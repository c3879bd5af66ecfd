"""Property/randomized tests (SURVEY.md §5.1 item 5) — hypothesis over
the pure function layer: parsers never throw, canonicalization is
idempotent, summaries respect bounds, filters behave like sets."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from web_scrapper_ray import extract
from web_scrapper_ray.functions.text import clean_text, summarize_text, word_count
from web_scrapper_ray.functions.urlnorm import canonicalize_url, host_of
from web_scrapper_ray.state.cuckoo import CuckooFilter, hash64

url_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=80,
)


@given(url_text)
@settings(max_examples=200, deadline=None)
def test_canonicalize_total_and_idempotent(s):
    # canonicalize_url is now TOTAL (unparseable authorities degrade to
    # the scheme-prefixed stripped input), so idempotency is asserted
    # unconditionally — the old try/except Exception: pass swallowed
    # AssertionError too
    c = canonicalize_url(s)
    assert canonicalize_url(c) == c
    host_of(c)


def test_canonicalize_trailing_dot_whitespace_host():
    # regression: rstrip('.') exposing trailing whitespace used to stop
    # after one pass, so pass 1 degraded to the unicode host while pass
    # 2 punycode-encoded it — a different seen/store key per pass
    c = canonicalize_url("ä\x85.")
    assert canonicalize_url(c) == c
    assert c == "http://xn--4ca/"


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_text_functions_total(s):
    cleaned = clean_text(s)
    assert "\x00" not in cleaned
    assert word_count(s) >= 0
    summary = summarize_text(s, 50)
    assert len(summary) <= max(53, len(cleaned))


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_parsers_never_throw(s):
    extract.parse_price(s)
    extract.parse_rating(s)
    extract.parse_phone(s, dict(extract.DEFAULT_BIZ_OPTS))
    extract.parse_email(s, dict(extract.DEFAULT_BIZ_OPTS))
    extract.clean_url(s, dict(extract.DEFAULT_BIZ_OPTS))


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives(items):
    f = CuckooFilter(capacity=1 << 12)
    arr = np.array(items, dtype=np.uint64)
    if arr.size:
        f.contains_or_add(arr)
        # everything inserted must be reported present afterwards
        assert f.contains_or_add(arr).all()


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_hash64_stable(s):
    assert hash64(s) == hash64(s)
    assert 0 <= hash64(s) < 2**64
