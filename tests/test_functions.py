from web_scrapper_ray.functions import text as T
from web_scrapper_ray.functions import validators as V
from web_scrapper_ray.functions.urlnorm import canonicalize_url, host_of


def test_clean_text():
    assert T.clean_text("  a\t\nb\xa0c  ") == "a b c"
    assert T.clean_text("x\x00y\x07z") == "xyz"
    # the reference's quote-normalization lines are no-ops (verified by
    # executing the reference): curly quotes must pass through unchanged
    assert T.clean_text("“q” ‘s’") == "“q” ‘s’"
    assert T.clean_text(None) == ""


def test_clean_html():
    assert T.clean_html("<p>Hello &amp; <b>world</b>&#33;</p>") == "Hello world"
    assert T.clean_html("") == ""


def test_summarize():
    assert T.summarize_text("short text.", 150) == "short text."
    s = T.summarize_text("One sentence here. Two sentence here. " * 10, 40)
    assert s == "One sentence here. Two sentence here."
    long_word = "a" * 200
    assert T.summarize_text(long_word, 50).endswith("...")


def test_keywords_tiebreak_first_occurrence():
    txt = "zebra apple zebra banana apple cherry"
    # zebra=2, apple=2, banana=1, cherry=1 → stable order of first occurrence
    assert T.extract_keywords(txt, 3) == ["zebra", "apple", "banana"]
    assert T.extract_keywords("the and of to", 5) == []


def test_word_count_reading_time():
    assert T.word_count("one two three") == 3
    assert T.word_count("") == 0
    assert T.estimate_reading_time("word " * 500) == 2
    assert T.estimate_reading_time("tiny") == 1
    # banker's rounding edge: 100 words / 200 wpm = 0.5 → round→0 → max(1,·)=1
    assert T.estimate_reading_time("w " * 100) == 1
    # 300/200 = 1.5 → banker's → 2
    assert T.estimate_reading_time("w " * 300) == 2


def test_entities():
    e = T.extract_entities(
        "Email a@b.org, call 555-123-4567, see https://x.org/page "
        "on 2023-01-02. Dr. John Smith of Acme Corp in Boston, Massachusetts."
    )
    assert "a@b.org" in e["emails"]
    assert "https://x.org/page" in e["urls"]
    assert any("555" in p for p in e["phone_numbers"])
    assert "2023-01-02" in e["dates"]
    assert "Dr. John Smith" in e["people"]
    assert "Acme Corp" in e["organizations"]
    assert "Boston, Massachusetts" in e["locations"]


def test_validators():
    assert V.is_valid_email("a.b@real-domain.org")
    assert not V.is_valid_email("a@example.com")
    assert not V.is_valid_email("nope")
    assert V.is_valid_phone("(555) 123-4567")
    assert not V.is_valid_phone("1111111")
    assert not V.is_valid_phone("1234567")
    assert V.is_valid_url("https://real.org/x")
    assert not V.is_valid_url("http://localhost/x")
    assert not V.is_valid_url("http://127.0.0.1/")
    assert V.is_valid_date("2023-05-01") and V.is_valid_date("May 01, 2023")
    assert not V.is_valid_date("not a date")
    assert V.is_valid_ip("10.0.0.1") and not V.is_valid_ip("300.1.1.1")
    assert V.is_valid_credit_card("4539 1488 0343 6467")
    assert not V.is_valid_credit_card("1234 5678 9012 3456")
    assert V.is_valid_json('{"a": 1}') and not V.is_valid_json("{nope")
    assert V.is_valid_numeric("3.5", 0, 10) and not V.is_valid_numeric("x")


def test_canonicalize_url():
    assert (
        canonicalize_url("HTTP://WWW.Example.COM:80/a/./b/../c?b=2&a=1#frag")
        == "http://www.example.com/a/c?a=1&b=2"
    )
    assert canonicalize_url("https://h.org:443/") == "https://h.org/"
    assert canonicalize_url("https://h.org:8443/x") == "https://h.org:8443/x"
    assert canonicalize_url("example.org") == "http://example.org/"
    assert canonicalize_url("http://h.org/%7euser/%2d") == "http://h.org/~user/-"
    # punycode
    assert canonicalize_url("http://bücher.example/x") == "http://xn--bcher-kva.example/x"
    assert host_of("HTTPS://A.B.C:9/x") == "a.b.c"
    # duplicate query keys preserved, sorted by (key,value)
    assert canonicalize_url("http://h.org/?b=1&a=2&a=1") == "http://h.org/?a=1&a=2&b=1"


def test_exception_hierarchy_and_logging(tmp_path):
    """Reference utility surface (utils/exceptions.py, utils/logging.py)."""
    import logging

    from web_scrapper_ray.functions import errors

    for name in ("ScraperError", "StorageError", "ValidationError",
                 "ConfigError", "ConnectionError", "RateLimitError",
                 "ParsingError", "CaptchaError", "ProxyError",
                 "AuthenticationError", "SchedulingError",
                 "DataProcessingError"):
        exc = getattr(errors, name)
        assert issubclass(exc, errors.WebScraperError)

    log_file = str(tmp_path / "x.log")
    lg = errors.configure_logging(level="DEBUG", log_file=log_file,
                                  log_to_file=True, log_to_console=False,
                                  logger_name="wsr.test")
    lg.debug("hello-debug")
    for h in lg.handlers:
        h.flush()
    text = open(log_file).read()
    assert "hello-debug" in text and "wsr.test" in text
    assert lg.propagate is False

    import pytest as _pytest
    with _pytest.raises(ValueError):
        errors.configure_logging(level="NOPE", logger_name="wsr.test2")
    assert errors.get_logger("abc") is logging.getLogger("abc")


def test_urlnorm_edge_cases_from_review():
    """Round-1 latent bugs pinned: %2E dot segments, anchored scheme
    detection, malformed ports, IPv6 brackets, unencodable IDNA."""
    from web_scrapper_ray.functions.urlnorm import canonicalize_url, host_of

    # percent-encoded dot segments resolve AND the result is idempotent
    c = canonicalize_url("http://h/a/%2e%2e/b")
    assert c == "http://h/b" and canonicalize_url(c) == c
    # '://' inside the query is not a scheme
    c2 = canonicalize_url("example.com/login?next=http://example.com/home")
    assert c2.startswith("http://example.com/login?")
    assert host_of("example.com/login?next=http://e.com/h") == "example.com"
    # malformed / out-of-range ports survive without raising
    assert canonicalize_url("http://h:99999/x")  # no ValueError
    assert canonicalize_url("http://h:8080abc/x")
    # IPv6 literals keep their brackets and stay idempotent
    c3 = canonicalize_url("https://[2001:db8::1]:8443/x")
    assert "[2001:db8::1]:8443" in c3 and canonicalize_url(c3) == c3
    # unencodable unicode host degrades instead of raising
    assert canonicalize_url("http://héllo..com/x")


def test_decode_image_corrupt_payloads_raise_valueerror():
    """Truncated/corrupt bodies must surface as ValueError (the decode
    stage's skip contract), never struct/zlib errors."""
    import pytest as _pytest

    from web_scrapper_ray import codecs

    for bad in (b"\x89PNG\r\n\x1a\n",                       # sig only
                b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" # truncated IHDR
                + b"IHDR" + b"\x00" * 5,
                b"SJ01" + b"\x01\x02"):
        with _pytest.raises(ValueError):
            codecs.decode_image(bad)
    # corrupt IDAT (valid structure, garbage compressed stream)
    from web_scrapper_ray.codecs import _PNG_SIG, _chunk
    import struct
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad_idat = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"junk") + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError):
        codecs.decode_image(bad_idat)
    # interlaced PNG: explicit unsupported error
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    interlaced = _PNG_SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IDAT", b"") + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="interlaced"):
        codecs.decode_image(interlaced)


def test_canonicalize_degrades_on_unparseable_authority():
    """A stray bracket in the authority (urlsplit ValueError) must not
    crash — it degrades to the stripped input, idempotently — and
    host_of handles protocol-relative and unparseable URLs."""
    from web_scrapper_ray.functions.urlnorm import canonicalize_url, host_of

    bad = "http://ex[a]mple.com/img.png"
    got = canonicalize_url(bad)
    assert got == bad
    assert canonicalize_url(got) == got  # fallback is idempotent
    assert host_of(bad) == ""
    assert host_of("//cdn.example.com/i.png") == "cdn.example.com"


def test_user_agent_pool_reference_semantics():
    """Reference user_agents.py parity: add() skips empty strings and
    duplicates; an empty pool falls back to the default pool (the
    reference's `or COMMON_USER_AGENTS` path — its single-default-UA
    warning branch is unreachable there too)."""
    from web_scrapper_ray.functions.user_agents import UserAgentManager

    m = UserAgentManager(user_agents=["ua-1"], rotate="sequential")
    m.add("")          # dropped
    m.add("ua-1")      # duplicate dropped
    m.add("ua-2")
    assert m.user_agents == ["ua-1", "ua-2"]
    empty = UserAgentManager(user_agents=[])
    assert empty.get()  # non-empty default UA


def test_exception_hierarchy_matches_reference():
    """exceptions.py parity: every exception (including ConfigError)
    subclasses WebScraperError."""
    from web_scrapper_ray.functions import errors as E

    for name in ("ConfigError", "ScraperError", "StorageError",
                 "ValidationError", "RateLimitError", "ParsingError"):
        assert issubclass(getattr(E, name), E.WebScraperError), name
