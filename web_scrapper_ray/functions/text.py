"""Text-processing function library.

Behavioral parity targets (semantics, not code) from the reference:
``clean_text``/``clean_html``/``summarize_text``/``extract_keywords``/
``extract_entities``/``word_count``/``estimate_reading_time`` at
`/root/reference/src/webscraper/utils/text.py:15-379`.

Each scalar function has exact reference semantics (unit-tested); batch
variants for ``map_batches`` are provided where the op is hot-path.
"""

from __future__ import annotations

import re

import numpy as np

_WS_RX = re.compile(r"\s+")
_CTRL_RX = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_WORD_RX = re.compile(r"\b\w+\b")
_TAG_RX = re.compile(r"<[^>]+>")
_ENT_NAME_RX = re.compile(r"&[a-zA-Z]+;")
_ENT_NUM_RX = re.compile(r"&#\d+;")
_SENT_SPLIT_RX = re.compile(r"(?<=[.!?])\s+")

# Stop-word list per utils/text.py:167-184 (reference behavior).
STOP_WORDS = frozenset(
    """a an the and or but if because as what which this that these those then
    just so than such both through about for is of while during to from in on
    by at with against between into before after above below up down out off
    over under again further once here there when where why how all any each
    few more most other some no nor not only own same too very s t can will
    don should now i me my myself we our ours ourselves you your yours
    yourself yourselves he him his himself she her hers herself it its itself
    they them their theirs themselves am are was were be been being have has
    had having do does did doing would could ought m re ve ll d""".split()
)


# The reference's "Normalize quotes" block (utils/text.py:37-39) is NOT
# what it looks like: line 38 replaces a straight quote with itself (a
# true no-op), but line 39's curly-quote literals were mangled so Python
# tokenizes ''' as a triple-quote — the line actually executes
# cleaned.replace(', "\'").replace(', "'"), i.e. it replaces this exact
# 15-char code-like sequence with a single apostrophe (verified by
# executing the reference module). Curly quotes pass through unchanged.
_REF_QUOTE_GLITCH = ", \"'\").replace("


def clean_text(text: str | None) -> str:
    """Whitespace collapse + nbsp normalization + the reference's
    (accidental) quote-glitch replace + control-char strip (reference:
    utils/text.py:15-44; see _REF_QUOTE_GLITCH note)."""
    if not text:
        return ""
    s = _WS_RX.sub(" ", text).strip()
    s = s.replace("\xa0", " ")
    s = s.replace(_REF_QUOTE_GLITCH, "'")
    return _CTRL_RX.sub("", s)


def clean_html(html_text: str | None) -> str:
    """Tag/entity strip then clean_text (reference: utils/text.py:47-78,
    regex fallback branch — bs4 is absent here by construction)."""
    if not html_text:
        return ""
    s = _TAG_RX.sub("", html_text)
    s = _ENT_NAME_RX.sub(" ", s)
    s = _ENT_NUM_RX.sub(" ", s)
    return clean_text(s)


def _truncate_at_word(cleaned: str, max_length: int) -> str:
    out = cleaned[:max_length].rstrip()
    if len(out) < len(cleaned) and out and out[-1] != " " and cleaned[len(out)] != " ":
        sp = out.rfind(" ")
        if sp > 0:
            out = out[:sp]
    return out + "..."


def summarize_text(text: str | None, max_length: int = 150,
                   prefer_sentences: bool = True) -> str:
    """Sentence-boundary-aware truncation (reference: utils/text.py:81-143)."""
    if not text:
        return ""
    cleaned = clean_text(text)
    if len(cleaned) <= max_length:
        return cleaned
    if prefer_sentences:
        summary = ""
        for sentence in _SENT_SPLIT_RX.split(cleaned):
            if len(summary) + len(sentence) + 1 <= max_length:
                summary += sentence + " "
            else:
                break
        summary = summary.strip()
        if summary:
            return summary
    return _truncate_at_word(cleaned, max_length)


def extract_keywords(text: str | None, max_keywords: int = 5) -> list[str]:
    """Top-k frequent non-stop-words, ties broken by first occurrence
    (reference: utils/text.py:146-203 — stable sort over insertion order)."""
    if not text:
        return []
    words = _WORD_RX.findall(clean_text(text.lower()))
    freq: dict[str, int] = {}
    for w in words:
        if w not in STOP_WORDS and len(w) > 2:
            freq[w] = freq.get(w, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: kv[1], reverse=True)
    return [w for w, _ in ranked[:max_keywords]]


def word_count(text: str | None) -> int:
    """\\b\\w+\\b token count after clean_text (reference: utils/text.py:344-363)."""
    if not text:
        return 0
    return len(_WORD_RX.findall(clean_text(text)))


def estimate_reading_time(text: str | None, words_per_minute: int = 200) -> int:
    """max(1, round(words/wpm)) — Python banker's rounding, matching
    reference utils/text.py:366-379."""
    return max(1, round(word_count(text) / words_per_minute))


_EMAIL_RX = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
_URL_RX = re.compile(r"https?://[^\s]+")
_PHONE_RX = re.compile(
    r"\b(?:\+\d{1,3}[-.\s]?)?(?:\(?\d{3}\)?[-.\s]?)?\d{3}[-.\s]?\d{4}\b"
)
_DATE_RXES = [
    re.compile(r"\b\d{1,2}/\d{1,2}/\d{2,4}\b", re.IGNORECASE),
    re.compile(r"\b\d{4}-\d{1,2}-\d{1,2}\b", re.IGNORECASE),
    re.compile(
        r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b",
        re.IGNORECASE,
    ),
]
_PEOPLE_RXES = [
    re.compile(p)
    for p in (
        r"Mr\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Ms\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Mrs\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Dr\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Prof\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
    )
]
_ORG_RX = re.compile(
    r"(?:[A-Z][a-z]*\s+)+(?:Inc|Corp|Corporation|LLC|Company|Ltd|Limited|"
    r"Association|Foundation|Institute)"
)
_LOC_RXES = [
    re.compile(p)
    for p in (
        r"in [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
        r"at [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
        r"from [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
        r"to [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
    )
]


def _dedup_keep_order(items: list[str]) -> list[str]:
    seen: set[str] = set()
    return [x for x in items if not (x in seen or seen.add(x))]


def extract_entities(text: str | None) -> dict[str, list[str]]:
    """Regex entity extraction (reference: utils/text.py:206-341, the
    non-NLTK branch — NLTK is absent in this container; the NLTK path is
    the ST4 actor-pool stage and is stubbed)."""
    if not text:
        return {}
    ents: dict[str, list[str]] = {
        "people": [], "organizations": [], "locations": [],
        "dates": [], "emails": [], "urls": [], "phone_numbers": [],
    }
    ents["emails"] = _EMAIL_RX.findall(text)
    ents["urls"] = _URL_RX.findall(text)
    ents["phone_numbers"] = _PHONE_RX.findall(text)
    dates: list[str] = []
    for rx in _DATE_RXES:
        dates.extend(rx.findall(text))
    ents["dates"] = dates
    for rx in _PEOPLE_RXES:
        ents["people"].extend(rx.findall(text))
    ents["organizations"].extend(_ORG_RX.findall(text))
    for rx in _LOC_RXES:
        for m in rx.findall(text):
            parts = m.split(" ", 1)
            if len(parts) > 1:
                ents["locations"].append(parts[1])
    return {k: _dedup_keep_order(v) for k, v in ents.items()}


# ---------------------------------------------------------------------------
# Batch variants for hot map_batches stages
# ---------------------------------------------------------------------------


def word_count_batch(texts) -> np.ndarray:
    return np.fromiter(
        (word_count(t) for t in texts), dtype=np.int64, count=len(texts)
    )


def simple_token_count_batch(texts) -> np.ndarray:
    """\\w+ token count on the RAW text (no clean_text) — the
    SQL-oracle-friendly token counter used by the documents pipelines."""
    return np.fromiter(
        (0 if t is None else len(_WORD_RX.findall(t)) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
