"""Text-analysis pipelines over the ``documents`` table.

Large-scale training-data ops: token counting, quality scoring,
language-ID (stopword heuristic), document fingerprinting, global
keyword top-k, reading time, clean-text — each a vectorized
``map_batches`` stage; aggregations pre-combine per batch before the
groupby shuffle (A1 global analog, SURVEY.md §2.5).

Integer-arithmetic score rules keep the DuckDB oracle SQL bit-exact.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _with_cols as _wc
from ..functions.text import STOP_WORDS, clean_text, estimate_reading_time

# ASCII \w to match the DuckDB (RE2) oracle token-for-token: Python's
# unicode \w would claim 'café' as one token where RE2 yields 'caf',
# silently flipping q13/q15/q16 on any non-ASCII corpus. (The reference
# uses unicode \w, but its corpus-facing behavior is identical on the
# ASCII test corpora; the SQL-checkable contract wins here.)
_TOKEN_RX = re.compile(r"\w+", re.ASCII)


def _docs(sf_dir: str, columns=None):
    from .relational import _read

    return _read(sf_dir, "documents", columns)  # memoized read


def keyword_counter(texts) -> Counter:
    """The q13/q65 keyword tokenization, in ONE place: ASCII ``\\w``
    tokens, lowered, len>2, non-stopword. The exact top-k (q13) and the
    CMS heavy hitters (q65, pipelines/sketches.py) must count the same
    tokens or their exactness-vs-each-other test is meaningless — keep
    any tokenization change here so both move together."""
    counter: Counter = Counter()
    for t in texts:
        for w in _TOKEN_RX.findall((t or "").lower()):
            if len(w) > 2 and w not in STOP_WORDS:
                counter[w] += 1
    return counter


def q_token_count_ds(sf_dir: str):
    """Dataset-returning core of q10 (the scale-safe contract: per-row
    results are corpus-sized, so the gate hash-compares a streamed
    parquet write instead of riding ``to_pandas`` through the
    driver). Fully vectorized: pyarrow.compute regex kernel."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), r"\w+")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_token_count(sf_dir: str) -> pd.DataFrame:
    """Fully vectorized: pyarrow.compute regex kernel, zero Python rows."""
    out = _wc(q_token_count_ds(sf_dir).to_pandas(),
              {"doc_id": "int64", "n_tokens": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_reading_time_ds(sf_dir: str):
    """Dataset-returning core of q11 (scale-safe gate contract)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def rt(batch: pa.Table) -> pa.Table:
        vals = [max(1, round(len(_TOKEN_RX.findall(clean_text(t))) / 200))
                for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "reading_min": pa.array(vals, pa.int64())})

    return ds.map_batches(rt, batch_format="pyarrow")


def q_reading_time(sf_dir: str) -> pd.DataFrame:
    """Reference F2 semantics: max(1, banker's-round(word_count/200)),
    counted on the CLEANED text like reference word_count — but with
    the ASCII tokenizer so the count matches the RE2 oracle exactly
    (same q13/q15/q16 rule; `estimate_reading_time` remains the
    unicode reference-parity scalar for the T-surface)."""
    return _wc(q_reading_time_ds(sf_dir).to_pandas(),
               {"doc_id": "int64",
                "reading_min": "int64"}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_clean_text_ds(sf_dir: str):
    """Dataset-returning core of q12 (scale-safe gate contract):
    reference T7 clean_text over the corpus — vectorized with
    pyarrow.compute replace/trim kernels (RE2), mirroring the scalar
    `clean_text` step-for-step (nbsp pre-replace, whitespace collapse,
    trim, the reference's quote-glitch replace, control strip). Known
    residual: Python's \\s also matches \\x1c–\\x1f, which here survive
    the collapse and are stripped instead (printable-ASCII corpora are
    unaffected); the scalar function remains the semantics oracle."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def clean(batch: pa.Table) -> pa.Table:
        from ..functions.text import _REF_QUOTE_GLITCH

        s = batch.column("text")
        # nbsp BEFORE the collapse: Python's \s matches \xa0 (so the
        # scalar clean_text collapses it), RE2's does not
        s = pc.replace_substring(s, "\xa0", " ")
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim_whitespace(s)
        # the reference's mis-parsed "normalize quotes" line really
        # replaces this literal code fragment (see functions/text.py)
        s = pc.replace_substring(s, _REF_QUOTE_GLITCH, "'")
        s = pc.replace_substring_regex(s, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
        return pa.table({"doc_id": batch.column("doc_id"), "clean": s})

    return ds.map_batches(clean, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_clean_text(sf_dir: str) -> pd.DataFrame:
    """See :func:`q_clean_text_ds` (driver-materialized form for the
    oracle row-compare)."""
    return _wc(q_clean_text_ds(sf_dir).to_pandas(),
               {"doc_id": "int64", "clean": "object"}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_fingerprint_ds(sf_dir: str):
    """Dataset-returning core of q14 (scale-safe gate contract):
    document fingerprint = md5 hex of the raw text (content-hash
    column reused by exact dedup)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        fps = [None if t is None else hashlib.md5(t.encode()).hexdigest()
               for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": pa.array(fps, pa.string())})

    return ds.map_batches(fp, batch_format="pyarrow")


def q_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Document fingerprint = md5 hex of the raw text (content-hash
    column reused by exact dedup)."""
    return _wc(q_fingerprint_ds(sf_dir).to_pandas(),
               {"doc_id": "int64", "fp": "object"}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def quality_stats(text: str | None) -> tuple[int, int, bool] | None:
    """q15's integer-exact quality rule in ONE place (shared by q15 and
    q68 — both oracle SQLs are built from the same _TOKS/_NSTOP macros,
    so the engine sides must move together too): (n_tokens, n_stop,
    is_good) with is_good = (10 ≤ n ≤ 1000) ∧ (20·n_stop > n); None for
    NULL text (the oracle's NULL stats)."""
    if text is None:
        return None
    toks = _TOKEN_RX.findall(text.lower())
    ns = sum(1 for w in toks if w in STOP_WORDS)
    return len(toks), ns, (10 <= len(toks) <= 1000 and 20 * ns > len(toks))


def q_quality_ds(sf_dir: str):
    """Dataset-returning core of q15 (scale-safe gate contract):
    quality signals with integer-exact rules — token count, stopword
    count, is_good = (10 ≤ n_tokens ≤ 1000) ∧ (20·n_stop > n_tokens)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        doc_ids, n_tok, n_stop, good = [], [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            doc_ids.append(d)
            st = quality_stats(t)
            if st is None:  # NULL text -> NULL stats (oracle semantics)
                n_tok.append(None)
                n_stop.append(None)
                good.append(None)
                continue
            n_tok.append(st[0])
            n_stop.append(st[1])
            good.append(st[2])
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "is_good": pa.array(good, pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_quality(sf_dir: str) -> pd.DataFrame:
    """Quality signals with integer-exact rules: token count, stopword
    count, is_good = (10 ≤ n_tokens ≤ 1000) ∧ (20·n_stop > n_tokens)."""
    out = _wc(q_quality_ds(sf_dir).to_pandas(),
              {"doc_id": "int64", "n_tokens": "int64",
               "n_stop": "int64", "is_good": "bool"}) \
        .sort_values("doc_id").reset_index(drop=True)
    # NULL booleans: Arrow→pandas hands None, DuckDB→pandas hands
    # np.nan inside the object column — normalize to the oracle's
    # representation so the value-hash agrees
    if out["is_good"].isna().any():
        out["is_good"] = out["is_good"].astype(object).where(
            out["is_good"].notna(), np.nan)
    return out


def q_lang_id_ds(sf_dir: str):
    """Dataset-returning core of q16 (scale-safe gate contract):
    stopword-ratio language heuristic, 'en' iff 10·n_stop > n_tokens."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def lang(batch: pa.Table) -> pa.Table:
        doc_ids, preds = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            # NULL text -> 'other' (the oracle's CASE WHEN NULL is not-true)
            toks = _TOKEN_RX.findall((t or "").lower())
            ns = sum(1 for w in toks if w in STOP_WORDS)
            doc_ids.append(d)
            preds.append("en" if 10 * ns > len(toks) else "other")
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "lang_pred": pa.array(preds)})

    return ds.map_batches(lang, batch_format="pyarrow")


def q_lang_id(sf_dir: str) -> pd.DataFrame:
    """Stopword-ratio language heuristic: 'en' iff 10·n_stop > n_tokens."""
    return _wc(q_lang_id_ds(sf_dir).to_pandas(),
               {"doc_id": "int64",
                "lang_pred": "object"}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_keywords_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global keyword top-k (A1 global analog): per-batch Counter partial
    → small (word, n) stream → groupby-sum → sort. The shuffle carries
    one row per distinct word per batch, not one per token."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        counter = keyword_counter(batch.column("text").to_pylist())
        if not counter:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, ns = zip(*counter.items())
        return pa.table({"word": pa.array(list(words)), "n": pa.array(list(ns), pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n_total"))
        .to_pandas()
    )
    agg = _wc(agg, {"word": "object", "n_total": "int64"})
    agg = agg.sort_values(["n_total", "word"], ascending=[False, True]).head(k)
    return agg.reset_index(drop=True)


def q_json_valid(sf_dir: str) -> pd.DataFrame:
    """F8 is_valid_json over the events props column."""
    import ray.data as rd

    from ..functions.validators import is_valid_json_batch

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "props"])

    def valid(batch: pa.Table) -> pa.Table:
        mask = is_valid_json_batch(batch.column("props").to_pylist())
        return pa.table({"event_id": batch.column("event_id"),
                         "valid_json": pa.array(mask, pa.bool_())})

    from .relational import _with_cols

    out = ds.map_batches(valid, batch_format="pyarrow").to_pandas()
    out = _with_cols(out, {"event_id": "int64", "valid_json": "bool"})
    return out.sort_values("event_id").reset_index(drop=True)


class _JPairs(list):
    """JSON object as its ordered (key, value) pair list — duplicate keys
    preserved for re-serialization (yyjson keeps the raw document, so
    ``{"a":1,"a":2}`` round-trips with BOTH pairs) while ``$.k`` lookup
    takes the FIRST match (probed: yyjson pointer returns the first
    duplicate, Python dicts would keep the last)."""
    __slots__ = ()


_NUM_REPR = re.compile(r"(-?)(\d+)(?:\.(\d+))?(?:e([+-]?\d+))?")
# yyjson READ_ALLOW_INF_AND_NAN tokens Python's json rejects:
# case-insensitive nan / inf / infinity, optional '-' only (a leading
# '+' is rejected by yyjson everywhere, probed '{"k": +infinity}')
_INFNAN = re.compile(r"-?(?:nan|infinity|inf)", re.IGNORECASE)


def _yy_double(x: float) -> str:
    """Render a double exactly like yyjson's writer (probed via DuckDB
    json_extract_string 2026-08-18): shortest round-trip digits; fixed
    notation when the decimal point lands in (-6, 21] (integral values
    get a ``.0`` suffix: ``1e15`` → ``1000000000000000.0``), otherwise
    scientific with NO ``+`` on the exponent (``1e22``, ``1e-7``).
    Python's repr switches to scientific at 1e16 — too early."""
    if x != x:
        return "NaN"
    if x in (float("inf"), float("-inf")):
        return "Infinity" if x > 0 else "-Infinity"
    m = _NUM_REPR.fullmatch(repr(float(x)))
    sign, ip, fp, ex = m.group(1), m.group(2), m.group(3) or "", m.group(4)
    alldig = ip + fp
    digits = alldig.lstrip("0")
    if not digits:
        return sign + "0.0"
    # k = decimal-point position relative to the first significant digit
    k = len(ip) - (len(alldig) - len(digits)) + (int(ex) if ex else 0)
    digits = digits.rstrip("0") or "0"
    if len(digits) <= k <= 21:
        return sign + digits + "0" * (k - len(digits)) + ".0"
    if 0 < k <= 21:
        return sign + digits[:k] + "." + digits[k:]
    if -6 < k <= 0:
        return sign + "0." + "0" * (-k) + digits
    mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return sign + mant + "e" + str(k - 1)


def _yy_int(v: int) -> str:
    # yyjson parses integers exactly within [int64 min, uint64 max];
    # anything wider is read as a double (probed: 123456789012345678901
    # → '123456789012345680000.0')
    if -(2 ** 63) <= v <= 2 ** 64 - 1:
        return str(v)
    try:
        return _yy_double(float(v))
    except OverflowError:
        return "-Infinity" if v < 0 else "Infinity"


def _yy_render(v, json) -> str:
    """Compact re-serialization matching yyjson's writer. String
    escaping matches json.dumps(ensure_ascii=False) (probed: control
    chars → \\u0001, shortcuts for \\n \\t \\" \\\\, raw unicode,
    unescaped ``/``)."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, int):
        return _yy_int(v)
    if isinstance(v, float):
        return _yy_double(v)
    if isinstance(v, _JPairs):
        return "{" + ",".join(
            json.dumps(kk, ensure_ascii=False) + ":" + _yy_render(vv, json)
            for kk, vv in v) + "}"
    return "[" + ",".join(_yy_render(x, json) for x in v) + "]"


def _rewrite_infnan(s: str) -> str:
    """Rewrite yyjson-accepted inf/nan spellings (``nan``, ``-NaN``,
    ``Inf``, ``+infinity`` …) outside string literals to the spellings
    Python's json accepts (``NaN`` — sign dropped, -NaN is NaN —
    and ``Infinity``/``-Infinity``). Only runs on the slow path after a
    plain json.loads has already failed."""
    out, i, n, in_str = [], 0, len(s), False
    while i < n:
        c = s[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(s[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
            continue
        if c == '"':
            in_str = True
            out.append(c)
            i += 1
            continue
        m = _INFNAN.match(s, i)
        if m:
            tok = m.group(0)
            body = tok.lstrip("-").lower()
            if body == "nan":
                out.append("NaN")
            else:
                out.append(("-" if tok[0] == "-" else "") + "Infinity")
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _loads_yy(s):
    """Parse like yyjson (inf/nan tokens allowed, duplicate object
    keys preserved via _JPairs); None when unparseable."""
    import json

    try:
        return json.loads(s, object_pairs_hook=_JPairs)
    except (ValueError, TypeError, RecursionError):
        if not (s and _INFNAN.search(s)):
            return None
        try:
            return json.loads(_rewrite_infnan(s),
                              object_pairs_hook=_JPairs)
        except (ValueError, TypeError, RecursionError):
            return None


def json_extract_string_py(s: str | None, path: str = "k") -> str | None:
    """One-row ``json_extract_string(s, '$.{path}')`` twin — the unit
    the q113 batch fn maps and the DuckDB-probe parity test targets."""
    import json

    if s is None:
        return None
    obj = _loads_yy(s)
    if not isinstance(obj, _JPairs):
        return None
    hit = next((vv for kk, vv in obj if kk == path), None)
    if hit is None:  # missing key or JSON null → SQL NULL
        return None
    if isinstance(hit, str):
        return hit  # top-level strings come back unquoted
    return _yy_render(hit, json)


def q_json_field(sf_dir: str, path: str = "k") -> pd.DataFrame:
    """JSON field extraction over events.props — DuckDB
    ``json_extract_string('$.k')`` semantics (probed 2026-08-18):
    invalid JSON / non-object roots / missing keys / JSON null → NULL;
    strings unquoted; scalars rendered as yyjson text (``true``,
    ``1.5``, ``1e22``, ``NaN``); duplicate keys → FIRST match; nested
    objects/arrays re-serialized compact with yyjson number rendering
    and duplicate pairs preserved. Parsing is the C json parser per
    batch list (string parsing is inherently row-wise — the same
    vectorization vehicle as the validator/levenshtein ops)."""
    import json

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        out = [json_extract_string_py(s, path)
               for s in batch.column("props").to_pylist()]
        return pa.table({"event_id": batch.column("event_id"),
                         "k": pa.array(out, pa.string())})

    from .relational import _with_cols

    out = ds.map_batches(extract, batch_format="pyarrow").to_pandas()
    out = _with_cols(out, {"event_id": "int64", "k": "object"})
    return out.sort_values("event_id").reset_index(drop=True)


def q_phone_digits(sf_dir: str) -> pd.DataFrame:
    """F5-adjacent validator exercise: the testdata customer table has no
    phone column, so a deterministic phone string is derived from
    c_custkey identically on both sides (engine + oracle SQL), then
    digit-normalized and checked with the RE2-expressible validity
    subset (length bounds, repeated-digit / sequential fakes)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"])
    non_digit = re.compile(r"[^\d+]")

    def digits(batch: pa.Table) -> pa.Table:
        keys, digs, valid = [], [], []
        for k in batch.column("c_custkey").to_pylist():
            if k is None:  # SQL: NULL key → NULL digits → NULL valid
                keys.append(None)
                digs.append(None)
                valid.append(None)
                continue
            phone = f"({200 + k % 800}) {100 + k % 900}-{k % 10000:04d}"
            d = non_digit.sub("", phone)
            ok = (
                7 <= len(d) <= 15
                and not (len(d) >= 7 and d == d[0] * len(d))
                and not d.startswith("12345")
            )
            keys.append(k)
            digs.append(d)
            valid.append(ok)
        return pa.table({"c_custkey": pa.array(keys, pa.int64()),
                         "digits": pa.array(digs, pa.string()),
                         "valid": pa.array(valid, pa.bool_())})

    out = _wc(ds.map_batches(digits, batch_format="pyarrow").to_pandas(),
              {"c_custkey": "int64", "digits": "object",
               "valid": "bool"})  # empty BOOLEAN arrives bool-dtyped
    out = (out.sort_values("c_custkey", na_position="last")
           .reset_index(drop=True))
    if out["valid"].dtype == object:
        # NULL boolean arrives as NaN from DuckDB→pandas (VARCHAR NULL
        # arrives as None) — mirror the asymmetry
        out["valid"] = out["valid"].fillna(np.nan)
    return out


# GPT-2-style pretokenizer, restricted to an ASCII-expressible subset so
# the Python `re` engine and DuckDB's RE2 oracle match token-for-token:
# contractions | space+letters | space+digits | space+punct-run | whitespace
BPE_SPLIT_RX_STR = (
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"
)


def q_bpe_token_count(sf_dir: str) -> pd.DataFrame:
    """BPE-ish token counting (pretokenizer piece count — the standard
    proxy for LLM token budgets when the merges table isn't loaded).
    Vectorized pyarrow.compute regex kernel per batch."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), BPE_SPLIT_RX_STR)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": pc.cast(n, pa.int64())})

    out = _wc(ds.map_batches(count, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas(),
              {"doc_id": "int64", "n_bpe_tokens": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_chunks(sf_dir: str, chunk_tokens: int = 32) -> pd.DataFrame:
    """Context-window chunking — the training-data op between token
    counting and sequence packing: each document splits into
    ceil(n/C) chunks of at most C tokens, (doc_id, chunk_idx,
    chunk_tokens) per chunk. Fully vectorized: counts from the RE2
    Arrow kernel, the explode is numpy repeat/arange — no Python
    per-doc loop; zero-token docs yield zero chunks (matching the
    oracle's empty range())."""
    import numpy as np
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        # fill_null: a NULL text yields zero chunks, exactly like the
        # oracle's range(NULL) unnesting to no rows
        n = pc.fill_null(pc.count_substring_regex(batch.column("text"),
                                                  r"\w+"), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_chunks = (n + chunk_tokens - 1) // chunk_tokens
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_tokens": pa.array([], pa.int64())})
        doc_rep = np.repeat(ids, n_chunks)
        n_rep = np.repeat(n, n_chunks)
        starts = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        idx = np.arange(total, dtype=np.int64) - starts
        tok = np.minimum(chunk_tokens, n_rep - idx * chunk_tokens)
        return pa.table({"doc_id": pa.array(doc_rep),
                         "chunk_idx": pa.array(idx),
                         "chunk_tokens": pa.array(tok)})

    out = _wc(ds.map_batches(chunks, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas(),
              {"doc_id": "int64", "chunk_idx": "int64",
               "chunk_tokens": "int64"})
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def q_tfidf_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-doc TF-IDF top-k terms (the corpus-aware keyword op — raw
    tf × ln(N/df)). Two streaming passes over the corpus, no token-scale
    shuffle:

    1. per-batch *distinct-per-doc* term partials → one groupby-sum on
       term → a vocab-sized (term, df) table, broadcast once via
       ``ray.put`` (at 100 TB this stays vocab-bounded, not
       corpus-bounded; swap the dict for a broadcast semi-join if the
       vocab itself outgrows worker heap);
    2. per-batch tf counting + idf lookup + per-doc top-k — only
       k rows per doc leave the stage.

    N comes from parquet metadata (no extra scan). Ties at the rank
    boundary break (score desc, term asc), matching the oracle's
    row_number ordering; equal (tf, df) pairs give bit-equal float64
    scores on both sides so the tie-break is deterministic."""
    import heapq

    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    n_docs = float(pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows)
    ds = _docs(sf_dir, ["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counter.update(set(_TOKEN_RX.findall((t or "").lower())))
        if not counter:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        terms, ns = zip(*counter.items())
        return pa.table({"term": pa.array(list(terms)),
                         "n": pa.array(list(ns), pa.int64())})

    df_tab = _wc((
        _docs(sf_dir, ["text"]).map_batches(df_partial, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("n", alias_name="df")).to_pandas()
    ), {"term": "object", "df": "int64"})
    import math

    idf = {t: math.log(n_docs / d)
           for t, d in zip(df_tab["term"], df_tab["df"])}
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        idf_ = ray.get(idf_ref)
        out_d, out_t, out_s = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            tf = Counter(_TOKEN_RX.findall((text or "").lower()))
            top = heapq.nsmallest(
                k, ((-n * idf_[t], t) for t, n in tf.items()))
            for neg, t in top:
                out_d.append(doc_id)
                out_t.append(t)
                out_s.append(round(-neg, 6))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "term": pa.array(out_t, pa.string()),
                         "score": pa.array(out_s, pa.float64())})

    out = _wc(ds.map_batches(score, batch_format="pyarrow")
              .to_pandas(),
              {"doc_id": "int64", "term": "object",
               "score": "float64"})
    return out.sort_values(["doc_id", "term"]).reset_index(drop=True)


def q_decontaminate(sf_dir: str, n: int = 8, holdout_mod: int = 50) -> pd.DataFrame:
    """Benchmark decontamination — the training-data op that flags
    corpus documents sharing any word n-gram with a held-out benchmark
    set (here: docs with ``doc_id % holdout_mod == 0``, derived
    deterministically from the same table so the check needs no
    external data). Returns (doc_id, n_hits, contaminated) for every
    non-benchmark doc, n_hits = distinct shared n-grams.

    Scale shape: the benchmark side is small by construction — its
    n-gram set is collected once and broadcast via ``ray.put``; the
    corpus side streams through one ``map_batches`` membership pass
    (set lookups on joined-token strings; swap strings for 128-bit
    hashes if the benchmark outgrows worker heap). No shuffle at all."""
    import numpy as np
    import ray

    def grams(text: str) -> list[str]:
        ws = _TOKEN_RX.findall((text or "").lower())
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]

    def _mod_filter(keep_equal: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % holdout_mod == 0) == keep_equal
            return batch.filter(pa.array(mask))
        return f

    bench_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _mod_filter(True), batch_format="pyarrow", zero_copy_batch=True)

    def bench_grams(batch: pa.Table) -> pa.Table:
        s: set = set()
        for t in batch.column("text").to_pylist():
            s.update(grams(t))
        return pa.table({"gram": pa.array(sorted(s), pa.string())})

    bench_set = set(
        _wc(bench_ds.map_batches(bench_grams, batch_format="pyarrow")
            .to_pandas(), {"gram": "object"})["gram"])
    bref = ray.put(bench_set)

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _mod_filter(False), batch_format="pyarrow", zero_copy_batch=True)

    def hits(batch: pa.Table) -> pa.Table:
        bench = ray.get(bref)
        ids = batch.column("doc_id").to_pylist()
        counts = [sum(1 for g in set(grams(t)) if g in bench)
                  for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_hits": pa.array(counts, pa.int64()),
                         "contaminated": pa.array(
                             [c > 0 for c in counts], pa.bool_())})

    out = _wc(ds.map_batches(hits, batch_format="pyarrow")
              .to_pandas(),
              {"doc_id": "int64", "n_hits": "int64",
               "contaminated": "bool"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_shard_pack(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """Balanced shard assignment — pack documents into ``k`` shards with
    near-equal token totals (the write-side balancing op for training
    shards). Docs are ranked globally by (n_tokens desc, doc_id asc) and
    dealt snake-wise (rank r → shard r%2k if < k else 2k-1-r%2k), the
    vectorizable cousin of LPT packing.

    The global rank is computed WITHOUT a global sort: token counts are
    small integers, so rank = (#docs with strictly larger n, from a
    broadcast histogram) + (doc_id-rank within the doc's own n-value,
    computed inside one ``hash_shuffle`` exchange on ``n % P`` — any
    pure function of n keeps an n-value whole in one bucket, and the
    coarse buckets avoid the per-distinct-n ``map_groups`` dispatch
    cost. The exchange carries (doc_id, n) only — 16 bytes/doc — and
    the histogram is distinct-token-count-sized. Skew note: one hot
    n-value loads one merge task, which still only sorts int64 ids."""
    import numpy as np
    import pyarrow.compute as pc

    from .pairs import hash_shuffle

    P = 32

    def counts(batch: pa.Table) -> pa.Table:
        # NULL text packs as a zero-token doc (oracle: coalesce(..,0))
        n = pc.fill_null(pc.count_substring_regex(batch.column("text"),
                                                  r"\w+"), 0)
        return pa.table({"doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                         "n_tokens": pc.cast(n, pa.int64())})

    def hist_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("n_tokens"))
        return pa.table({"n_tokens": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    # one tokenization pass: the (doc_id, n_tokens) table is tiny
    # (16 bytes/doc) so materializing it is cheap and both the histogram
    # and the exchange reuse the same blocks — text never re-scans and
    # never enters the exchange
    nt = (_docs(sf_dir, ["doc_id", "text"])
          .map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
          .materialize())
    hist = (_wc(nt.map_batches(hist_partial, batch_format="pyarrow")
                .to_pandas(), {"n_tokens": "int64", "cnt": "int64"})
            .groupby("n_tokens", as_index=False)["cnt"].sum()
            .sort_values("n_tokens", ascending=False))
    # offset[n] = number of docs with token count strictly greater than n
    offsets = dict(zip(hist["n_tokens"],
                       np.concatenate(([0], hist["cnt"].cumsum().to_numpy()[:-1]))))

    def split(block: pa.Table) -> pa.Table:
        if block.num_rows == 0 or \
                "n_tokens" not in block.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        n = block.column("n_tokens").to_numpy(zero_copy_only=False)
        return block.append_column("bucket", pa.array(n % P, pa.int64()))

    def merge(*tabs) -> pd.DataFrame:
        live = [t.drop_columns(["bucket"]) for t in tabs if t.num_rows]
        if not live:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "shard": pd.Series(dtype="int64")})
        g = pa.concat_tables(live).to_pandas() \
            .sort_values(["n_tokens", "doc_id"]).reset_index(drop=True)
        local = g.groupby("n_tokens").cumcount().to_numpy()
        idx = g["n_tokens"].map(offsets).to_numpy() + local
        m = idx % (2 * k)
        g["shard"] = np.where(m < k, m, 2 * k - 1 - m).astype(np.int64)
        return g

    parts = hash_shuffle([(r, ()) for r in nt.to_arrow_refs()],
                         split, merge, P=P)
    # no live-part filter: merge()'s typed empties concat cleanly and
    # keep the zero-doc case from raising on pd.concat([])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_token_offsets(sf_dir: str, block_tokens: int = 256) -> pd.DataFrame:
    """Global token offsets (distributed prefix sum) — lay the corpus
    out as one contiguous token stream in doc_id order and report each
    doc's start offset and its context-block id (``offset // B``), the
    addressing step for contiguous-packing training pipelines.

    The prefix sum never sorts globally: doc_ids are RANGE-bucketed
    (``doc_id * P // (max_id+1)``, max from parquet column statistics,
    with a distributed-max fallback when a writer omitted stats —
    contiguous ranges, unlike a hash), per-bucket token totals come from
    raw sum tasks over the materialized (doc_id, n) block refs (no
    second Dataset execution) and give the broadcast bucket base
    offsets, and each bucket finishes independently with a
    local sort + cumsum inside the raw-task exchange. Skew note: range
    buckets assume roughly uniform doc_id density; a dense hot range
    loads one merge task with O(bucket) int rows."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from .pairs import hash_shuffle

    P = 32
    path = os.path.join(sf_dir, "documents.parquet")
    md = pq.read_metadata(path)
    if md.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ["doc_id", "n_tokens", "start_offset", "block_id"]})
    idx = next(i for i in range(md.row_group(0).num_columns)
               if md.row_group(0).column(i).path_in_schema == "doc_id")
    stats = [md.row_group(g).column(idx).statistics
             for g in range(md.num_row_groups)]
    if all(s is not None and s.has_min_max for s in stats):
        max_id = max(s.max for s in stats)
    else:
        # Writer emitted no column statistics — fall back to one
        # column-pruned distributed max pass.
        max_id = int(_docs(sf_dir, ["doc_id"]).max("doc_id"))

    def counts(batch: pa.Table) -> pa.Table:
        # NULL text is a zero-token doc (oracle: coalesce(..,0))
        n = pc.fill_null(pc.count_substring_regex(batch.column("text"),
                                                  r"\w+"), 0)
        t = pa.table({"doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                      "n_tokens": pc.cast(n, pa.int64())})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(ids * P // (max_id + 1), pa.int64()))

    nt = (_docs(sf_dir, ["doc_id", "text"])
          .map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
          .materialize())

    refs = nt.to_arrow_refs()

    # Per-bucket token totals as raw tasks over the same block refs the
    # exchange consumes below: a second Dataset execution here would pay
    # the ~0.4s local-mode per-execution floor for a P-long reduction.
    def bucket_totals(block: pa.Table) -> "np.ndarray":
        b = block.column("bucket").to_numpy(zero_copy_only=False)
        n = block.column("n_tokens").to_numpy(zero_copy_only=False)
        # token counts stay far below 2^53, so the float64 round-trip
        # through bincount weights is exact
        return np.bincount(b, weights=n, minlength=P).astype(np.int64)

    totals_r = ray.remote(bucket_totals)
    base = sum(ray.get([totals_r.remote(r) for r in refs]))
    base = np.concatenate(([0], np.cumsum(base)[:-1]))

    def split(block: pa.Table) -> pa.Table:
        return block

    def merge(*tabs) -> pd.DataFrame:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 ["doc_id", "n_tokens", "start_offset",
                                  "block_id"]})
        g = pa.concat_tables(live).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        off = base[g["bucket"].iloc[0]] + \
            g["n_tokens"].cumsum().to_numpy() - g["n_tokens"].to_numpy()
        g["start_offset"] = off
        g["block_id"] = off // block_tokens
        return g.drop(columns=["bucket"])

    parts = hash_shuffle([(r, ()) for r in refs], split, merge, P=P)
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_stratified_sample(sf_dir: str, per_group: int = 5) -> pd.DataFrame:
    """Deterministic stratified sampling (the training-data "K docs per
    stratum" op): partition by language, rank inside each group by a
    content-derived hash (md5 — stable across runs and cluster shapes,
    unlike RNG state), keep the top K. One groupby shuffle; group ranking
    is vectorized pandas."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def add_rank_key(batch: pa.Table) -> pa.Table:
        keys = [None if t is None else hashlib.md5(t.encode()).hexdigest()
                for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         # explicit type: an all-NULL-text batch must
                         # not infer a null-typed column (schema clash
                         # in the downstream sort-based groupby)
                         "rank_key": pa.array(keys, pa.string())})

    def head_k(g: pa.Table) -> pa.Table:
        # NULL rank_key (NULL text → SQL md5(NULL) is NULL) sorts
        # last, DuckDB's ORDER BY default; Arrow string sort is
        # bytewise like pandas on the hex keys
        order = pc.sort_indices(
            g, sort_keys=[("rank_key", "ascending"),
                          ("doc_id", "ascending")],
            null_placement="at_end")
        top = g.take(order.slice(0, min(per_group, g.num_rows)))
        return pa.table({
            "lang": top.column("lang"),
            "doc_id": top.column("doc_id"),
            "rank": pa.array(np.arange(1, top.num_rows + 1), pa.int64())})

    from .relational import _null_safe_keys, _restore_null_keys

    out = (
        _null_safe_keys(ds.map_batches(add_rank_key,
                                       batch_format="pyarrow"), ["lang"])
        .groupby("lang")
        .map_groups(head_k, batch_format="pyarrow")
        .to_pandas()
    )
    out = _wc(out, {"lang": "object", "doc_id": "int64",
                    "rank": "int64"})
    out = _restore_null_keys(out, ["lang"])
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["lang", "rank"],
                           na_position="last").reset_index(drop=True)


def q_hash_split(sf_dir: str) -> pd.DataFrame:
    """Group-aware deterministic train/val/test split (80/10/10): every
    doc of a source lands in the same split — no cross-split leakage
    from near-identical pages of one site — and the assignment is a
    stable md5 of the source key, so it is independent of cluster
    shape, run order and Python hash salting. One partial-count pass
    (per-batch groupby over at most |sources-in-batch| rows) feeds a
    driver-side pandas sum (at most |distinct sources|×|batches| rows —
    a Dataset groupby here would pay the all-to-all's fixed local-mode
    latency for nothing); full md5s are computed once per distinct
    source per batch, never per row."""
    import pyarrow.compute as pc

    def _split_of(src) -> str:
        if src is None:
            return "test"  # mirrors the SQL CASE: NULL md5 falls to ELSE
        b = int(hashlib.md5(src.encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    def tag(batch: pa.Table) -> pa.Table:
        counts = pc.value_counts(batch.column("source"))
        srcs = counts.field("values").to_pylist()
        n = counts.field("counts").to_pylist()
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "split": pa.array([_split_of(s) for s in srcs], pa.string()),
            "n_docs": pa.array(n, pa.int64()),
        })

    df = _wc((_docs(sf_dir, ["source"])
              .map_batches(tag, batch_format="pyarrow")
              .to_pandas()),
             {"source": "object", "split": "object",
              "n_docs": "int64"})
    # code-keyed fold: pandas string groupby hashes NUL-terminated C
    # strings and would merge NUL-prefix source pairs (split is a
    # derived 3-value string — it can only differ when source differs,
    # so the source code alone keys the pair)
    from .pairs import factorize_strings

    codes, uniq = factorize_strings(df["source"], use_na_sentinel=False)
    out = (df.assign(_c=codes)
           .groupby(["_c", "split"], as_index=False)["n_docs"].sum())
    src = uniq.to_numpy()[out["_c"].to_numpy().astype(np.int64)] \
        if len(out) else np.array([], dtype=object)
    out["source"] = pd.Series(
        [None if (v is None or (isinstance(v, float)
                                and np.isnan(v))) else v
         for v in src], index=out.index, dtype=object)
    out["n_docs"] = out["n_docs"].astype("int64")
    return (out[["source", "split", "n_docs"]]
            .sort_values("split", kind="mergesort")
            .sort_values("source", kind="mergesort", na_position="last")
            .reset_index(drop=True))


def q_repetition_filter(sf_dir: str, dup_permille_max: int = 500,
                        top_permille_max: int = 200) -> pd.DataFrame:
    """Within-document repetition quality gate (the Gopher-style
    "duplicated content" axis, adapted to newline-free docs): per doc,
    total tokens, distinct tokens, the most frequent token's count, and
    integer-permille ratios — a doc is flagged when its duplicate-token
    share or its top-token share is excessive. Integer arithmetic keeps
    the DuckDB oracle bit-exact.

    Vectorization: regex split to a list column, then ONE
    ``list_flatten`` + ``list_parent_indices`` explode per batch; the
    per-(doc, token) counting and per-doc reduction are pandas groupby
    aggregations over the flat arrays — no Python loop over rows or
    tokens. Per-doc state never leaves the batch, so there is no
    shuffle at all."""
    import numpy as np
    import pyarrow.compute as pc

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        lists = pc.split_pattern_regex(batch.column("text"), r"\W+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")  # split artifacts at run boundaries
        toks = pc.filter(flat, keep)
        if isinstance(toks, pa.ChunkedArray):
            # one chunk -> ONE dictionary; per-chunk encode would give
            # incompatible code spaces
            toks = (pa.concat_arrays(toks.chunks) if toks.num_chunks
                    else pa.array([], pa.string()))
        # int token codes: pandas-groupby on object-dtype strings is the
        # documented hot-path anti-pattern; Arrow's C++ encode is cheap
        codes = np.asarray(pc.dictionary_encode(toks).indices)
        df = pd.DataFrame({"d": np.asarray(pc.filter(parent, keep)),
                           "t": codes})
        per = df.groupby(["d", "t"], sort=False).size().reset_index(name="c")
        agg = per.groupby("d", sort=False)["c"] \
            .agg(n_tokens="sum", n_distinct="size", top_count="max")
        # docs with zero tokens (or NULL text) drop out of the explode;
        # reindex them back with zeros like the SQL LEFT JOIN + coalesce
        agg = agg.reindex(range(len(batch)), fill_value=0)
        n = agg["n_tokens"].to_numpy().astype("int64")
        u = agg["n_distinct"].to_numpy().astype("int64")
        top = agg["top_count"].to_numpy().astype("int64")
        safe = np.maximum(n, 1)
        dup = (n - u) * 1000 // safe
        topp = top * 1000 // safe
        flagged = ((dup >= dup_permille_max)
                   | (topp >= top_permille_max)).astype("int64")
        return pa.table({
            "doc_id": pc.cast(ids, pa.int64()),
            "n_tokens": pa.array(n), "n_distinct": pa.array(u),
            "top_count": pa.array(top), "dup_permille": pa.array(dup),
            "top_permille": pa.array(topp), "flagged": pa.array(flagged),
        })

    out = _wc((_docs(sf_dir, ["doc_id", "text"])
               .map_batches(stats, batch_format="pyarrow")
               .to_pandas()),
              {"doc_id": "int64", "n_tokens": "int64",
               "n_distinct": "int64", "top_count": "int64",
               "dup_permille": "int64", "top_permille": "int64",
               "flagged": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Cross-document boilerplate detection (q66)
# ---------------------------------------------------------------------------

_GRAM_HASH_CACHE: dict[str, tuple[int, int]] = {}
_GRAM_CACHE_MAX = 1_000_000  # bound the per-worker vocab memo (web-scale
#                              vocabularies are unbounded; a clear at the
#                              cap keeps the amortization without the leak)


def _token_hashes(words: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """TWO independent uint64s per token (one 128-bit blake2b digest
    split in half), memoized per worker process. Independence matters:
    deriving the second chain from the first 64 bits (e.g. mix64 of the
    same digest XOR a salt) would cap the compound gram key's collision
    bound at the 64-bit token-hash birthday bound instead of 2⁻¹²⁸."""
    import hashlib

    t1 = np.empty(len(words), np.uint64)
    t2 = np.empty(len(words), np.uint64)
    cache = _GRAM_HASH_CACHE
    if len(cache) > _GRAM_CACHE_MAX:
        cache.clear()
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            d = hashlib.blake2b(w.encode(), digest_size=16).digest()
            h = (int.from_bytes(d[:8], "little"),
                 int.from_bytes(d[8:], "little"))
            cache[w] = h
        t1[i] = h[0]
        t2[i] = h[1]
    return t1, t2


def _doc_gram_hashes(text: str | None, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct order-sensitive n-gram keys of one doc as TWO
    independent rolling mix64 chains over the token-hash array
    (position-sensitive — 'a b c' and 'c b a' land on different keys).
    The compound 128-bit key keeps df counting collision-free to
    2⁻¹²⁸ at any corpus size — a single 64-bit key would silently merge
    distinct grams' doc counts at ~10¹² grams (birthday bound), where
    the exact-string oracle would not."""
    from .pairs import mix64

    toks = _TOKEN_RX.findall((text or "").lower())
    if len(toks) < n:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    th1, th2 = _token_hashes(toks)
    m = len(toks) - n + 1
    h1 = mix64(th1[:m])
    h2 = mix64(th2[:m])
    for k in range(1, n):
        h1 = mix64(h1 ^ th1[k:k + m])
        h2 = mix64(h2 ^ th2[k:k + m])
    g1, g2 = h1.view(np.int64), h2.view(np.int64)
    order = np.lexsort((g2, g1))
    g1, g2 = g1[order], g2[order]
    keep = np.ones(len(g1), bool)
    keep[1:] = (g1[1:] != g1[:-1]) | (g2[1:] != g2[:-1])
    return g1[keep], g2[keep]


def _batch_gram_frame(texts, n: int) -> tuple[pd.DataFrame, np.ndarray]:
    """All docs' distinct gram keys as one frame + per-doc lengths."""
    per1, per2, lens = [], [], np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        g1, g2 = _doc_gram_hashes(t, n)
        per1.append(g1)
        per2.append(g2)
        lens[i] = len(g1)
    a1 = np.concatenate(per1) if per1 else np.empty(0, np.int64)
    a2 = np.concatenate(per2) if per2 else np.empty(0, np.int64)
    return pd.DataFrame({"g1": a1, "g2": a2}), lens


def q_boilerplate_ngrams(sf_dir: str, n: int = 3, df_min: int = 4,
                         flag_min: int = 5) -> pd.DataFrame:
    """Cross-document boilerplate detection (the RefinedWeb/CCNet
    "drop content shared by many documents" primitive, df-based): a
    sliding word n-gram is *frequent* when it occurs in ≥ ``df_min``
    DISTINCT docs; each doc reports how many distinct frequent grams it
    contains plus a ``flagged`` bit. Two passes over the corpus, ONE
    exchange: pass 1 turns each block into per-gram partial
    distinct-doc counts (compound 128-bit gram keys through the
    raw-task ``hash_shuffle`` — same economics as the set ops, no
    Dataset sort all-to-all, collision-free where a 64-bit key merges
    distinct grams at web scale), the surviving frequent-gram key set
    (bounded above by total_grams/df_min) is broadcast once via
    ``ray.put``, and pass 2 does ONE vectorized int64-pair merge per
    batch plus a cumsum segment count — no per-doc isin re-sorts, no
    driver row loop. If a pathological corpus overflows the broadcast
    bound, the same semi-join shape as q48 (hash-partition
    (gram, doc_id) on gram) is the drop-in replacement."""
    import ray

    from .pairs import hash_shuffle, mix64

    P = 32

    def split(block: pa.Table) -> pa.Table:
        gf, _ = _batch_gram_frame(block.column("text").to_pylist(), n)
        per = gf.groupby(["g1", "g2"], sort=False).size().reset_index(name="nd")
        k1 = per["g1"].to_numpy()
        return pa.table({
            "g1": pa.array(k1, pa.int64()),
            "g2": pa.array(per["g2"].to_numpy(), pa.int64()),
            "nd": pa.array(per["nd"].to_numpy()),
            "bucket": pa.array(
                (mix64(k1.view(np.uint64)) % np.uint64(P)).astype(np.int64)),
        })

    def merge(*tabs) -> pd.DataFrame:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return pd.DataFrame({"g1": pd.Series(dtype="int64"),
                                 "g2": pd.Series(dtype="int64")})
        g = pa.concat_tables(live).to_pandas()
        df = g.groupby(["g1", "g2"], sort=False, as_index=False)["nd"].sum()
        return df.loc[df["nd"] >= df_min, ["g1", "g2"]]

    ds = _docs(sf_dir, ["doc_id", "text"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    frequent = pd.concat(parts, ignore_index=True)
    fref = ray.put(frequent)

    def count(batch: pa.Table) -> pa.Table:
        freq = ray.get(fref)
        ids = batch.column("doc_id").to_pylist()
        gf, lens = _batch_gram_frame(batch.column("text").to_pylist(), n)
        hit = np.zeros(len(gf), np.int64)
        if len(gf) and len(freq):
            m = gf.reset_index().merge(freq, on=["g1", "g2"], how="inner")
            hit[m["index"].to_numpy()] = 1  # freq pairs are unique → no dup rows
        cs = np.concatenate([[0], np.cumsum(hit)])
        ends = np.cumsum(lens)
        nf = cs[ends] - cs[ends - lens]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_frequent": pa.array(nf),
                         "flagged": pa.array(nf >= flag_min)})

    out = _wc(ds.map_batches(count, batch_format="pyarrow")
              .to_pandas(),
              {"doc_id": "int64", "n_frequent": "int64",
               "flagged": "bool"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_source_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Domain-level quality gating (the C4/RefinedWeb "drop bad hosts
    wholesale" step): per-source good-doc fraction from q15's
    integer-exact is_good rule, then every doc of a source with
    ``2·n_good ≥ n_docs`` (good fraction ≥ ½, no float compare) keeps.
    Scale shape: one streaming pass computes (source, n, n_good)
    per-batch partials (the combiner — rows crossing the driver are
    n_sources × n_batches, never docs), the source→keep map broadcasts
    via ``ray.put``, and the second pass reads only (doc_id, source)."""
    import ray
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        srcs, ns, ngs = [], [], []
        acc: dict[str, list[int]] = {}
        for s, t in zip(batch.column("source").to_pylist(),
                        batch.column("text").to_pylist()):
            if s is None:
                # the oracle's JOIN USING (source) drops NULL-source
                # rows (NULL ≠ NULL); mirror that here and in tag()
                continue
            cell = acc.setdefault(s, [0, 0])
            cell[0] += 1
            st = quality_stats(t)
            if st is not None and st[2]:
                cell[1] += 1
        for s, (cn, cg) in acc.items():
            srcs.append(s)
            ns.append(cn)
            ngs.append(cg)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "n_good": pa.array(ngs, pa.int64())})

    stats = _wc((_docs(sf_dir, ["source", "text"])
                 .map_batches(partial, batch_format="pyarrow")
                 .to_pandas()),
                {"source": "object", "n": "int64",
                 "n_good": "int64"})
    # code-keyed fold (pandas string groupby merges NUL-prefix pairs);
    # the keep map is a Python dict, which hashes full strings exactly
    from .pairs import factorize_strings

    codes, uniq = factorize_strings(stats["source"])
    agg = (stats.assign(_c=codes)
           .groupby("_c", sort=False)[["n", "n_good"]].sum())
    keep = {uniq[int(c)]: bool(2 * row.n_good >= row.n)
            for c, row in agg.iterrows()}
    kref = ray.put(keep)

    def tag(batch: pa.Table) -> pa.Table:
        km = ray.get(kref)
        # NULL-source rows fall out entirely (oracle JOIN semantics)
        batch = batch.filter(pc.is_valid(batch.column("source")))
        srcs = batch.column("source").to_pylist()
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "source": batch.column("source"),
            "keep": pa.array([km[s] for s in srcs], pa.bool_()),
        })

    out = _wc((_docs(sf_dir, ["doc_id", "source"])
               .map_batches(tag, batch_format="pyarrow")
               .to_pandas()),
              {"doc_id": "int64", "source": "object",
               "keep": "bool"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_consistent_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global deterministic k-sample by minimum content hash (the
    distributed reservoir-sample replacement: bottom-k of
    ``md5(doc_id || ':' || text)`` — the SAME sample regardless of
    partitioning, batch size or cluster shape, and partials merge by
    just re-taking the bottom k). Each batch emits its local bottom-k
    (k·n_batches tiny rows cross the wire, never the corpus); ties
    break on doc_id."""
    import hashlib

    _EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                       "h": pa.array([], pa.string())})

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        if not ids:
            return _EMPTY
        hs = np.array([hashlib.md5(
            f"{d}:{t or ''}".encode()).hexdigest()
            for d, t in zip(ids, batch.column("text").to_pylist())])
        ids = np.asarray(ids, np.int64)
        order = np.lexsort((ids, hs))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "h": pa.array(hs[order])})

    parts = _wc((_docs(sf_dir, ["doc_id", "text"])
                 .map_batches(bottomk, batch_format="pyarrow")
                 .to_pandas()), {"doc_id": "int64", "h": "object"})
    top = parts.sort_values(["h", "doc_id"]).head(k)
    return top.sort_values("doc_id").reset_index(drop=True)


def q_mix_allocation(sf_dir: str, budget: int = 100_000) -> pd.DataFrame:
    """Pretraining data-mixing plan (the "temperature-weighted source
    mixture" step): per-source token totals → sqrt-temperature weights
    (α = 0.5 upweights small sources like multilingual mixing recipes
    do) → integer token allocations under ``budget`` by
    largest-remainder rounding (deterministic, tie → source asc).
    Scale shape: ONE streaming pass computes per-batch (source,
    n_tokens) partials with the vectorized Arrow token-count kernel —
    rows crossing the driver are n_sources × n_batches — and the
    allocation arithmetic runs on the n_sources-sized table."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(
            pc.cast(pc.count_substring_regex(batch.column("text"), r"\w+"),
                    pa.int64()), 0)
        from .pairs import factorize_strings

        # code-keyed (NUL-safe) per-batch fold; NaN code = NULL source
        codes, uniq = factorize_strings(batch.column("source").to_pandas(),
                                        use_na_sentinel=False)
        df = pd.DataFrame({"c": codes, "n": n.to_pandas()})
        g = df.groupby("c", sort=False, as_index=False)["n"].sum()
        src = pd.Series(uniq.to_numpy()[g["c"].to_numpy()], dtype=object)
        # from_pandas maps the NaN that a NULL key rides on back to an
        # arrow null (pa.array would raise / mis-type)
        return pa.table({"source": pa.Array.from_pandas(src,
                                                        type=pa.string()),
                         "n_tokens": pa.array(g["n"].to_numpy(), pa.int64())})

    stats = (_docs(sf_dir, ["source", "text"])
             .map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    if stats.empty:
        return pd.DataFrame({"source": pd.Series(dtype="object"),
                             "n_tokens": pd.Series(dtype="int64"),
                             "alloc": pd.Series(dtype="int64")})
    from .pairs import factorize_strings

    codes, uniq = factorize_strings(stats["source"], use_na_sentinel=False)
    agg = (stats.assign(_c=codes)
           .groupby("_c", as_index=False)["n_tokens"].sum())
    agg["source"] = pd.Series(uniq.to_numpy()[agg["_c"].to_numpy()],
                              dtype=object)
    # restore None for the NULL key; single-column object sort is
    # comparison-exact (the tie-break below depends on source order)
    agg["source"] = agg["source"].where(agg["source"].notna(), None)
    agg = (agg.sort_values("source", kind="mergesort", na_position="last")
           .reset_index(drop=True))
    wt = np.sqrt(agg["n_tokens"].to_numpy().astype(np.float64))
    if wt.sum() == 0:
        # an all-zero-token corpus has no meaningful mixture; 0/0 would
        # otherwise be NaN → INT64_MIN garbage (oracle has the same
        # zero-sum CASE guard)
        alloc = np.zeros(len(agg), np.int64)
    else:
        quota = budget * wt / wt.sum()
        base = np.floor(quota).astype(np.int64)
        rem = quota - base
        extra = budget - int(base.sum())
        # largest remainder, ties by source ascending (agg is
        # source-sorted, so stable argsort on -rem realizes the
        # tie-break)
        order = np.argsort(-rem, kind="stable")
        alloc = base.copy()
        alloc[order[:extra]] += 1
    return pd.DataFrame({"source": agg["source"],
                         "n_tokens": agg["n_tokens"].astype("int64"),
                         "alloc": alloc}).reset_index(drop=True)


def q_inverted_index(sf_dir: str, top: int = 100) -> pd.DataFrame:
    """Inverted-index build (the search/retrieval primitive): posting
    lists for the ``top`` keywords by document frequency. Exploded to
    (word, df, doc_id) rows so the oracle can hash-compare it.
    Two streaming passes, both combiner-shaped:

    1. per-batch distinct-per-doc keyword partials (q13's keyword rule:
       ASCII ``\\w``, lowered, len>2, non-stopword) → groupby-sum →
       the (word, df) table; top-``top`` by (df DESC, word ASC) is the
       broadcast probe set — the full vocabulary never leaves the
       driver-side agg;
    2. per-batch (word, doc_id) pair emission filtered by the broadcast
       set — the shuffle-free postings collection; rows crossing the
       wire are bounded by Σ df over the probe words, not the corpus.
    At web scale step 2's collection becomes a partitioned parquet
    write keyed by word range instead of a driver frame — the pass
    itself is unchanged."""
    import ray
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counter.update({w for w in _TOKEN_RX.findall((t or "").lower())
                            if len(w) > 2 and w not in STOP_WORDS})
        if not counter:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, ns = zip(*counter.items())
        return pa.table({"word": pa.array(list(words)),
                         "n": pa.array(list(ns), pa.int64())})

    df_tab = (ds.map_batches(df_partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("n", alias_name="df"))
              .to_pandas())
    out_empty = pd.DataFrame({"word": pd.Series(dtype="object"),
                              "df": pd.Series(dtype="int64"),
                              "doc_id": pd.Series(dtype="int64")})
    if df_tab.empty:
        return out_empty
    df_tab = df_tab.sort_values(["df", "word"],
                                ascending=[False, True]).head(top)
    probe = {w: int(d) for w, d in zip(df_tab["word"], df_tab["df"])}
    pref = ray.put(probe)

    def postings(batch: pa.Table) -> pa.Table:
        pm = ray.get(pref)
        out_w, out_d, out_f = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            seen = {w for w in _TOKEN_RX.findall((t or "").lower())
                    if w in pm}
            for w in seen:
                out_w.append(w)
                out_f.append(pm[w])
                out_d.append(d)
        return pa.table({"word": pa.array(out_w, pa.string()),
                         "df": pa.array(out_f, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64())})

    rows = ds.map_batches(postings, batch_format="pyarrow").to_pandas()
    if rows.empty:
        return out_empty
    return rows.sort_values(["word", "doc_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# PII detection / redaction (q77)
# ---------------------------------------------------------------------------

# RE2-safe patterns (no backrefs/lookaround) so the pyarrow.compute
# kernels (RE2) and the DuckDB oracle (also RE2) match byte-for-byte.
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RX = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RX = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def q_pii_redact(sf_dir: str) -> pd.DataFrame:
    """PII detection + redaction — the anonymization pass every public
    training corpus runs (C4/Dolma-style): count and mask emails, IPv4
    addresses and phone-like digit runs. Fully vectorized RE2 kernels
    (`pc.count_substring_regex` / `pc.replace_substring_regex`), zero
    Python rows, no shuffle — the embarrassingly-parallel shape that
    streams at any scale.

    Counts are taken on the ORIGINAL text per category; redaction is
    sequential (emails → IPs → phones) so earlier masks can't create or
    destroy later matches ambiguously — the oracle SQL applies the
    exact same order with the same regexes (both engines are RE2)."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def redact(batch: pa.Table) -> pa.Table:
        s = batch.column("text")
        n_email = pc.cast(pc.count_substring_regex(s, PII_EMAIL_RX), pa.int64())
        n_ip = pc.cast(pc.count_substring_regex(s, PII_IPV4_RX), pa.int64())
        n_phone = pc.cast(pc.count_substring_regex(s, PII_PHONE_RX), pa.int64())
        red = pc.replace_substring_regex(s, PII_EMAIL_RX, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_IPV4_RX, "<IP>")
        red = pc.replace_substring_regex(red, PII_PHONE_RX, "<PHONE>")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_emails": n_email, "n_ips": n_ip,
                         "n_phones": n_phone, "redacted": red})

    out = ds.map_batches(redact, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if out.empty:  # 0-row reads drop the mapped schema
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_emails": pd.Series(dtype="int64"),
                             "n_ips": pd.Series(dtype="int64"),
                             "n_phones": pd.Series(dtype="int64"),
                             "redacted": pd.Series(dtype="object")})
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Unigram LM perplexity scoring (q78)
# ---------------------------------------------------------------------------


def q_unigram_nll(sf_dir: str) -> pd.DataFrame:
    """Per-doc unigram language-model negative log-likelihood — the
    CCNet/KenLM-style corpus-quality signal (docs whose tokens are
    improbable under the corpus's own unigram distribution score high).

    Two streaming passes, no token-scale shuffle:

    1. per-batch token-count partials → groupby-sum → a vocab-sized
       (word, n) table; the log-prob map is broadcast once via
       ``ray.put`` (vocab-bounded, not corpus-bounded — swap for a
       broadcast semi-join on word if the vocab outgrows worker heap);
    2. per-doc ``avg_nll = Σ tf_w·(ln total − ln n_w) / n_tokens`` from
       a per-doc Counter; only one row per doc leaves the stage.

    The LM is self-trained (pass 1 over the same corpus) so every token
    is in-vocab — no OOV smoothing branch to diverge from the oracle.
    Zero-token (empty/NULL text) docs drop, matching the oracle's inner
    join through the unnest."""
    import math

    import ray
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counter.update(_TOKEN_RX.findall((t or "").lower()))
        if not counter:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, ns = zip(*counter.items())
        return pa.table({"word": pa.array(list(words)),
                         "n": pa.array(list(ns), pa.int64())})

    vocab = (
        _docs(sf_dir, ["text"]).map_batches(count_partial, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    if vocab.empty:  # empty corpus (or 0-row read dropping the schema)
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_tokens": pd.Series(dtype="int64"),
                             "avg_nll": pd.Series(dtype="float64")})
    total = float(vocab["n"].sum())
    ln_total = math.log(total) if total else 0.0
    nll = {w: ln_total - math.log(n) for w, n in zip(vocab["word"], vocab["n"])}
    nll_ref = ray.put(nll)

    def score(batch: pa.Table) -> pa.Table:
        nll_ = ray.get(nll_ref)
        out_d, out_n, out_s = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            tf = Counter(_TOKEN_RX.findall((text or "").lower()))
            n_tok = sum(tf.values())
            if not n_tok:
                continue
            out_d.append(doc_id)
            out_n.append(n_tok)
            out_s.append(round(sum(c * nll_[w] for w, c in tf.items()) / n_tok, 6))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "n_tokens": pa.array(out_n, pa.int64()),
                         "avg_nll": pa.array(out_s, pa.float64())})

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bigram top-k (q79)
# ---------------------------------------------------------------------------


def q_bigram_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global bigram top-k — the n-gram statistics pass behind phrase
    mining / boilerplate spotting. Same shape as q13: per-batch bigram
    Counter partials → (bigram, n) stream (one row per distinct bigram
    per batch, never one per token pair) → groupby-sum → top-k with
    (n desc, bigram asc) tie-break, matching the oracle's ORDER BY."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for t in batch.column("text").to_pylist():
            ws = _TOKEN_RX.findall((t or "").lower())
            counter.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        if not counter:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        bgs, ns = zip(*counter.items())
        return pa.table({"bigram": pa.array(list(bgs)),
                         "n": pa.array(list(ns), pa.int64())})

    agg = (
        _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow")
        .groupby("bigram").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    if agg.empty:  # empty corpus / schema-less 0-row read
        return pd.DataFrame({"bigram": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    agg = agg.sort_values(["n", "bigram"], ascending=[False, True]).head(k)
    return agg.reset_index(drop=True)


def q_dup_spans(sf_dir: str, n: int = 7) -> pd.DataFrame:
    """Duplicated exact token spans across documents — the span-level
    exact-substring dedup signal (the "train-data dedup by duplicated
    n-gram spans" op, cf. Lee et al. 2022 deduplication): every
    ``n``-token shingle that occurs in ≥ 2 distinct docs, with its
    distinct-doc count. Distributed shape: split tasks tokenize their
    blocks (ASCII ``\\w``, the RE2-oracle-exact rule) and emit each
    doc's DISTINCT shingles bucketed by a crc32 of the shingle bytes —
    a doc is one row, so per-doc dedup already makes the exchange rows
    (shingle, 1-per-doc) and merge-side ``value_counts`` IS the
    distinct-doc count. At 100 TB the exchange would carry (hash64,
    doc_id) instead and resolve surviving hashes' strings with one
    pushdown re-read; the string shingles here keep the operator
    SQL-checkable end-to-end."""
    import zlib

    from .pairs import hash_shuffle

    P = 32
    ds = _docs(sf_dir, ["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        empty = pa.table({"shingle": pa.array([], pa.string()),
                          "bucket": pa.array([], pa.int64())})
        if t.num_rows == 0 or "text" not in t.schema.names:
            return empty
        out: list[str] = []
        for txt in t.column("text").to_pylist():
            ws = _TOKEN_RX.findall((txt or "").lower())
            if len(ws) < n:
                continue
            seen = {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
            out.extend(seen)
        if not out:
            return empty
        b = np.fromiter((zlib.crc32(s.encode()) for s in out),
                        dtype=np.int64, count=len(out))
        return pa.table({"shingle": pa.array(out, pa.string()),
                         "bucket": pa.array(b % P, pa.int64())})

    def merge(*tabs) -> pd.DataFrame:
        live = [t.drop_columns(["bucket"]) for t in tabs if t.num_rows]
        if not live:
            return pd.DataFrame({"shingle": pd.Series(dtype="object"),
                                 "n_docs": pd.Series(dtype="int64")})
        vc = (pa.concat_tables(live).to_pandas()["shingle"]
              .value_counts())
        vc = vc[vc >= 2]
        return pd.DataFrame({"shingle": vc.index.to_numpy(),
                             "n_docs": vc.to_numpy().astype(np.int64)})

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"shingle": pd.Series(dtype="object"),
                             "n_docs": pd.Series(dtype="int64")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("shingle").reset_index(drop=True))


def q_readability(sf_dir: str) -> pd.DataFrame:
    """Flesch-reading-ease-style readability scoring — the classic
    deterministic quality heuristic (words/sentence + syllables/word,
    with regex vowel-groups standing in for syllables, the standard
    dictionary-free approximation). Pure per-row arithmetic: three
    vectorized RE2 counts per batch (no Python row loop) and zero
    shuffle; both sides round to 4dp. Sentence count is clamped to ≥1
    (a fragment is one sentence); zero-word docs score NULL."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_words": pa.array([], pa.int64()),
                          "n_sentences": pa.array([], pa.int64()),
                          "n_syllables": pa.array([], pa.int64()),
                          "fre": pa.array([], pa.float64())})
        if t.num_rows == 0 or "text" not in t.schema.names:
            return empty
        txt = t.column("text")
        w = pc.cast(pc.count_substring_regex(txt, r"\w+"), pa.float64())
        s = pc.max_element_wise(
            pc.cast(pc.count_substring_regex(txt, r"[.!?]+"), pa.float64()),
            pa.scalar(1.0))
        y = pc.cast(pc.count_substring_regex(
            pc.utf8_lower(txt), r"[aeiouy]+"), pa.float64())
        fre = pc.subtract(
            pc.subtract(pa.scalar(206.835),
                        pc.multiply(pa.scalar(1.015), pc.divide(w, s))),
            pc.multiply(pa.scalar(84.6), pc.divide(y, w)))
        # SQL round() is half AWAY from zero; Arrow defaults to
        # banker's (a doc scoring exactly 33.48125 flips at 4dp)
        fre = pc.if_else(pc.greater(w, 0.0),
                         pc.round(fre, ndigits=4,
                                  round_mode="half_towards_infinity"),
                         pa.scalar(None, pa.float64()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_words": pc.cast(w, pa.int64()),
                         "n_sentences": pc.cast(s, pa.int64()),
                         "n_syllables": pc.cast(y, pa.int64()),
                         "fre": fre})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_words": pd.Series(dtype="int64"),
                             "n_sentences": pd.Series(dtype="int64"),
                             "n_syllables": pd.Series(dtype="int64"),
                             "fre": pd.Series(dtype="float64")})
    return out.sort_values("doc_id").reset_index(drop=True)


# fixed ad-hoc retrieval query for the BM25 op (mid-df corpus terms);
# the term list is part of the op's contract and mirrored in the oracle
BM25_TERMS = ("hash", "join", "vector", "scan", "filter")
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_scores(sf_dir: str) -> pd.DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    (the retrieval op a training-data pipeline uses for quality-biased
    sampling and hard-negative mining). Two streaming passes, no
    token-scale shuffle — the same shape as q55's TF-IDF:

    1. per-batch stats partials: Σ doc length, #docs with ≥1 token and
       per-query-term document frequencies — a fixed-width row per
       batch, summed driver-side (the exchange never sees tokens);
    2. per-batch scoring: tf over the 5 query terms + the closed-form
       BM25 sum; only matching docs emit a row.

    avgdl is Σdl/n_docs_with_tokens computed as ONE exact int sum and
    one division — the identical IEEE op order as the oracle's
    sum()::DOUBLE / count() — and idf uses the +1 smoothing form
    ln(1 + (N−df+0.5)/(df+0.5)), so both sides agree to the 6dp
    round."""
    import math

    import pyarrow.parquet as pq

    n_docs = float(pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows)
    terms = list(BM25_TERMS)

    def stats_partial(batch: pa.Table) -> pa.Table:
        sum_dl = 0
        n_tok_docs = 0
        df = Counter()
        for t in batch.column("text").to_pylist():
            toks = _TOKEN_RX.findall((t or "").lower())
            if not toks:
                continue
            sum_dl += len(toks)
            n_tok_docs += 1
            seen = set(toks)
            for q in terms:
                if q in seen:
                    df[q] += 1
        return pa.table({"sum_dl": pa.array([sum_dl], pa.int64()),
                         "n_tok_docs": pa.array([n_tok_docs], pa.int64()),
                         **{f"df_{i}": pa.array([df[q]], pa.int64())
                            for i, q in enumerate(terms)}})

    stats = (_docs(sf_dir, ["text"])
             .map_batches(stats_partial, batch_format="pyarrow")
             .to_pandas().sum())
    if stats.empty or stats["n_tok_docs"] == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    avgdl = float(stats["sum_dl"]) / float(stats["n_tok_docs"])
    idf = {q: math.log(1.0 + (n_docs - float(stats[f"df_{i}"]) + 0.5)
                       / (float(stats[f"df_{i}"]) + 0.5))
           for i, q in enumerate(terms)}

    def score(batch: pa.Table) -> pa.Table:
        out_d, out_s = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = _TOKEN_RX.findall((text or "").lower())
            if not toks:
                continue
            tf = Counter(toks)
            s = 0.0
            hit = False
            dl_norm = BM25_K1 * (1.0 - BM25_B + BM25_B * len(toks) / avgdl)
            for q in terms:
                f = tf.get(q, 0)
                if f:
                    hit = True
                    s += idf[q] * f * (BM25_K1 + 1.0) / (f + dl_norm)
            if hit:
                out_d.append(doc_id)
                out_s.append(s)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(score, batch_format="pyarrow").to_pandas())
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    from .pairs import round_away

    out["score"] = round_away(out["score"].to_numpy(), 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_bpe_train(sf_dir: str, n_merges: int = 12) -> pd.DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016 —
    learn the merge table a real LLM tokenizer ships with). The classic
    scalable decomposition: pair statistics depend only on the WORD
    FREQUENCY table, so the corpus-sized work is ONE streaming
    word-count pass (per-batch Counter partials → groupby-sum; the
    exchange carries distinct words × batches, never tokens) and the
    merge loop then runs on the vocab-bounded (word, freq) table
    driver-side — same vocab-bounded-driver-state contract as q55's
    idf broadcast; at larger vocabularies the loop distributes by
    sharding words (pair counts are an additive groupby), the merge
    ARGMAX staying a tiny all-reduce per round.

    Returns the ranked merge table (rank, left, right, freq) with the
    reference tie-break: highest pair frequency, then lexicographically
    smallest (left, right). Words carry an explicit ``</w>``
    end-of-word symbol, so merges distinguish suffix from infix
    pairs."""
    from ray.data.aggregate import Sum

    def wc_partial(batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for t in batch.column("text").to_pylist():
            counter.update(_TOKEN_RX.findall((t or "").lower()))
        if not counter:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, ns = zip(*counter.items())
        return pa.table({"word": pa.array(list(words)),
                         "n": pa.array(list(ns), pa.int64())})

    wf = (_docs(sf_dir, ["text"])
          .map_batches(wc_partial, batch_format="pyarrow")
          .groupby("word").aggregate(Sum("n", alias_name="freq"))
          .to_pandas())
    out_cols = {"rank": pd.Series(dtype="int64"),
                "left": pd.Series(dtype="object"),
                "right": pd.Series(dtype="object"),
                "freq": pd.Series(dtype="int64")}
    if wf.empty:
        return pd.DataFrame(out_cols)

    # word → (symbol tuple, freq); the merge loop mutates symbols only
    vocab = {tuple(w) + ("</w>",): int(f)
             for w, f in zip(wf["word"], wf["freq"])}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic argmax: max freq, then lexicographic pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), f = best
        merges.append((rank, la, rb, f))
        merged = la + rb
        nxt = {}
        for syms, fq in vocab.items():
            if la not in syms:
                nxt[syms] = nxt.get(syms, 0) + fq
                continue
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == la
                        and syms[i + 1] == rb):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + fq
        vocab = nxt

    return pd.DataFrame({
        "rank": np.array([m[0] for m in merges], np.int64),
        "left": [m[1] for m in merges],
        "right": [m[2] for m in merges],
        "freq": np.array([m[3] for m in merges], np.int64)})


def q_weighted_sample(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Weighted sample WITHOUT replacement, P(doc) ∝ n_chars —
    Efraimidis–Spirakis A-ES as a distributed bottom-k: each doc gets
    the deterministic priority ln(u)/w (u = mix64(doc_id)-uniform in
    (0,1), w = n_chars), and the top-k by priority IS the weighted
    sample. Like q70's consistent sample, partials merge by re-taking
    the top k, so each batch ships only its local top-k (k × batches
    rows cross the wire, never the corpus) and the result is identical
    under any partitioning — pinned by the split-invariance +
    brute-force-equality pytest (no SQL twin: the oracle can't
    reproduce the hash-uniform draws). Non-positive/NULL weights are
    never sampled (dropped, matching u^(1/w) → 0)."""
    from .pairs import mix64

    _EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                       "n_chars": pa.array([], pa.int64()),
                       "lp": pa.array([], pa.float64())})

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.schema.names:
            return _EMPTY
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = np.isfinite(w) & (w > 0)
        ids, w = ids[ok], w[ok]
        if not len(ids):
            return _EMPTY
        # u strictly in (0,1): top 53 bits + mid-riser over 2^53 stays
        # exactly representable — a raw 64-bit value within 2^11 of
        # 2^64 would ROUND to 2^64 under float64 and give u = 1.0,
        # lp = 0, an unconditional winner A-ES must exclude
        u = ((mix64(ids.astype(np.int64).view(np.uint64))
              >> np.uint64(11)).astype(np.float64) + 0.5) / 2.0 ** 53
        lp = np.log(u) / w
        if len(lp) > k:
            # lexsort, not argpartition: the global merge breaks lp
            # ties by doc_id asc, and the local cut must agree or the
            # sample loses its partitioning-invariance on exact ties
            sel = np.lexsort((ids, -lp))[:k]
            ids, w, lp = ids[sel], w[sel], lp[sel]
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n_chars": pa.array(w.astype(np.int64)),
                         "lp": pa.array(lp)})

    parts = (_docs(sf_dir, ["doc_id", "n_chars"])
             .map_batches(topk, batch_format="pyarrow")
             .to_pandas())
    if parts.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_chars": pd.Series(dtype="int64")})
    top = parts.sort_values(["lp", "doc_id"],
                            ascending=[False, True]).head(k)
    return (top[["doc_id", "n_chars"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_source_entropy(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy (bits) of each source's token distribution —
    the corpus-diversity score a mixing pipeline gates on. Exact
    per-(source, term) counts need one exchange: per-batch Counter
    partials keyed (source, term) → raw-task hash shuffle on the PAIR
    (so a merge task owns every partial of a pair and can finalize its
    count) → per-source Σc·log₂c / Σc partials per bucket → driver
    folds sources × buckets tiny rows. Entropy is computed as
    log₂(n) − Σc·log₂(c)/n IN THAT OP ORDER on both sides (the oracle
    SQL mirrors it; the textbook −Σp·log₂p form differs in the last
    ulps). NULL text tokenizes to nothing on both sides (SQL unnest of
    a NULL array emits no rows); an all-NULL source therefore has no
    row. NULL source is its own SQL group — IS NOT DISTINCT join in
    the oracle, sentinel bucket here."""
    from .pairs import factorize_strings, hash_shuffle, round_away, str_u64
    from .relational import _NULL_KEY

    P = 64
    ds = _docs(sf_dir, ["source", "text"])
    _E = pa.table({"source": pa.array([], pa.string()),
                   "term": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        counts: Counter = Counter()
        src_col = t.column("source").to_pylist()
        for src, txt in zip(src_col, t.column("text").to_pylist()):
            if txt is None:
                continue
            key = _NULL_KEY if src is None else src
            for w in _TOKEN_RX.findall(txt.lower()):
                counts[(key, w)] += 1
        if not counts:
            return _E
        srcs, terms, cs = [], [], []
        for (s, w), c in counts.items():
            srcs.append(s)
            terms.append(w)
            cs.append(c)
        # shared stable string hash (pairs.str_u64) — bucketing only,
        # any deterministic partition of (source, term) pairs works
        b = [str_u64(s + "\x1f" + w) % P for s, w in zip(srcs, terms)]
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "term": pa.array(terms, pa.string()),
                         "c": pa.array(cs, pa.int64()),
                         "bucket": pa.array(b, pa.int64())})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "clogc": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        # group on NUL-safe int codes — pandas' string groupby hashes
        # NUL-terminated C strings, which would merge the \\x00-prefixed
        # NULL sentinel with a real '' source (factorize_strings doc)
        cs, us = factorize_strings(df["source"])
        ct = factorize_strings(df["term"])[0]
        df = (df.assign(cs=cs, ct=ct)
              .groupby(["cs", "ct"], as_index=False)["c"].sum())
        c = df["c"].to_numpy().astype(np.float64)
        df["clogc"] = c * np.log2(c)
        g = df.groupby("cs", as_index=False).agg(
            clogc=("clogc", "sum"), n=("c", "sum"))
        g["source"] = us.to_numpy()[g["cs"].to_numpy()]
        return g[["source", "clogc", "n"]]

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                          "entropy": pd.Series(dtype="float64")})
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    cs, us = factorize_strings(df["source"])
    g = (df.assign(cs=cs)
         .groupby("cs", as_index=False).agg(clogc=("clogc", "sum"),
                                            n=("n", "sum")))
    n = g["n"].to_numpy().astype(np.float64)
    ent = round_away(np.log2(n) - g["clogc"].to_numpy() / n, 6)
    src = us.to_numpy()[g["cs"].to_numpy()]
    out = pd.DataFrame({
        "source": [None if s == _NULL_KEY else s for s in src],
        "entropy": ent})
    return out.sort_values("source", na_position="last").reset_index(drop=True)


def q_doc_sentences(sf_dir: str, sep: str = ". ") -> pd.DataFrame:
    """LATERAL-unnest twin: split every document into ordinal
    sentences (SQL ``unnest(string_split(text, sep))`` +
    ``generate_subscripts``) as a pure per-batch explode — repeat/
    arange like q54's chunker, zero shuffle. Split parity probed in
    DuckDB: fixed (non-regex) separator, '' yields ONE empty-string
    row, a trailing separator yields a trailing '' element, NULL text
    yields ZERO rows, and length() counts codepoints (= pandas
    str.len)."""
    import pyarrow as pa
    import numpy as np

    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "sentence": pa.array([], pa.string()),
                          "n_chars": pa.array([], pa.int64())})
        if t.num_rows == 0 or "text" not in t.schema.names:
            return empty
        df = t.to_pandas()
        ok = df["text"].notna()
        df = df[ok]
        if df.empty:
            return empty
        parts = df["text"].str.split(sep, regex=False)
        counts = parts.str.len().to_numpy(np.int64)
        # object dtype keeps a NULL doc_id as None through the
        # repeat (float64 NaN would corrupt big ids / fail the cast)
        ids = np.repeat(df["doc_id"].to_numpy(dtype=object), counts)
        # per-doc 1-based ordinals: global arange minus each doc's start
        ends = np.cumsum(counts)
        starts = ends - counts
        pos = np.arange(ends[-1], dtype=np.int64) - np.repeat(
            starts, counts) + 1
        flat = np.concatenate(parts.to_numpy()) if len(parts) else \
            np.array([], dtype=object)
        sent = pd.Series(flat, dtype=object)
        return pa.table({
            "doc_id": pa.Array.from_pandas(
                pd.Series(ids, dtype=object), type=pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "sentence": pa.Array.from_pandas(sent, type=pa.string()),
            "n_chars": pa.array(sent.str.len().to_numpy(np.int64),
                                pa.int64())})

    out = ds.map_batches(explode, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pos": pd.Series(dtype="int64"),
                             "sentence": pd.Series(dtype="object"),
                             "n_chars": pd.Series(dtype="int64")})
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def q_doc_long_words(sf_dir: str) -> pd.DataFrame:
    """``regexp_extract_all(text, '[a-z]{6,}')`` + UNNEST WITH
    ORDINALITY twin: every long-word match in every document as
    (doc_id, ord, num) rows — the all-matches explode q128's
    single-match extract doesn't cover. Pure per-batch explode
    (compiled-regex ``str.findall`` + repeat/arange like q153), zero
    shuffle. Parity probed in DuckDB: a no-match document yields ZERO
    rows (unnest of the empty list), NULL text yields zero rows;
    greedy non-overlapping runs of a fixed character class are
    identical in RE2 and Python re (no backrefs — RE2 has none)."""
    import numpy as np
    import pyarrow as pa

    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "ord": pa.array([], pa.int64()),
                          "num": pa.array([], pa.string())})
        if t.num_rows == 0 or "text" not in t.schema.names:
            return empty
        df = t.to_pandas()
        df = df[df["text"].notna()]
        if df.empty:
            return empty
        matches = df["text"].str.findall(r"[a-z]{6,}")
        counts = matches.str.len().to_numpy(np.int64)
        if counts.sum() == 0:
            return empty
        # object dtype keeps a NULL doc_id as None through the repeat
        ids = np.repeat(df["doc_id"].to_numpy(dtype=object), counts)
        ends = np.cumsum(counts)
        starts = ends - counts
        pos = np.arange(ends[-1], dtype=np.int64) - np.repeat(
            starts, counts) + 1
        flat = np.concatenate(
            [np.asarray(m, dtype=object) for m in matches
             if len(m)]) if counts.sum() else np.array([], object)
        return pa.table({
            "doc_id": pa.Array.from_pandas(
                pd.Series(ids, dtype=object), type=pa.int64()),
            "ord": pa.array(pos, pa.int64()),
            "num": pa.Array.from_pandas(
                pd.Series(flat, dtype=object), type=pa.string())})

    out = ds.map_batches(explode, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "ord": pd.Series(dtype="int64"),
                             "num": pd.Series(dtype="object")})
    return out.sort_values(["doc_id", "ord"]).reset_index(drop=True)


class _BPEEncoder:
    """Stateful BPE ENCODER — the actor-pool half of the tokenizer
    story (q100 trains the merge table; this class applies it). Ray
    Data calls ``__init__`` once per actor: the merge table becomes a
    rank dict and a per-actor word→length cache builds up across
    batches (Zipf reuse makes the cache hit rate ~1 after warmup), so
    per-batch work is a vectorized-ish loop over UNIQUE words only."""

    def __init__(self, merges: list):
        self.merges = [tuple(m) for m in merges]
        self.cache: dict = {}

    def _encode(self, word: str) -> int:
        n = self.cache.get(word)
        if n is not None:
            return n
        syms = list(word) + ["</w>"]
        # Sennrich encode: apply merges in learned rank order,
        # replacing every adjacent occurrence
        for la, rb in self.merges:
            if la not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == la
                        and syms[i + 1] == rb):
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        self.cache[word] = len(syms)
        return len(syms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        _E = pa.table({"doc_id": pa.array([], pa.int64()),
                       "n_words": pa.array([], pa.int64()),
                       "n_tokens": pa.array([], pa.int64())})
        if batch.num_rows == 0 or "doc_id" not in batch.schema.names:
            return _E
        ids, nw, nt = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            words = _TOKEN_RX.findall((t or "").lower())
            ids.append(d)
            nw.append(len(words))
            nt.append(sum(self._encode(w) for w in words))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_words": pa.array(nw, pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64())})


def q_bpe_encode(sf_dir: str, n_merges: int = 24) -> pd.DataFrame:
    """Tokenize the corpus with a TRAINED BPE merge table — the apply
    side of q100 and the shape of every real tokenization pass before
    pretraining: train once (vocab-bounded driver loop over the word
    frequency table), then stream the corpus through an ACTOR-POOL
    ``map_batches`` stage whose per-actor state (rank dict + word
    cache) is built once in ``__init__``, never per batch. Returns
    per-doc (n_words, n_tokens). No SQL twin (iterative merge
    semantics); the Sennrich hand-example pytest pins the encoding."""
    merges_df = q_bpe_train(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(_BPEEncoder, batch_format="pyarrow",
                        concurrency=2,
                        fn_constructor_kwargs={"merges": merges})
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_words": pd.Series(dtype="int64"),
                             "n_tokens": pd.Series(dtype="int64")})
    for c in ("doc_id", "n_words", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_lexical_diversity(sf_dir: str) -> pd.DataFrame:
    """Per-source lexical diversity — the corpus-linguistics screen
    next to q117's entropy and q175's Zipf slope: type/token ratio and
    hapax-legomena share of each source's vocabulary. The exchange is
    partitioned on the WORD hash (q181 discipline), so a given
    (source, word)'s global count lives in exactly one bucket; each
    bucket emits per-source (token-sum, type-count, hapax-count)
    partials and the driver folds a source-domain-sized frame. Source
    keys ride NUL-safe codes end-to-end (fuzz plants 'fz'/'fz\\x00x');
    NULL source IS a group; sources whose docs tokenize to nothing
    emit no row (the SQL unnest drops them)."""
    from collections import Counter

    from .pairs import factorize_strings, hash_shuffle, round_away, str_u64

    P = 32
    _NULL = "\x00NULLSRC"

    _E = pa.table({"src": pa.array([], pa.string()),
                   "word": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        counter: Counter = Counter()
        for src, txt in zip(t.column("source").to_pylist(),
                            t.column("text").to_pylist()):
            key = _NULL if src is None else "S" + src
            for w in _TOKEN_RX.findall((txt or "").lower()):
                counter[(key, w)] += 1
        if not counter:
            return _E
        srcs, words = zip(*counter.keys())
        b = np.array([str_u64(w) & (P - 1) for w in words], np.int64)
        return pa.table({"src": pa.array(list(srcs), pa.string()),
                         "word": pa.array(list(words), pa.string()),
                         "c": pa.array(list(counter.values()),
                                       pa.int64()),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"src": pd.Series(dtype="object"),
                "n_tokens": pd.Series(dtype="int64"),
                "n_types": pd.Series(dtype="int64"),
                "n_hapax": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        from .pairs import coded_keys

        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["src", "word"])
        g = restore(cj.groupby(["src", "word"], as_index=False)
                    ["c"].sum())
        scodes, suniq = factorize_strings(g["src"])
        c = g["c"].to_numpy(np.int64)
        tok = np.bincount(scodes, weights=c,
                          minlength=len(suniq)).astype(np.int64)
        typ = np.bincount(scodes, minlength=len(suniq))
        hap = np.bincount(scodes, weights=c == 1,
                          minlength=len(suniq)).astype(np.int64)
        return pd.DataFrame({"src": pd.Series(list(suniq),
                                              dtype=object),
                             "n_tokens": tok,
                             "n_types": typ.astype(np.int64),
                             "n_hapax": hap})

    tagged = [(r, ()) for r in _docs(
        sf_dir, ["source", "text"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                          "n_tokens": pd.Series(dtype="int64"),
                          "n_types": pd.Series(dtype="int64"),
                          "ttr": pd.Series(dtype="float64"),
                          "hapax_share": pd.Series(dtype="float64")})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(allp["src"])
    tok = np.bincount(codes, weights=allp["n_tokens"].to_numpy(
        np.float64), minlength=len(uniq)).astype(np.int64)
    typ = np.bincount(codes, weights=allp["n_types"].to_numpy(
        np.float64), minlength=len(uniq)).astype(np.int64)
    hap = np.bincount(codes, weights=allp["n_hapax"].to_numpy(
        np.float64), minlength=len(uniq)).astype(np.int64)
    src = [None if u == _NULL else u[1:] for u in uniq]
    from .pairs import round_away
    res = pd.DataFrame({
        "source": pd.Series(src, dtype=object),
        "n_tokens": tok, "n_types": typ,
        "ttr": round_away(typ / tok.astype(np.float64), 6),
        "hapax_share": round_away(hap / typ.astype(np.float64), 6)})
    hexkey = res["source"].map(
        lambda x: "zz" if x is None
        else str(x).encode("utf-8", "surrogatepass").hex())
    return (res.iloc[np.argsort(hexkey.to_numpy())]
            .reset_index(drop=True))


def q_source_cap_sample(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Capped per-group sampling — the over-representation guard in a
    data-mixing plan (q72 decides the quota; this op ENFORCES a hard
    per-source cap): keep at most ``k`` docs per source, selected by a
    deterministic cross-language hash order (md5 of the doc_id string
    — reproducible in SQL, unlike mix64), ties broken by doc_id. The
    per-batch combiner keeps each source's local top-k, the source-
    keyed exchange folds k × sources × batches rows (never the
    corpus), and each bucket emits its final top-k — the classic
    bounded-top-k-per-group plan. NULL source is a group; NULL doc_id
    is out of contract (md5(NULL) orders as NULL)."""
    from .pairs import factorize_strings, hash_shuffle

    import hashlib as _hl

    P = 16
    _NULL = "\x00NULLSRC"

    _E = pa.table({"src": pa.array([], pa.string()),
                   "doc_id": pa.array([], pa.int64()),
                   "h": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def _topk(src: np.ndarray, doc: np.ndarray,
              h: np.ndarray) -> np.ndarray:
        """Row indices of the per-source top-k by (h, doc)."""
        codes, _u = factorize_strings(pd.Series(src, dtype=object))
        order = np.lexsort((doc, h.astype("U32"), codes))
        c_s = codes[order]
        pos = np.arange(len(order))
        seg_start = np.concatenate(
            ([0], np.flatnonzero(c_s[1:] != c_s[:-1]) + 1))
        rank = pos - np.repeat(seg_start, np.diff(
            np.concatenate((seg_start, [len(order)]))))
        return order[rank < k]

    def split(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("doc_id")))
        if t2.num_rows == 0:
            return _E
        doc = t2.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        srcs = np.array(
            [_NULL if s is None else "S" + s
             for s in t2.column("source").to_pylist()], object)
        h = np.array([_hl.md5(str(int(d)).encode()).hexdigest()
                      for d in doc], object)
        keep = _topk(srcs, doc, h)
        hb = np.frombuffer(
            b"".join(str(s).encode("utf-8", "surrogatepass")[:8]
                     .ljust(8)[:8] for s in srcs[keep]), np.uint64)
        from .pairs import mix64
        return pa.table({
            "src": pa.array(list(srcs[keep]), pa.string()),
            "doc_id": pa.array(doc[keep]),
            "h": pa.array(list(h[keep]), pa.string()),
            "bucket": pa.array((mix64(hb) % np.uint64(P))
                               .astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"src": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
                "h": pd.Series(dtype="object")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        keep = _topk(df["src"].to_numpy(object),
                     df["doc_id"].to_numpy(np.int64),
                     df["h"].to_numpy(object))
        return df.iloc[np.sort(keep)].reset_index(drop=True)

    tagged = [(r, ()) for r in _docs(
        sf_dir, ["source", "doc_id"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                          "doc_id": pd.Series(dtype="int64")})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    src = [None if s == _NULL else s[1:] for s in allp["src"]]
    res = pd.DataFrame({"source": pd.Series(src, dtype=object),
                        "doc_id": allp["doc_id"].to_numpy(np.int64)})
    hexkey = np.array([("zz" if s is None else
                        s.encode("utf-8", "surrogatepass").hex())
                       for s in src], object)
    order = np.lexsort((res["doc_id"].to_numpy(np.int64), hexkey))
    return res.iloc[order].reset_index(drop=True)


def q_pmi_collocations(sf_dir: str, topk: int = 20,
                       min_sup: int = 5) -> pd.DataFrame:
    """PMI collocation mining — the corpus-linguistics twin of q207's
    basket lift: top-k word pairs by pointwise mutual information
    ln(sup·N / (s_a·s_b)) over document co-occurrence, support ≥
    ``min_sup``. A document is ONE ROW, so pair generation needs no
    exchange at all: each block emits its local (pair, n) / (word,
    n_docs) / basket-count combiners straight from a per-doc distinct-
    word pass; word supports + N fold driver-side (vocab-bounded, the
    q100/q55 contract) and broadcast; one pair-keyed exchange sums
    supports, applies the support floor, and keeps bucket-local top-k
    by (PMI DESC, pair) — the driver folds P·k rows. Tokens are
    ASCII \\w+ (byte order == codepoint order, so Python pair sorting
    matches SQL's binary collation); PMI is one ln of exact-int
    ratios in the oracle's own op order."""
    import ray

    from collections import Counter

    from .pairs import hash_shuffle, mix64, round_away, str_u64

    P = 32

    @ray.remote
    def stage1(t: pa.Table):
        import pyarrow.compute as pc

        E = pa.table({"kind": pa.array([], pa.int8()),
                      "wa": pa.array([], pa.string()),
                      "wb": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "text" not in t.schema.names:
            return E
        t2 = t.filter(pc.is_valid(t.column("doc_id")))
        # per-doc distinct words; pair generation is VECTORIZED via
        # the within-group shift-pairing used by q207 — codes come
        # from np.unique so they are ORDER-PRESERVING (pair (a<b) in
        # code space == byte order in string space; ASCII tokens)
        docs, words_all = [], []
        n_docs = 0
        for txt in t2.column("text").to_pylist():
            ws = set(_TOKEN_RX.findall((txt or "").lower()))
            if not ws:
                continue
            docs.extend([n_docs] * len(ws))
            words_all.extend(ws)
            n_docs += 1
        if n_docs == 0:
            return E
        uniq, codes = np.unique(np.array(words_all, object),
                                return_inverse=True)
        from .graph import _pairs_by_shift

        d = np.asarray(docs, np.int64)
        order = np.lexsort((codes, d))
        a, b = _pairs_by_shift(d[order], codes[order])
        V = np.int64(len(uniq))
        uk, cnt = np.unique(a * V + b, return_counts=True)
        wcnt = np.bincount(codes, minlength=len(uniq))
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(uk.size, np.int8),
                 np.ones(len(uniq), np.int8),
                 np.full(1, 2, np.int8)])),
            "wa": pa.array(list(uniq[uk // V]) + list(uniq) + [""],
                           pa.string()),
            "wb": pa.array(list(uniq[uk % V])
                           + [""] * (len(uniq) + 1), pa.string()),
            "n": pa.array(np.concatenate(
                [cnt.astype(np.int64), wcnt.astype(np.int64),
                 np.full(1, n_docs, np.int64)]))})

    refs = _docs(sf_dir, ["doc_id", "text"]).to_arrow_refs()
    s1 = [stage1.remote(r) for r in refs]
    s1_tabs = ray.get(s1)
    empty = pd.DataFrame({"wa": pd.Series(dtype="object"),
                          "wb": pd.Series(dtype="object"),
                          "sup": pd.Series(dtype="int64"),
                          "pmi": pd.Series(dtype="float64")})
    live = [t for t in s1_tabs if t.num_rows]
    if not live:
        return empty
    cat = pa.concat_tables(live).to_pandas()
    kinds = cat["kind"].to_numpy(np.int8)
    items = (cat[kinds == 1].groupby("wa")["n"].sum())
    N = int(cat[kinds == 2]["n"].sum())
    bc = ray.put((dict(items.items()), N))

    def split2(t: pa.Table) -> pa.Table:
        E = pa.table({"wa": pa.array([], pa.string()),
                      "wb": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return E
        d = t.to_pandas()
        d = d[d["kind"].to_numpy(np.int8) == 0]
        if d.empty:
            return E
        b = np.array([str_u64(a + "\x1f" + bb) & (P - 1)
                      for a, bb in zip(d["wa"], d["wb"])], np.int64)
        return pa.table({"wa": pa.array(d["wa"].tolist(), pa.string()),
                         "wb": pa.array(d["wb"].tolist(), pa.string()),
                         "n": pa.array(d["n"].to_numpy(np.int64)),
                         "bucket": pa.array(b)})

    def merge2(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return empty.copy()
        import ray as _ray

        idict, n_all = _ray.get(bc) if not isinstance(bc, tuple) else bc
        df = (pa.concat_tables(live).to_pandas()
              .groupby(["wa", "wb"], as_index=False)
              .agg(n=("n", "sum")))
        df = df[df["n"] >= min_sup]
        if df.empty:
            return empty.copy()
        sup = df["n"].to_numpy(np.int64)
        sa = np.array([idict[w] for w in df["wa"]], np.int64)
        sb = np.array([idict[w] for w in df["wb"]], np.int64)
        pmi = np.log((sup * n_all) / (sa * sb.astype(np.float64)))
        order = np.lexsort((df["wb"].to_numpy(object),
                            df["wa"].to_numpy(object), -pmi))[:topk]
        out = df.iloc[order].reset_index(drop=True)
        return pd.DataFrame({"wa": out["wa"], "wb": out["wb"],
                             "sup": out["n"].astype("int64"),
                             "pmi": pmi[order]})

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in s1], split2, merge2, P=P) if len(p)]
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    pmi = allp["pmi"].to_numpy(np.float64)
    order = np.lexsort((allp["wb"].to_numpy(object),
                        allp["wa"].to_numpy(object), -pmi))[:topk]
    out = allp.iloc[order].reset_index(drop=True)
    out["pmi"] = round_away(out["pmi"].to_numpy(np.float64), 6)
    out["sup"] = out["sup"].astype("int64")
    return out


def q_vocab_containment(sf_dir: str) -> pd.DataFrame:
    """Cross-source vocabulary CONTAINMENT — the asymmetric
    contamination screen (|V_a∩V_b| / |V_a| vs / |V_b|) that q181's
    cosine can't express (a tiny source fully inside a big one has
    low cosine but containment 1.0). Same word-hash exchange as q181:
    each bucket owns a vocab slice, emits per-pair intersection
    partials (source domain² bounded) and per-source vocab-size
    partials; the driver folds sources² rows. Source keys ride
    NUL-safe codes; pairs orient by source BYTE order (a < b), NULL
    source is out of contract (q181 rule)."""
    from .pairs import coded_keys, factorize_strings, hash_shuffle, str_u64

    P = 32

    _E = pa.table({"src": pa.array([], pa.string()),
                   "word": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("source")))
        seen = set()
        for src, txt in zip(t2.column("source").to_pylist(),
                            t2.column("text").to_pylist()):
            for w in _TOKEN_RX.findall((txt or "").lower()):
                seen.add((src, w))
        if not seen:
            return _E
        srcs, words = zip(*seen)
        b = np.array([str_u64(w) & (P - 1) for w in words], np.int64)
        return pa.table({"src": pa.array(list(srcs), pa.string()),
                         "word": pa.array(list(words), pa.string()),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"sa": pd.Series(dtype="object"),
                "sb": pd.Series(dtype="object"),
                "inter": pd.Series(dtype="int64"),
                "nv": pd.Series(dtype="int64"),
                "is_size": pd.Series(dtype="bool")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        cj, restore = coded_keys(df, ["src", "word"])
        g = restore(cj.drop_duplicates())
        src = g["src"].to_numpy(object)
        hexkey = np.array([v.encode("utf-8", "surrogatepass").hex()
                           for v in src], object)
        wcodes, _wu = factorize_strings(g["word"])
        # per-source vocab-size partial over this slice
        scodes, suniq = factorize_strings(g["src"])
        nv = np.bincount(scodes, minlength=len(suniq)).astype(np.int64)
        # per-word source lists → oriented pair intersections
        order = np.lexsort((hexkey, wcodes))
        wc, ss = wcodes[order], src[order]
        rows_a, rows_b = [], []
        n = len(wc)
        i = 0
        while i < n:
            j = i + 1
            while j < n and wc[j] == wc[i]:
                j += 1
            for a in range(i, j - 1):
                for b2 in range(a + 1, j):
                    rows_a.append(ss[a])
                    rows_b.append(ss[b2])
            i = j
        pairs = pd.DataFrame({"sa": np.array(rows_a, object),
                              "sb": np.array(rows_b, object)})
        if len(pairs):
            pj, prestore = coded_keys(pairs, ["sa", "sb"])
            pg = prestore(pj.groupby(["sa", "sb"], as_index=False)
                          .size().rename(columns={"size": "inter"}))
        else:
            pg = pd.DataFrame({"sa": pd.Series(dtype=object),
                               "sb": pd.Series(dtype=object),
                               "inter": pd.Series(dtype="int64")})
        out = pd.DataFrame({
            "sa": pd.concat([pg["sa"],
                             pd.Series(list(suniq), dtype=object)],
                            ignore_index=True),
            "sb": pd.concat([pg["sb"],
                             pd.Series(list(suniq), dtype=object)],
                            ignore_index=True),
            "inter": np.concatenate([pg["inter"].to_numpy(np.int64),
                                     np.zeros(len(suniq), np.int64)]),
            "nv": np.concatenate([np.zeros(len(pg), np.int64), nv]),
            "is_size": np.concatenate([np.zeros(len(pg), bool),
                                       np.ones(len(suniq), bool)])})
        return out

    tagged = [(r, ()) for r in _docs(
        sf_dir, ["source", "text"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"source_a": pd.Series(dtype="object"),
                          "source_b": pd.Series(dtype="object"),
                          "n_common": pd.Series(dtype="int64"),
                          "containment_a": pd.Series(dtype="float64"),
                          "containment_b": pd.Series(dtype="float64")})
    if not parts:
        return empty
    from .pairs import coded_keys as ck
    allp = pd.concat(parts, ignore_index=True)
    sizes = allp[allp["is_size"]]
    scode, suniq = factorize_strings(sizes["sa"])
    nv = np.bincount(scode, weights=sizes["nv"].to_numpy(np.float64),
                     minlength=len(suniq)).astype(np.int64)
    nmap = dict(zip(suniq, nv))
    ip = allp[~allp["is_size"]]
    if ip.empty:
        return empty
    pj, prestore = ck(ip[["sa", "sb"]].assign(
        inter=ip["inter"].to_numpy(np.int64)), ["sa", "sb"])
    pg = prestore(pj.groupby(["sa", "sb"], as_index=False)
                  .agg(inter=("inter", "sum")))
    inter = pg["inter"].to_numpy(np.int64)
    na = np.array([nmap[s] for s in pg["sa"]], np.int64)
    nb = np.array([nmap[s] for s in pg["sb"]], np.int64)
    from .pairs import round_away
    res = pd.DataFrame({
        "source_a": pg["sa"], "source_b": pg["sb"],
        "n_common": inter,
        "containment_a": round_away(inter / na.astype(np.float64), 6),
        "containment_b": round_away(inter / nb.astype(np.float64), 6)})
    ka = res["source_a"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    kb = res["source_b"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    order = pd.DataFrame({"a": ka, "b": kb}).sort_values(
        ["a", "b"]).index
    return res.loc[order].reset_index(drop=True)


def q_greedy_source_cover(sf_dir: str, k: int = 3, P: int = 32
                          ) -> pd.DataFrame:
    """Greedy maximum-coverage selection of document SOURCES by
    vocabulary — the classic data-mixture primitive (pick the source
    adding the most unseen words, k rounds): round r reports (r,
    source, marginal gain in distinct words). Distributed like q253:
    one word-hash exchange builds distinct (source, word) bucket
    tables that STAY in the object store (gather=False); each round is
    one task wave re-deriving the bucket's covered-word set from the
    broadcast picked-source list (3 rounds × P tasks — recompute beats
    carrying per-bucket mutable state) and emitting per-source
    uncovered counts, so the driver folds sources × buckets tiny rows.
    A source whose words are all covered emits no row (SQL's filtered
    GROUP BY drops it); ties break by gain DESC then source UTF-8
    BYTE order (DuckDB's binary collation). NULL source is out of
    contract (q181/q253 rule)."""
    import ray

    from .pairs import hash_shuffle, str_u64

    cols = {"round": pd.Series(dtype="int64"),
            "source": pd.Series(dtype="object"),
            "gain": pd.Series(dtype="int64")}

    _E = pa.table({"src": pa.array([], pa.string()),
                   "word": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("source")))
        seen = set()
        for src, txt in zip(t2.column("source").to_pylist(),
                            t2.column("text").to_pylist()):
            for w in _TOKEN_RX.findall((txt or "").lower()):
                seen.add((src, w))
        if not seen:
            return _E
        srcs, words = zip(*seen)
        b = np.array([str_u64(w) & (P - 1) for w in words], np.int64)
        return pa.table({"src": pa.array(list(srcs), pa.string()),
                         "word": pa.array(list(words), pa.string()),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> pa.Table:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return _E.drop_columns(["bucket"])
        t = pa.concat_tables(live)
        # Python-set dedup, NOT pandas drop_duplicates: pandas hashes
        # object strings as NUL-terminated C strings and would merge
        # 'w' with 'w\\x00x' (CLAUDE.md factorize_strings rule)
        seen = sorted(set(zip(t.column("src").to_pylist(),
                              t.column("word").to_pylist())))
        return pa.table({
            "src": pa.array([s for s, _ in seen], pa.string()),
            "word": pa.array([w for _, w in seen], pa.string())})

    bucket_refs = hash_shuffle(
        [(r, ()) for r in _docs(
            sf_dir, columns=["source", "text"]).to_arrow_refs()],
        split, merge, P=P, gather=False)

    @ray.remote
    def gains(tab: pa.Table, picked: tuple) -> pd.DataFrame:
        if tab.num_rows == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "gain": pd.Series(dtype="int64")})
        df = tab.to_pandas()
        pick = set(picked)
        covered = set(df.loc[[s in pick for s in df["src"]], "word"])
        live = df[[w not in covered for w in df["word"]]]
        out = (live.groupby(live["src"].map(
            lambda s: s.encode("utf-8", "surrogatepass")),
            as_index=True)["word"].count())
        return pd.DataFrame({"source": [b.decode("utf-8",
                                                 "surrogatepass")
                                        for b in out.index],
                             "gain": out.to_numpy(np.int64)})

    picked: list = []
    rows = []
    for r in range(1, k + 1):
        parts = [p for p in ray.get(
            [gains.remote(ref, tuple(picked)) for ref in bucket_refs])
            if len(p)]
        if not parts:
            break
        agg: dict = {}
        for p in parts:
            for s, g in zip(p["source"], p["gain"]):
                agg[s] = agg.get(s, 0) + int(g)
        best = min(agg.items(),
                   key=lambda kv: (-kv[1],
                                   kv[0].encode("utf-8",
                                                "surrogatepass")))
        rows.append({"round": r, "source": best[0], "gain": best[1]})
        picked.append(best[0])
    if not rows:
        return pd.DataFrame(cols)
    out = pd.DataFrame(rows)
    out["round"] = out["round"].astype(np.int64)
    out["gain"] = out["gain"].astype(np.int64)
    return out


def q_weighted_jaccard(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Weighted (multiset) Jaccard between source vocabularies —
    Σ_w min(c_a, c_b) / Σ_w max(c_a, c_b) over per-source token
    COUNTS, the frequency-aware upgrade of q253's set containment
    (a source quoting another's rare words a thousand times moves
    this score, not that one). Identity Σmax = T_a + T_b − Σmin turns
    the pair score into one Σmin exchange plus per-source token
    totals: each word-hash bucket owns its vocabulary slice GLOBALLY
    (counts for a word from every batch land in the same bucket), so
    per-pair Σmin partials are exact and the driver folds sources²
    × buckets tiny rows. All sums are exact integers — both sides
    compute the same division, round(…, 6) is belt-and-braces. Pairs
    orient by source UTF-8 byte order (a < b); pairs sharing no word
    emit no row, like the oracle's join. NULL source is out of
    contract (q253 rule)."""
    import ray  # noqa: F401  (hash_shuffle spawns the tasks)

    from .pairs import hash_shuffle, str_u64

    cols = {"source_a": pd.Series(dtype="object"),
            "source_b": pd.Series(dtype="object"),
            "wjaccard": pd.Series(dtype="float64")}

    _E = pa.table({"src": pa.array([], pa.string()),
                   "word": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("source")))
        cnt: dict = {}
        for src, txt in zip(t2.column("source").to_pylist(),
                            t2.column("text").to_pylist()):
            for w in _TOKEN_RX.findall((txt or "").lower()):
                key = (src, w)
                cnt[key] = cnt.get(key, 0) + 1
        if not cnt:
            return _E
        keys = list(cnt.keys())
        b = np.array([str_u64(w) & (P - 1) for _, w in keys], np.int64)
        return pa.table({
            "src": pa.array([s for s, _ in keys], pa.string()),
            "word": pa.array([w for _, w in keys], pa.string()),
            "c": pa.array(np.fromiter(cnt.values(), np.int64,
                                      len(cnt))),
            "bucket": pa.array(b)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        out_cols = {"sa": pd.Series(dtype="object"),
                    "sb": pd.Series(dtype="object"),
                    "msum": pd.Series(dtype="int64"),
                    "tot": pd.Series(dtype="int64"),
                    "is_tot": pd.Series(dtype="bool")}
        if not live:
            return pd.DataFrame(out_cols)
        t = pa.concat_tables(live)
        # global per-(source, word) counts for this vocab slice —
        # Python dicts: exact full-byte string keys (NUL rule)
        cnt: dict = {}
        for s, w, c in zip(t.column("src").to_pylist(),
                           t.column("word").to_pylist(),
                           t.column("c").to_pylist()):
            key = (s, w)
            cnt[key] = cnt.get(key, 0) + c
        by_word: dict = {}
        tot: dict = {}
        for (s, w), c in cnt.items():
            by_word.setdefault(w, []).append((s, c))
            tot[s] = tot.get(s, 0) + c
        mins: dict = {}
        for w, lst in by_word.items():
            if len(lst) < 2:
                continue
            lst = sorted(lst, key=lambda x: x[0].encode(
                "utf-8", "surrogatepass"))
            for i in range(len(lst)):
                for j in range(i + 1, len(lst)):
                    pair = (lst[i][0], lst[j][0])
                    mins[pair] = (mins.get(pair, 0)
                                  + min(lst[i][1], lst[j][1]))
        rows = ([{"sa": a, "sb": b, "msum": m, "tot": 0,
                  "is_tot": False} for (a, b), m in mins.items()]
                + [{"sa": s, "sb": "", "msum": 0, "tot": c,
                    "is_tot": True} for s, c in tot.items()])
        return pd.DataFrame(rows)

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in _docs(
            sf_dir, columns=["source", "text"]).to_arrow_refs()],
        split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame(cols)
    allp = pd.concat(parts, ignore_index=True)
    totals: dict = {}
    mins: dict = {}
    for r in allp.itertuples(index=False):
        if r.is_tot:
            totals[r.sa] = totals.get(r.sa, 0) + int(r.tot)
        else:
            pair = (r.sa, r.sb)
            mins[pair] = mins.get(pair, 0) + int(r.msum)
    if not mins:
        return pd.DataFrame(cols)
    out = pd.DataFrame(
        [{"source_a": a, "source_b": b,
          "wjaccard": m / float(totals[a] + totals[b] - m)}
         for (a, b), m in mins.items()])
    from .pairs import round_away
    out["wjaccard"] = round_away(out["wjaccard"].to_numpy(), 6)
    ka = out["source_a"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    kb = out["source_b"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    order = pd.DataFrame({"a": ka, "b": kb}).sort_values(
        ["a", "b"]).index
    return out.loc[order].reset_index(drop=True)


def q_loo_source_impact(sf_dir: str) -> pd.DataFrame:
    """Leave-one-source-out impact on mean document length — the
    cheapest data-attribution screen (how much would the corpus mean
    shift if source s were dropped): Δ_s = mean(n_chars | ≠s) −
    mean(n_chars). All sums are exact int64 (one per-batch per-source
    (count, sum) combiner; the exchange sees sources × batches rows),
    so both sides perform the identical two divisions. The only-source
    case (N − n_s = 0) is SQL NULL → NaN."""
    from .pairs import factorize_strings, round_away

    ds = _docs(sf_dir, columns=["source", "n_chars"])

    _E = pa.table({"src": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "t": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "source" not in t.schema.names:
            return _E
        keep = pc.and_(pc.is_valid(t.column("source")),
                       pc.is_valid(t.column("n_chars")))
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return _E
        df = pd.DataFrame({
            "src": t2.column("source").to_pandas(),
            "v": t2.column("n_chars").cast(pa.int64()).to_numpy(
                zero_copy_only=False)})
        codes, uniq = factorize_strings(df["src"])
        g = (df.assign(_c=codes).groupby("_c")["v"]
             .agg(["count", "sum"]).reset_index())
        return pa.table({
            "src": pa.array(uniq.to_numpy()[g["_c"].to_numpy()],
                            pa.string()),
            "n": pa.array(g["count"].to_numpy(np.int64)),
            "t": pa.array(g["sum"].to_numpy(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "loo_delta": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"])
    g = (parts.assign(_c=codes).groupby("_c")[["n", "t"]]
         .sum().reset_index())
    src = uniq.to_numpy()[g["_c"].to_numpy()]
    n = g["n"].to_numpy(np.int64)
    t = g["t"].to_numpy(np.int64)
    N, T = int(n.sum()), int(t.sum())
    with np.errstate(invalid="ignore", divide="ignore"):
        delta = np.where(N - n > 0,
                         (T - t) / (N - n).astype(np.float64)
                         - T / float(N), np.nan)
    out = pd.DataFrame({"source": pd.Series(src, dtype=object),
                        "n_docs": n,
                        "loo_delta": round_away(delta, 6)})
    key = out["source"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    return out.loc[key.sort_values().index].reset_index(drop=True)


def q_isotonic_enrate(sf_dir: str) -> pd.DataFrame:
    """Isotonic (PAVA) calibration of P(lang = 'en') as a function of
    document length — the monotone-fit step behind isotonic score
    calibration (q246 reports raw reliability deciles; this POOLS
    adjacent violators into the least-squares monotone staircase).
    Distributed as per-batch (n_chars → count, positives) integer
    partials — the exchange sees distinct-length × batches rows, never
    documents — then the weighted pool-adjacent-violators stack runs
    driver-side over the ~distinct-lengths series (PAVA is inherently
    sequential; the series is value-domain-bounded, not corpus-
    bounded). Output: one row per pooled block (x_lo, x_hi, n, rate),
    rates exact-integer ratios, non-decreasing by construction. No SQL
    twin (PAVA's pooling recursion isn't expressible as a window);
    pinned by a hand-example pytest. Contract: n_chars non-NULL."""
    from .pairs import round_away

    ds = _docs(sf_dir, columns=["n_chars", "lang"])

    _E = pa.table({"x": pa.array([], pa.int64()),
                   "n": pa.array([], pa.int64()),
                   "pos": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "n_chars" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("n_chars")))
        if t2.num_rows == 0:
            return _E
        x = t2.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        y = pc.fill_null(pc.equal(t2.column("lang"), "en"),
                         False).to_numpy(zero_copy_only=False)
        u, inv = np.unique(x, return_inverse=True)
        n = np.bincount(inv, minlength=u.size)
        pos = np.bincount(inv, weights=y.astype(np.float64),
                          minlength=u.size).astype(np.int64)
        return pa.table({"x": pa.array(u),
                         "n": pa.array(n.astype(np.int64)),
                         "pos": pa.array(pos)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"x_lo": pd.Series(dtype="int64"),
            "x_hi": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "rate": pd.Series(dtype="float64")}
    if parts.empty:
        return pd.DataFrame(cols)
    g = (parts.groupby("x", as_index=False).sum()
         .sort_values("x").reset_index(drop=True))
    # weighted PAVA: stack of (x_lo, x_hi, n, pos); pool while the
    # last block's rate exceeds the incoming one
    stack: list = []
    for x, n, pos in zip(g["x"].to_numpy(np.int64),
                         g["n"].to_numpy(np.int64),
                         g["pos"].to_numpy(np.int64)):
        blk = [int(x), int(x), int(n), int(pos)]
        # pool on >=: exact integer cross-multiplication, no float
        # rate comparisons
        while stack and (stack[-1][3] * blk[2] >= blk[3] * stack[-1][2]):
            prev = stack.pop()
            blk = [prev[0], blk[1], prev[2] + blk[2], prev[3] + blk[3]]
        stack.append(blk)
    out = pd.DataFrame(stack, columns=["x_lo", "x_hi", "n", "pos"])
    out["rate"] = round_away(
        out["pos"].to_numpy(np.float64) / out["n"].to_numpy(np.float64),
        6)
    return out.drop(columns=["pos"]).astype(
        {"x_lo": "int64", "x_hi": "int64", "n": "int64"})


def q_props_key_profile(sf_dir: str) -> pd.DataFrame:
    """Schema profile of the semi-structured ``events.props`` column:
    how many events carry each top-level JSON key — the first question
    asked of any JSON payload column before promoting keys to real
    columns. DuckDB ``json_keys`` parity (probed): duplicate keys in
    one object count TWICE (yyjson keeps the raw document — Python's
    dict-collapsing json.loads would silently merge them, hence the
    _JPairs pairs-hook loader), non-object roots contribute nothing,
    validity is the q17-parity yyjson ruleset. Per-batch key-count
    partials fold driver-side (keys are schema-dimension-sized); keys
    are exact full-byte strings (NUL-safe dict fold, byte-order
    output)."""
    import os

    import ray.data as rd

    from ..functions.validators import is_valid_json_batch
    from .pairs import factorize_strings

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["props"])

    _E = pa.table({"key": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "props" not in t.schema.names:
            return _E
        vals = t.column("props").to_pylist()
        ok = is_valid_json_batch(vals)
        cnt: dict = {}
        for s, v in zip(vals, ok):
            if not v or s is None:
                continue
            obj = _loads_yy(s)
            if isinstance(obj, _JPairs):
                for k, _ in obj:
                    cnt[k] = cnt.get(k, 0) + 1
        if not cnt:
            return _E
        return pa.table({
            "key": pa.array(list(cnt.keys()), pa.string()),
            "n": pa.array(np.fromiter(cnt.values(), np.int64,
                                      len(cnt)))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = {"key": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64")}
    if parts.empty:
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["key"])
    g = (parts.assign(_c=codes).groupby("_c")["n"].sum()
         .reset_index())
    out = pd.DataFrame({
        "key": pd.Series(uniq.to_numpy()[g["_c"].to_numpy()],
                         dtype=object),
        "n": g["n"].to_numpy(np.int64)})
    hexk = out["key"].map(lambda s: s.encode(
        "utf-8", "surrogatepass").hex())
    return out.loc[hexk.sort_values().index].reset_index(drop=True)


def q_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-document zlib compression ratio — the cheap redundancy
    screen training-data pipelines run alongside q63's repetition
    filter (boilerplate and template spam compress far below prose;
    ratios near 1 flag already-compressed or high-entropy junk).
    Stateless vectorized-per-batch stage: compressed size over UTF-8
    byte size, level 6. NULL or empty text is out of contract
    (dropped). Deterministic within an environment → rows-only;
    ordering (repetitive ≪ prose < random) pinned by pytest."""
    import zlib

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    _E = pa.table({"doc_id": pa.array([], pa.int64()),
                   "n_bytes": pa.array([], pa.int64()),
                   "n_compressed": pa.array([], pa.int64()),
                   "ratio": pa.array([], pa.float64())})

    def comp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        ids, nb, nc = [], [], []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            if did is None or not txt:
                continue
            raw = txt.encode("utf-8", "surrogatepass")
            ids.append(did)
            nb.append(len(raw))
            nc.append(len(zlib.compress(raw, 6)))
        nb_a = np.array(nb, np.int64)
        nc_a = np.array(nc, np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(nb_a),
            "n_compressed": pa.array(nc_a),
            "ratio": pa.array(np.round(nc_a / nb_a, 6))})

    out = _wc(ds.map_batches(comp, batch_format="pyarrow")
              .to_pandas(),
              {"doc_id": "int64", "n_bytes": "int64",
               "n_compressed": "int64", "ratio": "float64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_negative_sampling_dist(sf_dir: str, k: int = 50,
                             power: float = 0.75, P: int = 32
                             ) -> pd.DataFrame:
    """word2vec-style negative-sampling distribution: P(w) ∝
    count(w)^0.75, reported for the top-k words — the smoothed unigram
    table every skip-gram/contrastive text trainer builds first. One
    word-hash exchange: each bucket owns its vocab slice, folds global
    counts, and emits BOTH its Σ count^0.75 partial (the denominator
    needs every word, not just the head) and its local top-k
    candidates — any global top-k word is in its bucket's top-k, so
    the driver folds P·k candidates plus P scalars. pow() terms are
    identical doubles on both sides; only the denominator's summation
    order differs (round 6 on O(1e-3) probabilities). Ties at the k
    boundary break by UTF-8 byte order like the oracle's ORDER BY."""
    from .pairs import hash_shuffle, round_away, str_u64

    cols = {"word": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "prob": pd.Series(dtype="float64")}

    _E = pa.table({"word": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        cnt: dict = {}
        for txt in t.column("text").to_pylist():
            for w in _TOKEN_RX.findall((txt or "").lower()):
                cnt[w] = cnt.get(w, 0) + 1
        if not cnt:
            return _E
        words = list(cnt.keys())
        return pa.table({
            "word": pa.array(words, pa.string()),
            "c": pa.array(np.fromiter(cnt.values(), np.int64,
                                      len(cnt))),
            "bucket": pa.array(np.array(
                [str_u64(w) & (P - 1) for w in words], np.int64))})

    def merge(*tabs):
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return 0.0, []
        t = pa.concat_tables(live)
        cnt: dict = {}
        for w, c in zip(t.column("word").to_pylist(),
                        t.column("c").to_pylist()):
            cnt[w] = cnt.get(w, 0) + c
        z = float(np.power(np.fromiter(cnt.values(), np.float64,
                                       len(cnt)), power).sum())
        top = sorted(cnt.items(),
                     key=lambda kv: (-kv[1], kv[0].encode(
                         "utf-8", "surrogatepass")))[:k]
        return z, top

    parts = hash_shuffle(
        [(r, ()) for r in _docs(
            sf_dir, columns=["text"]).to_arrow_refs()],
        split, merge, P=P)
    z = sum(p[0] for p in parts)
    cands = [kv for p in parts for kv in p[1]]
    if not cands or z == 0.0:
        return pd.DataFrame(cols)
    cands.sort(key=lambda kv: (-kv[1], kv[0].encode(
        "utf-8", "surrogatepass")))
    top = cands[:k]
    return pd.DataFrame({
        "word": pd.Series([w for w, _ in top], dtype=object),
        "n": pd.array([c for _, c in top], "int64"),
        "prob": round_away(
            np.power(np.array([c for _, c in top], np.float64),
                     power) / z, 6)})


def q_langid_eval(sf_dir: str) -> pd.DataFrame:
    """Confusion matrix + macro-F1 of the q16 stopword language
    heuristic against the stored ``lang`` labels — the accuracy
    harness that turns the heuristic into a measurable classifier
    (binary task: 'en' vs everything else; NULL lang counts as
    not-en, NULL text predicts not-en, both the SQL CASE semantics).
    One streamed pass of per-batch 4-cell confusion partials; the
    driver folds P tiny tuples and computes the two class F1s from
    exact-integer ratios. An ungrouped SQL aggregate emits exactly
    one row even on empty input (q136 rule) — counts 0, NULL F1."""
    from ..functions.text import STOP_WORDS
    from .pairs import round_away

    ds = _docs(sf_dir, columns=["text", "lang"])

    def confusion(t: pa.Table) -> pa.Table:
        tp = fp = fn = tn = 0
        if t.num_rows and "text" in t.schema.names:
            for txt, lang in zip(t.column("text").to_pylist(),
                                 t.column("lang").to_pylist()):
                toks = _TOKEN_RX.findall((txt or "").lower())
                ns = sum(1 for w in toks if w in STOP_WORDS)
                pred = 10 * ns > len(toks)
                act = lang == "en"
                if pred and act:
                    tp += 1
                elif pred:
                    fp += 1
                elif act:
                    fn += 1
                else:
                    tn += 1
        return pa.table({"tp": pa.array([tp], pa.int64()),
                         "fp": pa.array([fp], pa.int64()),
                         "fn": pa.array([fn], pa.int64()),
                         "tn": pa.array([tn], pa.int64())})

    p = _wc(ds.map_batches(confusion, batch_format="pyarrow")
            .to_pandas(),
            {"tp": "int64", "fp": "int64", "fn": "int64",
             "tn": "int64"})
    tp, fp = int(p["tp"].sum()), int(p["fp"].sum())
    fn, tn = int(p["fn"].sum()), int(p["tn"].sum())
    den_en = 2 * tp + fp + fn
    den_ot = 2 * tn + fn + fp
    macro = np.nan
    if den_en > 0 and den_ot > 0:
        macro = (2.0 * tp / den_en + 2.0 * tn / den_ot) / 2.0
    return pd.DataFrame({"tp": pd.array([tp], "int64"),
                         "fp": pd.array([fp], "int64"),
                         "fn": pd.array([fn], "int64"),
                         "tn": pd.array([tn], "int64"),
                         "macro_f1": round_away(np.array([macro]), 6)})


def q_bpe_fertility(sf_dir: str, n_merges: int = 24) -> pd.DataFrame:
    """Tokenizer fertility by language — tokens-per-word of the
    trained q100 BPE per ``lang`` group, the first number checked when
    a tokenizer is suspected of fragmenting a language's text (high
    fertility = wasted context window for that slice). Reuses q233's
    actor-pool encode verbatim (per-doc counts stream back; the
    per-doc frame is already q233's driver contract) and folds
    exact-int (Σtokens, Σwords) per lang; fertility is one exact-int
    division. Docs that tokenize to zero words don't contribute;
    NULL lang is its own group."""
    import os

    import pyarrow.dataset as pads

    from .pairs import factorize_strings, round_away

    per_doc = q_bpe_encode(sf_dir, n_merges=n_merges)
    cols = {"lang": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "fertility": pd.Series(dtype="float64")}
    if per_doc.empty:
        return pd.DataFrame(cols)
    lang_t = pads.dataset(
        os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "lang"]).to_pandas()
    df = per_doc.merge(lang_t, on="doc_id", how="left")
    df = df[df["n_words"] > 0]
    if df.empty:
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(df["lang"],
                                    use_na_sentinel=False)
    g = (df.assign(_c=codes).groupby("_c")
         .agg(n_docs=("doc_id", "count"),
              tw=("n_words", "sum"), tt=("n_tokens", "sum"))
         .reset_index())
    out = pd.DataFrame({
        "lang": pd.Series(uniq.to_numpy()[g["_c"].to_numpy()],
                          dtype=object),
        "n_docs": g["n_docs"].to_numpy(np.int64),
        "fertility": round_away(
            g["tt"].to_numpy(np.float64)
            / g["tw"].to_numpy(np.float64), 6)})
    out["lang"] = out["lang"].astype(object).where(
        out["lang"].notna(), None)
    key = out["lang"].map(lambda s: "" if s is None
                          else "1" + s.encode("utf-8",
                                              "surrogatepass").hex())
    return out.loc[key.sort_values().index].reset_index(drop=True)


def q_source_skewness(sf_dir: str) -> pd.DataFrame:
    """Per-source skewness of document length (n_chars) — the
    data-quality screen that catches a source whose length
    distribution grew a heavy tail (truncation bugs, boilerplate
    floods) before the mean moves. Third-moment statistics are where
    float accumulation order bites hardest, so the partials are EXACT
    integer power sums (Σx, Σx², Σx³ per batch per source — int64
    with a loud overflow guard; the cross-batch fold accumulates as
    Python ints, unbounded), and the final skew =
    (E[x³] − 3·m·E[x²] + 2m³) / (E[x²] − m²)^1.5 applies ONE
    cast-to-double per exact operand in the oracle's literal op
    order. Constant groups (min == max, an exact integer flag — never
    a float var≈0 test) emit NULL skew; NULL source IS a group (SQL
    GROUP BY), carried on NUL-safe codes; NULL n_chars rows drop on
    both sides."""
    import pyarrow.compute as pc

    from .pairs import factorize_strings, round_away

    _E = pa.table({"src": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "s1": pa.array([], pa.int64()),
                   "s2": pa.array([], pa.int64()),
                   "s3": pa.array([], pa.int64()),
                   "mn": pa.array([], pa.int64()),
                   "mx": pa.array([], pa.int64())})
    _NULL = "\x00NULLSRC"

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_chars" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("n_chars")))
        if t2.num_rows == 0:
            return _E
        x = t2.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        mabs = int(np.abs(x).max()) if len(x) else 0
        if mabs ** 3 * len(x) >= 2 ** 62:
            # int64 partial would overflow — the wide-length
            # continuation splits the batch / carries decimal128
            raise ValueError("n_chars cube-sum exceeds int64 partial")
        src = pd.Series(t2.column("source").to_pylist(), dtype=object)
        keyed = src.where(src.isna(), "S" + src).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        k = len(uniq)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        s1 = np.zeros(k, np.int64)
        s2 = np.zeros(k, np.int64)
        s3 = np.zeros(k, np.int64)
        np.add.at(s1, codes, x)
        np.add.at(s2, codes, x * x)
        np.add.at(s3, codes, x * x * x)
        mn = np.full(k, np.iinfo(np.int64).max, np.int64)
        mx = np.full(k, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, codes, x)
        np.maximum.at(mx, codes, x)
        return pa.table({"src": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "s1": pa.array(s1),
                         "s2": pa.array(s2), "s3": pa.array(s3),
                         "mn": pa.array(mn), "mx": pa.array(mx)})

    parts = _docs(sf_dir, columns=["source", "n_chars"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "skew": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"], use_na_sentinel=False)
    k = len(uniq)
    n = [0] * k
    s1 = [0] * k
    s2 = [0] * k
    s3 = [0] * k
    mn = [None] * k
    mx = [None] * k
    for c, nn, a, b, cc, lo, hi in zip(
            codes, parts["n"].tolist(), parts["s1"].tolist(),
            parts["s2"].tolist(), parts["s3"].tolist(),
            parts["mn"].tolist(), parts["mx"].tolist()):
        n[c] += nn          # Python-int fold: exact at any magnitude
        s1[c] += a
        s2[c] += b
        s3[c] += cc
        mn[c] = lo if mn[c] is None else min(mn[c], lo)
        mx[c] = hi if mx[c] is None else max(mx[c], hi)
    out_src, out_n, out_sk = [], [], []
    order = sorted(range(k),          # SQL ORDER BY source NULLS LAST
                   key=lambda i: (uniq[i] == _NULL, uniq[i]))
    for i in order:
        key = uniq[i]
        src = None if key == _NULL else key[1:]
        ni = n[i]
        if mn[i] == mx[i]:
            sk = np.nan
        else:
            m1 = float(s1[i]) / ni
            e2 = float(s2[i]) / ni
            e3 = float(s3[i]) / ni
            sk = ((e3 - 3.0 * m1 * e2 + 2.0 * m1 * m1 * m1)
                  / (e2 - m1 * m1) ** 1.5)
        out_src.append(src)
        out_n.append(ni)
        out_sk.append(sk)
    return pd.DataFrame({
        "source": pd.Series(out_src, dtype=object),
        "n": pd.array(out_n, "int64"),
        "skew": round_away(np.array(out_sk, np.float64), 6)})


def q_lang_rebalance(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash resampling to a uniform language mix — the
    data-mixing realization next to q72's allocation math: each lang's
    acceptance probability is p = min(1, target/actual) with target =
    N/L docs per language, and a doc survives iff the first 52 bits
    of md5(doc_id) fall below ⌊p·2⁵²⌋ — the same
    cross-language-deterministic coin as q244's md5 selection order
    (never Python's salted hash; identical keeps on any cluster
    shape, any partitioning). Two streamed passes: per-batch per-lang
    count partials (driver folds the lang domain), then a broadcast
    threshold filter counting keeps. p's divisions run in the
    oracle's own op order on exact ints; thresholds are exact int64
    (52-bit mantissa — no double rounding at the boundary). NULL lang
    or doc_id rows are out of contract on both sides."""
    import hashlib

    from .pairs import round_away

    _E = pa.table({"lang": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64())})

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.schema.names:
            return _E
        import pyarrow.compute as pc
        keep = pc.and_kleene(pc.is_valid(t.column("lang")),
                             pc.is_valid(t.column("doc_id")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        g = (pa.table({"lang": t2.column("lang")})
             .group_by(["lang"]).aggregate([([], "count_all")]))
        return pa.table({"lang": g.column("lang"),
                         "n": g.column("count_all").cast(pa.int64())})

    ds = _docs(sf_dir, columns=["lang", "doc_id"])
    parts = ds.map_batches(count_partial,
                           batch_format="pyarrow").to_pandas()
    cols = {"lang": pd.Series(dtype="object"),
            "n_before": pd.Series(dtype="int64"),
            "n_kept": pd.Series(dtype="int64"),
            "p_keep": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    from .pairs import factorize_strings

    codes, uniq = factorize_strings(parts["lang"])
    cnt: dict = {}
    for c, nn in zip(codes, parts["n"].tolist()):
        cnt[uniq[c]] = cnt.get(uniq[c], 0) + nn
    tot = sum(cnt.values())
    L = len(cnt)
    TWO52 = 4503599627370496.0
    pk = {lg: min(1.0, (float(tot) / L) / n) for lg, n in cnt.items()}
    thr = {lg: int(np.floor(p * TWO52)) for lg, p in pk.items()}

    def kept_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.schema.names:
            return _E
        import pyarrow.compute as pc
        keep = pc.and_kleene(pc.is_valid(t.column("lang")),
                             pc.is_valid(t.column("doc_id")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        langs = t2.column("lang").to_pylist()
        ids = t2.column("doc_id").to_pylist()
        agg: dict = {}
        for lg, i in zip(langs, ids):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
            if h < thr[lg]:
                agg[lg] = agg.get(lg, 0) + 1
        if not agg:
            return _E
        return pa.table({"lang": pa.array(list(agg.keys()),
                                          pa.string()),
                         "n": pa.array(list(agg.values()),
                                       pa.int64())})

    kparts = ds.map_batches(kept_partial,
                            batch_format="pyarrow").to_pandas()
    kept: dict = {}
    if len(kparts):
        kc, ku = factorize_strings(kparts["lang"])
        for c, nn in zip(kc, kparts["n"].tolist()):
            kept[ku[c]] = kept.get(ku[c], 0) + nn
    langs = sorted(cnt.keys())
    return pd.DataFrame({
        "lang": pd.Series(langs, dtype=object),
        "n_before": pd.array([cnt[lg] for lg in langs], "int64"),
        "n_kept": pd.array([kept.get(lg, 0) for lg in langs],
                           "int64"),
        "p_keep": round_away(np.array([pk[lg] for lg in langs],
                                      np.float64), 6)})


def q_feature_hash_eval(sf_dir: str, B: int = 4096) -> pd.DataFrame:
    """Feature-hashing collision eval — before committing a hashing
    trick vectorizer, measure what a B-bucket table does to THIS
    corpus's vocabulary: distinct words, buckets actually used, the
    hottest bucket's load, and the collision share (words that lost
    their identity). The word exchange is q181's discipline
    (hash-partitioned on the word, so per-bucket distincts are
    global); each exchange bucket maps its words through the
    md5-prefix coin (q244/q297's cross-language-deterministic hash —
    never Python's salted ``hash``) into feature buckets and emits a
    (feature-bucket, count) partial; the driver folds a B-sized
    array. All outputs are exact ints but the one final share
    division. NULL/empty texts tokenize to nothing on both sides."""
    import hashlib

    from .pairs import hash_shuffle, round_away, str_u64

    P = 32

    _E = pa.table({"word": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        words = set()
        for txt in t.column("text").to_pylist():
            words.update(_TOKEN_RX.findall((txt or "").lower()))
        if not words:
            return _E
        w = sorted(words)
        b = np.array([str_u64(x) & (P - 1) for x in w], np.int64)
        return pa.table({"word": pa.array(w, pa.string()),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> np.ndarray:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        out = np.zeros(B, np.int64)
        if not live:
            return out
        words = set()
        for x in live:
            words.update(x.column("word").to_pylist())
        for w in words:    # distinct here IS global (word-keyed bucket)
            fb = int(hashlib.md5(w.encode()).hexdigest()[:13],
                     16) % B
            out[fb] += 1
        return out

    tagged = [(r, ()) for r in
              _docs(sf_dir, columns=["text"]).to_arrow_refs()]
    load = sum(hash_shuffle(tagged, split, merge, P=P))
    n_words = int(load.sum())
    n_used = int((load > 0).sum())
    if n_words == 0:                    # SQL ungrouped aggregates
        return pd.DataFrame({
            "n_words": pd.array([0], "int64"),
            "n_used": pd.array([0], "int64"),
            "max_load": np.array([np.nan]),  # NULL max → float64
            "collision_share": pd.array([np.nan], "float64")})
    return pd.DataFrame({
        "n_words": pd.array([n_words], "int64"),
        "n_used": pd.array([n_used], "int64"),
        "max_load": pd.array([int(load.max())], "int64"),
        "collision_share": round_away(np.array(
            [float(n_words - n_used) / n_words]), 6)})


def q_heaps_law(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law vocabulary growth curve — how many distinct word
    types the corpus has after its first c documents (by doc_id), at
    doubling checkpoints. The classic sequential scan becomes two
    embarrassingly-parallel folds: token counts are per-batch
    per-checkpoint sums, and the type curve rides the word-keyed
    exchange (q181 discipline) carrying each word's MIN doc_id — a
    word counts toward checkpoint c iff its first occurrence is
    below c, so per-bucket ``searchsorted`` over the sorted min-ids
    gives exact per-checkpoint type counts and the driver folds
    P × #checkpoints ints. Checkpoints past the corpus end report the
    full totals (SQL's filter semantics). NULL doc_id rows are out of
    contract; NULL texts tokenize to nothing."""
    import pyarrow.compute as pc

    from .pairs import hash_shuffle, str_u64

    CP = (125, 250, 500, 1000, 2000, 4000, 8000, 16000, 32000, 64000)
    P = 32

    _E = pa.table({"word": pa.array([], pa.string()),
                   "mind": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E, np.zeros(len(CP), np.int64)
        t2 = t.filter(pc.is_valid(t.column("doc_id")))
        if t2.num_rows == 0:
            return _E, np.zeros(len(CP), np.int64)
        ids = t2.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        toks = np.zeros(len(CP), np.int64)
        first: dict = {}
        for did, txt in zip(ids, t2.column("text").to_pylist()):
            ws = _TOKEN_RX.findall((txt or "").lower())
            for j, c in enumerate(CP):
                if did < c:
                    toks[j] += len(ws)
            for w in ws:
                old = first.get(w)
                if old is None or did < old:
                    first[w] = did
        if not first:
            return _E, toks
        w = sorted(first)
        b = np.array([str_u64(x) & (P - 1) for x in w], np.int64)
        return (pa.table({"word": pa.array(w, pa.string()),
                          "mind": pa.array(
                              [first[x] for x in w], pa.int64()),
                          "bucket": pa.array(b)}),
                toks)

    # hash_shuffle's split returns one table; carry the token partial
    # through a tiny driver-side accumulator instead (split runs in
    # tasks — so run the two folds as separate passes)
    tok_parts: list = []

    def split_words(t: pa.Table) -> pa.Table:
        tab, _ = split(t)
        return tab

    def merge(*tabs) -> np.ndarray:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return np.zeros(len(CP), np.int64)
        g = (pa.concat_tables(live).to_pandas()
             .groupby("word", sort=False)["mind"].min())
        mind = np.sort(g.to_numpy(np.int64))
        return np.searchsorted(mind, np.array(CP, np.int64),
                               side="left").astype(np.int64)

    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        _, toks = split(t)
        return pa.table({"j": pa.array(
            np.arange(len(CP), dtype=np.int64)),
            "n": pa.array(toks)})

    tp = ds.map_batches(tok_partial, batch_format="pyarrow").to_pandas()
    toks = np.zeros(len(CP), np.int64)
    if len(tp):
        np.add.at(toks, tp["j"].to_numpy(np.int64),
                  tp["n"].to_numpy(np.int64))
    types = sum(hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                             split_words, merge, P=P))
    types = np.asarray(types, np.int64) if np.ndim(types) \
        else np.zeros(len(CP), np.int64)
    return pd.DataFrame({
        "checkpoint": pd.array(list(CP), "int64"),
        "n_tokens": pd.array(toks.tolist(), "int64"),
        "n_types": pd.array(types.tolist(), "int64")})


def q_shuffle_quality(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Shuffle-quality eval — before training, verify the shuffled
    data order actually decorrelates source runs: the share of
    ADJACENT pairs sharing a source, in ingest order (by doc_id)
    versus after the deterministic md5(doc_id) shuffle (q244's coin).
    Adjacency is inherently sequential, but a global sort is not
    needed: both orders use an ORDER-PRESERVING RANGE exchange —
    doc_id ranges from a min/max pre-pass, md5 order by its first
    byte (uniform by construction) — so each bucket sorts locally,
    counts its within-bucket adjacent matches, and returns (count,
    n, first-source, last-source); the driver chains the P bucket
    boundaries in range order. Source NULLs compare SQL-style (NULL
    IS NOT DISTINCT FROM NULL) on NUL-safe codes. Exact ints; one
    division per rate. NULL doc_id rows are out of contract."""
    import hashlib

    import pyarrow.compute as pc

    from .pairs import factorize_strings, hash_shuffle, round_away

    _NULL = "\x00NULLSRC"
    _E = pa.table({"k1": pa.array([], pa.int64()),
                   "k2": pa.array([], pa.int64()),
                   "src": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    ds = _docs(sf_dir, columns=["doc_id", "source"])

    # pre-pass: doc_id min/max for the range split (tiny driver fold)
    def mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        v = t.filter(pc.is_valid(t.column("doc_id"))).column("doc_id")
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([pc.min(v).as_py()],
                                        pa.int64()),
                         "hi": pa.array([pc.max(v).as_py()],
                                        pa.int64())})

    mmf = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    cols = {"n": pd.Series(dtype="int64"),
            "same_adj_seq": pd.Series(dtype="int64"),
            "same_adj_shuf": pd.Series(dtype="int64"),
            "rate_seq": pd.Series(dtype="float64"),
            "rate_shuf": pd.Series(dtype="float64")}
    if not len(mmf) or mmf["lo"].isna().all():
        # SQL's ungrouped aggregate still emits one row on empty
        # (counts 0, 0/greatest(n,1) rates = 0.0)
        return pd.DataFrame({
            "n": pd.array([0], "int64"),
            "same_adj_seq": pd.array([0], "int64"),
            "same_adj_shuf": pd.array([0], "int64"),
            "rate_seq": pd.array([0.0], "float64"),
            "rate_shuf": pd.array([0.0], "float64")})
    lo, hi = int(mmf["lo"].min()), int(mmf["hi"].max())
    span = max(hi - lo + 1, 1)

    def split(t: pa.Table, mode: str) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("doc_id")))
        if t2.num_rows == 0:
            return _E
        ids = t2.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        src = pd.Series(t2.column("source").to_pylist(), dtype=object)
        keyed = src.where(src.isna(), "S" + src).fillna(_NULL)
        if mode == "seq":
            k1, k2 = ids, ids
            b = (ids - lo) * P // span           # ordered ranges
        else:
            h = np.array([int(hashlib.md5(str(i).encode())
                              .hexdigest()[:13], 16) for i in ids],
                         np.int64)
            k1, k2 = h, ids                      # (md5, id) order
            b = h * P >> 52                      # top bits = range
        return pa.table({"k1": pa.array(k1), "k2": pa.array(k2),
                         "src": pa.array(list(keyed), pa.string()),
                         "bucket": pa.array(b.astype(np.int64))})

    def merge(*tabs) -> tuple:
        live = [x for x in tabs if x.num_rows]
        if not live:
            return (-1, 0, 0, None, None)
        bid = int(live[0].column("bucket")[0].as_py())
        t = pa.concat_tables(
            [x.drop_columns(["bucket"]) for x in live]).to_pandas()
        t = t.sort_values(["k1", "k2"]).reset_index(drop=True)
        codes, _ = factorize_strings(t["src"], use_na_sentinel=False)
        same = int((codes[1:] == codes[:-1]).sum())
        return (bid, len(t), same, t["src"].iloc[0],
                t["src"].iloc[-1])

    def chain(parts) -> tuple:
        parts = sorted([p for p in parts if p[0] >= 0])
        n = sum(p[1] for p in parts)
        same = sum(p[2] for p in parts)
        for a, b in zip(parts[:-1], parts[1:]):
            if a[4] == b[3]:                    # boundary pair
                same += 1
        return n, same

    refs = ds.to_arrow_refs()
    n, same_seq = chain(hash_shuffle(
        [(r, ("seq",)) for r in refs], split, merge, P=P))
    n2, same_sh = chain(hash_shuffle(
        [(r, ("shuf",)) for r in refs], split, merge, P=P))
    if n == 0:
        return pd.DataFrame(cols)
    pairs = max(n - 1, 1)
    return pd.DataFrame({
        "n": pd.array([n], "int64"),
        "same_adj_seq": pd.array([same_seq], "int64"),
        "same_adj_shuf": pd.array([same_sh], "int64"),
        "rate_seq": round_away(
            np.array([same_seq / pairs], np.float64), 6),
        "rate_shuf": round_away(
            np.array([same_sh / pairs], np.float64), 6)})


def q_token_budget_mix(sf_dir: str) -> pd.DataFrame:
    """Greedy data-mixture selection under a token budget — the
    fractional-knapsack step of corpus curation: rank sources by
    English share (the quality proxy this corpus carries), then take
    whole sources in rank order until HALF the corpus's characters
    are spent, taking a partial slice of the boundary source. All
    quantities are exact ints (budget = Σchars // 2, takes are
    least/greatest clamps) except the one ranking ratio; rank ties
    break by source. One pass of per-batch per-source (chars, docs,
    en_docs) partials (NUL-safe codes), driver-side greedy over the
    source domain. NULL n_chars counts 0 chars; NULL source IS a
    group; NULL lang is simply not 'en'."""
    import pyarrow.compute as pc

    from .pairs import factorize_strings, round_away

    _E = pa.table({"src": pa.array([], pa.string()),
                   "chars": pa.array([], pa.int64()),
                   "docs": pa.array([], pa.int64()),
                   "en": pa.array([], pa.int64())})
    _NULL = "\x00NULLSRC"

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.schema.names:
            return _E
        ch = pc.fill_null(t.column("n_chars"), 0).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        en = pc.fill_null(pc.equal(t.column("lang"), "en"),
                          False).to_numpy(zero_copy_only=False)
        src = pd.Series(t.column("source").to_pylist(), dtype=object)
        keyed = src.where(src.isna(), "S" + src).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        k = len(uniq)
        chars = np.zeros(k, np.int64)
        np.add.at(chars, codes, ch)
        docs = np.bincount(codes, minlength=k).astype(np.int64)
        enc = np.zeros(k, np.int64)
        np.add.at(enc, codes, en.astype(np.int64))
        return pa.table({"src": pa.array(list(uniq), pa.string()),
                         "chars": pa.array(chars),
                         "docs": pa.array(docs),
                         "en": pa.array(enc)})

    parts = _docs(sf_dir, columns=["source", "lang", "n_chars"]
                  ).map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "rank": pd.Series(dtype="int64"),
            "en_share": pd.Series(dtype="float64"),
            "chars": pd.Series(dtype="int64"),
            "chars_taken": pd.Series(dtype="int64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"],
                                    use_na_sentinel=False)
    k = len(uniq)
    chars = [0] * k
    docs = [0] * k
    en = [0] * k
    for c, ch, d, e in zip(codes, parts["chars"].tolist(),
                           parts["docs"].tolist(),
                           parts["en"].tolist()):
        chars[c] += ch      # Python-int fold: exact
        docs[c] += d
        en[c] += e
    share = [float(en[i]) / docs[i] for i in range(k)]
    # rank: share DESC, source ASC (NULL last, SQL default)
    order = sorted(range(k),
                   key=lambda i: (-share[i], uniq[i] == _NULL,
                                  uniq[i]))
    budget = sum(chars) // 2
    out, cum_before = [], 0
    for r, i in enumerate(order, start=1):
        if cum_before >= budget:     # SQL: WHERE cum_before < budget
            break
        take = min(chars[i], budget - cum_before)
        key = uniq[i]
        out.append((None if key == _NULL else key[1:], r, share[i],
                    chars[i], take))
        cum_before += chars[i]
    return pd.DataFrame({
        "source": pd.Series([o[0] for o in out], dtype=object),
        "rank": pd.array([o[1] for o in out], "int64"),
        "en_share": round_away(
            np.array([o[2] for o in out], np.float64), 6),
        "chars": pd.array([o[3] for o in out], "int64"),
        "chars_taken": pd.array([o[4] for o in out], "int64")})


def q_length_quantile_report(sf_dir: str) -> pd.DataFrame:
    """Per-source document-length quantile report with POOLED
    context — the quantile-normalization table a cross-source length
    harmonizer starts from: each source's exact p25/p50/p75 of
    n_chars (quantile_disc rank rule ceil(p·n)−1, q99/q274) plus the
    pooled percentile rank of the source median (share of ALL
    lengths strictly below it — an exact-int count ratio, so a
    source that skews long is visible at a glance). One exchange of
    per-batch (source, n_chars, count) combiners partitioned on the
    LENGTH value (so pooled below-counts per distinct length are
    global per bucket); the driver folds the distinct-length domain
    per source. NULL n_chars drops; NULL source IS a group."""
    import pyarrow.compute as pc

    from .pairs import factorize_strings, hash_shuffle, round_away

    P = 16
    _NULL = "\x00NULLSRC"
    _E = pa.table({"src": pa.array([], pa.string()),
                   "v": pa.array([], pa.int64()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_chars" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("n_chars")))
        if t2.num_rows == 0:
            return _E
        x = t2.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        src = pd.Series(t2.column("source").to_pylist(), dtype=object)
        keyed = src.where(src.isna(), "S" + src).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        g = (pd.DataFrame({"sc": codes, "v": x})
             .groupby(["sc", "v"], sort=False).size()
             .reset_index(name="c"))
        return pa.table({
            "src": pa.array([uniq[i] for i in g["sc"]], pa.string()),
            "v": pa.array(g["v"].to_numpy(np.int64)),
            "c": pa.array(g["c"].to_numpy(np.int64)),
            "bucket": pa.array(
                np.abs(g["v"].to_numpy(np.int64)) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"src": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        df = pa.concat_tables(live).to_pandas()
        from .pairs import coded_keys

        cj, restore = coded_keys(df, ["src"])
        return restore(cj.groupby(["src", "v"], as_index=False)
                       ["c"].sum())

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in _docs(sf_dir,
                                columns=["source", "n_chars"])
         .to_arrow_refs()], split, merge, P=P) if len(p)]
    cols = {"source": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "p25": pd.Series(dtype="int64"),
            "p50": pd.Series(dtype="int64"),
            "p75": pd.Series(dtype="int64"),
            "pooled_rank_p50": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    codes, uniq = factorize_strings(df["src"], use_na_sentinel=False)
    df = df.assign(sc=codes)
    pooled = (df.groupby("v", as_index=False)["c"].sum()
              .sort_values("v").reset_index(drop=True))
    pv = pooled["v"].to_numpy(np.int64)
    pcum = np.cumsum(pooled["c"].to_numpy(np.int64))
    ntot = int(pcum[-1])
    out = []
    for sc in sorted(set(codes),
                     key=lambda i: (uniq[i] == _NULL, uniq[i])):
        sub = (df[df["sc"] == sc].groupby("v", as_index=False)
               ["c"].sum().sort_values("v"))
        v = sub["v"].to_numpy(np.int64)
        cum = np.cumsum(sub["c"].to_numpy(np.int64))
        n = int(cum[-1])
        qs = []
        for pq_ in (0.25, 0.5, 0.75):
            idx = int(np.ceil(pq_ * n)) - 1      # quantile_disc rule
            qs.append(int(v[np.searchsorted(cum, idx,
                                            side="right")]))
        med = qs[1]
        pos = np.searchsorted(pv, med, side="left")
        below = int(pcum[pos - 1]) if pos > 0 else 0
        key = uniq[sc]
        out.append((None if key == _NULL else key[1:], n,
                    qs[0], qs[1], qs[2], float(below) / ntot))
    return pd.DataFrame({
        "source": pd.Series([o[0] for o in out], dtype=object),
        "n": pd.array([o[1] for o in out], "int64"),
        "p25": pd.array([o[2] for o in out], "int64"),
        "p50": pd.array([o[3] for o in out], "int64"),
        "p75": pd.array([o[4] for o in out], "int64"),
        "pooled_rank_p50": round_away(
            np.array([o[5] for o in out], np.float64), 6)})


_EMAIL_RX = re.compile(r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}")
_PHONE_RX = re.compile(r"\d{3}[-.]\d{3}[-.]\d{4}")


def q_pii_rate(sf_dir: str) -> pd.DataFrame:
    """PII exposure rate per source — the redaction-priority report
    upstream of q77's scrubber: per source, how many documents
    contain an email or a phone pattern (both regexes probed for
    Python-re ↔ DuckDB-RE2 parity), and the per-1000-doc rates. One
    streamed pass of per-batch per-source int partials on NUL-safe
    codes; two divisions per source. NULL text matches nothing; NULL
    source IS a group."""
    from .pairs import factorize_strings, round_away

    _NULL = "\x00NULLSRC"
    _E = pa.table({"src": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "em": pa.array([], pa.int64()),
                   "ph": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        src = pd.Series(t.column("source").to_pylist(), dtype=object)
        keyed = src.where(src.isna(), "S" + src).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        k = len(uniq)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        em = np.zeros(k, np.int64)
        ph = np.zeros(k, np.int64)
        for c, txt in zip(codes, t.column("text").to_pylist()):
            if not txt:
                continue
            low = txt.lower()
            if _EMAIL_RX.search(low):
                em[c] += 1
            if _PHONE_RX.search(txt):
                ph[c] += 1
        return pa.table({"src": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "em": pa.array(em),
                         "ph": pa.array(ph)})

    parts = _docs(sf_dir, columns=["source", "text"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_email": pd.Series(dtype="int64"),
            "n_phone": pd.Series(dtype="int64"),
            "email_per_1k": pd.Series(dtype="float64"),
            "phone_per_1k": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"],
                                    use_na_sentinel=False)
    k = len(uniq)
    n = [0] * k
    em = [0] * k
    ph = [0] * k
    for c, a, b, d in zip(codes, parts["n"].tolist(),
                          parts["em"].tolist(),
                          parts["ph"].tolist()):
        n[c] += a
        em[c] += b
        ph[c] += d
    order = sorted(range(k), key=lambda i: (uniq[i] == _NULL,
                                            uniq[i]))
    return pd.DataFrame({
        "source": pd.Series(
            [None if uniq[i] == _NULL else uniq[i][1:]
             for i in order], dtype=object),
        "n_docs": pd.array([n[i] for i in order], "int64"),
        "n_email": pd.array([em[i] for i in order], "int64"),
        "n_phone": pd.array([ph[i] for i in order], "int64"),
        "email_per_1k": round_away(np.array(
            [1000.0 * em[i] / n[i] for i in order], np.float64), 6),
        "phone_per_1k": round_away(np.array(
            [1000.0 * ph[i] / n[i] for i in order], np.float64), 6)})


_SENT_RX = re.compile(r"[.!?]+")


def q_sentence_stats(sf_dir: str) -> pd.DataFrame:
    """Sentence-shape stats per language — the readability companion
    to q91: per lang, documents, sentence count (runs of [.!?]+, the
    regex mirrored in SQL), word count, and words-per-sentence. All
    counts exact ints from one streamed pass of per-batch per-lang
    partials; one division. NULL lang IS a group; NULL text counts a
    document with zero sentences/words."""
    from .pairs import factorize_strings, round_away

    _NULL = "\x00NULLLANG"
    _E = pa.table({"lang": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "s": pa.array([], pa.int64()),
                   "w": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        lg = pd.Series(t.column("lang").to_pylist(), dtype=object)
        keyed = lg.where(lg.isna(), "L" + lg).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        k = len(uniq)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        sc = np.zeros(k, np.int64)
        wc = np.zeros(k, np.int64)
        for c, txt in zip(codes, t.column("text").to_pylist()):
            if not txt:
                continue
            sc[c] += len(_SENT_RX.findall(txt))
            wc[c] += len(_TOKEN_RX.findall(txt.lower()))
        return pa.table({"lang": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "s": pa.array(sc),
                         "w": pa.array(wc)})

    parts = _docs(sf_dir, columns=["lang", "text"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    cols = {"lang": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_sentences": pd.Series(dtype="int64"),
            "n_words": pd.Series(dtype="int64"),
            "words_per_sentence": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["lang"],
                                    use_na_sentinel=False)
    k = len(uniq)
    n = [0] * k
    sc = [0] * k
    wc = [0] * k
    for c, a, b, d in zip(codes, parts["n"].tolist(),
                          parts["s"].tolist(), parts["w"].tolist()):
        n[c] += a
        sc[c] += b
        wc[c] += d
    order = sorted(range(k), key=lambda i: (uniq[i] == _NULL,
                                            uniq[i]))
    return pd.DataFrame({
        "lang": pd.Series([None if uniq[i] == _NULL else uniq[i][1:]
                           for i in order], dtype=object),
        "n_docs": pd.array([n[i] for i in order], "int64"),
        "n_sentences": pd.array([sc[i] for i in order], "int64"),
        "n_words": pd.array([wc[i] for i in order], "int64"),
        "words_per_sentence": round_away(np.array(
            [np.nan if sc[i] == 0 else float(wc[i]) / sc[i]
             for i in order], np.float64), 6)})


def q_nonascii_share(sf_dir: str) -> pd.DataFrame:
    """Non-ASCII character share per source — the multilingual-
    hygiene screen that separates genuinely non-English sources from
    mojibake floods: per source, total characters, non-ASCII
    characters (codepoints > 0x7F, parity probed against DuckDB's
    regexp_replace strip) and the share. One streamed pass of exact
    int partials on NUL-safe source codes; one division. NULL text
    contributes zero chars; NULL source IS a group."""
    from .pairs import factorize_strings, round_away

    _NULL = "\x00NULLSRC"
    _E = pa.table({"src": pa.array([], pa.string()),
                   "chars": pa.array([], pa.int64()),
                   "na": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        src = pd.Series(t.column("source").to_pylist(), dtype=object)
        keyed = src.where(src.isna(), "S" + src).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        k = len(uniq)
        ch = np.zeros(k, np.int64)
        na = np.zeros(k, np.int64)
        for c, txt in zip(codes, t.column("text").to_pylist()):
            if not txt:
                continue
            ch[c] += len(txt)
            na[c] += sum(1 for x in txt if ord(x) > 0x7F)
        return pa.table({"src": pa.array(list(uniq), pa.string()),
                         "chars": pa.array(ch), "na": pa.array(na)})

    parts = _docs(sf_dir, columns=["source", "text"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "n_chars": pd.Series(dtype="int64"),
            "n_nonascii": pd.Series(dtype="int64"),
            "nonascii_share": pd.Series(dtype="float64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"],
                                    use_na_sentinel=False)
    k = len(uniq)
    ch = [0] * k
    na = [0] * k
    for c, a, b in zip(codes, parts["chars"].tolist(),
                       parts["na"].tolist()):
        ch[c] += a
        na[c] += b
    order = sorted(range(k), key=lambda i: (uniq[i] == _NULL,
                                            uniq[i]))
    return pd.DataFrame({
        "source": pd.Series(
            [None if uniq[i] == _NULL else uniq[i][1:]
             for i in order], dtype=object),
        "n_chars": pd.array([ch[i] for i in order], "int64"),
        "n_nonascii": pd.array([na[i] for i in order], "int64"),
        "nonascii_share": round_away(np.array(
            [np.nan if ch[i] == 0 else float(na[i]) / ch[i]
             for i in order], np.float64), 6)})


def q_term_burstiness(sf_dir: str, k: int = 30) -> pd.DataFrame:
    """Term burstiness — collection frequency over document frequency
    for the top-k most frequent words: cf/df ≈ 1 marks an evenly
    sprinkled (function) word, large cf/df marks a bursty topical
    term that clumps in few documents (the Church–Gale signal TF-IDF
    misses). One word-keyed exchange of per-batch (word, cf, df)
    combiners (each bucket's totals are global); per-bucket local
    top-k by (cf DESC, word) and a driver fold of P·k rows. Exact
    ints, one division."""
    from .pairs import hash_shuffle, round_away, str_u64

    P = 32
    _E = pa.table({"word": pa.array([], pa.string()),
                   "cf": pa.array([], pa.int64()),
                   "df": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        cf: Counter = Counter()
        df: Counter = Counter()
        for txt in t.column("text").to_pylist():
            ws = _TOKEN_RX.findall((txt or "").lower())
            cf.update(ws)
            df.update(set(ws))
        if not cf:
            return _E
        w = sorted(cf)
        b = np.array([str_u64(x) & (P - 1) for x in w], np.int64)
        return pa.table({"word": pa.array(w, pa.string()),
                         "cf": pa.array([cf[x] for x in w],
                                        pa.int64()),
                         "df": pa.array([df[x] for x in w],
                                        pa.int64()),
                         "bucket": pa.array(b)})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"word": pd.Series(dtype="object"),
                "cf": pd.Series(dtype="int64"),
                "df": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        g = (pa.concat_tables(live).to_pandas()
             .groupby("word", as_index=False)[["cf", "df"]].sum())
        g = g.sort_values(["cf", "word"],
                          ascending=[False, True]).head(k)
        return g

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in _docs(sf_dir, columns=["text"])
         .to_arrow_refs()], split, merge, P=P) if len(p)]
    cols = {"word": pd.Series(dtype="object"),
            "cf": pd.Series(dtype="int64"),
            "df": pd.Series(dtype="int64"),
            "burstiness": pd.Series(dtype="float64")}
    if not parts:
        return pd.DataFrame(cols)
    g = (pd.concat(parts, ignore_index=True)
         .sort_values(["cf", "word"], ascending=[False, True])
         .head(k).reset_index(drop=True))
    return pd.DataFrame({
        "word": g["word"].astype(object),
        "cf": g["cf"].astype("int64"),
        "df": g["df"].astype("int64"),
        "burstiness": round_away(
            g["cf"].to_numpy(np.int64).astype(np.float64)
            / g["df"].to_numpy(np.int64), 6)})


def q_prefix_suggest(sf_dir: str, plen: int = 3,
                     min_count: int = 5) -> pd.DataFrame:
    """Autocomplete suggestion table: for every ``plen``-character
    prefix, the corpus's most frequent completion (count ties break
    lexicographically) — the search-suggest index built as one
    aggregation: (word, count) combiners ride the word-keyed
    exchange, each bucket re-keys its counts by prefix and emits
    per-prefix local argmax candidates... but a prefix spans MANY
    word buckets, so the bucket emits its per-prefix best and the
    driver takes the final argmax over P candidates per prefix —
    exactly-once because a word lives in one bucket and the final
    fold is associative. Counts exact; prefixes shorter than plen
    are their whole word. Suggestions below ``min_count`` drop."""
    from .pairs import hash_shuffle, str_u64

    P = 32
    _E = pa.table({"word": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        cf: Counter = Counter()
        for txt in t.column("text").to_pylist():
            cf.update(_TOKEN_RX.findall((txt or "").lower()))
        if not cf:
            return _E
        w = sorted(cf)
        return pa.table({"word": pa.array(w, pa.string()),
                         "c": pa.array([cf[x] for x in w],
                                       pa.int64()),
                         "bucket": pa.array(np.array(
                             [str_u64(x) & (P - 1) for x in w],
                             np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"prefix": pd.Series(dtype="object"),
                "word": pd.Series(dtype="object"),
                "c": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        g = (pa.concat_tables(live).to_pandas()
             .groupby("word", as_index=False)["c"].sum())
        g["prefix"] = g["word"].str[:plen]
        g = g.sort_values(["prefix", "c", "word"],
                          ascending=[True, False, True])
        return (g.groupby("prefix", as_index=False).head(1)
                [["prefix", "word", "c"]])

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in _docs(sf_dir, columns=["text"])
         .to_arrow_refs()], split, merge, P=P) if len(p)]
    cols = {"prefix": pd.Series(dtype="object"),
            "suggestion": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    df = pd.concat(parts, ignore_index=True)
    df = df.sort_values(["prefix", "c", "word"],
                        ascending=[True, False, True])
    best = df.groupby("prefix", as_index=False).head(1)
    best = best[best["c"] >= min_count]
    return pd.DataFrame({
        "prefix": best["prefix"].astype(object).to_numpy(),
        "suggestion": best["word"].astype(object).to_numpy(),
        "n": best["c"].astype("int64").to_numpy()}
    ).reset_index(drop=True)


_WS_RX = re.compile(r"[ \t\n\r\f\v]+")  # ASCII class == RE2 oracle


def q_contamination_13gram(sf_dir: str, k: int = 13,
                           P: int = 32) -> pd.DataFrame:
    """Benchmark decontamination screen — the standard LLM-corpus
    hygiene pass: flag training documents sharing any 13-token
    shingle with the held-out benchmark set (here the deterministic
    doc_id % 100 == 0 slice — np.fmod, SQL's truncated %). One hash
    exchange keyed on the shingle (str_u64 bucket): benchmark and
    candidate shingles co-locate, each bucket set-intersects on FULL
    shingle bytes (exact — no hash-collision false positives), and
    only flagged (doc_id, source) pairs leave the buckets; a doc
    flagged in several buckets dedups on its int key. Per-source
    totals ride a separate streamed partial pass. At 100 TB the
    exchange would ship 8-byte shingle hashes with an in-bucket
    byte-verify; at oracle scale the exact strings are the contract.
    Whitespace tokenization on the ASCII class only (Python-re ↔
    RE2 parity); docs with < 13 tokens have no shingles."""
    from .pairs import factorize_strings, hash_shuffle, round_away, \
        str_u64

    _NULL = "\x00NULLSRC"
    _E = pa.table({"gram": pa.array([], pa.string()),
                   "bench": pa.array([], pa.bool_()),
                   "doc": pa.array([], pa.int64()),
                   "src": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"doc_id", "text", "source"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.is_valid(t.column("doc_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        ids = t2.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        srcs = t2.column("source").to_pylist()
        texts = t2.column("text").to_pylist()
        grams, bench, docs, src_out = [], [], [], []
        for d, s, txt in zip(ids, srcs, texts):
            toks = [x for x in _WS_RX.split(txt or "") if x]
            if len(toks) < k:
                continue
            is_b = np.fmod(d, 100) == 0
            skey = _NULL if s is None else "S" + s
            seen = set()
            for i in range(len(toks) - k + 1):
                g = " ".join(toks[i:i + k])
                if g not in seen:
                    seen.add(g)
                    grams.append(g)
                    bench.append(bool(is_b))
                    docs.append(int(d))
                    src_out.append(skey)
        return pa.table({
            "gram": pa.array(grams, pa.string()),
            "bench": pa.array(bench, pa.bool_()),
            "doc": pa.array(docs, pa.int64()),
            "src": pa.array(src_out, pa.string()),
            "bucket": pa.array(np.array(
                [str_u64(g) & (P - 1) for g in grams], np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"doc": pd.Series(dtype="int64"),
                "src": pd.Series(dtype="object")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        bg = set(df.loc[df["bench"], "gram"])
        if not bg:
            return pd.DataFrame(cols)
        cand = df[~df["bench"] & df["gram"].isin(bg)]
        hit = cand.drop_duplicates("doc")  # int key — NUL-safe
        return pd.DataFrame({"doc": hit["doc"].to_numpy(np.int64),
                             "src": hit["src"].to_numpy(object)})

    ds = _docs(sf_dir, columns=["doc_id", "source", "text"])
    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]

    # per-source totals of the scored (non-benchmark) population
    def totals(t: pa.Table) -> pa.Table:
        _ET = pa.table({"src": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return _ET
        # keep ids INTEGER end-to-end (the >2^53 surrogate-key
        # contract): filter NULLs in Arrow, THEN to_numpy — a
        # null-bearing int64 column round-trips through float64 and
        # misclassifies non-representable ids between the scored and
        # benchmark populations (split() uses this same exact path)
        keep = pc.is_valid(t.column("doc_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _ET
        ids64 = t2.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nb = np.fmod(ids64, 100) != 0
        srcs = pd.Series(t2.column("source").to_pylist(),
                         dtype=object)[nb]
        keyed = srcs.where(srcs.isna(), "S" + srcs).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"src": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n)})

    tparts = ds.map_batches(totals, batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_contaminated": pd.Series(dtype="int64"),
            "rate": pd.Series(dtype="float64")}
    if not len(tparts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(tparts["src"],
                                    use_na_sentinel=False)
    tot = np.zeros(len(uniq), np.int64)
    np.add.at(tot, codes, tparts["n"].to_numpy(np.int64))
    cont = np.zeros(len(uniq), np.int64)
    if parts:
        hits = pd.concat(parts, ignore_index=True)
        hits = hits.drop_duplicates("doc")
        lut = {s: i for i, s in enumerate(uniq)}
        for s in hits["src"]:
            if s in lut:  # scored population only
                cont[lut[s]] += 1
    order = sorted(range(len(uniq)),
                   key=lambda i: (uniq[i] == _NULL, uniq[i]))
    order = [i for i in order if tot[i] > 0]
    return pd.DataFrame({
        "source": pd.Series(
            [None if uniq[i] == _NULL else uniq[i][1:]
             for i in order], dtype=object),
        "n_docs": pd.array([int(tot[i]) for i in order], "int64"),
        "n_contaminated": pd.array([int(cont[i]) for i in order],
                                   "int64"),
        "rate": round_away(np.array(
            [cont[i] / float(tot[i]) for i in order], np.float64),
            6)})


def q_repetition_ratio(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Within-document repetition screen (the Gopher-class quality
    rule): per source, the fraction of 3-gram occurrences that are
    repeats of an earlier 3-gram in the SAME document. Per-source
    rates are RATIO-OF-SUMS (Σdup / Σtotal — exact ints, one final
    division; a mean of per-doc float ratios would be order-sensitive
    in SQL), and the high-repetition doc count compares per-doc
    ratios by exact cross-multiplication (5·dup > total ↔ ratio >
    0.2). Pure streamed pass — per-doc work stays in its batch, only
    per-source int partials cross the wire, no shuffle at all. Docs
    with < 3 tokens are unscored; NULL source is a group; NULL
    doc_id is out of contract."""
    from .pairs import factorize_strings, round_away

    _NULL = "\x00NULLSRC"
    _E = pa.table({"src": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "tot": pa.array([], pa.int64()),
                   "dup": pa.array([], pa.int64()),
                   "hi": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        need = {"doc_id", "text", "source"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.is_valid(t.column("doc_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        src = pd.Series(t2.column("source").to_pylist(), dtype=object)
        keyed = src.where(src.isna(), "S" + src).fillna(_NULL)
        codes, uniq = factorize_strings(keyed, use_na_sentinel=False)
        m = len(uniq)
        n = np.zeros(m, np.int64)
        tot = np.zeros(m, np.int64)
        dup = np.zeros(m, np.int64)
        hi = np.zeros(m, np.int64)
        for c, txt in zip(codes, t2.column("text").to_pylist()):
            toks = [x for x in _WS_RX.split(txt or "") if x]
            t3 = len(toks) - k + 1
            if t3 < 1:
                continue
            seen = {" ".join(toks[i:i + k]) for i in range(t3)}
            d3 = t3 - len(seen)
            n[c] += 1
            tot[c] += t3
            dup[c] += d3
            hi[c] += int(5 * d3 > t3)
        return pa.table({"src": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "tot": pa.array(tot),
                         "dup": pa.array(dup), "hi": pa.array(hi)})

    parts = _docs(sf_dir, columns=["doc_id", "source", "text"]
                  ).map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "total_3grams": pd.Series(dtype="int64"),
            "dup_3grams": pd.Series(dtype="int64"),
            "dup_rate": pd.Series(dtype="float64"),
            "n_high_rep": pd.Series(dtype="int64")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"],
                                    use_na_sentinel=False)
    m = len(uniq)
    agg = np.zeros((m, 4), np.int64)
    for j, colname in enumerate(["n", "tot", "dup", "hi"]):
        np.add.at(agg[:, j], codes, parts[colname].to_numpy(np.int64))
    order = sorted(range(m), key=lambda i: (uniq[i] == _NULL,
                                            uniq[i]))
    order = [i for i in order if agg[i, 0] > 0]
    return pd.DataFrame({
        "source": pd.Series(
            [None if uniq[i] == _NULL else uniq[i][1:]
             for i in order], dtype=object),
        "n_docs": pd.array([int(agg[i, 0]) for i in order], "int64"),
        "total_3grams": pd.array([int(agg[i, 1]) for i in order],
                                 "int64"),
        "dup_3grams": pd.array([int(agg[i, 2]) for i in order],
                               "int64"),
        "dup_rate": round_away(np.array(
            [agg[i, 2] / float(agg[i, 1]) for i in order],
            np.float64), 6),
        "n_high_rep": pd.array([int(agg[i, 3]) for i in order],
                               "int64")})


def _corpus_df_stats(sf_dir: str, k: int = 3, P: int = 32):
    """Shared pass 1 of the IR pair (q376/q377): exact document
    frequencies via a token-keyed exchange with per-bucket top-k
    (the driver folds P·k rows, never the vocabulary), plus the
    corpus scalars (N docs, total token mass) from per-block
    partials. Tokenization is the q13 keyword contract (ASCII \\w,
    lowered, len>2, non-stopword) so the SQL twins share macros.
    Returns (terms, N, total_len) where terms is the top-k list of
    (token, df) by (df DESC, token ASC)."""
    from .pairs import hash_shuffle, str_u64

    _E = pa.table({"w": pa.array([], pa.string()),
                   "df": pa.array([], pa.int64()),
                   "nd": pa.array([], pa.int64()),
                   "tl": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        need = {"doc_id", "text"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.is_valid(t.column("doc_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        dfc: Counter = Counter()
        nd = 0
        tl = 0
        for txt in t2.column("text").to_pylist():
            nd += 1
            toks = _TOKEN_RX.findall((txt or "").lower())
            tl += len(toks)
            seen = {w for w in toks
                    if len(w) > 2 and w not in STOP_WORDS}
            dfc.update(seen)
        ws = list(dfc)
        if not ws:  # scalar-only partial (no eligible tokens)
            return pa.table({"w": pa.array([""], pa.string()),
                             "df": pa.array([0], pa.int64()),
                             "nd": pa.array([nd], pa.int64()),
                             "tl": pa.array([tl], pa.int64()),
                             "bucket": pa.array([0], pa.int64())})
        n = len(ws)
        # corpus scalars ride row 0 of each block's partial
        return pa.table({
            "w": pa.array(ws, pa.string()),
            "df": pa.array([dfc[w] for w in ws], pa.int64()),
            "nd": pa.array([nd] + [0] * (n - 1), pa.int64()),
            "tl": pa.array([tl] + [0] * (n - 1), pa.int64()),
            "bucket": pa.array([str_u64(w) & (P - 1) for w in ws],
                               pa.int64())})

    def merge(*tabs) -> tuple:
        live = [x for x in tabs if x.num_rows]
        if not live:
            return ((), 0, 0)
        df = pa.concat_tables(
            [x.drop_columns(["bucket"]) for x in live]).to_pandas()
        nd = int(df["nd"].sum())
        tl = int(df["tl"].sum())
        toks = df[(df["df"] > 0)]
        if len(toks):
            # hex keys — NUL-bearing tokens can't merge wrongly
            hx = toks["w"].map(
                lambda s: s.encode("utf-8", "surrogatepass").hex())
            g = (pd.DataFrame({"hx": hx,
                               "df": toks["df"].to_numpy(np.int64)})
                 .groupby("hx")["df"].sum())
            top = sorted(g.items(), key=lambda it: (-it[1], it[0]))[:k]
            top = tuple((bytes.fromhex(h).decode("utf-8",
                                                 "surrogatepass"),
                         int(c)) for h, c in top)
        else:
            top = ()
        return (top, nd, tl)

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    parts = hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                         split, merge, P=P)
    nd = sum(p[1] for p in parts)
    tl = sum(p[2] for p in parts)
    cand = [t for p in parts for t in p[0]]
    cand.sort(key=lambda it: (-it[1],
                              it[0].encode("utf-8",
                                           "surrogatepass").hex()))
    return cand[:k], nd, tl


def q_boolean_retrieval(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Conjunctive (AND) boolean retrieval over the corpus — search
    primitive: pick the k=3 highest-document-frequency keyword terms
    (deterministic tie order: df DESC, token bytes ASC), then count
    per source how many documents contain ALL of them. Pass 1 is the
    shared exact-df exchange (`_corpus_df_stats`); pass 2 broadcasts
    the 3 terms and streams per-source int partials — a membership
    test per doc, no exchange at all. NULL doc_id out of contract;
    NULL source is a group."""
    from .pairs import factorize_strings, round_away

    terms, nd, tl = _corpus_df_stats(sf_dir, k=k)
    tset = [t for t, _ in terms]
    _NULL = "\x00NULLSRC"
    _E = pa.table({"src": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64()),
                   "h": pa.array([], pa.int64())})

    def partial(t: pa.Table, want=tuple(tset)) -> pa.Table:
        need = {"doc_id", "text", "source"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.is_valid(t.column("doc_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        src = pd.Series(t2.column("source").to_pylist(), dtype=object)
        keyed = src.map(lambda s: _NULL if s is None
                        else "S" + s.encode("utf-8",
                                            "surrogatepass").hex())
        codes, uniq = pd.factorize(keyed)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        h = np.zeros(len(uniq), np.int64)
        for c, txt in zip(codes, t2.column("text").to_pylist()):
            toks = set(_TOKEN_RX.findall((txt or "").lower()))
            if want and all(w in toks for w in want):
                h[c] += 1
        return pa.table({"src": pa.array(list(uniq), pa.string()),
                         "n": pa.array(n), "h": pa.array(h)})

    parts = _docs(sf_dir, columns=["doc_id", "source", "text"]
                  ).map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_hits": pd.Series(dtype="int64"),
            "hit_rate": pd.Series(dtype="float64"),
            "terms": pd.Series(dtype="object")}
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"],
                                    use_na_sentinel=False)
    n = np.zeros(len(uniq), np.int64)
    h = np.zeros(len(uniq), np.int64)
    np.add.at(n, codes, parts["n"].to_numpy(np.int64))
    np.add.at(h, codes, parts["h"].to_numpy(np.int64))
    order = sorted(range(len(uniq)),
                   key=lambda i: (uniq[i] == _NULL, uniq[i]))
    order = [i for i in order if n[i] > 0]
    tstr = " ".join(tset) if tset else None
    return pd.DataFrame({
        "source": pd.Series(
            [None if uniq[i] == _NULL
             else bytes.fromhex(uniq[i][1:]).decode(
                 "utf-8", "surrogatepass") for i in order],
            dtype=object),
        "n_docs": pd.array([int(n[i]) for i in order], "int64"),
        "n_hits": pd.array([int(h[i]) for i in order], "int64"),
        "hit_rate": round_away(np.array(
            [h[i] / float(n[i]) for i in order], np.float64), 6),
        "terms": pd.Series([tstr] * len(order), dtype=object)})


def q_bm25_topk(sf_dir: str, k: int = 3, topn: int = 10,
                k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Okapi BM25 top-N retrieval for the corpus's own top-df keyword
    query — the ranked-search primitive over the same two-pass plan
    as q376: pass 1 exact df + corpus scalars, pass 2 broadcasts the
    scored terms and every block emits only its LOCAL top-N partial
    (the driver folds P·N rows — classic distributed top-k). The
    score is a FIXED 3-term expression in the deterministic term
    order (pivoted on both sides — no float aggregate of data-
    dependent width), mirrored op-for-op against the oracle:
    idf·(tf·(k1+1)) / (tf + k1·(1−b + b·dl/avgdl)); ln's last-ulp
    libm variation is continuous-valued → 6dp round. Ties break on
    doc_id; the ORDER BY binds to the ROUNDED score (q218 rule)."""
    from .pairs import round_away

    terms, nd, tl = _corpus_df_stats(sf_dir, k=k)
    cols = {"doc_id": pd.Series(dtype="int64"),
            "dl": pd.Series(dtype="int64"),
            "bm25": pd.Series(dtype="float64")}
    if not terms or nd == 0 or tl == 0:
        return pd.DataFrame(cols)
    avgdl = float(tl) / nd
    idfs = tuple(math.log(1.0 + (nd - dfv + 0.5) / (dfv + 0.5))
                 for _, dfv in terms)
    tws = tuple(t for t, _ in terms)

    _E = pa.table({"doc_id": pa.array([], pa.int64()),
                   "dl": pa.array([], pa.int64()),
                   "s": pa.array([], pa.float64())})

    def partial(t: pa.Table, want=tws, idf=idfs) -> pa.Table:
        need = {"doc_id", "text"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.is_valid(t.column("doc_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        ids = t2.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        out_id, out_dl, out_s = [], [], []
        for did, txt in zip(ids, t2.column("text").to_pylist()):
            toks = _TOKEN_RX.findall((txt or "").lower())
            dl = len(toks)
            cnt = Counter(toks)
            s = 0.0
            for w, iv in zip(want, idf):
                tf = cnt.get(w, 0)
                if tf > 0:
                    s += (iv * (tf * (k1 + 1.0))
                          / (tf + k1 * ((1.0 - b)
                                        + b * dl / avgdl)))
                else:
                    s += 0.0
            if s > 0:
                out_id.append(int(did))
                out_dl.append(dl)
                out_s.append(s)
        if not out_id:
            return _E
        df = pd.DataFrame({"doc_id": out_id, "dl": out_dl,
                           "s": out_s})
        df["r"] = round_away(df["s"].to_numpy(np.float64), 6)
        df = (df.sort_values("doc_id", kind="stable")
              .sort_values("r", kind="stable", ascending=False)
              .head(topn))
        return pa.table({"doc_id": pa.array(
            df["doc_id"].to_numpy(np.int64)),
            "dl": pa.array(df["dl"].to_numpy(np.int64)),
            "s": pa.array(df["s"].to_numpy(np.float64))})

    parts = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame(cols)
    parts = parts.copy()
    parts["r"] = round_away(parts["s"].to_numpy(np.float64), 6)
    parts = (parts.sort_values("doc_id", kind="stable")
             .sort_values("r", kind="stable", ascending=False)
             .head(topn))
    return pd.DataFrame({
        "doc_id": parts["doc_id"].to_numpy(np.int64),
        "dl": parts["dl"].to_numpy(np.int64),
        "bm25": parts["r"].to_numpy(np.float64)}).reset_index(
        drop=True)


_SYM_RX = re.compile(r"[^\w\t\n\f\r ]", re.ASCII)
# explicit class: Python ASCII \s includes \v, RE2 \s does not —
# spell the whitespace set out so both sides agree on every byte


def q_filter_verdicts(sf_dir: str) -> pd.DataFrame:
    """The composite C4/Gopher-style quality-filter pass — the
    keep/drop verdict table a training-corpus build runs per doc,
    with per-rule firing counts per source. Five rules, every one an
    EXACT integer test (cross-multiplied thresholds — no float ever):
      R1 size: n_tokens < 50 or > 100000 (ASCII \\w tokens, raw text)
      R2 shape: mean token length outside [3,10] ⇔
                3·n > chars or chars > 10·n
      R3 stopwords: 20·n_stop < n_tokens (q15's threshold shape)
      R4 repetition: duplicate 3-gram mass > 0.2 ⇔ 5·dup > total
                     (whitespace shingles, the q366 contract)
      R5 symbols: non-word-non-space chars > 10% ⇔ 10·sym > chars_all
    keep = no rule fired. One streamed pass of per-source int
    partials (per-doc work stays in its batch; no shuffle). NULL text
    fires R1 (0 tokens); NULL doc_id out of contract; NULL source is
    a group."""
    from .pairs import factorize_strings, round_away

    _NULL = "\x00NULLSRC"
    _E = pa.table({"src": pa.array([], pa.string())} | {
        c: pa.array([], pa.int64())
        for c in ("n", "k", "r1", "r2", "r3", "r4", "r5")})

    def partial(t: pa.Table) -> pa.Table:
        need = {"doc_id", "text", "source"}
        if t.num_rows == 0 or not need <= set(t.schema.names):
            return _E
        keep = pc.is_valid(t.column("doc_id"))
        t2 = t.filter(keep) if not pc.all(keep).as_py() else t
        if t2.num_rows == 0:
            return _E
        src = pd.Series(t2.column("source").to_pylist(), dtype=object)
        keyed = src.map(lambda s: _NULL if s is None
                        else "S" + s.encode("utf-8",
                                            "surrogatepass").hex())
        codes, uniq = pd.factorize(keyed)
        m = len(uniq)
        acc = np.zeros((m, 7), np.int64)  # n k r1..r5
        for c, txt in zip(codes, t2.column("text").to_pylist()):
            raw = txt or ""
            toks = _TOKEN_RX.findall(raw)
            n = len(toks)
            chars = sum(len(w) for w in toks)
            low = raw.lower()
            ltoks = _TOKEN_RX.findall(low)
            nstop = sum(1 for w in ltoks if w in STOP_WORDS)
            wtoks = [x for x in _WS_RX.split(raw) if x]
            t3 = len(wtoks) - 2
            dup = (t3 - len({" ".join(wtoks[i:i + 3])
                             for i in range(t3)})) if t3 >= 1 else 0
            tot3 = max(t3, 0)
            nsym = len(_SYM_RX.findall(raw))
            call = len(raw)
            r1 = n < 50 or n > 100000
            r2 = (3 * n > chars) or (chars > 10 * n)
            r3 = 20 * nstop < n
            r4 = 5 * dup > tot3
            r5 = 10 * nsym > call
            acc[c, 0] += 1
            fired = (r1, r2, r3, r4, r5)
            if not any(fired):
                acc[c, 1] += 1
            for j, f in enumerate(fired):
                if f:
                    acc[c, 2 + j] += 1
        return pa.table({"src": pa.array(list(uniq), pa.string())} | {
            nm: pa.array(acc[:, j])
            for j, nm in enumerate(("n", "k", "r1", "r2", "r3",
                                    "r4", "r5"))})

    parts = _docs(sf_dir, columns=["doc_id", "source", "text"]
                  ).map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    cols = {"source": pd.Series(dtype="object")} | {
        c: pd.Series(dtype="int64")
        for c in ("n_docs", "n_kept", "r1_size", "r2_shape",
                  "r3_stopword", "r4_repetition", "r5_symbol")}
    cols["keep_rate"] = pd.Series(dtype="float64")
    if not len(parts):
        return pd.DataFrame(cols)
    codes, uniq = factorize_strings(parts["src"],
                                    use_na_sentinel=False)
    m = len(uniq)
    acc = np.zeros((m, 7), np.int64)
    for j, nm in enumerate(("n", "k", "r1", "r2", "r3", "r4", "r5")):
        np.add.at(acc[:, j], codes, parts[nm].to_numpy(np.int64))
    order = sorted(range(m), key=lambda i: (uniq[i] == _NULL,
                                            uniq[i]))
    order = [i for i in order if acc[i, 0] > 0]
    out = {"source": pd.Series(
        [None if uniq[i] == _NULL
         else bytes.fromhex(uniq[i][1:]).decode("utf-8",
                                                "surrogatepass")
         for i in order], dtype=object)}
    for j, nm in enumerate(("n_docs", "n_kept", "r1_size",
                            "r2_shape", "r3_stopword",
                            "r4_repetition", "r5_symbol")):
        out[nm] = pd.array([int(acc[i, j]) for i in order], "int64")
    out["keep_rate"] = round_away(np.array(
        [acc[i, 1] / float(acc[i, 0]) for i in order],
        np.float64), 6)
    return pd.DataFrame(out)
