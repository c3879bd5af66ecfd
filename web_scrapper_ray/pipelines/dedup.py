"""Deduplication pipelines over the ``documents`` table (north-brief
training-data ops): exact content-hash dedup, MinHash+LSH near-dup,
SimHash, n-gram Jaccard verification.

Scale shapes:
* exact — hash column added vectorized, then ONE groupby(hash) shuffle;
* MinHash-LSH — shingle→minhash per batch (numpy), explode to
  (band_id, band_hash, doc_id) rows (16 bands × 4 rows/doc), groupby
  the band key, pairs within buckets, exact-Jaccard verify on the
  candidate set only (never all-pairs);
* SimHash — 64-bit signature per doc; near-dup = equal signature
  buckets (hamming-ball probing is the multi-table extension).

All hashing is blake2b-derived and deterministic (no Python hash()).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .pairs import factorize_strings, hash_shuffle, mix64
from .relational import _NULL_KEY, _with_cols

_TOKEN_RX = re.compile(r"\w+")
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int = N_PERM) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(42)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_A, _B = _perm_params()


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        if len(_TOKEN_HASH_CACHE) < 1_000_000:  # bounded per-worker cache
            _TOKEN_HASH_CACHE[tok] = h
    return h


def _shingle_hashes(text: str | None, n: int = 3) -> np.ndarray:
    """Vectorized n-gram hashing: blake2b per UNIQUE token (cached per
    worker), polynomial combination over the shingle window — ~5× the
    throughput of hashing every shingle string. NULL text = empty doc
    (no shingles), mirroring the textops NULL guards."""
    toks = _TOKEN_RX.findall((text or "").lower())
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    p1, p2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)
    combined = th[:-2] * p1 + th[1:-1] * p2 + th[2:]  # wrapping uint64 mul/add
    return np.unique(combined % np.uint64(_MERSENNE))


def _shingles(text: str, n: int = 3) -> set[int]:
    return set(int(x) for x in _shingle_hashes(text, n))


def _sig_from_hashes(hv: np.ndarray) -> np.ndarray:
    # (a*x + b) mod p, vectorized over perms × shingles
    prod = (hv[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def minhash_signature(text: str) -> np.ndarray:
    hv = _shingle_hashes(text)
    if hv.size == 0:
        return np.full(N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    return _sig_from_hashes(hv)


def _docs(sf_dir: str, columns=None):
    from .relational import _read

    return _read(sf_dir, "documents", columns)  # memoized read


def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup groups: (content md5, keeper = min doc_id, group size).
    Hash-partition + per-group first (SURVEY.md §2.7 D3 engine policy)."""
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir, ["doc_id", "text"])

    from .relational import _null_safe_keys, _restore_null_keys

    def add_hash(batch: pa.Table) -> pa.Table:
        # NULL text keeps SQL's md5(NULL) = NULL — its own group,
        # distinct from md5('') (rides the sentinel through groupby)
        hs = [None if t is None else hashlib.md5(t.encode()).hexdigest()
              for t in batch.column("text").to_pylist()]
        return pa.table({"content_hash": pa.array(hs, pa.string()),
                         "doc_id": batch.column("doc_id")})

    out = (
        _null_safe_keys(ds.map_batches(add_hash, batch_format="pyarrow"),
                        ["content_hash"])
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_docs"))
        .to_pandas()
    )
    out = _with_cols(out, {"content_hash": "object",
                           "keep_doc_id": "int64",
                           "n_docs": "int64"})
    out = _restore_null_keys(out, ["content_hash"])
    return out.sort_values("content_hash",
                           na_position="last").reset_index(drop=True)


def q_minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.5,
                        n_bands: int = N_BANDS,
                        rows_per_band: int = ROWS_PER_BAND) -> pd.DataFrame:
    """MinHash+LSH candidate generation + exact shingle-Jaccard verify.
    Returns (doc_a, doc_b, jaccard) pairs above threshold, doc_a < doc_b.
    Banding must be chosen for the threshold: candidate recall at
    jaccard j is 1-(1-j^rows_per_band)^n_bands. Non-SQL-expressible →
    rows-only driver check; invariants pytest'd."""
    assert n_bands * rows_per_band <= N_PERM
    ds = _docs(sf_dir, ["doc_id", "text"])

    # Bucket pairing is a raw-task hash shuffle (the phash-near-dup
    # exchange pattern): one split task per input block computes the
    # minhash bands AND partitions its (band_key, doc_id) rows into P
    # bucket slices; one pair task per bucket gathers its slices and
    # pairs all its buckets with one int64 self-merge. Identical data
    # movement to the old map_batches→groupby formulation, minus two
    # Dataset all-to-all executions' fixed cost; a (band, hash) bucket
    # never straddles partitions. Only the candidate pair list (small
    # by construction: docs sharing a full band) reaches the driver.
    P = 64
    # per-band 64-bit salts fold band_id into the blake-derived band
    # hash so one int column carries the whole merge key
    band_salt = mix64(np.arange(n_bands, dtype=np.uint64)
                      + np.uint64(0x9E3779B97F4A7C15))

    def band_rows(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:  # empty block → possibly empty schema
            return pa.table({"k": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        doc_ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        texts = block.column("text").to_pylist()
        n = len(doc_ids)
        keys = np.empty(n * n_bands, dtype=np.uint64)
        valid = np.ones(n * n_bands, dtype=bool)
        for i, t in enumerate(texts):
            hv = _shingle_hashes(t)
            if hv.size == 0:
                # <3 tokens → no shingles → Jaccard is 0 against
                # everything, so the doc can never verify as a pair;
                # emitting the all-sentinel signature instead would
                # collide EVERY short doc into one quadratic clique
                valid[i * n_bands:(i + 1) * n_bands] = False
                continue
            sig = _sig_from_hashes(hv)
            for b in range(n_bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                keys[i * n_bands + b] = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                    "big")
        keys ^= np.tile(band_salt, n)
        docs = np.repeat(doc_ids.astype(np.int64), n_bands)
        keys, docs = keys[valid], docs[valid]
        return pa.table({
            "k": pa.array(keys.view(np.int64)),
            "doc_id": pa.array(docs),
            "bucket": pa.array((keys % np.uint64(P)).astype(np.int64)),
        })

    _EMPTY_CAND = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                "doc_b": pd.Series(dtype="int64")})

    def pair_fn(*tabs) -> pd.DataFrame:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return _EMPTY_CAND
        g = pa.concat_tables(live).to_pandas()
        dup = g[g.duplicated("k", keep=False)]
        if dup.empty:
            return _EMPTY_CAND
        m = dup.merge(dup, on="k")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (m[["doc_id_x", "doc_id_y"]]
                .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
                .drop_duplicates())

    refs = ds.to_arrow_refs()
    parts = [p for p in hash_shuffle([(r, ()) for r in refs],
                                     band_rows, pair_fn, P=P)
             if len(p)] if refs else []
    cand = (pd.concat(parts, ignore_index=True) if parts else _EMPTY_CAND)
    cand = cand.drop_duplicates(["doc_a", "doc_b"]).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    # verify IN Ray: the (small) pair list is broadcast; candidate docs
    # stream through a predicate-pushdown read and are replicated into
    # each pair-bucket that references them (replication factor = the
    # doc's distinct-bucket degree, ~1-2); each bucket shingles its own
    # docs and computes exact Jaccard for its pairs inside map_groups.
    # No driver-side shingling — the driver only round-trips id lists.
    out = _verify_pairs_jaccard(sf_dir, cand, jaccard_threshold)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _verify_pairs_jaccard(sf_dir: str, cand: pd.DataFrame,
                          jaccard_threshold: float) -> pd.DataFrame:
    """Distributed exact shingle-Jaccard verify over a candidate pair
    list (the MinHash-LSH / n-gram-Jaccard second stage). Work and
    memory scale with |candidates|, never with the corpus."""
    import ray.data as rd

    from .pairs import verify_pairs

    need = sorted(set(int(x) for x in cand["doc_a"])
                  | set(int(x) for x in cand["doc_b"]))
    docs_ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(need),
    )

    def payload(batch: pa.Table) -> tuple:
        return (batch.column("doc_id").to_numpy(zero_copy_only=False),
                batch.column("text").to_pylist())

    def verify(texts: dict, prs: np.ndarray) -> pd.DataFrame:
        sh = {d: _shingles(t) for d, t in texts.items()}
        rows = []
        for a, b in prs:
            sa, sb = sh[int(a)], sh[int(b)]
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 0.0
            if j >= jaccard_threshold:
                rows.append((int(a), int(b), j))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    return verify_pairs(docs_ds, cand[["doc_a", "doc_b"]].to_numpy(),
                        payload, verify, empty, payload_type=pa.string())


def simhash64(text: str) -> int:
    """64-bit SimHash. Vectorized: one cached blake2b per UNIQUE token
    (the shared ``_token_hash`` cache), then a single unpackbits + sum
    over the (n_tokens × 64) bit matrix — no per-token digest loop.
    NULL text hashes like the empty string (0)."""
    toks = _TOKEN_RX.findall((text or "").lower())
    if not toks:
        return 0
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    bytes_be = np.frombuffer(th.astype(">u8").tobytes(), dtype=np.uint8)
    bits = np.unpackbits(bytes_be.reshape(len(toks), 8), axis=1)
    acc = bits.astype(np.int64).sum(axis=0) * 2 - len(toks)
    val = int.from_bytes(np.packbits((acc > 0).astype(np.uint8)).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


N_HBANDS = 4  # 4 × 16-bit bands of the 64-bit hash

# 256-entry popcount LUT → vectorized hamming over int64 columns
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.int64).view(np.uint64) ^ b.astype(np.int64).view(np.uint64))
    return _POPCNT8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def _probe_masks(radius: int) -> np.ndarray:
    """All 16-bit masks with popcount ≤ radius (the symmetric probe
    ball). radius 0 → 1 mask, 1 → 17, 2 → 137."""
    masks = [0]
    if radius >= 1:
        masks += [1 << i for i in range(16)]
    if radius >= 2:
        masks += [(1 << i) | (1 << j)
                  for i in range(16) for j in range(i + 1, 16)]
    if radius >= 3:
        raise NotImplementedError(
            "hamming-ball banding supports max_hamming <= 19 "
            "(4 bands x radius-2 probing); larger radii need more bands")
    return np.array(masks, dtype=np.uint32)


def _probe_radius(max_hamming: int) -> int:
    """Smallest symmetric probe radius with GUARANTEED candidate
    generation: pigeonhole gives min-band-distance ≤ floor(d/4) for any
    pair at hamming d, and two radius-r balls intersect iff their
    centers are ≤ 2r apart — so r = ceil(floor(max_hamming/4)/2)."""
    return -(-(max_hamming // N_HBANDS) // 2)


def phash_neardup_pairs_ds(ds, max_hamming: int = 10,
                           as_refs: bool = False):
    """Hamming-ball near-dup over 64-bit perceptual hashes (SURVEY.md
    §2.7 D4 stretch), streaming form: ``ds`` is a Ray Dataset with
    (image_id, phash) columns — typically a parquet read of the images
    table, never a driver-side list.

    EXACT result (recall 1.0) via multi-index probing [Norouzi et al.,
    "Fast Search in Hamming Space with Multi-Index Hashing"]: split the
    hash into 4×16-bit bands; by pigeonhole a pair at hamming d ≤
    max_hamming agrees to within floor(d/4) bits in SOME band, and both
    sides emitting every band value within the radius-r probe ball
    (r = ceil(floor(max_hamming/4)/2), so 2r ≥ floor(max_hamming/4))
    guarantees a shared (band, probed_val) bucket. Exact-band-only
    banding (the r=0 special case) is only sound for max_hamming ≤ 3.
    Candidates are verified with exact vectorized hamming; buckets are
    coarsened into ~P hash partitions so pairing is one pandas
    self-merge per partition, not one dispatch per bucket. Only the
    (small) pair list reaches the driver.

    The exchange is a raw-task hash shuffle (split tasks emit P
    bucket-slices per input block; one pair task per bucket gathers its
    slices): identical data movement to ``groupby(bucket)`` but without
    the Ray Data sort-based all-to-all, whose fixed coordination cost
    (~4s in local mode at any size) dominates this operator's tiny
    int-only intermediate. At cluster scale it is the same one-exchange
    pattern the wave crawl uses for its refs layout."""
    radius = _probe_radius(max_hamming)
    masks = _probe_masks(radius)
    m = len(masks)
    P = 64

    def bands(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # empty blocks out of a lazy upstream map can carry an
            # EMPTY schema — never touch columns before this guard
            return pa.table({"image_id": pa.array([], pa.string()),
                             "band": pa.array([], pa.int32()),
                             "val": pa.array([], pa.int32()),
                             "phash": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        ph = batch.column("phash").to_numpy(zero_copy_only=False)
        n = len(ids)
        u = ph.astype(np.int64).view(np.uint64)
        band_vals = np.stack(
            [(u >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(N_HBANDS)],
            axis=1,
        ).astype(np.uint32)                       # (n, 4)
        probed = band_vals[:, :, None] ^ masks[None, None, :]   # (n, 4, m)
        out_band = np.tile(np.repeat(np.arange(N_HBANDS, dtype=np.int32), m), n)
        out_val = probed.reshape(-1).astype(np.int32)
        key = (out_band.astype(np.uint64) << np.uint64(32)) | out_val.astype(np.uint64)
        bucket = (mix64(key) % np.uint64(P)).astype(np.int32)
        return pa.table({
            "image_id": pa.array(np.repeat(ids, N_HBANDS * m)),
            "band": pa.array(out_band),
            "val": pa.array(out_val),
            "phash": pa.array(np.repeat(ph, N_HBANDS * m).astype("int64")),
            "bucket": pa.array(bucket),
        })

    _EMPTY = pd.DataFrame({"image_a": pd.Series(dtype="str"),
                           "image_b": pd.Series(dtype="str"),
                           "hamming": pd.Series(dtype="int64")})

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # int-only hot path: probe buckets of clustered hashes overlap
        # heavily (a close pair shares up to 17 probed buckets), so the
        # self-merge can be tens of millions of rows — factorize string
        # ids to int codes and merge on ONE int64 key; strings reappear
        # only for the (few) pairs that survive the hamming filter.
        codes, uniq = factorize_strings(g["image_id"])
        key = ((g["band"].to_numpy().astype(np.int64) << 16)
               | g["val"].to_numpy().astype(np.int64))
        df = pd.DataFrame({"k": key, "c": codes.astype(np.int64),
                           "h": g["phash"].to_numpy()})
        dup = df[df.duplicated("k", keep=False)]
        if dup.empty:
            return _EMPTY
        mm = dup.merge(dup, on="k")
        mm = mm[mm["c_x"] < mm["c_y"]]
        if mm.empty:
            return _EMPTY
        d = _hamming64(mm["h_x"].to_numpy(), mm["h_y"].to_numpy())
        keep = d <= max_hamming
        if not keep.any():
            return _EMPTY
        ca = mm["c_x"].to_numpy()[keep]
        cb = mm["c_y"].to_numpy()[keep]
        dd = d[keep]
        # collapse probe-bucket replicas of the same pair
        pk = ca * len(uniq) + cb
        _, first = np.unique(pk, return_index=True)
        ca, cb, dd = ca[first], cb[first], dd[first]
        ids = np.asarray(uniq)
        a, b = ids[ca], ids[cb]
        swap = a > b
        return pd.DataFrame({"image_a": np.where(swap, b, a),
                             "image_b": np.where(swap, a, b),
                             "hamming": dd})

    def pair_fn(*tabs) -> pd.DataFrame:
        live = [t for t in tabs if t.num_rows]
        if not live:
            return _EMPTY
        return partition_pairs(pa.concat_tables(live).to_pandas())

    refs = ds.to_arrow_refs()
    empty = pd.DataFrame({"image_a": pd.Series(dtype="object"),
                          "image_b": pd.Series(dtype="object"),
                          "hamming": pd.Series(dtype="int64")})
    if not refs:
        return [] if as_refs else empty
    if as_refs:
        # scale-safe handoff: per-bucket pair DataFrames stay in the
        # object store as ObjectRefs for a duplicate-tolerant consumer
        # (cc_min_label_refs) — a close pair shares up to 17 probe
        # buckets, so CROSS-bucket replicas remain; only the gathering
        # path below pays the global dedup
        return hash_shuffle([(r, ()) for r in refs], bands, pair_fn,
                            P=P, gather=False)
    parts = [p for p in hash_shuffle([(r, ()) for r in refs],
                                     bands, pair_fn, P=P) if len(p)]
    if not parts:
        return empty
    cand = pd.concat(parts, ignore_index=True)
    return (
        cand.drop_duplicates(["image_a", "image_b"])
        .sort_values(["image_a", "image_b"])
        .reset_index(drop=True)
    )


def phash_neardup_pairs(ids, phashes, max_hamming: int = 10) -> pd.DataFrame:
    """List-input convenience wrapper over :func:`phash_neardup_pairs_ds`
    (tests / small ad-hoc sets)."""
    import ray.data as rd

    table = pa.table({
        "image_id": pa.array(list(ids), pa.string()),
        "phash": pa.array(list(phashes), pa.int64()),
    })
    return phash_neardup_pairs_ds(rd.from_arrow(table), max_hamming)


def q_simhash_ds(sf_dir: str):
    """Dataset-returning core of q23 (the scale-safe per-row oracle
    contract: the signature table is corpus-sized — one row per
    document — so the gate streams it to parquet and count-checks it
    instead of riding ``to_pandas`` through the driver; the VALUES
    have no SQL twin — blake2b token hashes — so the streamed check is
    count+schema, with exactness pytested against a sequential
    reference simhash)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sig(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(vals, pa.int64())})

    return ds.map_batches(sig, batch_format="pyarrow")


def q_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash signature per document (int64, same convention as phash)."""
    return _with_cols(
        q_simhash_ds(sf_dir).to_pandas(),
        {"doc_id": "int64", "simhash": "int64"}).sort_values(
        "doc_id").reset_index(drop=True)


def q_dedup_corpus_ds(sf_dir: str):
    """Dataset-returning core of q48 (the scale-safe per-row oracle
    contract): the deduplicated corpus IS the dataset — the gate
    streams it to parquet with ``Dataset.write_parquet`` and
    hash-compares against DuckDB over the files, so the result never
    transits the driver heap. Keeper selection happens INSIDE the one
    hash shuffle — no driver-side keeper set, no second corpus pass:
    rows carry (doc_id, text, content_hash), are coarsened into ~P
    hash partitions (a content_hash never straddles partitions), and
    each partition keeps its per-hash min-doc_id row with one
    vectorized sort + drop_duplicates. Scales as one all-to-all of
    the corpus."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    P = 64

    def add_hash(batch: pa.Table) -> pa.Table:
        # NULL text = SQL md5(NULL) = NULL: its own dedup group, keyed
        # by the shared NULL sentinel (distinct from every real md5 hex)
        hs = [_NULL_KEY if t is None
              else hashlib.md5(t.encode()).hexdigest()
              for t in batch.column("text").to_pylist()]
        buckets = pa.array([0 if h == _NULL_KEY else int(h[:8], 16) % P
                            for h in hs], pa.int32())
        return (batch.append_column("content_hash", pa.array(hs))
                     .append_column("bucket", buckets))

    def keep_min(g: pa.Table) -> pa.Table:
        # hashes are md5 hex / the NULL sentinel — no NULs, so the
        # bytewise Arrow sort and object-equality first-row mask are
        # exact; first row per hash after (hash, doc_id) sort = keeper
        order = pc.sort_indices(
            g, sort_keys=[("content_hash", "ascending"),
                          ("doc_id", "ascending")])
        g2 = g.take(order)
        h = g2.column("content_hash").to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], h[1:] != h[:-1]]) \
            if len(h) else np.zeros(0, bool)
        return g2.filter(pa.array(first)).select(["doc_id", "text"])

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(keep_min, batch_format="pyarrow"))


def q_dedup_corpus(sf_dir: str) -> pd.DataFrame:
    """Gathering wrapper over :func:`q_dedup_corpus_ds` — the driver's
    small-sf row-compare contract; corpus-scale consumers use the
    streamed ``_ds`` twin (perrow_queries)."""
    out = _with_cols(q_dedup_corpus_ds(sf_dir).to_pandas(),
                     {"doc_id": "int64", "text": "object"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_neardup_clusters_ds(sf_dir: str, max_hamming: int = 6):
    """Dataset-returning core of q53 — near-duplicate CLUSTERS, the
    unit real training-data dedup operates on (cluster near-dups
    transitively, keep one exemplar): connected components of the
    simhash near-dup graph at hamming ≤ ``max_hamming``. One row per
    doc: (doc_id, cluster_id, keep) with cluster_id = min doc_id of
    the component, keep = (doc_id == cluster_id) — chains A~B~C
    cluster together even when A≁C.

    Scale shape — NOTHING corpus-scale transits the driver: the pair
    list comes from the EXACT multi-probe banding (guaranteed recall)
    as per-bucket ObjectRefs straight out of the raw-task shuffle
    (``_simhash_pair_refs``), components are resolved by the
    distributed min-label propagation over those refs
    (``graph.cc_min_label_refs``: scatter-min tasks per bucket per
    round, pointer jumping on the O(|clustered docs|) label vector —
    no driver-side union-find, no driver-side edge list), and the
    resulting doc→cluster map — O(clustered docs), not O(corpus) — is
    broadcast once and applied to the corpus as a streaming vectorized
    map_batches. The per-doc RESULT streams through the parquet+hash
    gate contract (perrow_queries). Approximate upstream (simhash) →
    rows-only/count checks; transitivity pytest'd."""
    import ray

    from .graph import cc_min_label_refs

    refs = _SIMHASH_REF_MEMO.get((os.path.abspath(sf_dir),
                                  max_hamming))
    if refs is None:
        refs = _simhash_pair_refs(sf_dir, max_hamming)

    nodes, roots = cc_min_label_refs(refs)
    cref = ray.put((nodes, roots))

    ds = _docs(sf_dir, ["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        nd, rt = ray.get(cref)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        clusters = ids.copy()
        if len(nd):
            pos = np.searchsorted(nd, ids)
            pos_c = np.minimum(pos, len(nd) - 1)
            hitm = nd[pos_c] == ids
            clusters[hitm] = rt[pos_c[hitm]]
        return pa.table({
            "doc_id": pa.array(ids),
            "cluster_id": pa.array(clusters),
            "keep": pa.array(clusters == ids),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def q_neardup_clusters(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """Gathering wrapper over :func:`q_neardup_clusters_ds` (driver
    row-compare contract at small sf)."""
    out = _with_cols(
        q_neardup_clusters_ds(sf_dir, max_hamming).to_pandas(),
        {"doc_id": "int64", "cluster_id": "int64", "keep": "bool"})
    return out.sort_values("doc_id").reset_index(drop=True)


def phash_neardup_clusters_ds(ds, max_hamming: int = 10):
    """Transitive near-duplicate CLUSTERS over an (image_id, phash)
    Dataset — the IMAGE-corpus twin of q53 (cluster near-dups
    transitively, keep one exemplar): connected components of the
    exact multi-probe hamming-banding pair graph, exemplar = the
    lexicographically smallest image_id of the component (numpy
    byte-wise string order; crawl-corpus op, no SQL twin). Returns a
    Dataset of (image_id, cluster_id, keep) — one row per input image.

    Scale shape mirrors q53's: banding-shuffle pair buckets stay in
    the object store (``as_refs=True``), string ids are factorized to
    dense codes AGAINST the sorted clustered-id table (O(clustered
    images) on the driver — the same bound as the CC label vector;
    sorted table ⇒ min code IS the lexicographic min id), components
    resolve via ``cc_min_label_refs`` (contracted min-label rounds,
    no driver edge list), and the per-image assignment is one
    broadcast + streaming vectorized map_batches."""
    import ray

    from .graph import cc_min_label_refs

    futs = phash_neardup_pairs_ds(ds, max_hamming, as_refs=True)

    @ray.remote
    def part_ids(df: pd.DataFrame):
        if df is None or not len(df):
            return np.empty(0, object)
        return np.unique(np.concatenate(
            [df["image_a"].to_numpy(object),
             df["image_b"].to_numpy(object)]))

    ids = np.empty(0, object)
    for p in ray.get([part_ids.remote(f) for f in futs]):
        if len(p):
            ids = np.union1d(ids, p)
    tref = ray.put(ids)

    _EC = pa.table({"doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64())})

    @ray.remote
    def to_codes(df: pd.DataFrame, tab: np.ndarray) -> pa.Table:
        if df is None or not len(df):
            return _EC
        a = np.searchsorted(tab, df["image_a"].to_numpy(object))
        b = np.searchsorted(tab, df["image_b"].to_numpy(object))
        return pa.table({"doc_a": pa.array(a.astype(np.int64)),
                         "doc_b": pa.array(b.astype(np.int64))})

    nodes, roots = cc_min_label_refs(
        [to_codes.remote(f, tref) for f in futs])
    clus = ids.copy()
    if len(nodes):
        clus[nodes] = ids[roots]
    cref = ray.put((ids, clus))

    def assign(batch: pa.Table) -> pa.Table:
        tab, cl = ray.get(cref)
        iid = batch.column("image_id").to_numpy(
            zero_copy_only=False).astype(object)
        out = iid.copy()
        if len(tab):
            pos = np.searchsorted(tab, iid)
            posc = np.minimum(pos, len(tab) - 1)
            hit = tab[posc] == iid
            out[hit] = cl[posc[hit]]
        return pa.table({"image_id": pa.array(iid, pa.string()),
                         "cluster_id": pa.array(out, pa.string()),
                         "keep": pa.array((out == iid).astype(bool))})

    return ds.map_batches(assign, batch_format="pyarrow")


def q_ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """n-gram Jaccard near-dup as its own operator: banded-MinHash
    candidates + exact 3-gram-shingle Jaccard verify. The banding is
    REBANDED for the lower threshold — 32 bands × 2 rows gives
    candidate recall 1-(1-0.3²)^32 ≈ 0.95 at j=0.3 (q21's 16×4 family
    would catch only ~12% there); the verify step keeps the result
    exact on the candidate set either way."""
    return q_minhash_lsh_pairs(sf_dir, jaccard_threshold=threshold,
                               n_bands=32, rows_per_band=2)


_SIMHASH_REF_MEMO: dict = {}  # (sf_dir, h) → per-bucket pair-table ObjectRefs


def _simhash_pair_refs(sf_dir: str, max_hamming: int) -> list:
    """Per-bucket simhash near-dup PAIR TABLES as ObjectRefs — the
    edge-bucket handoff: signatures → multi-probe banding shuffle
    (``gather=False``) → one chained task per bucket converts the
    string ids back to int64 (doc_a < doc_b) IN the object store, so
    the pair list never transits the driver heap. Cross-bucket
    duplicate pairs remain by contract (a close pair shares up to 17
    probe buckets): consumers must be duplicate-tolerant
    (``cc_min_label_refs``'s scatter-min is idempotent; q51's
    gathering path pays the global dedup itself). PUBLISHES the refs
    per (sf_dir, max_hamming) — q53's transitive-closure layer
    consumes the published scan (pinned in the object store while the
    memo holds the refs) instead of re-running it; every direct call
    computes fresh so timings stay honest."""
    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])

    def sig(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "image_id": pa.array([str(d) for d in
                                  batch.column("doc_id").to_pylist()], pa.string()),
            "phash": pa.array(vals, pa.int64()),
        })

    futs = phash_neardup_pairs_ds(
        ds.map_batches(sig, batch_format="pyarrow"), max_hamming,
        as_refs=True)

    _EP = pa.table({"doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64())})

    @ray.remote
    def to_int(df: pd.DataFrame) -> pa.Table:
        if df is None or not len(df):
            return _EP
        # str(doc_id) → int64 is exact past 2^53 (string parse)
        a = df["image_a"].astype("int64").to_numpy()
        b = df["image_b"].astype("int64").to_numpy()
        h = df["hamming"].to_numpy(np.int64)
        swap = a > b  # pairing ordered by STRING id — reorder as ints
        return pa.table({"doc_a": pa.array(np.where(swap, b, a)),
                         "doc_b": pa.array(np.where(swap, a, b)),
                         "hamming": pa.array(h)})

    refs = [to_int.remote(f) for f in futs]
    _SIMHASH_REF_MEMO[(os.path.abspath(sf_dir), max_hamming)] = refs
    return refs


def q_simhash_neardup(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-duplicate PAIRS over documents (the multi-table
    hamming-ball extension promised above): multi-probe banding of the
    64-bit signature — identical machinery to the phash near-dup path —
    candidates from band-bucket collisions, exact hamming verify.
    Returns (doc_a, doc_b, hamming), doc_a < doc_b. The PAIR LIST is
    this query's result, so the driver gathers it (small by contract
    outside planted-clique worlds); the banding scan itself is
    published as object-store bucket refs (``_simhash_pair_refs``)
    for q53's transitive-closure layer."""
    import ray

    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "hamming": pd.Series(dtype="int64")})
    refs = _simhash_pair_refs(sf_dir, max_hamming)
    parts = [t for t in ray.get(refs) if t.num_rows]
    if not parts:
        return empty
    out = pa.concat_tables(parts).to_pandas()
    # cross-bucket probe replicas of the same pair: dedupe on the two
    # INT columns (NUL-safe by construction)
    out = (out.drop_duplicates(["doc_a", "doc_b"])
              .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    return _with_cols(out, {"doc_a": "int64", "doc_b": "int64",
                            "hamming": "int64"})


def _lev_banded(A: np.ndarray, B: np.ndarray, la: np.ndarray,
                lb: np.ndarray, d: int) -> np.ndarray:
    """Banded Levenshtein over PAIR ARRAYS: A/B are (n, L) uint8 byte
    matrices (rows zero-padded past their true lengths la/lb), d the
    distance budget. Returns the exact distance where it is <= d and
    a value > d otherwise — the classic |i-j| <= d band, vectorized
    ACROSS pairs (one (n,)-wide op per DP cell; 2d+1 cells per row),
    so cost is O(L·d) vector ops regardless of pair count."""
    INF = np.int32(127)
    n = A.shape[0]
    if n == 0:
        return np.empty(0, np.int32)
    width = 2 * d + 1
    L = int(la.max()) if n else 0
    prev = np.full((n, width), INF, np.int32)
    for k in range(d, width):
        j = k - d
        prev[:, k] = np.where(j <= lb, j, INF)
    ans = np.full(n, INF, np.int32)
    z = la == 0
    ans[z] = np.where(lb[z] <= d, lb[z], INF).astype(np.int32)
    for i in range(1, L + 1):
        cur = np.full((n, width), INF, np.int32)
        for k in range(width):
            j = i + k - d
            if j < 0 or j > int(lb.max()):
                continue
            valid = (j <= lb) & (i <= la)
            cand = np.full(n, INF, np.int32)
            if j == 0:
                cand[valid] = i
            else:
                cost = (A[:, i - 1] != B[:, j - 1]).astype(np.int32)
                cand = prev[:, k] + cost  # diagonal (i-1, j-1)
                if k + 1 < width:
                    cand = np.minimum(cand, prev[:, k + 1] + 1)
                if k - 1 >= 0:
                    cand = np.minimum(cand, cur[:, k - 1] + 1)
                cand = np.where(valid, cand, INF)
            cur[:, k] = np.minimum(cand, INF)
        hit = la == i
        if hit.any():
            kk = d + (lb - la)
            ok = hit & (kk >= 0) & (kk < width)
            ans[ok] = cur[ok, kk[ok]]
        prev = cur
    return ans


def q_sorted_neighborhood(sf_dir: str, w: int = 4, prefix: int = 32,
                          budget: int = 2) -> pd.DataFrame:
    """Sorted-neighborhood near-duplicate detection (SNM — the classic
    record-linkage blocking method the hash-based families above don't
    cover): documents sort globally by (32-codepoint text prefix,
    doc_id); each row compares against its next ``w`` neighbors in
    that order, and pairs whose prefix BYTES are within Levenshtein
    ``budget`` are emitted as (doc_a, doc_b, dist), doc_a the lower-
    RANK side like the oracle's ``b.rk > a.rk`` self-join.

    Distributed shape — the HALO pattern: ONE Dataset.sort (the only
    all-to-all; its output blocks concatenate in sort order), then one
    task per sorted block joined with a w-row halo stitched from the
    heads of the following blocks, so boundary pairs are counted
    exactly once (left side always in the owning block) and nothing
    but P·w halo rows moves after the sort. Levenshtein runs banded
    and pair-vectorized (``_lev_banded``); DuckDB's levenshtein counts
    BYTES (q105 rule), so the engine compares UTF-8 bytes of the same
    32-codepoint prefix the oracle's substr() takes. Arrow's string
    sort is bytewise like DuckDB's binary collation (probed — NUL and
    multi-byte safe). NULL text is out of contract on both sides."""
    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        E = pa.table({"doc_id": pa.array([], pa.int64()),
                      "key": pa.array([], pa.string())})
        if t.num_rows == 0 or "text" not in t.schema.names:
            return E
        t2 = t.filter(pc.is_valid(t.column("text")))
        if t2.num_rows == 0:
            return E
        return pa.table({
            "doc_id": pc.cast(t2.column("doc_id"), pa.int64()),
            "key": pc.utf8_slice_codeunits(t2.column("text"), 0,
                                           prefix)})

    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "dist": pd.Series(dtype="int64")})
    srt = (ds.map_batches(keyed, batch_format="pyarrow")
           .sort(["key", "doc_id"]).materialize())
    refs = srt.to_arrow_refs()

    @ray.remote
    def head(t: pa.Table, k: int) -> pa.Table:
        return t.slice(0, min(k, t.num_rows)).combine_chunks()

    heads = ray.get([head.remote(r, w) for r in refs])

    @ray.remote
    def block_pairs(t: pa.Table, halo: pa.Table, w: int, d: int):
        if t.num_rows == 0:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        ext = pa.concat_tables([t, halo]) if halo.num_rows else t
        ids = ext.column("doc_id").to_numpy(zero_copy_only=False)
        keys = ext.column("key").to_pandas().to_numpy(dtype=object)
        kb = [k.encode("utf-8", "surrogatepass") for k in keys]
        n_own = t.num_rows
        n_ext = len(ids)
        li, ri = [], []
        for off in range(1, w + 1):
            m = min(n_own, n_ext - off)
            if m <= 0:
                break
            li.append(np.arange(m, dtype=np.int64))
            ri.append(np.arange(m, dtype=np.int64) + off)
        if not li:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        li = np.concatenate(li)
        ri = np.concatenate(ri)
        # one byte matrix per EXT ROW (loop is row-bounded, pairs just
        # index into it)
        lens = np.asarray([len(b) for b in kb], np.int64)
        Lmax = int(lens.max()) if lens.size else 0
        mat = np.zeros((n_ext, max(Lmax, 1)), np.uint8)
        for r_, b in enumerate(kb):
            if b:
                mat[r_, :len(b)] = np.frombuffer(b, np.uint8)
        la, lb = lens[li], lens[ri]
        # cheap pre-filter: |len difference| > budget can't pass
        pre = np.abs(la - lb) <= d
        li, ri, la, lb = li[pre], ri[pre], la[pre], lb[pre]
        if li.size == 0:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        dist = _lev_banded(mat[li], mat[ri], la, lb, d)
        keep = dist <= d
        return pd.DataFrame({"doc_a": ids[li[keep]].astype(np.int64),
                             "doc_b": ids[ri[keep]].astype(np.int64),
                             "dist": dist[keep].astype(np.int64)})

    # halo for block i = first w rows of the CONCAT of the following
    # blocks (stitched from their heads — each non-empty head carries
    # up to w rows, so the first few suffice)
    E_HALO = pa.table({"doc_id": pa.array([], pa.int64()),
                      "key": pa.array([], pa.string())})
    outs = []
    for i, r in enumerate(refs):
        pieces, have = [], 0
        for h in heads[i + 1:]:
            if have >= w:
                break
            if h.num_rows:
                pieces.append(h)
                have += h.num_rows
        halo = (pa.concat_tables(pieces).slice(0, w).combine_chunks()
                if pieces else E_HALO)
        outs.append(block_pairs.remote(r, halo, w, budget))
    parts = [p for p in ray.get(outs) if len(p)]
    if not parts:
        return empty
    return (pd.concat(parts, ignore_index=True)
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def q_er_clusters(sf_dir: str, rounds: int = 8) -> pd.DataFrame:
    """Entity-resolution clustering over the sorted-neighborhood pair
    graph: every document touched by a q208 pair gets the MIN doc_id
    of its cluster after ``rounds`` synchronous min-label-propagation
    rounds — the link-then-cluster half of record linkage (q126's CC
    machinery applied to fuzzy-match edges). CONTRACT: exactly
    ``rounds`` rounds on both sides (oracle unrolls them; the engine
    early-exits only at the fixpoint); SNM clusters are tiny, so the
    bound is slack in practice. The pair list is output-bounded by
    construction, so the propagation runs vectorized on the fold —
    at cluster scale the same rounds run as q126's bucketed scatter."""
    pairs = q_sorted_neighborhood(sf_dir)
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "cluster_id": pd.Series(dtype="int64")})
    if pairs.empty:
        return empty
    a = pairs["doc_a"].to_numpy(np.int64)
    b = pairs["doc_b"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    lbl = nodes.copy()
    for _ in range(rounds):
        new = lbl.copy()
        m = np.minimum(lbl[ia], lbl[ib])
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        if (new == lbl).all():
            break  # fixpoint
        lbl = new
    return pd.DataFrame({"doc_id": nodes, "cluster_id": lbl})


def q_dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Curation dashboard metric: per SOURCE, how many docs share
    their exact text (md5) with at least one other doc anywhere in
    the corpus, and the resulting dup rate. One hash-keyed exchange:
    split emits (md5, source-code-as-string, count) combiner rows,
    each bucket resolves its hashes' GLOBAL dup flag (a hash lives in
    exactly one bucket) and returns per-source (n, n_dup) partials;
    the driver folds a source-domain-sized frame through
    ``factorize_strings`` (NUL-safe — fuzz plants 'fz'/'fz\\x00x'
    sources). NULL text hashes like SQL md5(NULL) = NULL — its own
    key, and NULL source IS a group."""
    P = 32

    _E = pa.table({"h": pa.array([], pa.string()),
                   "src": pa.array([], pa.string()),
                   "snull": pa.array([], pa.bool_()),
                   "n": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        texts = t.column("text").to_pylist()
        srcs = t.column("source").to_pylist()
        hs = ["\x00NULL" if x is None
              else hashlib.md5(x.encode()).hexdigest() for x in texts]
        key = pd.DataFrame({
            "h": pd.Series(hs, dtype=object),
            "src": pd.Series([s if s is not None else "" for s in srcs],
                             dtype=object),
            "snull": [s is None for s in srcs]})
        codes, uniq = factorize_strings(
            key["src"].where(~key["snull"].to_numpy(bool), None),
            use_na_sentinel=False)
        key = key.assign(sc=codes)
        g = key.groupby(["h", "sc"], as_index=False).agg(
            n=("snull", "size"), snull=("snull", "first"))
        uniq = [None if u is None or (isinstance(u, float)
                                      and np.isnan(u)) else u
                for u in uniq]
        srcv = [uniq[i] if uniq[i] is not None else "" for i in g["sc"]]
        hb = np.frombuffer(
            b"".join(h[:8].encode("utf-8", "surrogatepass").ljust(8)
                     [:8] for h in g["h"]), np.uint64)
        return pa.table({
            "h": pa.array(g["h"].tolist(), pa.string()),
            "src": pa.array(srcv, pa.string()),
            "snull": pa.array([uniq[i] is None for i in g["sc"]]),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "bucket": pa.array((mix64(hb) % np.uint64(P))
                               .astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"src": pd.Series(dtype="object"),
                "snull": pd.Series(dtype="bool"),
                "n": pd.Series(dtype="int64"),
                "n_dup": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        hcodes, _hu = factorize_strings(df["h"])
        tot = np.bincount(hcodes, weights=df["n"].to_numpy(np.float64))
        isdup = tot[hcodes] > 1
        key = df["src"].where(~df["snull"].to_numpy(bool), None)
        scodes, suniq = factorize_strings(key, use_na_sentinel=False)
        suniq = [None if u is None or (isinstance(u, float)
                                       and np.isnan(u)) else u
                 for u in suniq]
        nn = df["n"].to_numpy(np.int64)
        n = np.bincount(scodes, weights=nn, minlength=len(suniq))
        nd = np.bincount(scodes, weights=nn * isdup,
                         minlength=len(suniq))
        return pd.DataFrame({
            "src": pd.Series([u if u is not None else "" for u in suniq],
                             dtype=object),
            "snull": [u is None for u in suniq],
            "n": n.astype(np.int64), "n_dup": nd.astype(np.int64)})

    tagged = [(r, ()) for r in _docs(
        sf_dir, ["source", "text"]).to_arrow_refs()]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                          "n_docs": pd.Series(dtype="int64"),
                          "n_dup": pd.Series(dtype="int64"),
                          "dup_rate": pd.Series(dtype="float64")})
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    key = out["src"].where(~out["snull"].to_numpy(bool), None)
    codes, uniq = factorize_strings(key, use_na_sentinel=False)
    uniq = [None if u is None or (isinstance(u, float)
                                  and np.isnan(u)) else u
            for u in uniq]
    n = np.bincount(codes, weights=out["n"].to_numpy(np.float64),
                    minlength=len(uniq)).astype(np.int64)
    nd = np.bincount(codes, weights=out["n_dup"].to_numpy(np.float64),
                     minlength=len(uniq)).astype(np.int64)
    from .pairs import round_away
    res = pd.DataFrame({
        "source": pd.Series(list(uniq), dtype=object),
        "n_docs": n, "n_dup": nd,
        "dup_rate": round_away(nd / n, 6)})
    hexkey = res["source"].map(
        lambda x: "zz" if x is None
        else str(x).encode("utf-8", "surrogatepass").hex())
    return (res.iloc[np.argsort(hexkey.to_numpy())]
            .reset_index(drop=True))


def q_ttl_dedup(sf_dir: str, ttl_hours: int = 1) -> pd.DataFrame:
    """Streaming dedup with a TTL window — the stateful suppression
    rule every event collector runs: within each (user, event_type)
    key, an event is a DUPLICATE if the last KEPT event of that key is
    less than ``ttl_hours`` old; kept events reset the clock. This is
    a non-windowed recurrence (a suppressed event does NOT extend the
    TTL), so no SQL window expresses it — the hand-built chain pytest
    pins the semantics, including the case where a mid-burst event
    outlives the FIRST kept event and reopens the window.

    Distributed shape: one user exchange; each bucket orders its rows
    by (user, type-bytes, ts, event_id) and walks each key's timeline
    in JUMPS — ``searchsorted`` finds the next event past
    last_kept + TTL, so the Python loop iterates per KEPT event
    (bursts collapse), never per row. Returns per-type kept/suppressed
    counts. Contract: non-NULL user/ts; NULL type is its own key."""
    from .pairs import factorize_strings, hash_shuffle

    P = 16
    L = np.int64(ttl_hours) * 3_600_000_000

    _E = pa.table({"user": pa.array([], pa.int64()),
                   "us": pa.array([], pa.int64()),
                   "idf": pa.array([], pa.int64()),
                   "typ": pa.array([], pa.string()),
                   "tnull": pa.array([], pa.bool_()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return _E
        keep = pc.and_kleene(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts")))
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return _E
        uid = t2.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        typ = t2.column("event_type")
        return pa.table({
            "user": pa.array(uid),
            "us": pc.cast(t2.column("ts"), pa.int64()),
            "idf": pc.fill_null(pc.cast(t2.column("event_id"),
                                        pa.int64()),
                                np.iinfo(np.int64).max),
            "typ": pc.fill_null(typ, ""),
            "tnull": pc.is_null(typ),
            "bucket": pa.array(np.abs(uid) % P)})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"typ": pd.Series(dtype="object"),
                "tnull": pd.Series(dtype="bool"),
                "n_kept": pd.Series(dtype="int64"),
                "n_suppressed": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        key = df["typ"].where(~df["tnull"].to_numpy(bool), None)
        tcodes, tuniq = factorize_strings(key, use_na_sentinel=False)
        df = df.assign(tc=tcodes)
        order = np.lexsort((df["idf"].to_numpy(np.int64),
                            df["us"].to_numpy(np.int64),
                            df["tc"].to_numpy(np.int64),
                            df["user"].to_numpy(np.int64)))
        user = df["user"].to_numpy(np.int64)[order]
        tc = df["tc"].to_numpy(np.int64)[order]
        us = df["us"].to_numpy(np.int64)[order]
        seg = np.flatnonzero(np.concatenate(
            ([True], (user[1:] != user[:-1]) | (tc[1:] != tc[:-1]),
             [True])))
        kept = np.zeros(len(tuniq), np.int64)
        total = np.bincount(tc, minlength=len(tuniq)).astype(np.int64)
        for s, e in zip(seg[:-1], seg[1:]):
            t = us[s:e]
            i = 0
            k = 0
            while i < e - s:        # one iteration per KEPT event
                k += 1
                i = int(np.searchsorted(t, t[i] + L, side="left"))
            kept[tc[s]] += k
        tun = [None if u is None or (isinstance(u, float)
                                     and np.isnan(u)) else u
               for u in tuniq]
        return pd.DataFrame({
            "typ": pd.Series(tun, dtype=object),
            "tnull": [u is None for u in tun],
            "n_kept": kept,
            "n_suppressed": total - kept})

    tagged = [(r, ()) for r in _docs_like(sf_dir)]
    parts = [p for p in hash_shuffle(tagged, split, merge, P=P)
             if len(p)]
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_kept": pd.Series(dtype="int64"),
                          "n_suppressed": pd.Series(dtype="int64")})
    if not parts:
        return empty
    from .pairs import factorize_strings as _fs
    allp = pd.concat(parts, ignore_index=True)
    key = allp["typ"].where(~allp["tnull"].to_numpy(bool), None)
    codes, uniq = _fs(key, use_na_sentinel=False)
    uniq = [None if u is None or (isinstance(u, float)
                                  and np.isnan(u)) else u
            for u in uniq]
    nk = np.bincount(codes, weights=allp["n_kept"].to_numpy(
        np.float64), minlength=len(uniq)).astype(np.int64)
    ns = np.bincount(codes, weights=allp["n_suppressed"].to_numpy(
        np.float64), minlength=len(uniq)).astype(np.int64)
    res = pd.DataFrame({"event_type": pd.Series(list(uniq),
                                                dtype=object),
                        "n_kept": nk, "n_suppressed": ns})
    hexkey = res["event_type"].map(
        lambda x: "zz" if x is None
        else str(x).encode("utf-8", "surrogatepass").hex())
    return (res.iloc[np.argsort(hexkey.to_numpy())]
            .reset_index(drop=True))


def _docs_like(sf_dir: str):
    """Event block refs for the TTL dedup exchange."""
    return [(r) for r in _read_events(sf_dir)]


def _read_events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"]
    ).to_arrow_refs()


def q_minhash_accuracy(sf_dir: str) -> pd.DataFrame:
    """Sketch-accuracy eval for MinHash (q240's discipline applied to
    the similarity sketch): over q21's verified near-dup pairs,
    compare the 64-perm MinHash Jaccard ESTIMATE (matching-coordinate
    fraction) against the exact shingle Jaccard the verify step
    already computed — the calibration every LSH threshold choice
    rests on (σ ≈ √(j(1-j)/64) ≈ 0.06 at j=0.5). The pair list is
    output-bounded; the signatures come from ONE pushdown read of the
    candidate docs streamed through map_batches (never the corpus).
    Estimates are hash-deterministic → rows-only + error-bound
    pytest."""
    import pyarrow.dataset as pads
    import ray

    pairs = q_minhash_lsh_pairs(sf_dir)
    empty = pd.DataFrame({"n_pairs": pd.array([0], "int64"),
                          "mean_exact": pd.array([np.nan], "float64"),
                          "mean_est": pd.array([np.nan], "float64"),
                          "mean_abs_err": pd.array([np.nan],
                                                   "float64"),
                          "max_abs_err": pd.array([np.nan],
                                                  "float64")})
    if pairs.empty:
        return empty
    ids = np.unique(np.concatenate(
        [pairs["doc_a"].to_numpy(np.int64),
         pairs["doc_b"].to_numpy(np.int64)]))
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(ids.tolist()))

    def sigs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.uint64()))})
        out = [minhash_signature(x).tolist()
               for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "sig": pa.array(out, pa.list_(pa.uint64()))})

    import pyarrow.compute as pc

    stab = ds.map_batches(sigs, batch_format="pyarrow").to_pandas()
    smap = {int(d): np.asarray(s, np.uint64)
            for d, s in zip(stab["doc_id"], stab["sig"])}
    a = pairs["doc_a"].to_numpy(np.int64)
    b = pairs["doc_b"].to_numpy(np.int64)
    exact = pairs["jaccard"].to_numpy(np.float64)
    est = np.array([(smap[int(x)] == smap[int(y)]).mean()
                    for x, y in zip(a, b)])
    err = np.abs(est - exact)
    return pd.DataFrame({
        "n_pairs": pd.array([int(len(err))], "int64"),
        "mean_exact": np.round([exact.mean()], 6),
        "mean_est": np.round([est.mean()], 6),
        "mean_abs_err": np.round([err.mean()], 6),
        "max_abs_err": np.round([err.max()], 6)})


def pixel_dup_groups_ds(ds, P: int = 16) -> pd.DataFrame:
    """Exact pixel-content image dedup groups: decode each block's
    images ONCE inside the split task (bytes never re-shuffle —
    only 16-byte pixel hashes and ids cross the exchange), bucket by
    pixel-hash, and each bucket emits only hashes holding ≥ 2 images.
    Catches byte-different but pixel-identical payloads (re-encoded
    containers) that byte-level URL dedup and perceptual pHash
    grouping both miss-classify. Returns (pixel_hash, n, keep_image_id
    = min id)."""
    from ..stages.multimodal import PixelHash
    from .pairs import hash_shuffle, str_u64

    stage = PixelHash()
    _E = pa.table({"pixel_hash": pa.array([], pa.string()),
                   "image_id": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bytes" not in t.schema.names:
            return _E
        hashed = stage(t)
        hs = hashed.column("pixel_hash").to_pylist()
        return pa.table({
            "pixel_hash": hashed.column("pixel_hash"),
            "image_id": hashed.column("image_id").cast(pa.string()),
            "bucket": pa.array(
                np.array([str_u64(h) % P for h in hs], np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"pixel_hash": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "keep_image_id": pd.Series(dtype="object")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        g = df.groupby("pixel_hash")["image_id"]  # hex keys: NUL-free
        out = pd.DataFrame({"n": g.count(), "keep_image_id": g.min()})
        out = out[out["n"] >= 2].reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out[["pixel_hash", "n", "keep_image_id"]]

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    if not parts:
        return pd.DataFrame({"pixel_hash": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "keep_image_id": pd.Series(dtype="object")})
    return (pd.concat(parts, ignore_index=True)
            .sort_values("pixel_hash").reset_index(drop=True))


def tile_neardup_pairs_ds(ds, min_match: int = 12, grid: int = 4,
                          P: int = 16) -> pd.DataFrame:
    """Crop-localized near-dup image pairs: per-tile 64-bit pHashes
    (TilePHash stage, computed inside the split task — bytes never
    cross the exchange), one hash exchange keyed by (tile_idx,
    tile_hash), per-bucket pair generation within exact-collision
    groups, and a driver fold of per-pair match counts. A pair
    sharing ≥ ``min_match`` of the grid² tiles is a near-dup robust
    to LOCAL edits (logo swap, caption strip) that push a whole-image
    pHash outside its hamming ball. Collision groups are small by
    construction (exact 64-bit equality); a pathologically dup-heavy
    corpus bounds work by the same candidate-count contract as the
    q21 banding family."""
    from ..stages.multimodal import TilePHash
    from .pairs import hash_shuffle, mix64

    stage = TilePHash(grid=grid)
    _E = pa.table({"image_id": pa.array([], pa.string()),
                   "tile_idx": pa.array([], pa.int32()),
                   "tile_hash": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bytes" not in t.schema.names:
            return _E
        tiles = stage(t)
        th = tiles.column("tile_hash").to_numpy(zero_copy_only=False)
        ti = tiles.column("tile_idx").to_numpy(zero_copy_only=False)
        key = th.view(np.uint64) ^ (ti.astype(np.uint64)
                                    * np.uint64(0x9E3779B97F4A7C15))
        return pa.table({
            "image_id": tiles.column("image_id"),
            "tile_idx": tiles.column("tile_idx"),
            "tile_hash": tiles.column("tile_hash"),
            "bucket": pa.array((mix64(key) % np.uint64(P))
                               .astype(np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        cols = {"a": pd.Series(dtype="object"),
                "b": pd.Series(dtype="object"),
                "m": pd.Series(dtype="int64")}
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        pairs: dict = {}
        for _, g in df.groupby(["tile_idx", "tile_hash"],
                               sort=False):
            ids = sorted(g["image_id"].tolist())
            if len(ids) < 2:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    k = (ids[i], ids[j])
                    pairs[k] = pairs.get(k, 0) + 1
        if not pairs:
            return pd.DataFrame(cols)
        return pd.DataFrame(
            [{"a": a, "b": b, "m": m} for (a, b), m in pairs.items()])

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in ds.to_arrow_refs()], split, merge, P=P)
        if len(p)]
    cols = {"image_a": pd.Series(dtype="object"),
            "image_b": pd.Series(dtype="object"),
            "n_tiles": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    agg: dict = {}
    for p in parts:
        for a, b, m in zip(p["a"], p["b"], p["m"]):
            agg[(a, b)] = agg.get((a, b), 0) + int(m)
    rows = [{"image_a": a, "image_b": b, "n_tiles": m}
            for (a, b), m in agg.items() if m >= min_match]
    if not rows:
        return pd.DataFrame(cols)
    out = pd.DataFrame(rows)
    out["n_tiles"] = out["n_tiles"].astype(np.int64)
    return out.sort_values(["image_a", "image_b"]).reset_index(
        drop=True)


def _text_hash_sizes(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Exact-duplicate group sizes (non-NULL text, keyed on md5 —
    q20's content-identity rule): per-batch (hash, count) combiners →
    one hash exchange (same hash ⇒ same bucket, so bucket group
    sizes are global) → per-bucket size histogram; the driver folds
    P tiny (size, n_groups) frames. Shared by the blocking-quality
    eval (q314) and the dup-cluster census (q315)."""
    from .pairs import str_u64

    _E = pa.table({"h": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("text")))
        if t2.num_rows == 0:
            return _E
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in t2.column("text").to_pylist()]
        g = pd.Series(hs).value_counts()
        h = list(g.index)
        return pa.table({"h": pa.array(h, pa.string()),
                         "c": pa.array(g.to_numpy(np.int64)),
                         "bucket": pa.array(np.array(
                             [str_u64(x) & (P - 1) for x in h],
                             np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame({"size": pd.Series(dtype="int64"),
                                 "n_groups": pd.Series(dtype="int64")})
        g = (pa.concat_tables(live).to_pandas()
             .groupby("h")["c"].sum())
        u, n = np.unique(g.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"size": u,
                             "n_groups": n.astype(np.int64)})

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in _docs(sf_dir, ["text"]).to_arrow_refs()],
        split, merge, P=P) if len(p)]
    if not parts:
        return pd.DataFrame({"size": pd.Series(dtype="int64"),
                             "n_groups": pd.Series(dtype="int64")})
    return (pd.concat(parts, ignore_index=True)
            .groupby("size", as_index=False)["n_groups"].sum()
            .sort_values("size").reset_index(drop=True))


def q_dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Exact-duplicate cluster-size census — the first question after
    any dedup run: how big are the duplicate families (size ≥ 2) and
    how many singletons are there? One (hash, count) exchange
    (``_text_hash_sizes``); exact ints end-to-end."""
    g = _text_hash_sizes(sf_dir)
    return g


def q_blocking_quality(sf_dir: str, w: int = 4,
                       prefix: int = 32) -> pd.DataFrame:
    """Blocking-quality eval of the sorted-neighborhood method (q208)
    — the two numbers every record-linkage blocking scheme is judged
    by: REDUCTION RATIO (how much of the n²/2 comparison space the
    window avoids) and PAIR COMPLETENESS (what share of true
    duplicate pairs the window still catches). Truth = identical full
    text (Σ C(g,2) over q20's md5 groups, one hash exchange);
    candidates = q208's (prefix, doc_id) sort windows counted via the
    same ONE-sort + w-row-halo layout, with found-true tested by md5
    equality inside each window. All counts exact int64; two
    divisions. NULL text is out of contract (q208's rule)."""
    import ray

    from .pairs import round_away

    ds = _docs(sf_dir, ["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        E = pa.table({"doc_id": pa.array([], pa.int64()),
                      "key": pa.array([], pa.string()),
                      "h": pa.array([], pa.string())})
        if t.num_rows == 0 or "text" not in t.schema.names:
            return E
        t2 = t.filter(pc.is_valid(t.column("text")))
        if t2.num_rows == 0:
            return E
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in t2.column("text").to_pylist()]
        return pa.table({
            "doc_id": pc.cast(t2.column("doc_id"), pa.int64()),
            "key": pc.utf8_slice_codeunits(t2.column("text"), 0,
                                           prefix),
            "h": pa.array(hs, pa.string())})

    srt = (ds.map_batches(keyed, batch_format="pyarrow")
           .sort(["key", "doc_id"]).materialize())
    refs = srt.to_arrow_refs()
    tabs = ray.get(list(refs))
    sizes = [t.num_rows for t in tabs]
    n = int(sum(sizes))
    cols = {"n_docs": pd.Series(dtype="int64"),
            "total_pairs": pd.Series(dtype="int64"),
            "cand_pairs": pd.Series(dtype="int64"),
            "true_pairs": pd.Series(dtype="int64"),
            "found_true": pd.Series(dtype="int64"),
            "reduction_ratio": pd.Series(dtype="float64"),
            "pair_completeness": pd.Series(dtype="float64")}
    if n == 0:
        return pd.DataFrame(cols)

    # halo: each block sees the next w rows of the global order
    halos = []
    for i in range(len(tabs)):
        need, got = w, []
        for j in range(i + 1, len(tabs)):
            if need <= 0:
                break
            take = tabs[j].slice(0, min(need, tabs[j].num_rows))
            got.append(take)
            need -= take.num_rows
        halos.append(pa.concat_tables([tabs[i]] + got)
                     if got else tabs[i])

    @ray.remote
    def count_block(tab: pa.Table, own: int):
        if own == 0:
            return 0, 0
        h = np.array(tab.column("h").to_pylist(), dtype=object)
        m = len(h)
        i = np.arange(own, dtype=np.int64)
        cand = int(np.maximum(np.minimum(i + w, m - 1) - i, 0).sum())
        found = 0
        for d in range(1, w + 1):      # w shifted equality passes,
            if own + d > m:            # never a per-row loop
                lim = m - d
            else:
                lim = own
            if lim > 0:
                found += int((h[:lim] == h[d:d + lim]).sum())
        return cand, found

    outs = ray.get([count_block.remote(hl, sz)
                    for hl, sz in zip(halos, sizes)])
    cand = sum(o[0] for o in outs)
    found = sum(o[1] for o in outs)
    g = _text_hash_sizes(sf_dir)
    true_pairs = int(sum(int(s) * (int(s) - 1) // 2 * int(ng)
                         for s, ng in zip(g["size"], g["n_groups"])))
    total = n * (n - 1) // 2
    rr = np.nan if total == 0 else 1.0 - float(cand) / total
    pc_ = np.nan if true_pairs == 0 else float(found) / true_pairs
    return pd.DataFrame({
        "n_docs": pd.array([n], "int64"),
        "total_pairs": pd.array([total], "int64"),
        "cand_pairs": pd.array([cand], "int64"),
        "true_pairs": pd.array([true_pairs], "int64"),
        "found_true": pd.array([found], "int64"),
        "reduction_ratio": round_away(np.array([rr]), 6),
        "pair_completeness": round_away(np.array([pc_]), 6)})


def q_dedup_savings(sf_dir: str, P: int = 32) -> pd.DataFrame:
    """Exact-dedup savings report — the before/after sheet a dedup
    run is judged by: documents and characters before, after keeping
    ONE copy per identical text (q20's md5 identity), and the
    savings shares. One (hash, count, chars) exchange — copies of a
    text share its length, so the kept chars per group are just the
    group's char value; every number is an exact int and the two
    shares are one division each. NULL text is out of contract
    here (no bytes to save)."""
    from .pairs import hash_shuffle, round_away, str_u64

    _E = pa.table({"h": pa.array([], pa.string()),
                   "c": pa.array([], pa.int64()),
                   "ch": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("text")))
        if t2.num_rows == 0:
            return _E
        texts = t2.column("text").to_pylist()
        agg: dict = {}
        for x in texts:
            hx = hashlib.md5(x.encode()).hexdigest()
            cur = agg.get(hx)
            if cur is None:
                agg[hx] = [1, len(x)]
            else:
                cur[0] += 1
        h = sorted(agg)
        return pa.table({"h": pa.array(h, pa.string()),
                         "c": pa.array([agg[x][0] for x in h],
                                       pa.int64()),
                         "ch": pa.array([agg[x][1] for x in h],
                                        pa.int64()),
                         "bucket": pa.array(np.array(
                             [str_u64(x) & (P - 1) for x in h],
                             np.int64))})

    def merge(*tabs) -> np.ndarray:
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return np.zeros(4, np.int64)
        df = (pa.concat_tables(live).to_pandas()
              .groupby("h", as_index=False)
              .agg(c=("c", "sum"), ch=("ch", "first")))
        n_docs = int(df["c"].sum())
        n_groups = len(df)
        before = int((df["c"] * df["ch"]).sum())
        after = int(df["ch"].sum())
        return np.array([n_docs, n_groups, before, after], np.int64)

    ds = _docs(sf_dir, ["text"])
    tot = sum(hash_shuffle([(r, ()) for r in ds.to_arrow_refs()],
                           split, merge, P=P))
    nd, ng, cb, ca = ((int(x) for x in np.atleast_1d(tot)[:4])
                      if np.ndim(tot) else (0, 0, 0, 0))
    cols = {"n_docs": pd.Series(dtype="int64"),
            "n_kept": pd.Series(dtype="int64"),
            "chars_before": pd.Series(dtype="int64"),
            "chars_after": pd.Series(dtype="int64"),
            "doc_savings": pd.Series(dtype="float64"),
            "char_savings": pd.Series(dtype="float64")}
    if nd == 0:
        return pd.DataFrame(cols)
    return pd.DataFrame({
        "n_docs": pd.array([nd], "int64"),
        "n_kept": pd.array([ng], "int64"),
        "chars_before": pd.array([cb], "int64"),
        "chars_after": pd.array([ca], "int64"),
        "doc_savings": round_away(np.array(
            [float(nd - ng) / nd]), 6),
        "char_savings": round_away(np.array(
            [np.nan if cb == 0 else float(cb - ca) / cb]), 6)})


def q_cross_source_dups(sf_dir: str, k: int = 20,
                        P: int = 32) -> pd.DataFrame:
    """Cross-source duplicated content — which SOURCE PAIRS share
    identical documents (syndication / scraping-each-other signal;
    within-source dups are usually templates): per md5 text group,
    the distinct sources present; every unordered source pair in a
    group scores one shared document. One (hash → source set)
    exchange (q20's identity, hash-keyed so groups are global);
    buckets emit per-pair counts on NUL-safe coded names and the
    driver folds + ranks top-k (n DESC, pair ASC). NULL text out of
    contract; NULL source IS a source value."""
    from .pairs import factorize_strings, hash_shuffle, str_u64

    _NULL = "\x00NULLSRC"
    _E = pa.table({"h": pa.array([], pa.string()),
                   "src": pa.array([], pa.string()),
                   "bucket": pa.array([], pa.int64())})

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return _E
        t2 = t.filter(pc.is_valid(t.column("text")))
        if t2.num_rows == 0:
            return _E
        texts = t2.column("text").to_pylist()
        srcs = t2.column("source").to_pylist()
        seen = set()
        hs, ss = [], []
        for x, s_ in zip(texts, srcs):
            hx = hashlib.md5(x.encode()).hexdigest()
            key = _NULL if s_ is None else "S" + s_
            if (hx, key) not in seen:
                seen.add((hx, key))
                hs.append(hx)
                ss.append(key)
        return pa.table({"h": pa.array(hs, pa.string()),
                         "src": pa.array(ss, pa.string()),
                         "bucket": pa.array(np.array(
                             [str_u64(x) & (P - 1) for x in hs],
                             np.int64))})

    def merge(*tabs) -> pd.DataFrame:
        cols = {"sa": pd.Series(dtype="object"),
                "sb": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64")}
        live = [x.drop_columns(["bucket"]) for x in tabs if x.num_rows]
        if not live:
            return pd.DataFrame(cols)
        df = pa.concat_tables(live).to_pandas()
        codes, uniq = factorize_strings(df["src"])
        df = df.assign(sc=codes).drop_duplicates(["h", "sc"])
        cnt: dict = {}
        for _, sub in df.groupby("h")["sc"]:
            # orient pairs by NAME (byte order, matching SQL), not
            # by first-appearance code
            scs = sorted(set(sub.tolist()), key=lambda c: uniq[c])
            for i in range(len(scs)):
                for j in range(i + 1, len(scs)):
                    cnt[(scs[i], scs[j])] = \
                        cnt.get((scs[i], scs[j]), 0) + 1
        if not cnt:
            return pd.DataFrame(cols)
        rows = [(uniq[a], uniq[b], n)
                for (a, b), n in cnt.items()]
        return pd.DataFrame(rows, columns=["sa", "sb", "n"])

    parts = [p for p in hash_shuffle(
        [(r, ()) for r in _docs(sf_dir, ["source", "text"])
         .to_arrow_refs()], split, merge, P=P) if len(p)]
    cols = {"source_a": pd.Series(dtype="object"),
            "source_b": pd.Series(dtype="object"),
            "n_shared_docs": pd.Series(dtype="int64")}
    if not parts:
        return pd.DataFrame(cols)
    from .pairs import coded_keys

    df = pd.concat(parts, ignore_index=True)
    cj, restore = coded_keys(df, ["sa", "sb"])
    g = restore(cj.groupby(["sa", "sb"], as_index=False)["n"].sum())
    g = g.sort_values(["n", "sa", "sb"],
                      ascending=[False, True, True]).head(k)
    out_a = [None if x == _NULL else x[1:] for x in g["sa"]]
    out_b = [None if x == _NULL else x[1:] for x in g["sb"]]
    return pd.DataFrame({
        "source_a": pd.Series(out_a, dtype=object),
        "source_b": pd.Series(out_b, dtype=object),
        "n_shared_docs": g["n"].astype("int64").to_numpy()}
    ).reset_index(drop=True)


def q_phash_threshold_sweep(sf_dir: str,
                            thresholds: tuple = (0, 2, 4, 6, 8,
                                                 10),
                            images_dir: str | None = None
                            ) -> pd.DataFrame:
    """pHash-threshold tuning table — precision/recall of "hamming ≤
    t" near-dup prediction against PIXEL-identity ground truth, per
    threshold: the sheet that picks the production hamming radius.
    Runs over the crawl's image table (phash already a column; truth
    via the PixelHash stage once); the corpus is the crawl-images
    dimension, so the pair space is the documented exact all-pairs
    contract (banding is the scale path, q37). Exact pair counts;
    two divisions per threshold."""
    import ray.data as rd

    from .pairs import round_away
    from ..stages.multimodal import PixelHash
    from ..pipelines.crawl import ensure_tier_crawl

    if images_dir is None:
        images_dir = ensure_tier_crawl("t1")["images_dir"]
    ds = rd.read_parquet(images_dir, columns=["image_id", "bytes"])
    ph = ds.map_batches(PixelHash, batch_format="pyarrow",
                        batch_size=128, concurrency=2).to_pandas()
    meta = rd.read_parquet(images_dir,
                           columns=["image_id", "phash"]).to_pandas()
    df = meta.merge(ph, on="image_id")
    h = df["phash"].to_numpy(np.int64).view(np.uint64)
    codes, _ = pd.factorize(df["pixel_hash"])
    n = len(h)
    cols = {"threshold": pd.Series(dtype="int64"),
            "pred_pairs": pd.Series(dtype="int64"),
            "true_pairs": pd.Series(dtype="int64"),
            "tp": pd.Series(dtype="int64"),
            "precision": pd.Series(dtype="float64"),
            "recall": pd.Series(dtype="float64")}
    if n < 2:
        return pd.DataFrame(cols)
    POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1).astype(np.int64)
    hb = h.view(np.uint8).reshape(n, 8)
    rows = []
    true_total = 0
    # exact all-pairs over the dimension-sized image set (vectorized
    # per row) — hamming matrix folded into per-threshold counts
    ham_counts = np.zeros(65, np.int64)
    ham_counts_true = np.zeros(65, np.int64)
    for i in range(n - 1):
        d = POP[hb[i][None, :] ^ hb[i + 1:]].sum(axis=1)
        same = codes[i + 1:] == codes[i]
        np.add.at(ham_counts, d, 1)
        np.add.at(ham_counts_true, d[same], 1)
        true_total += int(same.sum())
    cum = np.cumsum(ham_counts)
    cum_t = np.cumsum(ham_counts_true)
    for t in thresholds:
        pred = int(cum[t])
        tp = int(cum_t[t])
        rows.append((t, pred, true_total, tp,
                     np.nan if pred == 0 else tp / pred,
                     np.nan if true_total == 0
                     else tp / true_total))
    out = pd.DataFrame(rows, columns=["threshold", "pred_pairs",
                                      "true_pairs", "tp",
                                      "precision", "recall"])
    out["precision"] = round_away(
        out["precision"].to_numpy(np.float64), 6)
    out["recall"] = round_away(out["recall"].to_numpy(np.float64), 6)
    for c in ("threshold", "pred_pairs", "true_pairs", "tp"):
        out[c] = out[c].astype("int64")
    return out
