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


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Vectorized n-gram hashing: blake2b per UNIQUE token (cached per
    worker), polynomial combination over the shingle window — ~5× the
    throughput of hashing every shingle string."""
    toks = _TOKEN_RX.findall(text.lower())
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    p1, p2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)
    combined = th[:-2] * p1 + th[1:-1] * p2 + th[2:]  # wrapping uint64 mul/add
    return np.unique(combined % np.uint64(_MERSENNE))


def _shingles(text: str, n: int = 3) -> set[int]:
    return set(int(x) for x in _shingle_hashes(text, n))


def minhash_signature(text: str) -> np.ndarray:
    hv = _shingle_hashes(text)
    if hv.size == 0:
        return np.full(N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    # (a*x + b) mod p, vectorized over perms × shingles
    prod = (hv[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup groups: (content md5, keeper = min doc_id, group size).
    Hash-partition + per-group first (SURVEY.md §2.7 D3 engine policy)."""
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({"content_hash": pa.array(hs), "doc_id": batch.column("doc_id")})

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("content_hash").reset_index(drop=True)


def q_minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.5,
                        n_bands: int = N_BANDS,
                        rows_per_band: int = ROWS_PER_BAND) -> pd.DataFrame:
    """MinHash+LSH candidate generation + exact shingle-Jaccard verify.
    Returns (doc_a, doc_b, jaccard) pairs above threshold, doc_a < doc_b.
    Banding must be chosen for the threshold: candidate recall at
    jaccard j is 1-(1-j^rows_per_band)^n_bands. Non-SQL-expressible →
    rows-only driver check; invariants pytest'd."""
    import ray

    assert n_bands * rows_per_band <= N_PERM
    ds = _docs(sf_dir, ["doc_id", "text"])

    def bands(batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            sig = minhash_signature(t)
            for b in range(n_bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(d)
                band_ids.append(b)
                band_hashes.append(h)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes),
        })

    # Bucket pairing runs IN Ray with ONE coarse shuffle: band rows are
    # hash-partitioned on band_hash into ~P partitions (a (band_id,
    # band_hash) bucket never straddles partitions), and each partition
    # pairs ALL its buckets vectorized in one pandas self-merge — P
    # map_groups calls instead of one per bucket (most buckets are
    # singletons; per-group dispatch dominated the old wall time).
    # Only the candidate pair list (small by construction: docs sharing
    # a full band) reaches the driver.
    P = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        parts = [int(h[:4], 16) % P for h in batch.column("band_hash").to_pylist()]
        return batch.append_column("bucket", pa.array(parts, pa.int32()))

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["band_id", "band_hash", "doc_id"]].drop_duplicates()
        dup = g[g.duplicated(["band_id", "band_hash"], keep=False)]
        if dup.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        m = dup.merge(dup, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (m[["doc_id_x", "doc_id_y"]]
                .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
                .drop_duplicates())

    cand = (
        ds.map_batches(bands, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partition_pairs, batch_format="pandas")
        .to_pandas()  # candidate pairs only — never the band table
    )
    cand = cand.drop_duplicates(["doc_a", "doc_b"]).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    # verify: fetch ONLY the candidate docs' texts via a predicate-
    # pushdown read (semi-join of the parquet against the candidate ids),
    # then exact shingle-Jaccard on that small set.
    import pyarrow.dataset as pads

    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    doc_t = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        filter=pc.field("doc_id").isin(need), columns=["doc_id", "text"]
    )
    texts = dict(zip(doc_t.column("doc_id").to_pylist(),
                     doc_t.column("text").to_pylist()))
    sh = {d: _shingles(t) for d, t in texts.items()}
    jac = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh[a], sh[b]
        inter = len(sa & sb)
        union = len(sa | sb)
        jac.append(inter / union if union else 0.0)
    cand["jaccard"] = jac
    out = cand[cand["jaccard"] >= jaccard_threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash64(text: str) -> int:
    """64-bit SimHash. Vectorized: one cached blake2b per UNIQUE token
    (the shared ``_token_hash`` cache), then a single unpackbits + sum
    over the (n_tokens × 64) bit matrix — no per-token digest loop."""
    toks = _TOKEN_RX.findall(text.lower())
    if not toks:
        return 0
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    bytes_be = np.frombuffer(th.astype(">u8").tobytes(), dtype=np.uint8)
    bits = np.unpackbits(bytes_be.reshape(len(toks), 8), axis=1)
    acc = bits.astype(np.int64).sum(axis=0) * 2 - len(toks)
    val = int.from_bytes(np.packbits((acc > 0).astype(np.uint8)).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def phash_neardup_pairs_ds(ds, max_hamming: int = 10) -> pd.DataFrame:
    """Hamming-ball near-dup over 64-bit perceptual hashes (SURVEY.md
    §2.7 D4 stretch), streaming form: ``ds`` is a Ray Dataset with
    (image_id, phash) columns — typically a parquet read of the images
    table, never a driver-side list. Split each hash into 4×16-bit
    bands; near-dups (≤10 bits) almost surely collide in ≥1 band.
    Candidates = band-bucket groups; verify exact hamming inside
    map_groups. Only the (small) pair list reaches the driver."""

    def bands(batch: pa.Table) -> pa.Table:
        out_id, out_band, out_val, out_hash = [], [], [], []
        for iid, ph in zip(batch.column("image_id").to_pylist(),
                           batch.column("phash").to_pylist()):
            u = ph & 0xFFFFFFFFFFFFFFFF
            for b in range(4):
                out_id.append(iid)
                out_band.append(b)
                out_val.append((u >> (16 * b)) & 0xFFFF)
                out_hash.append(ph)
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "band": pa.array(out_band, pa.int32()),
            "val": pa.array(out_val, pa.int32()),
            "phash": pa.array(out_hash, pa.int64()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("image_id").sort_values("image_id")
        out = []
        items = list(zip(rows["image_id"], rows["phash"]))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                a, b = items[i], items[j]
                d = bin((a[1] ^ b[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= max_hamming:
                    out.append((a[0], b[0], d))
        if not out:
            return pd.DataFrame({"image_a": pd.Series(dtype="object"),
                                 "image_b": pd.Series(dtype="object"),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.DataFrame(out, columns=["image_a", "image_b", "hamming"])

    cand = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby(["band", "val"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"image_a": pd.Series(dtype="object"),
                             "image_b": pd.Series(dtype="object"),
                             "hamming": pd.Series(dtype="int64")})
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


def q_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash signature per document (int64, same convention as phash)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sig(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(vals, pa.int64())})

    return ds.map_batches(sig, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_dedup_corpus(sf_dir: str) -> pd.DataFrame:
    """The training-data op behind exact dedup: EMIT the deduplicated
    corpus (keep min doc_id per content hash). Keeper ids are a small
    aggregate → broadcast set → streaming membership filter; the corpus
    itself never leaves map_batches except as the final result."""
    import ray
    from ray.data.aggregate import Min

    ds = _docs(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest()
              for t in batch.column("text").to_pylist()]
        return pa.table({"content_hash": pa.array(hs),
                         "doc_id": batch.column("doc_id")})

    keepers = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep"))
        .to_pandas()["keep"]
    )
    kref = ray.put(frozenset(int(k) for k in keepers))

    def keep_only(batch: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        mask = [int(d) in ks for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask))

    out = ds.map_batches(keep_only, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """n-gram Jaccard near-dup as its own operator: banded-MinHash
    candidates + exact 3-gram-shingle Jaccard verify. The banding is
    REBANDED for the lower threshold — 32 bands × 2 rows gives
    candidate recall 1-(1-0.3²)^32 ≈ 0.95 at j=0.3 (q21's 16×4 family
    would catch only ~12% there); the verify step keeps the result
    exact on the candidate set either way."""
    return q_minhash_lsh_pairs(sf_dir, jaccard_threshold=threshold,
                               n_bands=32, rows_per_band=2)


def q_simhash_neardup(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-duplicate PAIRS over documents (the multi-table
    hamming-ball extension promised above): 4×16-bit banding of the
    64-bit signature — identical machinery to the phash near-dup path —
    candidates from band-bucket collisions, exact hamming verify.
    Returns (doc_a, doc_b, hamming), doc_a < doc_b."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sig(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "image_id": pa.array([str(d) for d in
                                  batch.column("doc_id").to_pylist()], pa.string()),
            "phash": pa.array(vals, pa.int64()),
        })

    pairs = phash_neardup_pairs_ds(
        ds.map_batches(sig, batch_format="pyarrow"), max_hamming)
    if pairs.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    out = pd.DataFrame({
        "doc_a": pairs["image_a"].astype("int64"),
        "doc_b": pairs["image_b"].astype("int64"),
        "hamming": pairs["hamming"].astype("int64"),
    })
    swap = out["doc_a"] > out["doc_b"]
    out.loc[swap, ["doc_a", "doc_b"]] = out.loc[swap, ["doc_b", "doc_a"]].values
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
