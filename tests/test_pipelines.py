"""Dedup / similarity / text pipeline invariants over the sf0.001 tables
(the SQL-equivalence gate runs driver-side; these pin the non-SQL ops)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_finds_planted_duplicates(ray_session, tmp_path):
    """Plant exact+near duplicates in a parquet copy; LSH must recover
    them with exact-Jaccard verification."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.dedup import q_minhash_lsh_pairs

    base = pq.read_table(f"{SF}/documents.parquet").to_pylist()[:50]
    rows = list(base)
    # plant: 9000/9001 exact dup of doc 0; 9002 near-dup (one word changed)
    rows.append({**base[0], "doc_id": 9000})
    rows.append({**base[0], "doc_id": 9001})
    words = base[1]["text"].split()
    words[len(words) // 2] = "zzzchanged"
    rows.append({**base[1], "doc_id": 9002, "text": " ".join(words)})
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{d}/documents.parquet")

    pairs = q_minhash_lsh_pairs(d, jaccard_threshold=0.5)
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (base[0]["doc_id"], 9000) in got
    assert (base[0]["doc_id"], 9001) in got
    assert (9000, 9001) in got
    near = [j for a, b, j in zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"])
            if (a, b) == (base[1]["doc_id"], 9002)]
    assert near and 0.5 <= near[0] < 1.0


def test_exact_dedup_groups(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.dedup import q_exact_dedup

    base = pq.read_table(f"{SF}/documents.parquet").to_pylist()[:20]
    rows = list(base) + [{**base[3], "doc_id": 7777}]
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{d}/documents.parquet")
    out = q_exact_dedup(d)
    dup = out[out["n_docs"] > 1]
    assert len(dup) == 1
    assert dup["keep_doc_id"].iloc[0] == base[3]["doc_id"]
    assert dup["n_docs"].iloc[0] == 2


def test_simhash_near_for_near_texts(ray_session):
    from web_scrapper_ray.pipelines.dedup import simhash64

    t1 = "the quick brown fox jumps over the lazy dog again and again today"
    t2 = t1.replace("today", "tomorrow")
    t3 = "completely different words about elephants pianos galaxies rivers"
    h1, h2, h3 = simhash64(t1), simhash64(t2), simhash64(t3)

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(h1, h2) < ham(h1, h3)
    assert simhash64(t1) == h1  # deterministic


def test_knn_lsh_recall_vs_bruteforce(ray_session):
    from web_scrapper_ray.pipelines.similarity import q_knn_bruteforce, q_knn_lsh

    bf = q_knn_bruteforce(SF, query_ids=(0, 1, 2, 3), k=5)
    lsh = q_knn_lsh(SF, query_ids=(0, 1, 2, 3), k=5)
    bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
    lsh_sets = lsh.groupby("query_id")["neighbor_id"].apply(set)
    recalls = []
    for q in bf_sets.index:
        got = lsh_sets.get(q, set())
        recalls.append(len(got & bf_sets[q]) / len(bf_sets[q]))
    # approximate by design; hyperplane LSH on 64-dim random data has
    # modest recall — the invariant is "finds real neighbors, cheaply"
    assert np.mean(recalls) >= 0.15, recalls


def test_knn_ivf_recall_vs_bruteforce(ray_session):
    from web_scrapper_ray.pipelines.similarity import q_knn_bruteforce, q_knn_ivf

    bf = q_knn_bruteforce(SF, query_ids=(0, 1, 2, 3), k=5)
    ivf = q_knn_ivf(SF, query_ids=(0, 1, 2, 3), k=5, n_lists=16, n_probe=4)
    bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
    iv_sets = ivf.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(iv_sets.get(q, set()) & bf_sets[q]) / len(bf_sets[q]) for q in bf_sets.index
    ]
    # probing 4/16 lists on near-uniform random data
    assert np.mean(recalls) >= 0.25, recalls


def test_neardup_cosine_exact_and_lsh_planted(ray_session, tmp_path):
    """Plant near-duplicate embeddings; the exact blocked cross-join must
    find exactly the planted pairs, and the sub-quadratic LSH variant
    must recover them (its recall at cos≥0.95 is ~0.996 by design)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import (
        q_neardup_cosine,
        q_neardup_cosine_lsh,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 64))
    rows = [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(base)]
    # plant 5 near-dups: tiny perturbations of vectors 0..4
    for i in range(5):
        v = base[i] + 0.02 * rng.normal(size=64)
        rows.append({"vec_id": 1000 + i, "embedding": v.tolist()})
    d = str(tmp_path)
    pq.write_table(
        pa.table({
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "embedding": pa.array([r["embedding"] for r in rows],
                                  pa.list_(pa.float32())),
        }),
        f"{d}/embeddings.parquet",
    )
    exact = q_neardup_cosine(d, threshold=0.95)
    got_exact = set(zip(exact["vec_a"], exact["vec_b"]))
    for i in range(5):
        assert (i, 1000 + i) in got_exact
    assert len(got_exact) == 5  # independent gaussians don't collide

    lsh = q_neardup_cosine_lsh(d, threshold=0.95)
    got_lsh = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert got_lsh <= got_exact          # exact verify → no false positives
    assert len(got_lsh & got_exact) >= 4  # ≥0.8 recall on 5 planted pairs


def test_neardup_cosine_size_gate_switch(ray_session, tmp_path,
                                         monkeypatch):
    """q27's 100-TB size gate: above ``auto_lsh_rows`` the exact O(N²)
    plan must hand off to the widened LSH candidate path, and on a
    seeded mid-size world the switched result must MATCH the exact
    path bit-for-bit (planted near-dups are far from the 0.95
    boundary, so 16×12 LSH recall ≈ 1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines import similarity

    rng = np.random.default_rng(11)
    base = rng.normal(size=(400, 48))
    rows = [{"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(base)]
    for i in range(12):
        v = base[i] + 0.01 * rng.normal(size=48)
        rows.append({"vec_id": 5000 + i, "embedding": v.tolist()})
    d = str(tmp_path)
    pq.write_table(
        pa.table({
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "embedding": pa.array([r["embedding"] for r in rows],
                                  pa.list_(pa.float32())),
        }),
        f"{d}/embeddings.parquet",
    )
    exact = similarity.q_neardup_cosine(d, threshold=0.95,
                                        auto_lsh_rows=None)

    fired = {}
    real_lsh = similarity.q_neardup_cosine_lsh

    def spy(*args, **kwargs):
        fired["yes"] = kwargs
        return real_lsh(*args, **kwargs)

    monkeypatch.setattr(similarity, "q_neardup_cosine_lsh", spy)
    gated = similarity.q_neardup_cosine(d, threshold=0.95,
                                        auto_lsh_rows=100)
    assert fired and fired["yes"] == {"n_tables": 16, "n_planes": 12}
    pd.testing.assert_frame_equal(gated.reset_index(drop=True),
                                  exact.reset_index(drop=True))

    # under the gate: exact path, no LSH call
    fired.clear()
    ungated = similarity.q_neardup_cosine(d, threshold=0.95)
    assert not fired
    pd.testing.assert_frame_equal(ungated.reset_index(drop=True),
                                  exact.reset_index(drop=True))


def test_phash_neardup_hamming_ball(ray_session):
    """Planted near-dups: a lossy re-encode of the same pixels must land
    within the hamming ball; unrelated images must not."""
    from web_scrapper_ray import codecs, synth
    from web_scrapper_ray.pipelines.dedup import phash_neardup_pairs

    ids, hashes = [], []
    for i in range(12):
        iid = f"nd-{i}"
        px = synth.image_pixels(iid, 64, 64)
        ids.append(iid)
        hashes.append(codecs.phash64(px))
        if i < 3:  # plant lossy twins
            twin = codecs.sjpg_decode(codecs.sjpg_encode(px))
            ids.append(f"{iid}-twin")
            hashes.append(codecs.phash64(twin))
    pairs = phash_neardup_pairs(ids, hashes, max_hamming=10)
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["image_a"], pairs["image_b"])}
    for i in range(3):
        assert (f"nd-{i}", f"nd-{i}-twin") in got
    # no unrelated pair below the ball (independent random-ish images)
    assert all("twin" in a or "twin" in b for a, b in got)


def test_phash_neardup_exact_at_all_distances(ray_session):
    """The banding+probing must be EXACT: for planted pairs with exactly
    d random bit flips (d spread across bands — the adversarial case for
    exact-band banding, which only guarantees d ≤ 3), every pair with
    d ≤ max_hamming is found and the result equals brute force."""
    import numpy as np

    from web_scrapper_ray.pipelines.dedup import phash_neardup_pairs

    rng = np.random.default_rng(1234)
    ids, hashes = [], []
    expected = {}
    for d in range(0, 14):  # beyond max_hamming too (must NOT be found)
        base = int(rng.integers(0, 2**63, dtype=np.int64))
        # spread the d flips across bands round-robin so no band absorbs
        # them all (the case 4x16 exact banding silently misses)
        positions = []
        for i in range(d):
            band = i % 4
            while True:
                p = 16 * band + int(rng.integers(0, 16))
                if p not in positions:
                    positions.append(p)
                    break
        twin = base
        for p in positions:
            twin ^= 1 << p
        if twin >= 2**63:
            twin -= 2**64
        ids += [f"d{d:02d}-a", f"d{d:02d}-b"]
        hashes += [base, twin]
        expected[(f"d{d:02d}-a", f"d{d:02d}-b")] = d
    for max_hamming in (6, 10):
        pairs = phash_neardup_pairs(ids, hashes, max_hamming=max_hamming)
        got = {tuple(sorted((a, b))): h
               for a, b, h in zip(pairs["image_a"], pairs["image_b"],
                                  pairs["hamming"])}
        # brute force ground truth over the whole planted set
        brute = {}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = bin((hashes[i] ^ hashes[j]) & (2**64 - 1)).count("1")
                if h <= max_hamming:
                    brute[tuple(sorted((ids[i], ids[j])))] = h
        assert got == brute, f"max_hamming={max_hamming}"
        for pair, d in expected.items():
            assert (pair in got) == (d <= max_hamming), (pair, d, max_hamming)


def test_keywords_topk_deterministic(ray_session):
    from web_scrapper_ray.pipelines.textops import q_keywords_topk

    a = q_keywords_topk(SF)
    b = q_keywords_topk(SF)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_total"].values[:-1] >= a["n_total"].values[1:]).all()


def test_multimodal_stages(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from web_scrapper_ray import codecs, synth
    from web_scrapper_ray.stages.multimodal import (
        DecodeAudio,
        ImageFeatures,
        ResizeImages,
        SampleFrames,
    )

    imgs = []
    for i in range(6):
        iid = f"mm-{i}"
        w, h, fmt = synth.image_spec(iid)
        px = synth.image_pixels(iid, w, h)
        imgs.append({"image_id": iid, "bytes": codecs.encode_image(px, fmt)})
    ds = rd.from_arrow(pa.Table.from_pylist(imgs))
    rs = ds.map_batches(ResizeImages, fn_constructor_args=(16, 16),
                        batch_format="pyarrow", concurrency=1, num_cpus=0.5).to_pandas()
    assert (rs["w"] == 16).all() and (rs["h"] == 16).all()
    for b in rs["bytes"]:
        assert codecs.decode_image(b).shape == (16, 16, 3)
    ft = ds.map_batches(ImageFeatures, batch_format="pyarrow",
                        concurrency=1, num_cpus=0.5).to_pandas()
    assert len(ft) == 6 and all(len(f) == 8 for f in ft["feature"])

    # stubs: raise without fake, flow with fake
    media = rd.from_arrow(pa.Table.from_pylist(
        [{"media_id": "m1", "bytes": b"\x01\x02\x03\x04"}]))
    with pytest.raises(Exception):
        media.map_batches(DecodeAudio, batch_format="pyarrow").to_pandas()
    out = media.map_batches(DecodeAudio, fn_constructor_args=(True,),
                            batch_format="pyarrow", concurrency=1,
                            num_cpus=0.5).to_pandas()
    assert out["n_samples"].iloc[0] == 4
    frames = media.map_batches(SampleFrames, fn_constructor_kwargs={"fake": True},
                               batch_format="pyarrow", concurrency=1,
                               num_cpus=0.5).to_pandas()
    assert len(frames) == 3


def test_image_quality_stage(ray_session):
    """Flat image → zero Laplacian variance and zero contrast; a
    checkerboard is sharper (higher lap_var) than the flat one;
    brightness equals the constructed luma."""
    import pyarrow as pa
    import ray.data as rd

    from web_scrapper_ray import codecs
    from web_scrapper_ray.stages.multimodal import ImageQuality

    flat = np.full((16, 16, 3), 100, np.uint8)
    checker = np.zeros((16, 16, 3), np.uint8)
    checker[::2, ::2] = 255
    checker[1::2, 1::2] = 255
    ds = rd.from_arrow(pa.Table.from_pylist([
        {"image_id": "flat", "bytes": codecs.png_encode(flat)},
        {"image_id": "checker", "bytes": codecs.png_encode(checker)},
    ]))
    out = (ds.map_batches(ImageQuality, batch_format="pyarrow",
                          concurrency=1, num_cpus=0.5)
           .to_pandas().set_index("image_id"))
    assert out.loc["flat", "lap_var"] == 0.0
    assert out.loc["flat", "contrast"] == 0.0
    assert abs(out.loc["flat", "brightness"] - 100.0) < 1e-9
    assert out.loc["checker", "lap_var"] > 1000.0


def test_simhash_neardup_pairs_planted(ray_session, tmp_path):
    """Near-identical texts land within the hamming ball; the planted
    twin is recovered by the banded simhash near-dup operator."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.dedup import q_simhash_neardup

    base = pq.read_table(f"{SF}/documents.parquet").to_pylist()[:40]
    rows = list(base)
    words = base[2]["text"].split()
    words[len(words) // 3] = "tweaked"
    rows.append({**base[2], "doc_id": 9100, "text": " ".join(words)})
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{d}/documents.parquet")
    pairs = q_simhash_neardup(d, max_hamming=6)
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (base[2]["doc_id"], 9100) in got
    ham = pairs.set_index(["doc_a", "doc_b"])["hamming"].to_dict()
    assert ham[(base[2]["doc_id"], 9100)] <= 3


def test_neardup_cosine_cross_chunk_pairs(ray_session, tmp_path):
    """Regression: with more blocks than chunk groups, a near-dup pair
    whose lower id lands in a HIGHER-numbered group must still be found
    (cross-group tasks emit normalized (min, max) pairs — an id-order
    filter would silently drop them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_neardup_cosine

    rng = np.random.default_rng(11)
    n = 4000
    mat = rng.normal(size=(n, 32))
    mat[2000] = mat[250] + 0.01 * rng.normal(size=32)  # planted pair (250, 2000)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
    })
    d = str(tmp_path)
    # tiny row groups → the read splits into many blocks (> N_CHUNKS)
    pq.write_table(t, f"{d}/embeddings.parquet", row_group_size=100)
    out = q_neardup_cosine(d, threshold=0.95)
    got = set(zip(out["vec_a"], out["vec_b"]))
    assert (250, 2000) in got, got


def test_neardup_clusters_transitive(ray_session, tmp_path):
    """q53: chains cluster transitively (A~B and B~C group A,B,C even
    when hamming(A,C) exceeds the threshold), exemplar = min doc_id,
    singletons keep themselves."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.dedup import q_neardup_clusters

    base = ("the quick brown fox jumps over the lazy dog while many "
            "other animals watch from the forest edge every day") * 4
    words = base.split()

    def variant(*swaps):
        w = list(words)
        for i, repl in swaps:
            w[i] = repl
        return " ".join(w)

    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": variant((5, "leaps"))},           # ~1
        {"doc_id": 3, "text": variant((5, "leaps"), (30, "zebras"))},  # ~2
        {"doc_id": 50, "text": "an entirely different document about "
                               "spacecraft propulsion systems and orbital "
                               "mechanics research papers " * 5},
    ]
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{d}/documents.parquet")
    out = q_neardup_clusters(d, max_hamming=10)
    by_doc = out.set_index("doc_id")
    # 1,2,3 share one cluster rooted at 1 (regardless of whether the
    # 1-3 edge itself exists; 1-2 and 2-3 must)
    assert by_doc.loc[2, "cluster_id"] == 1
    assert by_doc.loc[3, "cluster_id"] == 1
    assert bool(by_doc.loc[1, "keep"]) and not bool(by_doc.loc[2, "keep"])
    # singleton keeps itself
    assert by_doc.loc[50, "cluster_id"] == 50 and bool(by_doc.loc[50, "keep"])


def test_cc_min_label_giant_component(ray_session):
    """Distributed CC (graph.cc_min_label): a planted 20k-node chain —
    a pair list far past driver-union-find comfort with diameter ≫ any
    fixed round count — resolves to one component rooted at the min
    id; pointer jumping keeps the round count logarithmic. Plus random
    shuffled forests checked against a reference union-find."""
    import numpy as np

    from web_scrapper_ray.pipelines.graph import cc_min_label

    n = 20_000
    ids = np.arange(n, dtype=np.int64) * 7 + 3   # non-contiguous ids
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    a, b = ids[perm[:-1]], ids[perm[1:]]         # one long chain
    nodes, roots = cc_min_label(a, b)
    assert len(nodes) == n
    assert (roots == ids.min()).all()

    # random forest: 3 components by construction
    groups = [np.arange(0, 500), np.arange(500, 1200),
              np.arange(1200, 1201)]  # incl. a singleton with an edge
    ea, eb = [], []
    for g in groups:
        if len(g) > 1:
            p = rng.permutation(g)
            ea.append(p[:-1])
            eb.append(p[1:])
        else:
            ea.append(g)
            eb.append(g)  # self-edge
    a2 = np.concatenate(ea).astype(np.int64)
    b2 = np.concatenate(eb).astype(np.int64)
    nodes2, roots2 = cc_min_label(a2, b2)
    lookup = dict(zip(nodes2.tolist(), roots2.tolist()))
    for g in groups:
        assert {lookup[int(x)] for x in g} == {int(g.min())}


def test_cc_min_label_refs_bucketed_giant_component(ray_session):
    """graph.cc_min_label_refs — the edge-bucket handoff: a planted
    giant component whose pair list (500k edges with cross-bucket
    duplicate replicas, the banding-shuffle contract) is handed over
    ONLY as per-bucket object-store refs; the driver receives nothing
    larger than the node table. Verified against cc_min_label on the
    same (deduplicated) edge set."""
    import numpy as np
    import pyarrow as pa
    import ray

    from web_scrapper_ray.pipelines.graph import cc_min_label, \
        cc_min_label_refs

    n = 100_000
    ids = np.arange(n, dtype=np.int64) * 3 + 11
    rng = np.random.default_rng(13)
    perm = rng.permutation(n)
    a = ids[perm[:-1]]
    b = ids[perm[1:]]                      # one long chain, diameter n
    # replicate ~5x with shuffled assignment to 16 buckets — replicas
    # of a pair land in DIFFERENT buckets like probe-band replicas do;
    # every edge index present so the chain stays one component
    rep = np.concatenate([np.arange(len(a)),
                          rng.integers(0, len(a), size=400_000)])
    ra, rb = a[rep], b[rep]
    bkt = rng.integers(0, 16, size=len(ra))
    refs = []
    for p in range(16):
        m = bkt == p
        refs.append(ray.put(pa.table({
            "doc_a": pa.array(ra[m]), "doc_b": pa.array(rb[m]),
            "hamming": pa.array(np.zeros(int(m.sum()), np.int64))})))
    nodes, roots = cc_min_label_refs(refs)
    ref_nodes, ref_roots = cc_min_label(a, b)
    assert np.array_equal(nodes, ref_nodes)
    assert np.array_equal(roots, ref_roots)
    assert (roots == ids.min()).all()


def test_image_neardup_clusters_brute_force(ray_session):
    """q386 (phash_neardup_clusters_ds): transitive image clusters
    match a brute-force union-find over the exact hamming-ball pair
    set; exemplar = lexicographically smallest image_id; non-clustered
    images keep themselves."""
    import pyarrow as pa
    import ray.data as rd

    from web_scrapper_ray.pipelines.dedup import (
        phash_neardup_clusters_ds, phash_neardup_pairs)

    rng = np.random.default_rng(5)
    n = 400
    ids = [f"img{i:04d}" for i in range(n)]
    base = rng.integers(0, 2**63, size=n, dtype=np.int64)
    # plant a chain a~b~c (1-bit steps) and an exact pair
    base[10] = base[7] ^ 1
    base[13] = base[10] ^ 2
    base[200] = base[100]
    t = pa.table({"image_id": pa.array(ids),
                  "phash": pa.array(base, pa.int64())})
    out = (phash_neardup_clusters_ds(rd.from_arrow(t), 6).to_pandas()
           .set_index("image_id"))
    assert len(out) == n
    # brute-force reference
    pairs = phash_neardup_pairs(ids, base.tolist(), 6)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["image_a"], pairs["image_b"]):
        parent[find(a)] = find(b)
    want = {i: min(j for j in ids if find(j) == find(i)) for i in ids}
    got = out["cluster_id"].to_dict()
    assert got == want
    assert bool(out.loc["img0007", "keep"])
    assert not bool(out.loc["img0013", "keep"])
    assert out.loc["img0013", "cluster_id"] == "img0007"
    assert out.loc["img0200", "cluster_id"] == "img0100"


def test_common_neighbors_blocked_equals_waves(ray_session, monkeypatch):
    """q291's default broadcast-CSR blocked plan and the wave-exchange
    fallback must produce the identical exact top-k (routing is by
    edge count; forcing WSR_CN_BLOCK_MAX_EDGES=0 exercises the wave
    path on the same input)."""
    from web_scrapper_ray.pipelines.graph import q_common_neighbors

    blocked = q_common_neighbors(SF)
    monkeypatch.setenv("WSR_CN_BLOCK_MAX_EDGES", "0")
    waves = q_common_neighbors(SF)
    pd.testing.assert_frame_equal(blocked, waves)
    assert len(blocked) > 0


def test_dedup_corpus_and_clusters_ds_twins(ray_session):
    """The q48/q23/q53 ``_ds`` twins stream the same rows their
    gathering wrappers return (scale-safe perrow contract)."""
    from web_scrapper_ray.pipelines.dedup import (
        q_dedup_corpus, q_dedup_corpus_ds, q_neardup_clusters,
        q_neardup_clusters_ds, q_simhash, q_simhash_ds)

    got = (q_dedup_corpus_ds(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = q_dedup_corpus(SF)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), want)
    got = (q_simhash_ds(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "simhash": "int64"}),
        q_simhash(SF))
    got = (q_neardup_clusters_ds(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "cluster_id": "int64",
                    "keep": "bool"}),
        q_neardup_clusters(SF))


def test_doc_chunks_matches_naive(ray_session):
    """q54 context-window chunking: per-doc naive ceil-split ground truth."""
    import re

    from web_scrapper_ray.pipelines.textops import q_doc_chunks

    got = q_doc_chunks(SF, chunk_tokens=32)
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        n = len(re.findall(r"\w+", text))
        for k in range((n + 31) // 32):
            rows.append((doc_id, k, min(32, n - k * 32)))
    want = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk_tokens"]) \
        .astype({"doc_id": "int64", "chunk_idx": "int64", "chunk_tokens": "int64"}) \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # every chunk except a doc's last is full-width
    last = got.groupby("doc_id")["chunk_idx"].transform("max")
    assert (got.loc[got["chunk_idx"] < last, "chunk_tokens"] == 32).all()


def test_tfidf_topk_matches_naive(ray_session):
    """q55: naive per-doc tf*ln(N/df) ground truth with the same
    (score desc, term asc) boundary tie-break."""
    import math
    import re
    from collections import Counter

    from web_scrapper_ray.pipelines.textops import q_tfidf_topk

    got = q_tfidf_topk(SF, k=5)
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    rx = re.compile(r"\w+", re.ASCII)
    toks = {d: rx.findall(t.lower()) for d, t in zip(docs["doc_id"], docs["text"])}
    df = Counter()
    for ws in toks.values():
        df.update(set(ws))
    n = float(len(docs))
    rows = []
    for d, ws in toks.items():
        tf = Counter(ws)
        scored = sorted(((-c * math.log(n / df[t]), t) for t, c in tf.items()))
        for neg, t in scored[:5]:
            rows.append((d, t, round(-neg, 6)))
    want = pd.DataFrame(rows, columns=["doc_id", "term", "score"]) \
        .astype({"doc_id": "int64"}) \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_decontaminate_planted(ray_session, tmp_path):
    """q56: plant an 8-gram overlap with the benchmark doc (id 0) and
    verify hit counts; distinct-gram counting, no self rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_decontaminate

    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            bench,                                  # benchmark (0 % 50 == 0)
            "x " + bench + " y",                    # shares all 3 bench 8-grams
            "alpha beta gamma delta epsilon zeta eta NOPE",  # 7-word prefix only
            "unrelated words entirely different content here okay fine",
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = q_decontaminate(str(tmp_path), n=8, holdout_mod=50)
    got = out.set_index("doc_id")
    assert list(got.index) == [1, 2, 3]
    assert got.loc[1, "n_hits"] == 3 and bool(got.loc[1, "contaminated"])
    assert got.loc[2, "n_hits"] == 0 and not bool(got.loc[2, "contaminated"])
    assert got.loc[3, "n_hits"] == 0


def test_shard_pack_balanced_and_exact(ray_session):
    """q58: histogram-offset ranking must equal a naive global sort's
    snake deal, and shard token totals must be near-balanced."""
    import re

    from web_scrapper_ray.pipelines.textops import q_shard_pack

    k = 8
    got = q_shard_pack(SF, k=k)
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    rx = re.compile(r"\w+", re.ASCII)
    naive = pd.DataFrame({
        "doc_id": docs["doc_id"],
        "n_tokens": [len(rx.findall(t)) for t in docs["text"]],
    }).sort_values(["n_tokens", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    m = naive.index.to_numpy() % (2 * k)
    naive["shard"] = np.where(m < k, m, 2 * k - 1 - m)
    naive = naive.astype({"n_tokens": "int64", "shard": "int64"}) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, naive)
    totals = got.groupby("shard")["n_tokens"].sum()
    assert len(totals) == k
    # snake packing keeps shard totals within one max-doc of each other
    assert totals.max() - totals.min() <= got["n_tokens"].max()


def test_hll_distinct_error_bounds(ray_session):
    """q59: HLL estimate within 3% of exact on the events table, and the
    raw sketch within 3% at 10^6 distinct keys (non-small-range regime,
    split across shards to exercise the merge)."""
    from web_scrapper_ray.pipelines.sketches import (
        _M, hll_accumulate, hll_estimate, q_distinct_users_hll)

    est = q_distinct_users_hll(SF)["n_users_hll"][0]
    exact = pd.read_parquet(SF + "/events.parquet", columns=["user_id"])["user_id"].nunique()
    assert abs(est - exact) / exact < 0.03

    keys = np.arange(1_000_000, dtype=np.int64)
    regs = np.zeros(_M, np.uint8)
    merged = np.zeros(_M, np.uint8)
    for shard in np.array_split(keys, 7):
        part = hll_accumulate(np.zeros(_M, np.uint8), shard)
        merged = np.maximum(merged, part)
    assert abs(hll_estimate(merged) - 1_000_000) / 1_000_000 < 0.03
    # merge of shards == single-pass accumulate (idempotent max)
    assert np.array_equal(merged, hll_accumulate(np.zeros(_M, np.uint8), keys))


def test_users_per_type_hll_error_bounds(ray_session, tmp_path):
    """q101: per-type HLL within 3% of each type's exact distinct
    count on the events table, and cross-batch register merging is
    exercised with a multi-row-group fixture where every type spans
    every batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.sketches import q_users_per_type_hll

    est = q_users_per_type_hll(SF).set_index("event_type")
    exact = (pd.read_parquet(SF + "/events.parquet",
                             columns=["event_type", "user_id"])
             .groupby("event_type")["user_id"].nunique())
    assert set(est.index) == set(exact.index)
    for et, ex in exact.items():
        assert abs(est.loc[et, "n_users_hll"] - ex) / ex < 0.03

    # planted: type a has 3 distinct users spread over row groups,
    # type b has 1; small-range correction makes these exact
    uid = np.r_[np.tile([1, 2, 3], 40), np.full(40, 9)]
    et = np.r_[np.full(120, "a"), np.full(40, "b")]
    order = np.random.default_rng(5).permutation(len(uid))
    t = pa.table({"event_type": pa.array(et[order]),
                  "user_id": pa.array(uid[order], pa.int64())})
    pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=16)
    out = q_users_per_type_hll(str(tmp_path)).set_index("event_type")
    assert int(out.loc["a", "n_users_hll"]) == 3
    assert int(out.loc["b", "n_users_hll"]) == 1


def test_token_offsets_prefix_sum(ray_session):
    """q60: distributed prefix sum equals the naive cumulative sum, and
    offsets are continuous across range-bucket boundaries."""
    import re

    from web_scrapper_ray.pipelines.textops import q_token_offsets

    got = q_token_offsets(SF, block_tokens=256)
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"]) \
        .sort_values("doc_id").reset_index(drop=True)
    rx = re.compile(r"\w+", re.ASCII)
    n = docs["text"].map(lambda t: len(rx.findall(t)))
    want_off = n.cumsum().shift(fill_value=0).astype("int64")
    assert (got["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    assert (got["start_offset"].to_numpy() == want_off.to_numpy()).all()
    assert (got["block_id"] == got["start_offset"] // 256).all()
    # offsets are strictly cumulative: next start = prev start + prev n
    assert (got["start_offset"].to_numpy()[1:] ==
            (got["start_offset"] + got["n_tokens"]).to_numpy()[:-1]).all()


def test_token_offsets_without_parquet_stats(ray_session, tmp_path):
    """q60's range-bucket bounds fall back to a distributed max when the
    parquet writer omitted column statistics."""
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_token_offsets

    t = pq.read_table(SF + "/documents.parquet")
    pq.write_table(t, str(tmp_path / "documents.parquet"),
                   write_statistics=False)
    md = pq.read_metadata(str(tmp_path / "documents.parquet"))
    assert md.row_group(0).column(0).statistics is None  # precondition
    got = q_token_offsets(str(tmp_path))
    want = q_token_offsets(SF)
    pd.testing.assert_frame_equal(got, want)


def test_top_percentile_selection(ray_session, tmp_path):
    """q61: histogram-refinement selection equals the naive global sort,
    including deterministic tie-fill on a heavily-tied value column."""
    import numpy as np

    from web_scrapper_ray.pipelines.relational import q_top_percentile_events

    # real table vs naive
    got = q_top_percentile_events(SF)
    ev = pd.read_parquet(SF + "/events.parquet", columns=["event_id", "value"])
    ev = ev[ev["value"].notna()]
    k = -(-len(ev) // 100)  # ceil(0.01 * n)
    want = ev.sort_values(["value", "event_id"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert np.allclose(got["value"], want["value"].round(4))

    # tie-heavy synthetic: only 5 distinct values over 2000 rows, so the
    # cutoff bucket holds hundreds of equal values and the tie-fill must
    # pick the smallest event_ids
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"event_id": np.arange(2000, dtype=np.int64),
                       "value": rng.integers(0, 5, 2000).astype("float64")})
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got2 = q_top_percentile_events(str(tmp_path))
    want2 = df.sort_values(["value", "event_id"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)
    assert (got2["event_id"].to_numpy() == want2["event_id"].to_numpy()).all()


def test_top_percentile_nan_inf_regimes(ray_session, tmp_path):
    """q61 value-domain contract: NaN rows are never selected, ±inf are
    orderable extremes — covering all three cutoff regimes (inside the
    +inf ties, among finite values, into the -inf ties)."""
    import numpy as np

    from web_scrapper_ray.pipelines.relational import q_top_percentile_events

    rng = np.random.default_rng(11)
    vals = rng.normal(size=1000)
    vals[:30] = np.inf
    vals[30:50] = -np.inf
    vals[50:65] = np.nan
    df = pd.DataFrame({"event_id": np.arange(1000, dtype=np.int64),
                       "value": vals})
    df.to_parquet(tmp_path / "events.parquet", index=False)

    naive = df[df["value"].notna() & ~np.isnan(df["value"])]
    naive = naive.sort_values(["value", "event_id"], ascending=[False, True])
    n = len(naive)  # 985
    import math

    for frac in (0.01, 0.1, 0.99):  # k=10 (+inf ties), 99 (finite), 976 (-inf)
        got = q_top_percentile_events(str(tmp_path), frac=frac)
        k = max(1, math.ceil(frac * n))
        want = naive.head(k).reset_index(drop=True)
        assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all(), frac
        assert len(got) == k


def test_hash_split_group_aware(ray_session):
    """q62: every source lands in exactly one split, the assignment is
    the documented md5 bucket rule, and counts cover the whole table."""
    import hashlib

    from web_scrapper_ray.pipelines.textops import q_hash_split

    got = q_hash_split(SF)
    assert (got.groupby("source")["split"].nunique() == 1).all()
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["source"])
    assert got["n_docs"].sum() == len(docs)
    for src, split in got[["source", "split"]].itertuples(index=False):
        b = int(hashlib.md5(src.encode()).hexdigest()[:8], 16) % 100
        assert split == ("train" if b < 80 else "val" if b < 90 else "test")


def test_hash_split_null_source_group(ray_session, tmp_path):
    """q62 keeps the NULL-source group (SQL GROUP BY semantics: NULL
    forms a group, CASE's ELSE sends it to 'test'), with a real None
    key — not pandas' silent dropna or a NaN stand-in."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_hash_split

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a", "b", "c"], "lang": ["en"] * 3,
        "source": pa.array(["s1", None, None], pa.string()),
        "n_chars": pa.array([1, 1, 1], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = q_hash_split(str(tmp_path))
    null_row = got[got["source"].isna()]
    assert len(null_row) == 1
    assert null_row["split"].iloc[0] == "test"
    assert null_row["n_docs"].iloc[0] == 2
    assert null_row["source"].iloc[0] is None


def test_repetition_filter_naive(ray_session):
    """q63: exploded-list stats equal a per-doc Python recompute."""
    import re
    from collections import Counter

    from web_scrapper_ray.pipelines.textops import q_repetition_filter

    got = q_repetition_filter(SF).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    rx = re.compile(r"\w+", re.ASCII)
    for d, t in docs.sample(50, random_state=0).itertuples(index=False):
        c = Counter(rx.findall(t or ""))
        n, u = sum(c.values()), len(c)
        top = max(c.values()) if c else 0
        row = got.loc[d]
        assert (row["n_tokens"], row["n_distinct"], row["top_count"]) == (n, u, top)
        assert row["dup_permille"] == (n - u) * 1000 // max(n, 1)
        assert row["flagged"] == int(
            (n - u) * 1000 // max(n, 1) >= 500 or top * 1000 // max(n, 1) >= 200)


def test_quantize_embeddings_roundtrip(ray_session, tmp_path):
    """q64: symmetric int8 quantization — extremes hit ±127, zero
    vectors quantize to zeros, and values stay in [-127, 127]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_quantize_embeddings

    import numpy as np

    # m is a non-power-of-two float32 max: (127*x)/m and x*(127/m)
    # disagree at the exact-half boundary x = m/2 (63.5 vs 63.4999…);
    # the engine must associate multiply-first like the oracle SQL
    m = float(np.float32(0.027000000700354576))
    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, -2.0, 0.5], [0.0, 0.0, 0.0],
                               [-0.25, 0.25, 0.125],
                               [m, m / 2, 0.0]],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = q_quantize_embeddings(str(tmp_path))
    by = {(r.vec_id, r.pos): r.q for r in got.itertuples(index=False)}
    # vec 0: maxabs=2 → 63.5 rounds half-away to 64, -2 → -127
    assert by[(0, 1)] == 64 and by[(0, 2)] == -127 and by[(0, 3)] == 32
    assert by[(1, 1)] == by[(1, 2)] == by[(1, 3)] == 0  # zero vector
    assert by[(2, 1)] == -127 and by[(2, 2)] == 127 and by[(2, 3)] == 64
    assert by[(3, 1)] == 127 and by[(3, 2)] == 64 and by[(3, 3)] == 0
    assert got["q"].abs().max() <= 127


def test_heavy_hitters_cms_matches_exact(ray_session):
    """q65: on a small-vocabulary corpus the CMS ranking equals the
    exact q13 top-k (identical tokenization; CMS never underestimates,
    and at width 8192 the tiny vocab has no colliding buckets), and a
    merged sketch equals the single-pass one (mergeability)."""
    from web_scrapper_ray.pipelines.sketches import q_heavy_hitters_cms
    from web_scrapper_ray.pipelines.textops import q_keywords_topk

    approx = q_heavy_hitters_cms(SF, k=20)
    exact = q_keywords_topk(SF, k=20)
    assert approx["word"].tolist() == exact["word"].tolist()
    assert approx["est_n"].tolist() == exact["n_total"].tolist()


def test_boilerplate_ngrams_planted(ray_session, tmp_path):
    """q66: a 3-gram planted in >= df_min docs counts as frequent for
    exactly those docs; short docs (<3 tokens) report zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_boilerplate_ngrams

    boiler = "click here now"
    rows = [{"doc_id": i, "text": f"unique{i} words only {boiler} tail{i}"}
            for i in range(4)]
    rows.append({"doc_id": 4, "text": "totally fresh content without repeats"})
    rows.append({"doc_id": 5, "text": "two words"})
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = q_boilerplate_ngrams(str(tmp_path), n=3, df_min=4, flag_min=1)
    by = dict(zip(out["doc_id"], out["n_frequent"]))
    # docs 0-3 share the sliding grams crossing 'click here now' — at
    # least the exact boilerplate gram is frequent in each
    assert all(by[i] >= 1 for i in range(4))
    assert by[4] == 0 and by[5] == 0
    flags = dict(zip(out["doc_id"], out["flagged"]))
    assert flags[0] and not flags[4]


def test_pagerank_star_graph(ray_session, tmp_path):
    """q67 on a star (one supplier serving all parts): the hub supplier
    must out-rank every leaf part, ranks sum to ~1, and the result
    matches an independent dense power iteration."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.graph import q_pagerank_part_supplier

    parts = list(range(1, 9))
    t = pa.table({"l_partkey": pa.array(parts * 2, pa.int64()),
                  "l_suppkey": pa.array([7] * 16, pa.int64())})
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = q_pagerank_part_supplier(str(tmp_path), iters=3)
    pr = dict(zip(out["node"], out["pr"]))
    assert set(pr) == {f"p{p}" for p in parts} | {"s7"}
    assert pr["s7"] > max(pr[f"p{p}"] for p in parts)
    assert abs(sum(pr.values()) - 1.0) < 1e-3
    # independent dense reference: nodes [s7, p1..p8]
    N = 9
    r = np.full(N, 1 / N)
    for _ in range(3):
        new = np.full(N, 0.15 / N)
        new[0] += 0.85 * r[1:].sum()          # leaves (deg 1) -> hub
        new[1:] += 0.85 * r[0] / 8            # hub (deg 8) -> leaves
        r = new
    assert abs(pr["s7"] - round(r[0], 6)) < 2e-6
    assert abs(pr["p1"] - round(r[1], 6)) < 2e-6


def test_source_quality_filter_planted(ray_session, tmp_path):
    """q68: a source whose majority of docs fail the q15 is_good rule
    drops all its docs; a good-majority source keeps all."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_source_quality_filter

    good = ("the and for with this that from they have " * 3).strip()
    bad = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = ([{"doc_id": i, "source": "goodsrc", "text": good} for i in range(3)]
            + [{"doc_id": 10 + i, "source": "badsrc", "text": bad} for i in range(3)]
            + [{"doc_id": 20, "source": "badsrc", "text": good}])
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = q_source_quality_filter(str(tmp_path))
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert all(keep[i] for i in range(3))
    assert not keep[10] and not keep[20]  # 1 good of 4 -> whole source drops


def test_embedding_gram_matches_numpy(ray_session, tmp_path):
    """q69 equals the dense X.T @ X upper triangle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_embedding_gram

    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 5)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.array([list(map(float, row)) for row in X],
                                        pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_embedding_gram(str(tmp_path))
    G = X.astype(np.float64).T @ X.astype(np.float64)
    for i, j, g in zip(out["i"], out["j"], out["g"]):
        assert abs(g - round(G[i - 1, j - 1], 6)) < 1e-9
    assert len(out) == 5 * 6 // 2


def test_consistent_sample_partition_invariant(ray_session, tmp_path):
    """q70: the sample equals the brute-force global bottom-k and does
    not depend on how the input is partitioned."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_consistent_sample

    rows = [{"doc_id": i, "text": f"document body {i} {'x' * (i % 7)}"}
            for i in range(200)]
    expect = sorted(
        (hashlib.md5(f"{r['doc_id']}:{r['text']}".encode()).hexdigest(),
         r["doc_id"]) for r in rows)[:10]
    expect_ids = sorted(d for _, d in expect)

    d1 = tmp_path / "one"
    d1.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d1 / "documents.parquet"))
    got1 = q_consistent_sample(str(d1), k=10)
    assert got1["doc_id"].tolist() == expect_ids

    d2 = tmp_path / "many"
    d2.mkdir()
    (d2 / "documents.parquet").mkdir()
    for c in range(8):  # 8-fragment layout: different blocks, same sample
        chunk = [r for r in rows if r["doc_id"] % 8 == c]
        pq.write_table(pa.Table.from_pylist(chunk),
                       str(d2 / "documents.parquet" / f"part{c}.parquet"))
    got2 = q_consistent_sample(str(d2), k=10)
    assert got2["doc_id"].tolist() == expect_ids


def test_source_quality_filter_null_source_dropped(ray_session, tmp_path):
    """q68: NULL-source docs fall out entirely (the oracle's JOIN USING
    drops them) instead of KeyError-ing the keep lookup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_source_quality_filter

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": pa.array(["s1", None, "s1"], pa.string()),
                  "text": pa.array(["the and for with this that from "
                                    "they have was"] * 3, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_source_quality_filter(str(tmp_path))
    assert out["doc_id"].tolist() == [1, 3]


def test_pagerank_key_overflow_is_loud(ray_session, tmp_path):
    """q67: keys >= 2^32 must raise (silent packed-key aliasing would
    corrupt the graph), not wrap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.graph import q_pagerank_part_supplier

    t = pa.table({"l_partkey": pa.array([2 ** 33], pa.int64()),
                  "l_suppkey": pa.array([1], pa.int64())})
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    with pytest.raises(Exception, match="pack overflow"):
        q_pagerank_part_supplier(str(tmp_path))


def test_kmeans_recovers_planted_blobs(ray_session, tmp_path):
    """q71: with one init point per well-separated blob, two Lloyd
    rounds land each centroid on its blob mean (within the blob noise);
    a cluster that captures nothing keeps its init centroid."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_kmeans

    rng = np.random.default_rng(3)
    centers = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]])
    pts = [centers[i % 3] + 0.1 * rng.normal(size=2) for i in range(90)]
    # vec_ids 0,1,2 are the first three points → one init per blob
    t = pa.table({"vec_id": pa.array(range(90), pa.int64()),
                  "embedding": pa.array([list(map(float, p)) for p in pts],
                                        pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_kmeans(str(tmp_path), k=3, iters=2)
    cent = {c: np.array([g.sort_values("pos")["c"].to_numpy()])
            for c, g in out.groupby("cluster")}
    for i in range(3):
        true_mean = np.mean([p for j, p in enumerate(pts) if j % 3 == i], axis=0)
        assert np.abs(cent[i][0] - true_mean).max() < 0.05, (i, cent[i], true_mean)


def test_mix_allocation_budget_and_temperature(ray_session, tmp_path):
    """q72: allocations sum exactly to the budget, every source gets
    its floor quota, and the sqrt temperature upweights small sources
    relative to proportional allocation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_mix_allocation

    rows = []
    did = 0
    for s, ndocs, words in (("big", 40, 100), ("mid", 10, 50), ("tiny", 2, 10)):
        for _ in range(ndocs):
            rows.append({"doc_id": did, "source": s,
                         "text": " ".join(f"w{j}" for j in range(words))})
            did += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = q_mix_allocation(str(tmp_path), budget=1000)
    by = out.set_index("source")
    assert int(out["alloc"].sum()) == 1000
    tot = by["n_tokens"].sum()
    # sqrt temperature: tiny source's share must exceed its raw share
    assert by.loc["tiny", "alloc"] / 1000 > by.loc["tiny", "n_tokens"] / tot
    assert by.loc["big", "alloc"] / 1000 < by.loc["big", "n_tokens"] / tot


def test_mix_allocation_zero_and_null_edges(ray_session, tmp_path):
    """q72 edge cases: an all-zero-token corpus allocates zeros (not
    NaN-floor garbage) and a NULL source survives as its own row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_mix_allocation

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": pa.array(["a", None, "a"], pa.string()),
                  "text": pa.array(["...", "!!!", None], pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_mix_allocation(str(tmp_path), budget=100)
    assert out["alloc"].tolist() == [0, 0]
    assert out["source"].tolist()[0] == "a" and out["source"].tolist()[1] is None


def test_kmeans_skips_null_embeddings(ray_session, tmp_path):
    """q71 (via _batch_matrix): NULL embedding rows drop like the
    oracle's unnest instead of shifting the batch matrix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_kmeans

    t = pa.table({"vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "embedding": pa.array([[1.0, 0.0], [0.0, 1.0],
                                         None, [4.0, 5.0]],
                                        pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_kmeans(str(tmp_path), k=2, iters=1)
    cent = {(c, p): v for c, p, v in zip(out["cluster"], out["pos"], out["c"])}
    # vec 3 joins cluster 1 (d²=32 vs 34); vec 2 is skipped entirely
    assert cent[(0, 1)] == 1.0 and cent[(0, 2)] == 0.0
    assert cent[(1, 1)] == 2.0 and cent[(1, 2)] == 3.0


def test_inverted_index_postings(ray_session, tmp_path):
    """q73: df equals the number of distinct docs containing the word,
    postings list every one of them exactly once, and the top cut
    orders by (df desc, word asc)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_inverted_index

    rows = [{"doc_id": 0, "text": "apple banana apple"},
            {"doc_id": 1, "text": "apple cherry"},
            {"doc_id": 2, "text": "banana banana cherry"},
            {"doc_id": 3, "text": "the and for"}]  # stopwords only
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = q_inverted_index(str(tmp_path), top=2)
    got = {(w, d) for w, d in zip(out["word"], out["doc_id"])}
    # df: apple 2, banana 2, cherry 2 → top-2 by word asc = apple, banana
    assert got == {("apple", 0), ("apple", 1), ("banana", 0), ("banana", 2)}
    assert set(out["df"]) == {2}


def test_event_funnel_strict_ordering(ray_session, tmp_path):
    """q74: stage timestamps must be strictly increasing — a purchase
    BEFORE the first view doesn't convert; a full ordered path does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def ts(m):
        return pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m)

    rows = [
        # user 1: full ordered funnel
        {"user_id": 1, "event_type": "signup", "ts": ts(0)},
        {"user_id": 1, "event_type": "view", "ts": ts(5)},
        {"user_id": 1, "event_type": "purchase", "ts": ts(9)},
        # user 2: purchase precedes the post-signup view -> reached 2
        {"user_id": 2, "event_type": "signup", "ts": ts(0)},
        {"user_id": 2, "event_type": "purchase", "ts": ts(1)},
        {"user_id": 2, "event_type": "view", "ts": ts(2)},
        # user 3: view before signup only -> reached 1
        {"user_id": 3, "event_type": "view", "ts": ts(0)},
        {"user_id": 3, "event_type": "signup", "ts": ts(1)},
        # user 4: never signed up -> reached 0
        {"user_id": 4, "event_type": "view", "ts": ts(0)},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    from web_scrapper_ray.pipelines.relational import q_event_funnel

    out = q_event_funnel(str(tmp_path))
    assert dict(zip(out["user_id"], out["reached"])) == {1: 3, 2: 2, 3: 1, 4: 0}


def test_event_funnel_null_and_empty_edges(ray_session, tmp_path):
    """q74: a NULL user_id gets its own reached-0 row (SQL NULL never
    joins a stage) and an empty events table returns zero rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_event_funnel

    t = pa.table({
        "user_id": pa.array([1, None], pa.int64()),
        "event_type": pa.array(["signup", "signup"], pa.string()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * 2,
                       pa.timestamp("us")),
    })
    d1 = tmp_path / "a"
    d1.mkdir()
    pq.write_table(t, str(d1 / "events.parquet"))
    out = q_event_funnel(str(d1))
    vals = {(-1 if pd.isna(u) else int(u)): r
            for u, r in zip(out["user_id"], out["reached"])}
    assert vals == {1: 1, -1: 0}

    d2 = tmp_path / "b"
    d2.mkdir()
    pq.write_table(t.slice(0, 0), str(d2 / "events.parquet"))
    assert len(q_event_funnel(str(d2))) == 0


def test_normalize_by_label_stats(ray_session, tmp_path):
    """q75: z-scores within each (label, pos) have mean ~0 and pop-std
    ~1; a constant dimension normalizes to exactly 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_normalize_by_label

    rng = np.random.default_rng(11)
    rows, labels = [], []
    for i in range(60):
        lb = i % 2
        v = rng.normal(size=3) * (lb + 1) + lb
        v[2] = 7.0  # constant dimension
        rows.append(list(map(float, v)))
        labels.append(lb)
    t = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                  "label": pa.array(labels, pa.int32()),
                  "embedding": pa.array(rows, pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_normalize_by_label(str(tmp_path))
    z = out.pivot(index="vec_id", columns="pos", values="z")
    for lb in (0, 1):
        sel = z.loc[[i for i in range(60) if i % 2 == lb]]
        for pos in (1, 2):
            assert abs(sel[pos].mean()) < 1e-5
            assert abs(sel[pos].std(ddof=0) - 1.0) < 1e-5
        assert (sel[3] == 0.0).all()  # constant dim


def test_event_anomaly_flags_spike(ray_session, tmp_path):
    """q76: a planted hourly spike flags (|z| > 2 against that type's
    own hourly distribution); steady hours do not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_event_anomaly

    rows = []
    base = pd.Timestamp("2024-03-01")
    for h in range(24):
        count = 100 if h == 7 else 10  # spike at hour 7
        for i in range(count):
            rows.append({"event_type": "view",
                         "ts": base + pd.Timedelta(hours=h, seconds=i)})
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = q_event_anomaly(str(tmp_path))
    spike_h = int((base + pd.Timedelta(hours=7)).timestamp())
    by = out.set_index("hour_start")
    assert bool(by.loc[spike_h, "flagged"])
    assert by["flagged"].sum() == 1  # only the spike
    assert by.loc[spike_h, "z"] > 4


def test_label_ops_null_edges(ray_session, tmp_path):
    """NULL-label rows: q75 drops them (its oracle's JOIN USING), q40
    keeps them as their own centroid group (its oracle's GROUP BY);
    neither crashes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import (
        q_label_centroids,
        q_normalize_by_label,
    )

    t = pa.table({"vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "label": pa.array([0, 0, None, None], pa.int32()),
                  "embedding": pa.array([[1.0, 3.0], [3.0, 5.0],
                                         [10.0, 10.0], [20.0, 30.0]],
                                        pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    z = q_normalize_by_label(str(tmp_path))
    assert set(z["vec_id"]) == {0, 1}  # null-label vecs dropped

    c = q_label_centroids(str(tmp_path))
    by = {(lb if lb is not pd.NA and not pd.isna(lb) else None, p): v
          for lb, p, v in zip(c["label"], c["pos"], c["c"])}
    assert by[(0, 1)] == 2.0 and by[(0, 2)] == 4.0
    assert by[(None, 1)] == 15.0 and by[(None, 2)] == 20.0


def test_event_anomaly_null_edges(ray_session, tmp_path):
    """q76: NULL event_type and NULL ts rows drop on both sides."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_event_anomaly

    base = pd.Timestamp("2024-03-01").value // 1000
    t = pa.table({
        "event_type": pa.array(["view", None, "view"], pa.string()),
        "ts": pa.array([base, base, None], pa.timestamp("us")),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_event_anomaly(str(tmp_path))
    assert len(out) == 1 and out["n"].iloc[0] == 1


def test_pii_redact_counts_and_masks(ray_session, tmp_path):
    """q77: planted email / IPv4 / phone strings are counted on the
    original text and masked in order (emails, IPs, phones); NULL text
    passes through as NULL counts + NULL redacted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_pii_redact

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at a.b+c@ex-ample.org or x@y.io thanks",
            "server 10.0.0.1 and 192.168.1.255, call +1 (555) 123-4567",
            "no pii here at all",
            None,
        ], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_pii_redact(str(tmp_path)).set_index("doc_id")

    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_ips"] == 0
    assert out.loc[0, "redacted"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out.loc[1, "n_ips"] == 2 and out.loc[1, "n_phones"] == 1
    assert out.loc[1, "redacted"] == "server <IP> and <IP>, call <PHONE>"
    assert out.loc[2, ["n_emails", "n_ips", "n_phones"]].tolist() == [0, 0, 0]
    assert out.loc[2, "redacted"] == "no pii here at all"
    import pandas as pd
    assert pd.isna(out.loc[3, "redacted"]) and pd.isna(out.loc[3, "n_emails"])


def test_unigram_nll_hand_computed(ray_session, tmp_path):
    """q78: avg NLL matches the hand-computed self-trained unigram LM;
    rare-token docs score strictly higher; zero-token docs drop."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_unigram_nll

    # corpus: 'a' x3, 'b' x1  (total 4) → nll(a)=ln(4/3), nll(b)=ln(4)
    rows = [{"doc_id": 0, "text": "a a a"},
            {"doc_id": 1, "text": "b"},
            {"doc_id": 2, "text": "..."}]  # no tokens → dropped
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = q_unigram_nll(str(tmp_path)).set_index("doc_id")
    assert list(out.index) == [0, 1]
    assert out.loc[0, "n_tokens"] == 3
    assert abs(out.loc[0, "avg_nll"] - math.log(4 / 3)) < 1e-6
    assert abs(out.loc[1, "avg_nll"] - math.log(4.0)) < 1e-6
    assert out.loc[1, "avg_nll"] > out.loc[0, "avg_nll"]


def test_bigram_topk_counts_and_tiebreak(ray_session, tmp_path):
    """q79: bigrams counted within docs only (no cross-doc pairs),
    ties break bigram-ascending."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_bigram_topk

    rows = [{"doc_id": 0, "text": "x y x y"},   # 'x y' x2, 'y x' x1
            {"doc_id": 1, "text": "y"},          # no bigram
            {"doc_id": 2, "text": "a b"}]        # 'a b' x1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = q_bigram_topk(str(tmp_path), k=3)
    assert list(zip(out["bigram"], out["n"])) == [
        ("x y", 2), ("a b", 1), ("y x", 1)]


def test_semdedup_drops_planted_near_dups(ray_session, tmp_path):
    """q80: near-identical embeddings land in one cluster and every
    later copy is dropped (keep-first); distinct vectors survive; NULL
    embeddings vanish; the zero vector is kept (cos 0 to everything)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_semdedup

    vecs = [
        [1.0, 0.0, 0.0, 0.0],     # 0: init c0, kept
        [0.0, 1.0, 0.0, 0.0],     # 1: init c1, kept
        [1.0, 0.01, 0.0, 0.0],    # 2: near-dup of 0 → dropped
        [0.0, 1.0, 0.01, 0.0],    # 3: near-dup of 1 → dropped
        [0.6, 0.8, 0.0, 0.0],     # 4: distinct → kept
        None,                      # 5: NULL → absent from output
        [0.0, 0.0, 0.0, 0.0],     # 6: zero vector → kept
        [1.0, 0.011, 0.0, 0.0],   # 7: dup of 0 AND of dropped 2 → dropped
    ]
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    out = q_semdedup(str(tmp_path), k=2, iters=2, threshold=0.95)
    assert list(out["vec_id"]) == [0, 1, 2, 3, 4, 6, 7]
    keep = dict(zip(out["vec_id"], out["keep"]))
    assert keep == {0: True, 1: True, 2: False, 3: False,
                    4: True, 6: True, 7: False}
    cl = dict(zip(out["vec_id"], out["cluster"]))
    assert cl[2] == cl[0] and cl[3] == cl[1] and cl[7] == cl[0]


def test_pca_power_recovers_dominant_axis(ray_session, tmp_path):
    """q81: on data whose variance is overwhelmingly along one known
    axis, three power iterations align with that axis; the mean offset
    is removed (covariance, not raw second moment); NULL rows drop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_pca_power

    rng = np.random.default_rng(7)
    n, d = 400, 6
    X = rng.normal(0, 0.01, (n, d))
    X[:, 2] += rng.normal(0, 5.0, n)   # dominant variance on axis 3
    X += 100.0                          # large common mean to catch centering bugs
    vecs = [list(map(float, r)) for r in X] + [None]
    t = pa.table({"vec_id": pa.array(range(n + 1), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    out = q_pca_power(str(tmp_path))
    v = out.sort_values("pos")["v"].to_numpy()
    assert len(v) == d
    assert abs(abs(v[2]) - 1.0) < 1e-3          # dominant axis
    assert np.abs(np.delete(v, 2)).max() < 0.05  # everything else tiny


def test_rollup_levels_and_null_keys(ray_session, tmp_path):
    """q82: subtotal rows (lvl 1/3) are derived from the leaf pass; a
    genuine NULL lang keeps its own leaf row (lvl 0) distinct from the
    subtotal NULL marker; NULL n_chars is skipped by sums like SQL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_rollup_docs

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a", "b", "c", "d"], pa.string()),
        "lang": pa.array(["en", "en", None, "de"], pa.string()),
        "source": pa.array(["s1", "s2", "s1", "s1"], pa.string()),
        "n_chars": pa.array([10, 20, 30, None], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_rollup_docs(str(tmp_path))

    leaf = out[out["lvl"] == 0]
    assert len(leaf) == 4  # (en,s1) (en,s2) (None,s1) (de,s1)
    null_leaf = leaf[leaf["lang"].isna()]
    assert len(null_leaf) == 1 and null_leaf["source"].iloc[0] == "s1"

    sub = out[out["lvl"] == 1].set_index("lang")
    assert sub.loc["en", "n_docs"] == 2 and sub.loc["en", "sum_chars"] == 30
    assert pd.isna(sub.loc["de", "sum_chars"])  # all-NULL chars → NULL, not 0
    grand = out[out["lvl"] == 3]
    assert grand["n_docs"].iloc[0] == 4 and grand["sum_chars"].iloc[0] == 60


def test_retention_cohort_grid(ray_session, tmp_path):
    """q83: cohort = hour of first event; each (cohort, offset) cell
    counts distinct users, repeat events in one hour count once; NULL
    user/ts rows are out of contract and dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_retention

    H = 3600 * 1_000_000  # one hour in µs
    rows = [
        # user 1: first at hour 0, active hours 0 (twice) and 2
        (1, 0), (1, 10), (1, 2 * H),
        # user 2: first at hour 0, active hour 0 only
        (2, 30),
        # user 3: first at hour 2, active hours 2 and 3
        (3, 2 * H), (3, 3 * H),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows) + 2), pa.int64()),
        "user_id": pa.array([u for u, _ in rows] + [None, 9], pa.int64()),
        "ts": pa.array([ts for _, ts in rows] + [0, None],
                       pa.timestamp("us")),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_retention(str(tmp_path))
    grid = {(c, o): n for c, o, n in
            zip(out["cohort_hour"], out["offset_h"], out["n_users"])}
    assert grid == {(0, 0): 2, (0, 2): 1, (7200, 0): 1, (7200, 1): 1}


def test_quantile_sketch_error_bound(ray_session, tmp_path):
    """q84: estimates land within one bin width of the exact
    percentiles; NULL/NaN values drop; a constant column collapses to
    the constant."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.sketches import (_HIST_BINS,
                                                     q_value_quantile_sketch)

    rng = np.random.default_rng(11)
    v = rng.exponential(50.0, 20000)
    vals = list(map(float, v)) + [None, float("nan")]
    t = pa.table({"event_id": pa.array(range(len(vals)), pa.int64()),
                  "value": pa.array(vals, pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))

    out = q_value_quantile_sketch(str(tmp_path)).set_index("q")
    width = (v.max() - v.min()) / _HIST_BINS
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(v, q)
        assert abs(out.loc[q, "value_est"] - exact) <= width + 1e-9, (q, exact)

    t2 = pa.table({"event_id": pa.array([0, 1, 2], pa.int64()),
                   "value": pa.array([7.0, 7.0, 7.0], pa.float64())})
    pq.write_table(t2, str(tmp_path / "events.parquet"))
    out2 = q_value_quantile_sketch(str(tmp_path))
    assert np.allclose(out2["value_est"], 7.0, atol=1e-3)


def test_new_ops_empty_and_null_edges(ray_session, tmp_path):
    """Review regressions: q77/q78/q79/q82 on a 0-row documents table
    (oracle: empty, except ROLLUP's grand row); q82 NULL group keys come
    back as None, not float NaN; q84 with an inf value estimates the
    finite mass; q80 survives a single-vector table (hash_shuffle P=1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_rollup_docs
    from web_scrapper_ray.pipelines.similarity import q_semdedup
    from web_scrapper_ray.pipelines.sketches import q_value_quantile_sketch
    from web_scrapper_ray.pipelines.textops import (q_bigram_topk,
                                                    q_pii_redact,
                                                    q_unigram_nll)

    docs_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                             ("lang", pa.string()), ("source", pa.string()),
                             ("n_chars", pa.int64())])
    pq.write_table(docs_schema.empty_table(),
                   str(tmp_path / "documents.parquet"))
    assert q_pii_redact(str(tmp_path)).empty
    assert q_unigram_nll(str(tmp_path)).empty
    assert q_bigram_topk(str(tmp_path)).empty
    r = q_rollup_docs(str(tmp_path))
    assert len(r) == 1 and r["lvl"].iloc[0] == 3 and r["n_docs"].iloc[0] == 0
    assert r["lang"].iloc[0] is None and pd.isna(r["sum_chars"].iloc[0])

    # NULL group keys must be None (oracle NULL), never float NaN
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a", "b"]),
                  "lang": pa.array([None, "en"], pa.string()),
                  "source": pa.array(["s", None], pa.string()),
                  "n_chars": pa.array([1, 2], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    r2 = q_rollup_docs(str(tmp_path))
    for v in list(r2["lang"]) + list(r2["source"]):
        assert v is None or isinstance(v, str), repr(v)

    # inf must not poison the histogram bounds
    ev = pa.table({"event_id": pa.array(range(5), pa.int64()),
                   "value": pa.array([1.0, 2.0, 3.0, 4.0, float("inf")],
                                     pa.float64())})
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    s = q_value_quantile_sketch(str(tmp_path))
    assert np.isfinite(s["value_est"]).all()
    assert (s["value_est"] <= 4.0 + 1e-9).all()

    # single usable init vector → P=1 exchange
    e = pa.table({"vec_id": pa.array([0], pa.int64()),
                  "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32()))})
    pq.write_table(e, str(tmp_path / "embeddings.parquet"))
    d = q_semdedup(str(tmp_path))
    assert list(d["vec_id"]) == [0] and bool(d["keep"].iloc[0])


def test_user_type_pivot_small(ray_session, tmp_path):
    """q85: wide per-user counts from a hand-built log — NULL user_id
    keeps its own row, NULL event_type counts in n_total only, an
    all-NULL value group sums to NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_user_type_pivot

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, None], pa.int64()),
        "event_type": pa.array(["click", "click", "view", None, "signup"],
                               pa.string()),
        "value": pa.array([1.5, 2.5, None, None, None], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_user_type_pivot(str(tmp_path))
    assert len(out) == 3
    r1 = out[out["user_id"] == 1].iloc[0]
    assert (int(r1["n_click"]), int(r1["n_view"]), int(r1["n_total"])) == (2, 1, 3)
    assert r1["sum_value"] == 4.0
    r2 = out[out["user_id"] == 2].iloc[0]
    assert int(r2["n_total"]) == 1 and int(r2["n_click"]) == 0
    assert pd.isna(r2["sum_value"])  # SQL sum over all-NULL -> NULL
    rn = out[out["user_id"].isna()].iloc[0]
    assert int(rn["n_signup"]) == 1 and int(rn["n_total"]) == 1

    d2 = tmp_path / "empty"
    d2.mkdir()
    pq.write_table(t.slice(0, 0), str(d2 / "events.parquet"))
    assert len(q_user_type_pivot(str(d2))) == 0


def test_event_gaps_small(ray_session, tmp_path):
    """q86: gaps telescope to span/(n-1); single-event users keep a row
    with NULL gaps; NULL user/ts rows are dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_event_gaps

    base = pd.Timestamp("2024-01-01").value // 1000  # us
    ts = lambda s: pd.Timestamp((base + int(s * 1e6)) * 1000)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, None, 3], pa.int64()),
        "ts": pa.array([ts(0), ts(10), ts(40), ts(5), ts(0), None],
                       pa.timestamp("us")),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_event_gaps(str(tmp_path))
    assert list(out["user_id"]) == [1, 2]
    r1 = out.iloc[0]
    assert int(r1["n_events"]) == 3
    assert r1["avg_gap_s"] == 20.0  # (40-0)/2
    assert r1["max_gap_s"] == 30.0
    r2 = out.iloc[1]
    assert int(r2["n_events"]) == 1
    assert pd.isna(r2["avg_gap_s"]) and pd.isna(r2["max_gap_s"])


def test_order_deciles_small(ray_session, tmp_path):
    """q87: exact ntile semantics without a global sort — uneven
    n_total (first n%10 tiles get the extra row) and n_total < tiles
    (one row per tile that exists)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_order_deciles

    t = pa.table({"o_orderkey": pa.array(range(23), pa.int64()),
                  "o_totalprice": pa.array(
                      [float(1000 + 7 * i % 100) for i in range(23)],
                      pa.float64())})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_order_deciles(str(tmp_path))
    assert list(out["tile"]) == list(range(1, 11))
    # 23 rows -> tiles 1-3 have 3 rows, 4-10 have 2
    assert list(out["n_orders"]) == [3, 3, 3] + [2] * 7
    # tiles partition the sorted order: max of tile t <= min of tile t+1
    assert (out["max_price"].to_numpy()[:-1]
            <= out["min_price"].to_numpy()[1:]).all()

    d2 = tmp_path / "tiny"
    d2.mkdir()
    pq.write_table(t.slice(0, 4), str(d2 / "orders.parquet"))
    out2 = q_order_deciles(str(d2))
    assert list(out2["tile"]) == [1, 2, 3, 4]
    assert list(out2["n_orders"]) == [1, 1, 1, 1]

    d3 = tmp_path / "empty"
    d3.mkdir()
    pq.write_table(t.slice(0, 0), str(d3 / "orders.parquet"))
    assert len(q_order_deciles(str(d3))) == 0


def test_bloom_semijoin_small(ray_session, tmp_path):
    """q88: bloom prefilter + exact verify gives the exact semi-join —
    non-qualifying orders and unmatched lineitems drop; empty build
    side yields zero rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_bloom_semijoin

    od = pa.table({"o_orderkey": pa.array([1, 2, 3], pa.int64()),
                   "o_totalprice": pa.array([10.0, 20.0, 30.0],
                                            pa.float64())})
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 2, 3, 4], pa.int64()),
        "l_returnflag": pa.array(["A", "A", "B", "B", "B"], pa.string()),
        "l_extendedprice": pa.array([100.0] * 5, pa.float64()),
        "l_discount": pa.array([0.1] * 5, pa.float64())})
    pq.write_table(od, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))

    out = q_bloom_semijoin(str(tmp_path), cutoff=15.0)  # orders 2,3 qualify
    got = {r.l_returnflag: (int(r.n_items), float(r.revenue))
           for r in out.itertuples()}
    assert got == {"A": (1, 90.0), "B": (2, 180.0)}

    out2 = q_bloom_semijoin(str(tmp_path), cutoff=100.0)  # nothing qualifies
    assert len(out2) == 0


def test_dup_spans_small(ray_session, tmp_path):
    """q89: a planted 7-token span shared by two docs is found with
    n_docs=2; a repeated span WITHIN one doc does not count; short docs
    produce no shingles."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_dup_spans

    span = "alpha bravo charlie delta echo foxtrot golf"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            f"prefix {span} suffix words here",
            f"other text {span} trailing",
            f"{span} {span}",      # twice in ONE doc -> counts once
            "too short",
        ], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_dup_spans(str(tmp_path))
    got = dict(zip(out["shingle"], out["n_docs"]))
    assert got[span] == 3  # docs 0, 1, 2 (doc 2 deduped to one)
    # every reported span occurs in >= 2 docs
    assert (out["n_docs"] >= 2).all()


def test_mad_outliers_small(ray_session, tmp_path):
    """q90: hand-computable median/MAD and the 3-MAD outlier count;
    NULL values are out of contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_mad_outliers

    t = pa.table({
        "event_type": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 100.0, 5.0, None],
                          pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_mad_outliers(str(tmp_path))
    ra = out[out["event_type"] == "a"].iloc[0]
    assert ra["med"] == 3.0 and ra["mad"] == 1.0  # |1,2,3,4,100 - 3| -> 2,1,0,1,97
    assert int(ra["n_outliers"]) == 1  # only 97 > 3
    rb = out[out["event_type"] == "b"].iloc[0]
    assert rb["med"] == 5.0 and rb["mad"] == 0.0 and int(rb["n_outliers"]) == 0


def test_readability_small(ray_session, tmp_path):
    """q91: hand-computed Flesch arithmetic; fragment clamps to one
    sentence; zero-word doc scores NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_readability

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["See it. Go on!", "?!"], pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_readability(str(tmp_path))
    r0 = out.iloc[0]
    # words=4, sentences=2, vowel-groups: ee,i,o,o = 4
    assert (int(r0["n_words"]), int(r0["n_sentences"]),
            int(r0["n_syllables"])) == (4, 2, 4)
    assert r0["fre"] == round(206.835 - 1.015 * 2.0 - 84.6 * 1.0, 4)
    r1 = out.iloc[1]
    assert int(r1["n_words"]) == 0 and int(r1["n_sentences"]) == 1
    assert pd.isna(r1["fre"])


def test_event_regression_small(ray_session, tmp_path):
    """q92: exact slope/intercept on a planted line; a single-point
    group gets NULL slope/r2; NULL value rows are ignored."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import (_REGR_X0,
                                                       q_event_regression)

    base_us = int((_REGR_X0 + 7200) * 1e6)  # x = 2.0 hours
    hrs = lambda h: pd.Timestamp(int(base_us + h * 3.6e9) * 1000)
    t = pa.table({
        "event_type": pa.array(["a"] * 3 + ["b", "a"], pa.string()),
        "ts": pa.array([hrs(0), hrs(1), hrs(2), hrs(0), hrs(3)],
                       pa.timestamp("us")),
        "value": pa.array([10.0, 12.0, 14.0, 5.0, None], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_event_regression(str(tmp_path))
    ra = out[out["event_type"] == "a"].iloc[0]
    assert int(ra["n"]) == 3  # the NULL-value row is ignored
    assert ra["slope"] == 2.0 and ra["r2"] == 1.0
    assert ra["icept"] == 10.0 - 2.0 * 2.0  # y = 2x + 6 at x0=2h
    rb = out[out["event_type"] == "b"].iloc[0]
    assert int(rb["n"]) == 1
    assert pd.isna(rb["slope"]) and pd.isna(rb["r2"])


def test_round_away_matches_sql():
    """round_away is half-away-from-zero like SQL round(), where
    np.round's banker's rounding flips the half boundary."""
    from web_scrapper_ray.pipelines.pairs import round_away

    assert float(round_away(33.48125, 4)) == 33.4813  # np.round -> 33.4812
    assert float(round_away(-33.48125, 4)) == -33.4813
    assert float(round_away(2.5, 0)) == 3.0
    assert float(round_away(-2.5, 0)) == -3.0
    assert np.isnan(round_away(float("nan"), 2))
    assert float(round_away(1.23449, 4)) == 1.2345
    assert float(round_away(1.23444, 4)) == 1.2344  # below half stays down


def test_new_ops_null_edges(ray_session, tmp_path):
    """Review-fix pins: q87 NULL prices rank last (NULLS LAST) with
    NULL stats in their tile; q88 keeps a NULL-returnflag group; q92
    returns r2=1.0 for a constant-y group (DuckDB regr_r2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import (q_bloom_semijoin,
                                                       q_event_regression,
                                                       q_order_deciles)

    d1 = tmp_path / "deciles"
    d1.mkdir()
    od = pa.table({"o_orderkey": pa.array(range(6), pa.int64()),
                   "o_totalprice": pa.array(
                       [30.0, 10.0, None, 20.0, None, 40.0], pa.float64())})
    pq.write_table(od, str(d1 / "orders.parquet"))
    out = q_order_deciles(str(d1), tiles=3)
    # sorted: 10,20,30,40,NULL,NULL -> tiles of 2: (10,20) (30,40) (N,N)
    assert list(out["n_orders"]) == [2, 2, 2]
    assert out["max_price"].iloc[1] == 40.0
    assert pd.isna(out["min_price"].iloc[2]) and pd.isna(out["sum_price"].iloc[2])

    d2 = tmp_path / "bloom"
    d2.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([100.0], pa.float64())}),
        str(d2 / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1], pa.int64()),
        "l_returnflag": pa.array(["A", None], pa.string()),
        "l_extendedprice": pa.array([10.0, 20.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64())}),
        str(d2 / "lineitem.parquet"))
    out2 = q_bloom_semijoin(str(d2), cutoff=50.0)
    assert len(out2) == 2  # the NULL-flag group survives
    assert out2["l_returnflag"].iloc[-1] is None
    assert out2["revenue"].iloc[-1] == 20.0

    d3 = tmp_path / "regr"
    d3.mkdir()
    ts0 = pd.Timestamp("2024-01-01")
    pq.write_table(pa.table({
        "event_type": pa.array(["c"] * 3, pa.string()),
        "ts": pa.array([ts0, ts0 + pd.Timedelta(hours=1),
                        ts0 + pd.Timedelta(hours=2)], pa.timestamp("us")),
        "value": pa.array([7.0, 7.0, 7.0], pa.float64())}),
        str(d3 / "events.parquet"))
    out3 = q_event_regression(str(d3))
    r = out3.iloc[0]
    assert r["slope"] == 0.0 and r["r2"] == 1.0  # constant y, varying x


def test_corr_matrix_small(ray_session, tmp_path):
    """q94: perfectly linear qty→price gives corr 1.0; a constant
    column yields NULL (zero variance); empty table → all-NULL row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_corr_matrix

    t = pa.table({
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0, 400.0],
                                    pa.float64()),
        "l_discount": pa.array([0.05] * 4, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = q_corr_matrix(str(tmp_path))
    assert out["corr_qty_price"].iloc[0] == 1.0
    assert pd.isna(out["corr_qty_disc"].iloc[0])
    assert pd.isna(out["corr_price_disc"].iloc[0])

    d2 = tmp_path / "empty"
    d2.mkdir()
    pq.write_table(t.slice(0, 0), str(d2 / "lineitem.parquet"))
    out2 = q_corr_matrix(str(d2))
    assert len(out2) == 1 and out2.isna().all(axis=None)


def test_running_total_small(ray_session, tmp_path):
    """q95: per-customer cumulative spend in exact cents — same-date
    ties break by orderkey, customers never bleed into each other, and
    0.1+0.2-style float prices stay exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_running_total

    d = pd.Timestamp("2024-01-01")
    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([7, 7, 7, 9, 9], pa.int64()),
        "o_orderdate": pa.array(
            [d, d, d + pd.Timedelta(days=1), d, d], pa.timestamp("us")),
        "o_totalprice": pa.array([0.10, 0.20, 0.30, 5.00, 2.50],
                                 pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_running_total(str(tmp_path)).set_index("o_orderkey")
    # cust 7: orderkey tie on day 0 -> 0.10, then 0.30, then 0.60
    assert list(out.loc[[1, 2, 3], "running_spend"]) == [0.10, 0.30, 0.60]
    # cust 9: same date, orderkey order -> 5.00 then 7.50
    assert list(out.loc[[4, 5], "running_spend"]) == [5.00, 7.50]

    d2 = tmp_path / "empty"
    d2.mkdir()
    pq.write_table(t.slice(0, 0), str(d2 / "orders.parquet"))
    assert len(q_running_total(str(d2))) == 0


def test_cube_agg_small(ray_session, tmp_path):
    """q96: all four grouping sets from one leaf pass; a genuine NULL
    group key stays a leaf row (lvl 0), disambiguated from subtotal
    NULLs by lvl; empty table emits only the grand row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_cube_agg

    t = pa.table({
        "l_returnflag": pa.array(["A", "A", None, "R"], pa.string()),
        "l_linestatus": pa.array(["O", "F", "O", "O"], pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = q_cube_agg(str(tmp_path))
    leaf = out[out["lvl"] == 0]
    assert len(leaf) == 4  # (A,O) (A,F) (NULL,O) (R,O)
    null_leaf = leaf[leaf["l_returnflag"].isna()]
    assert int(null_leaf["sum_qty"].iloc[0]) == 4
    grand = out[out["lvl"] == 3]
    assert int(grand["n_items"].iloc[0]) == 4
    assert int(grand["sum_qty"].iloc[0]) == 15
    by_status = out[out["lvl"] == 2]
    assert int(by_status[by_status["l_linestatus"] == "O"]["sum_qty"]
               .iloc[0]) == 13
    # lvl-1 rolls status within flag: NULL flag keeps its own subtotal
    by_flag = out[out["lvl"] == 1]
    assert len(by_flag) == 3

    d2 = tmp_path / "empty"
    d2.mkdir()
    pq.write_table(t.slice(0, 0), str(d2 / "lineitem.parquet"))
    out2 = q_cube_agg(str(d2))
    assert len(out2) == 1 and int(out2["lvl"].iloc[0]) == 3
    assert int(out2["n_items"].iloc[0]) == 0


def test_cube_agg_offgrid_cast_half_even(ray_session, tmp_path):
    """q96 off-grid quantities: DuckDB cast(double AS BIGINT) rounds
    half-to-EVEN (cast(2.5)=2, cast(0.5)=0, cast(-2.5)=-2 — unlike
    round(), which is half-away). The sf tables keep quantities on an
    integral grid, so this boundary is invisible to the driver gate —
    pin it against the live DuckDB cast here."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_cube_agg

    t = pa.table({
        "l_returnflag": pa.array(["A", "A", "A", "A", "A"], pa.string()),
        "l_linestatus": pa.array(["O"] * 5, pa.string()),
        "l_quantity": pa.array([2.5, 3.5, -2.5, 0.5, 1.5], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = q_cube_agg(str(tmp_path))
    grand = int(out[out["lvl"] == 3]["sum_qty"].iloc[0])
    oracle = duckdb.sql(
        "select sum(cast(l_quantity AS BIGINT)) from "
        f"read_parquet('{tmp_path}/lineitem.parquet')").fetchone()[0]
    assert grand == int(oracle) == 6  # 2+4-2+0+2, half-to-even


def test_next_event_gap_small(ray_session, tmp_path):
    """q97: leads are per (user, type) — interleaved types don't see
    each other; the last event of each partition gets NaN; NULL
    user/type/ts rows are out of contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_next_event_gap

    base = pd.Timestamp("2024-01-01")
    ts = lambda s: base + pd.Timedelta(seconds=s)
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, None, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "a", None],
                               pa.string()),
        "ts": pa.array([ts(0), ts(1), ts(10), ts(21), ts(2), ts(3)],
                       pa.timestamp("us")),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_next_event_gap(str(tmp_path)).set_index("event_id")
    assert list(out.index) == [1, 2, 3, 4]  # NULL rows dropped
    assert out.loc[1, "next_gap_us"] == 10e6  # a: 0 -> 10
    assert out.loc[2, "next_gap_us"] == 20e6  # b: 1 -> 21
    assert pd.isna(out.loc[3, "next_gap_us"])
    assert pd.isna(out.loc[4, "next_gap_us"])


def test_mode_per_user_small(ray_session, tmp_path):
    """q98: the modal type wins; exact ties break to the
    lexicographically smaller type (row_number ORDER BY n DESC, type)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_mode_per_user

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["b", "b", "a", "z", "a", "q"],
                               pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_mode_per_user(str(tmp_path)).set_index("user_id")
    assert out.loc[1, "mode_type"] == "b" and out.loc[1, "n_events"] == 2
    assert out.loc[2, "mode_type"] == "a"  # 1-1 tie -> lexicographic
    assert out.loc[3, "mode_type"] == "q"


def test_median_value_disc_small(ray_session, tmp_path):
    """q99: quantile_disc(0.5) picks the element at ceil(n/2)-1 of the
    sorted values — the LOWER middle for even n, no interpolation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_median_value_disc

    t = pa.table({
        "event_type": pa.array(["e"] * 4 + ["o"] * 3 + ["s"],
                               pa.string()),
        "value": pa.array([4.0, 1.0, 3.0, 2.0, 30.0, 10.0, 20.0, 7.5],
                          pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_median_value_disc(str(tmp_path)).set_index("event_type")
    assert out.loc["e", "median_value"] == 2.0  # even n=4 -> lower middle
    assert out.loc["o", "median_value"] == 20.0  # odd n=3 -> middle
    assert out.loc["s", "median_value"] == 7.5
    assert int(out.loc["e", "n_events"]) == 4

    # force the rank-refinement loop (max_collect far below the type
    # sizes): exact order statistics, duplicate-heavy one-round
    # convergence, and the -inf / +inf / NaN total-order blocks
    rng = np.random.default_rng(7)
    big = rng.normal(100.0, 17.0, size=5001)
    dup = np.full(4000, 42.5)
    inf_vals = np.r_[np.full(3, -np.inf), [1.0, 2.0], np.full(6, np.inf)]
    nan_vals = np.r_[[5.0], np.full(4, np.nan)]
    d2 = tmp_path / "refine"
    d2.mkdir()
    pq.write_table(pa.table({
        "event_type": pa.array(["big"] * len(big) + ["dup"] * len(dup)
                               + ["inf"] * len(inf_vals)
                               + ["nan"] * len(nan_vals), pa.string()),
        "value": pa.array(np.r_[big, dup, inf_vals, nan_vals],
                          pa.float64())}), str(d2 / "events.parquet"))
    out2 = (q_median_value_disc(str(d2), bins=16, max_collect=64)
            .set_index("event_type"))
    exact = np.sort(big)[int(np.ceil(len(big) / 2)) - 1]
    assert out2.loc["big", "median_value"] == exact
    assert out2.loc["dup", "median_value"] == 42.5
    # inf: sorted blocks [-inf x3 | 1,2 | +inf x6], k=ceil(11/2)-1=5 -> +inf
    assert out2.loc["inf", "median_value"] == np.inf
    # NaN values are excluded on BOTH sides (quantile_disc's selection
    # network has no consistent NaN placement with >1 NaN — probed r3):
    # the 'nan' group keeps only its finite 5.0
    assert out2.loc["nan", "median_value"] == 5.0
    assert int(out2.loc["nan", "n_events"]) == 1
    assert int(out2.loc["big", "n_events"]) == len(big)


def test_bm25_scores_small(ray_session, tmp_path):
    """q93: hand-checked Okapi BM25 — matching docs score by the
    closed form, tf saturation orders repeated terms above single
    hits, non-matching docs emit no row."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import (BM25_B, BM25_K1,
                                                    q_bm25_scores)

    texts = ["hash join", "the cat sat", "hash hash hash hash"]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_bm25_scores(str(tmp_path)).set_index("doc_id")
    assert list(out.index) == [1, 3]  # doc 2 matches nothing

    n, avgdl = 3.0, 9 / 3.0
    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf, dl, df):
        return (idf(df) * tf * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)))
    exp1 = w(1, 2, 2) + w(1, 2, 1)   # hash + join
    exp3 = w(4, 4, 2)                # hash x4
    assert abs(out.loc[1, "score"] - exp1) < 1e-6
    assert abs(out.loc[3, "score"] - exp3) < 1e-6


def test_bpe_train_sennrich_example(ray_session, tmp_path):
    """q100: the canonical BPE walkthrough (Sennrich et al. 2016) —
    {low:5, lower:2, newest:6, widest:3} with an explicit </w> marker
    learns es, est, est</w>, lo, low, ew in that exact order (ties
    break to the lexicographically smaller pair)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_bpe_train

    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_bpe_train(str(tmp_path), n_merges=6)
    got = list(zip(out["left"], out["right"], out["freq"]))
    assert got == [("e", "s", 9), ("es", "t", 9), ("est", "</w>", 9),
                   ("l", "o", 7), ("lo", "w", 7), ("e", "w", 6)]
    assert list(out["rank"]) == list(range(6))

    d2 = tmp_path / "empty"
    d2.mkdir()
    pq.write_table(t.slice(0, 0), str(d2 / "documents.parquet"))
    assert len(q_bpe_train(str(d2))) == 0


def test_percentile_cont_small(ray_session, tmp_path):
    """q102: DuckDB quantile_cont parity — integral ranks short-circuit
    to the element, fractional ranks interpolate v0*(1-f) + v1*f in
    that exact IEEE op order; NaN rows are filtered by contract; a
    -inf bracket propagates like the oracle. Forced refinement path
    checked against the formula on the fully sorted values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_percentile_cont

    rng = np.random.default_rng(11)
    big = rng.lognormal(0.0, 2.0, size=4001)
    small = np.array([1.0, 2.0, 4.0, 8.0])       # RN=(4-1)*.9=2.7
    nanny = np.array([5.0, np.nan, 6.0, np.nan])  # NaN filtered -> n=2
    infy = np.r_[np.full(9, -np.inf), [1.0]]      # RN=8.1 -> interp(-inf,-inf)
    t = pa.table({
        "event_type": pa.array(["big"] * len(big) + ["s"] * len(small)
                               + ["nan"] * len(nanny) + ["inf"] * len(infy),
                               pa.string()),
        "value": pa.array(np.r_[big, small, nanny, infy], pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (q_percentile_cont(str(tmp_path), bins=16, max_collect=64)
           .set_index("event_type"))

    def ref(vals, frac=0.9):
        v = np.sort(vals[~np.isnan(vals)])
        rn = (len(v) - 1) * frac
        i0, i1 = int(np.floor(rn)), int(np.ceil(rn))
        if i0 == i1:
            return v[i0]
        f = rn - i0
        return v[i0] * (1.0 - f) + v[i1] * f

    assert out.loc["big", "p90"] == ref(big)
    assert out.loc["s", "p90"] == ref(small)
    # the fractional part carries (4-1)*0.9's float error, exactly as
    # DuckDB computes it — NOT the decimal 0.3/0.7 split
    f = (4 - 1) * 0.9 - 2
    assert out.loc["s", "p90"] == 4.0 * (1.0 - f) + 8.0 * f
    assert out.loc["nan", "p90"] == ref(nanny)
    assert int(out.loc["nan", "n_events"]) == 2
    assert out.loc["inf", "p90"] == -np.inf


def test_native_left_outer_and_anti_join(ray_session, tmp_path):
    """q103/q104: native Dataset.join left_outer keeps unmatched parts
    with NULL aggregates; left_anti emits exactly those parts. The
    all-unmatched edge (no lineitem above the threshold) exercises the
    schema-less-right-side guard."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import (
        q_part_heavy_left_join, q_parts_never_heavy)

    part = pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["A", "B", "C"], pa.string()),
        "p_type": pa.array(["t", "t", "t"], pa.string()),
        "p_name": pa.array(["n", "n", "n"], pa.string()),
        "p_size": pa.array([1, 1, 1], pa.int32()),
        "p_retailprice": pa.array([9.0, 9.0, 9.0], pa.float64()),
    })
    li = pa.table({
        "l_orderkey": pa.array([10, 11, 12], pa.int64()),
        "l_partkey": pa.array([1, 1, 3], pa.int64()),
        "l_quantity": pa.array([50.0, 46.0, 10.0], pa.float64()),
    })
    pq.write_table(part, str(tmp_path / "part.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))

    out = q_part_heavy_left_join(str(tmp_path)).set_index("p_partkey")
    assert out.loc[1, "n_ship"] == 2.0 and out.loc[1, "ship_qty"] == 96.0
    assert np.isnan(out.loc[2, "n_ship"]) and np.isnan(out.loc[3, "n_ship"])
    anti = q_parts_never_heavy(str(tmp_path))
    assert list(anti["p_partkey"]) == [2, 3]

    # no heavy shipments at all -> every part unmatched / anti
    d2 = tmp_path / "none"
    d2.mkdir()
    pq.write_table(part, str(d2 / "part.parquet"))
    lo = li.set_column(li.schema.get_field_index("l_quantity"),
                       "l_quantity", pa.array([1.0, 2.0, 3.0], pa.float64()))
    pq.write_table(lo, str(d2 / "lineitem.parquet"))
    out2 = q_part_heavy_left_join(str(d2))
    assert len(out2) == 3 and out2["n_ship"].isna().all()
    assert list(q_parts_never_heavy(str(d2))["p_partkey"]) == [1, 2, 3]


def test_fuzzy_name_join_banding(ray_session, tmp_path):
    """q105: deletion-neighborhood banding finds ALL edit-distance-≤1
    pairs exactly once — substitution, insertion/deletion, identical
    names (which share every band key: emit-once must dedup), and the
    classic shared-deletion-key FALSE candidate 'ab'/'ba' (distance 2,
    must be verified away)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import (_ed_le1,
                                                       q_fuzzy_name_join)

    assert _ed_le1("ab", "ab") and _ed_le1("ab", "aX")
    assert _ed_le1("ab", "abc") and _ed_le1("xabc", "abc")
    assert not _ed_le1("ab", "ba") and not _ed_le1("abc", "cba")

    names = ["ring", "ring", "rang", "rings", "ing", "ab", "ba", "zzz"]
    t = pa.table({
        "p_partkey": pa.array(list(range(1, len(names) + 1)), pa.int64()),
        "p_name": pa.array(names, pa.string()),
        "p_brand": pa.array(["B"] * len(names), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = q_fuzzy_name_join(str(tmp_path))
    got = set(zip(out["a_partkey"], out["b_partkey"], out["dist"]))
    expect = {(1, 2, 0),            # identical (all keys shared, once)
              (1, 3, 1), (2, 3, 1),  # substitution
              (1, 4, 1), (2, 4, 1),  # insertion
              (1, 5, 1), (2, 5, 1)}  # deletion
    assert got == expect            # no (6,7): 'ab'/'ba' is distance 2
    assert not out.duplicated(["a_partkey", "b_partkey"]).any()


def test_event_regression_constant_y(ray_session, tmp_path):
    """q92: a constant-y group must report r2 = 1.0 like DuckDB's
    regr_r2 (Welford gives var(y) exactly 0) even though the engine's
    naive moments leave vary tiny-POSITIVE for off-grid constants; a
    constant-x group reports NULL slope/r2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_event_regression

    base = pd.Timestamp("2024-01-01")
    ts = lambda s: base + pd.Timedelta(seconds=s)
    t = pa.table({
        "event_type": pa.array(["cy"] * 7 + ["cx"] * 3 + ["ok"] * 3),
        "ts": pa.array([ts(i * 3600) for i in range(7)]
                       + [ts(5)] * 3 + [ts(0), ts(3600), ts(7200)],
                       pa.timestamp("us")),
        "value": pa.array([1.7] * 7 + [1.0, 2.0, 3.0] + [1.0, 2.0, 3.0],
                          pa.float64()),
        "event_id": pa.array(list(range(13)), pa.int64()),
        "user_id": pa.array([1] * 13, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_event_regression(str(tmp_path)).set_index("event_type")
    assert out.loc["cy", "r2"] == 1.0          # constant y, varying x
    assert out.loc["cy", "slope"] == 0.0
    assert pd.isna(out.loc["cx", "slope"]) and pd.isna(out.loc["cx", "r2"])
    assert out.loc["ok", "r2"] == 1.0 and out.loc["ok", "slope"] == 1.0


def test_fuzzy_name_join_bytes_distance(ray_session, tmp_path):
    """q105 counts edit distance in UTF-8 BYTES like DuckDB's
    levenshtein: 'a'→'é' is two byte edits (no pair), while 'é'→'éx'
    is one byte... no — 'x' appended is one byte insertion (pair)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.relational import q_fuzzy_name_join

    names = ["a", "é", "éx", "ab"]
    t = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_name": pa.array(names, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = q_fuzzy_name_join(str(tmp_path))
    sql = duckdb.sql(
        "select p1.p_partkey a_partkey, p2.p_partkey b_partkey, "
        "levenshtein(p1.p_name, p2.p_name)::BIGINT dist "
        f"from read_parquet('{tmp_path}/part.parquet') p1, "
        f"read_parquet('{tmp_path}/part.parquet') p2 "
        "where p1.p_partkey < p2.p_partkey "
        "and levenshtein(p1.p_name, p2.p_name) <= 1 order by 1, 2").df()
    pd.testing.assert_frame_equal(out, sql)
    got = set(zip(out["a_partkey"], out["b_partkey"]))
    assert (2, 3) in got        # é→éx: one byte inserted
    assert (1, 2) not in got    # a→é: TWO byte edits (codepoint dist 1)


def test_weighted_sample_aes(ray_session, tmp_path):
    """q106: the distributed bottom-k A-ES sample equals the
    brute-force single-process computation, is invariant to how the
    table is split into row groups, never picks zero/NULL-weight
    docs, and higher weights win under equal hash luck."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.pairs import mix64
    from web_scrapper_ray.pipelines.textops import q_weighted_sample

    n = 500
    ids = np.arange(1, n + 1, dtype=np.int64)
    w = ((ids * 37) % 997 + 1).astype(np.int64)
    w[::50] = 0                    # some zero weights
    t = pa.table({"doc_id": pa.array(ids),
                  "n_chars": pa.array(w),
                  "text": pa.array(["x"] * n),
                  "lang": pa.array(["en"] * n),
                  "source": pa.array(["s"] * n)})
    pq.write_table(t, str(tmp_path / "documents.parquet"),
                   row_group_size=64)

    out = q_weighted_sample(str(tmp_path), k=25)
    # brute force (same 53-bit u derivation as the engine)
    ok = w > 0
    u = ((mix64(ids[ok].view(np.uint64)) >> np.uint64(11))
         .astype(np.float64) + 0.5) / 2.0**53
    lp = np.log(u) / w[ok]
    order = np.lexsort((ids[ok], -lp))[:25]
    expect = np.sort(ids[ok][order])
    assert list(out["doc_id"]) == list(expect)
    assert not set(out["doc_id"]) & set(ids[~ok])

    # split-invariance: one row group vs 64-row groups
    d2 = tmp_path / "one"
    d2.mkdir()
    pq.write_table(t, str(d2 / "documents.parquet"))
    out2 = q_weighted_sample(str(d2), k=25)
    pd.testing.assert_frame_equal(out, out2)


def test_zorder_layout_prunes(ray_session, tmp_path):
    """q108: a (user × hour) box intersects FAR fewer z-ordered
    partition envelopes than hour-sorted ones — the two-dimensional
    pruning the layout exists for — and the envelopes tile the table
    exactly (row counts sum, global min/max preserved)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.layout import morton2, q_zorder_layout

    rng = np.random.RandomState(7)
    n = 20000
    users = rng.randint(0, 1000, n).astype(np.int64)
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    ts = (base + rng.randint(0, 1000, n).astype(np.int64) * 3_600_000_000)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(users),
        "event_type": pa.array(["e"] * n),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(np.ones(n)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    out = q_zorder_layout(str(tmp_path), partitions=64)
    assert out["rows"].sum() == n
    assert out["user_min"].min() == users.min()
    assert out["user_max"].max() == users.max()

    hours = ts // 3_600_000_000
    # predicate on the dimension the reference layout does NOT sort
    # by: hour-sorted partitions each span ~the full user range, so a
    # user-range predicate prunes nothing there, while z-order keeps
    # user locality too
    ulo, uhi = 450, 550                    # ~10% of the user range

    def touch_fraction(env):
        hit = (env["user_max"] >= ulo) & (env["user_min"] <= uhi)
        return hit.mean()

    z_frac = touch_fraction(out)

    # reference layout: hour-sorted, same partition count — every
    # partition spans ~the full user range, so the user predicate
    # prunes nothing
    order = np.argsort(hours, kind="stable")
    p = np.arange(n) // -(-n // 64)
    ref = pd.DataFrame({"partition": p, "u": users[order],
                        "h": hours[order]}).groupby("partition").agg(
        user_min=("u", "min"), user_max=("u", "max"),
        hour_min=("h", "min"), hour_max=("h", "max"))
    t_frac = touch_fraction(ref)

    assert z_frac < 0.35 and t_frac > 0.9, (z_frac, t_frac)
    assert z_frac * 3 < t_frac

    # morton interleave sanity: key order groups quadrants
    assert morton2(np.array([0], np.uint64), np.array([1], np.uint64))[0] == 1
    assert morton2(np.array([1], np.uint64), np.array([0], np.uint64))[0] == 2


def test_dbscan_planted_blobs(ray_session, tmp_path):
    """Plant two dense blobs, one chain of borderline points, and
    isolated noise; DBSCAN must cluster each blob under its min
    vec_id, mark low-degree members adjacent to cores as border, and
    omit the noise entirely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_dbscan

    rng = np.random.default_rng(11)
    rows = []
    # blob A: ids 0..5 tightly around one direction
    a = rng.normal(size=64)
    for i in range(6):
        rows.append((i, a + 0.05 * rng.normal(size=64)))
    # blob B: ids 100..105 around an orthogonal-ish direction
    b = rng.normal(size=64)
    for i in range(6):
        rows.append((100 + i, b + 0.05 * rng.normal(size=64)))
    # noise: isolated gaussians
    for i in range(30):
        rows.append((500 + i, rng.normal(size=64)))
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    out = q_dbscan(str(tmp_path), threshold=0.9, min_pts=3)
    got = dict(zip(out["vec_id"], out["cluster_id"]))
    roles = dict(zip(out["vec_id"], out["role"]))
    for i in range(6):
        assert got[i] == 0 and roles[i] == "core"
        assert got[100 + i] == 100 and roles[100 + i] == "core"
    assert all(v < 500 for v in got)  # noise emits no row


def test_dbscan_border_vs_core(ray_session, tmp_path):
    """A point with exactly one core neighbor (degree < min_pts) is a
    BORDER member of that core's cluster, not a core."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_dbscan

    # deterministic geometry: v0 = e0; v1..v3 = 10°-rotations of e0
    # in distinct planes (pairwise cos = cos²10° ≈ .970, to v0 =
    # cos10° ≈ .985 — all ≥ .9); border b = .905·v1 ⊕ orthogonal rest
    # → cos(b,v1) = .905 ≥ .9 but cos(b,v0) = .891 and cos(b,v2/3) =
    # .878 < .9: exactly ONE core neighbor → border, never core
    th = np.deg2rad(10.0)
    vecs = {0: np.eye(64)[0]}
    for i in (1, 2, 3):
        v = np.cos(th) * np.eye(64)[0] + np.sin(th) * np.eye(64)[i]
        vecs[i] = v
    b = 0.905 * vecs[1] + np.sqrt(1 - 0.905 ** 2) * np.eye(64)[10]
    vecs[50] = b
    rows = sorted(vecs.items())
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    out = q_dbscan(str(tmp_path), threshold=0.9, min_pts=3)
    roles = dict(zip(out["vec_id"], out["role"]))
    got = dict(zip(out["vec_id"], out["cluster_id"]))
    for i in range(4):
        assert roles[i] == "core" and got[i] == 0
    assert roles[50] == "border" and got[50] == 0


def test_ann_recall_eval(ray_session):
    """Brute-force self-recall is exactly 1.0; the approximate methods
    report a sane recall in [0, 1] with the documented floors."""
    from web_scrapper_ray.pipelines.similarity import q_ann_recall_eval

    out = q_ann_recall_eval(SF, query_ids=(0, 1, 2, 3), k=5)
    r = dict(zip(out["method"], out["mean_recall"]))
    assert r["bruteforce"] == 1.0
    assert 0.15 <= r["lsh"] <= 1.0
    assert 0.25 <= r["ivf"] <= 1.0
    assert (out["n_probes"] == 4).all()


def test_bpe_encode_hand_example(ray_session, tmp_path):
    """Sennrich hand-example: corpus 'aa aa aa' + 'aab' learns merges
    (a,a) then (aa,</w>); encoding gives 1 symbol per 'aa' word and 3
    for 'aab' (aa, b, </w>)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_bpe_encode

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa aa aa", "aab"], pa.string())}),
        str(tmp_path / "documents.parquet"))
    out = q_bpe_encode(str(tmp_path), n_merges=2)
    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in out.itertuples()}
    assert got[1] == (3, 3)   # three 'aa' words, one symbol each
    assert got[2] == (1, 3)   # aa + b + </w>


def test_bpe_encode_matches_train_vocab(ray_session):
    """Invariant on real data: token counts are bounded by chars+1 per
    word and shrink monotonically as merges are added."""
    from web_scrapper_ray.pipelines.textops import q_bpe_encode

    few = q_bpe_encode(SF, n_merges=2)
    many = q_bpe_encode(SF, n_merges=24)
    m = few.merge(many, on="doc_id", suffixes=("_f", "_m"))
    assert (m["n_tokens_m"] <= m["n_tokens_f"]).all()
    assert (m["n_words_f"] == m["n_words_m"]).all()


def test_sketch_accuracy_bounds(ray_session):
    """HLL estimate lands within the 2^14-register error envelope of
    the exact per-type distinct counts, and the exact side matches a
    pandas ground truth."""
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.sketches import q_sketch_accuracy

    out = q_sketch_accuracy(SF)
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["event_type", "user_id"]).to_pandas()
    t = t.dropna()
    truth = (t.drop_duplicates().groupby("event_type")["user_id"]
             .size().to_dict())
    got = dict(zip(out["event_type"], out["n_exact"]))
    assert got == {k: int(v) for k, v in truth.items()}
    assert (out["rel_err"].abs() <= 0.05).all()


def test_ttl_dedup_chain_semantics(ray_session, tmp_path):
    """TTL dedup is a recurrence on KEPT events: a suppressed event
    does not extend the window. Chain 0/40/80 min with TTL 60: 0 kept,
    40 suppressed, 80 kept (>= 60 past the KEPT 0 — the lag-gap rule
    would wrongly suppress it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.dedup import q_ttl_dedup

    mins = [0, 40, 80,           # user 1 type 'a': keep 0 and 80
            0, 50, 110, 200]     # user 2 type 'b': keep 0, 110, 200
    users = [1, 1, 1, 2, 2, 2, 2]
    types = ["a", "a", "a", "b", "b", "b", "b"]
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_id": pa.array(list(range(7)), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array([m * 60_000_000 for m in mins],
                       pa.timestamp("us")),
        "value": pa.array([1.0] * 7, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_ttl_dedup(str(tmp_path), ttl_hours=1)
    got = {r.event_type: (r.n_kept, r.n_suppressed)
           for r in out.itertuples()}
    assert got == {"a": (2, 1), "b": (3, 1)}


def test_minhash_accuracy_bounds(ray_session):
    """64-perm MinHash estimates stay within the binomial envelope of
    the exact Jaccard over the verified near-dup pairs (σ ≈ 0.06 at
    j=0.5; 4σ bound on the max)."""
    from web_scrapper_ray.pipelines.dedup import q_minhash_accuracy

    out = q_minhash_accuracy(SF)
    assert len(out) == 1
    r = out.iloc[0]
    if r["n_pairs"] == 0:
        return
    assert r["mean_abs_err"] <= 0.10
    assert r["max_abs_err"] <= 0.30


def test_matryoshka_recall_monotone(ray_session):
    """Full-dim recall is exactly 1 (self-ground-truth); recall stays
    in [0, 1] at every truncation."""
    from web_scrapper_ray.pipelines.similarity import q_matryoshka_recall

    out = q_matryoshka_recall(SF, query_ids=(0, 1, 2, 3), k=5)
    r = dict(zip(out["dim"], out["mean_recall"]))
    assert r[64] == 1.0
    assert all(0.0 <= v <= 1.0 for v in r.values())


def test_cluster_ari_planted_blobs(ray_session, tmp_path):
    """Four well-separated blobs labeled consistently → k-means
    recovers them and ARI = 1; ARI is invariant to a label
    permutation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_cluster_ari

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(4, 64)) * 10
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(20):
            rows.append((vid, centers[c] + 0.05 * rng.normal(size=64),
                         c))
            vid += 1
    # q71's deterministic init uses vec_id 0..k-1 as seeds — reorder
    # so the first four rows are one per blob
    order = [0, 20, 40, 60] + [i for i in range(80)
                               if i not in (0, 20, 40, 60)]
    rows = [rows[i] for i in order]
    for perm in ((0, 1, 2, 3), (2, 0, 3, 1)):
        t = pa.table({
            "vec_id": pa.array(list(range(80)), pa.int64()),
            "embedding": pa.array([r[1].tolist() for r in rows],
                                  pa.list_(pa.float32())),
            "label": pa.array([perm[r[2]] for r in rows],
                              pa.int32())})
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        out = q_cluster_ari(str(tmp_path), k=4, iters=3)
        assert out["ari"].iloc[0] == 1.0, (perm, out)


def test_pixel_dup_groups_reencoded(ray_session):
    """q276: pixel-identical images group together even when the
    payload bytes differ (extra rows are distinct)."""
    import pyarrow as pa
    import ray.data as rd

    from web_scrapper_ray import codecs
    from web_scrapper_ray.pipelines.dedup import pixel_dup_groups_ds

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    other = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    rows = [
        {"image_id": "a", "bytes": codecs.png_encode(px)},
        {"image_id": "b", "bytes": codecs.png_encode(px)},  # same pixels
        {"image_id": "c", "bytes": codecs.png_encode(other)},
    ]
    out = pixel_dup_groups_ds(
        rd.from_arrow(pa.Table.from_pylist(rows)))
    assert len(out) == 1
    assert out.iloc[0]["n"] == 2 and out.iloc[0]["keep_image_id"] == "a"


def test_tile_neardup_local_edit(ray_session):
    """q277: an image with ONE edited tile region still matches its
    original on >= 12 of 16 tiles; an unrelated image does not pair."""
    import pyarrow as pa
    import ray.data as rd

    from web_scrapper_ray import codecs
    from web_scrapper_ray.pipelines.dedup import tile_neardup_pairs_ds

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    edited = base.copy()
    edited[0:16, 0:16] = 255 - edited[0:16, 0:16]  # invert tile (0,0)
    unrelated = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    rows = [
        {"image_id": "orig", "bytes": codecs.png_encode(base)},
        {"image_id": "edit", "bytes": codecs.png_encode(edited)},
        {"image_id": "zzz", "bytes": codecs.png_encode(unrelated)},
    ]
    out = tile_neardup_pairs_ds(
        rd.from_arrow(pa.Table.from_pylist(rows)), min_match=12)
    pairs = set(zip(out["image_a"], out["image_b"]))
    assert ("edit", "orig") in pairs
    assert all("zzz" not in p for pair in pairs for p in pair)
    got = out.set_index(["image_a", "image_b"])["n_tiles"]
    assert got.loc[("edit", "orig")] == 15


def test_compression_ratio_ordering(ray_session, tmp_path):
    """q280: repetitive text compresses far below prose, prose below
    random bytes; NULL/empty texts drop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.textops import q_compression_ratio

    rng = np.random.default_rng(3)
    rand = "".join(chr(32 + int(x)) for x in rng.integers(0, 90, 4000))
    rows = [
        {"doc_id": 1, "text": "spam ham " * 500},
        {"doc_id": 2, "text": ("the quick brown fox jumps over a "
                               "lazy dog and keeps going ") * 60},
        {"doc_id": 3, "text": rand},
        {"doc_id": 4, "text": None},
        {"doc_id": 5, "text": ""},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = q_compression_ratio(str(tmp_path)).set_index("doc_id")
    assert sorted(out.index) == [1, 2, 3]
    assert out.loc[1, "ratio"] < out.loc[2, "ratio"] < out.loc[3, "ratio"]
    assert out.loc[3, "ratio"] > 0.5
    assert (out["n_compressed"] < out["n_bytes"]).loc[[1, 2]].all()


def test_bpe_fertility_groups(ray_session):
    """q287: per-lang fertility is Σtokens/Σwords of q233's per-doc
    counts, grouped over the real sf0.001 corpus."""
    import pyarrow.dataset as pads

    from web_scrapper_ray.pipelines.textops import (q_bpe_encode,
                                                    q_bpe_fertility)

    sf = "/root/testdata/sf0.001"
    out = q_bpe_fertility(sf)
    per_doc = q_bpe_encode(sf)
    lang = pads.dataset(f"{sf}/documents.parquet").to_table(
        columns=["doc_id", "lang"]).to_pandas()
    df = per_doc.merge(lang, on="doc_id")
    df = df[df["n_words"] > 0]
    for _, r in out.iterrows():
        sub = df[df["lang"] == r["lang"]]
        assert len(sub) == r["n_docs"]
        want = sub["n_tokens"].sum() / sub["n_words"].sum()
        assert abs(r["fertility"] - round(want, 6)) < 1e-9
    assert (out["fertility"] >= 1.0).all()


def test_ndcg_eval_hand_example(ray_session, tmp_path):
    """q293: rel hits at ranks 1 and 3 → gains 1, 0, 1/log2(4)=0.5
    and running DCG 1, 1, 1.5."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_ndcg_eval

    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [1.0, 0.1], [1.0, 0.2],
                               [0.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([1, 1, 0, 1], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_ndcg_eval(str(tmp_path), query_ids=(0,), k=3)
    assert out["rank"].tolist() == [1, 2, 3]
    assert out["neighbor_id"].tolist() == [1, 2, 3]
    assert out["rel"].tolist() == [1, 0, 1]
    assert out["gain"].tolist() == [1.0, 0.0, 0.5]
    assert out["running_dcg"].tolist() == [1.0, 1.0, 1.5]


def test_binary_hash_recall_sign_separable(ray_session, tmp_path):
    """q306: clusters in disjoint orthants — sign codes separate them
    perfectly, so Hamming retrieval reproduces the exact top-k."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import (
        q_binary_hash_recall)

    rng = np.random.default_rng(7)
    dim = 16
    vecs, ids = [], []
    # exactly k non-probe members per cluster: the exact top-k and
    # the Hamming top-k must then retrieve the SAME set (all other
    # candidates live in a different orthant)
    for c in range(4):
        sign = np.where(rng.standard_normal(dim) > 0, 1.0, -1.0)
        for i in range(6):
            vecs.append((sign * (1.0 + 0.05 * rng.random(dim)))
                        .astype(np.float32).tolist())
            ids.append(c * 6 + i)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([i // 6 for i in ids], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_binary_hash_recall(str(tmp_path), query_ids=(0, 6, 12),
                               k=5)
    assert out["n_probes"].tolist() == [3]
    assert out["mean_recall"].tolist() == [1.0]
    assert out["mean_hamming"].tolist() == [0.0]


def test_hubness_planted_hub(ray_session, tmp_path):
    """q322: one centroid point near every cluster is retrieved by
    all probes (k-occurrence = n−1); distant satellites mostly
    retrieve the hub + their twin."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.similarity import q_hubness

    hub = np.ones(8)
    vecs = [hub.tolist()]
    rng = np.random.default_rng(2)
    for i in range(6):
        v = hub + 0.01 * rng.standard_normal(8)
        vecs.append(v.tolist())
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(7)), pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 7, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_hubness(str(tmp_path), k=2)
    # every point lands in some top-2 lists; total occurrences = 7*2
    assert int((out["k_occurrence"] * out["n_points"]).sum()) == 14
    assert int(out["n_points"].sum()) == 7
