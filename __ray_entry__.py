"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl (synthetic t1 world → wave engine →
image+caption table, the BASELINE.json input_hint shape).  ``queries()``
exposes one callable per implemented operator family from SURVEY.md §2
over the driver's parquet tables; ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one (column names match exactly).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from web_scrapper_ray.functions.text import STOP_WORDS


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: wave-crawl the t1 synthetic world (seed canonicalize →
    cuckoo seen-set → politeness groupby-host fetch/parse → decode+phash)
    and return the north-rule image+caption table."""
    import pyarrow.dataset as pads

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    res = ensure_tier_crawl("t1")
    table = pads.dataset(res["images_dir"], partitioning="hive").to_table(
        columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )
    return table.sort_by("image_id")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _crawl_articles(sf_dir: str):
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    res = ensure_tier_crawl("t1")
    return pq.read_table(res["articles"])


def _crawl_log(sf_dir: str):
    import pyarrow.parquet as pq

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    res = ensure_tier_crawl("t1")
    return pq.read_table(res["crawl_log"]).drop_columns(["fetch_ts"])


def _crawl_images(sf_dir: str):
    import pyarrow.dataset as pads

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    res = ensure_tier_crawl("t1")
    t = pads.dataset(res["images_dir"], partitioning="hive").to_table(
        columns=["image_id", "w", "h", "fmt", "caption", "phash"]
    )
    return t.sort_by("image_id")


def _shop_products(sf_dir: str):
    import pandas as pd

    from web_scrapper_ray import synth
    from web_scrapper_ray.pipelines.scrape import run_page_scrape

    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]
    seeds = [f"http://{synth.host_name(spec, i)}/shop" for i in range(spec.n_hosts)]
    recs = run_page_scrape(world, seeds, "ecommerce")
    return pd.DataFrame(
        [
            {"name": r["name"], "price": r["price"], "currency": r["currency"],
             "url": r["url"], "availability": r["availability"],
             "n_images": len(r.get("images") or []),
             "rating": (r.get("reviews") or {}).get("rating"),
             "review_count": (r.get("reviews") or {}).get("count")}
            for r in recs
        ]
    )


def _directory_businesses(sf_dir: str):
    import pandas as pd

    from web_scrapper_ray import synth
    from web_scrapper_ray.pipelines.scrape import run_page_scrape

    world = synth.ensure_world("t1")
    spec = synth.TIERS["t1"]
    seeds = [f"http://{synth.host_name(spec, i)}/directory" for i in range(spec.n_hosts)]
    recs = run_page_scrape(world, seeds, "business")
    return pd.DataFrame(
        [
            {"name": r["name"], "address": r["address"], "phone": r["phone"],
             "email": r["email"], "website": r["website"],
             "n_social": len(r.get("social_media") or {}),
             "n_categories": len(r.get("categories") or [])}
            for r in recs
        ]
    )


def _image_features(sf_dir: str):
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.stages.multimodal import ImageFeatures

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "bytes"])
    out = ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=128, concurrency=2
    ).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def _image_quality(sf_dir: str):
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.stages.multimodal import ImageQuality

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "bytes"])
    out = ds.map_batches(
        ImageQuality, batch_format="pyarrow", batch_size=128, concurrency=2
    ).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def _dhash_dup_groups(sf_dir: str):
    """q316: exact dHash collision groups over the crawl corpus — the
    gradient-sign member of the perceptual-hash family (brightness /
    contrast-shift-robust, unlike q276's exact pixel hash)."""
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.stages.multimodal import DHash

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "bytes"])
    h = ds.map_batches(DHash, batch_format="pyarrow", batch_size=128,
                       concurrency=2).to_pandas()
    g = (h.groupby("dhash", sort=False)
         .agg(n=("image_id", "size"), keeper=("image_id", "min"))
         .reset_index())
    g = g[g["n"] >= 2].sort_values(["keeper"]).reset_index(drop=True)
    g["n"] = g["n"].astype("int64")
    return g[["keeper", "n", "dhash"]]


def _border_screen(sf_dir: str):
    """q317: letterbox/pillarbox bar extents + content fraction per
    crawl image (crop-before-train screen)."""
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.stages.multimodal import BorderScreen

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "bytes"])
    out = ds.map_batches(BorderScreen, batch_format="pyarrow",
                         batch_size=128, concurrency=2).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def _caption_quality(sf_dir: str):
    """q318: per-image caption quality screen over the crawl's
    image+caption table (the north-rule pairing): word/char counts,
    alphanumeric share, and a placeholder flag (empty / 'image' /
    'photo' / numeric-only alt-text) — the curation pass that keeps
    captionless crops out of a training set. Vectorized per batch;
    captions are never shipped separately from their image row."""
    import re

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    rx_word = re.compile(r"\w+", re.ASCII)
    placeholders = {"", "image", "photo", "picture", "img",
                    "untitled"}

    def screen(batch: pa.Table) -> pa.Table:
        caps = batch.column("caption").to_pylist()
        nw, nc, alpha, ph = [], [], [], []
        for c in caps:
            c = c or ""
            words = rx_word.findall(c.lower())
            nw.append(len(words))
            nc.append(len(c))
            n_alpha = sum(ch.isalnum() for ch in c)
            alpha.append(round(n_alpha / len(c), 6) if c else 0.0)
            ph.append(int(c.strip().lower() in placeholders
                          or c.strip().isdigit()))
        return pa.table({
            "image_id": batch.column("image_id"),
            "n_words": pa.array(nw, pa.int64()),
            "n_chars": pa.array(nc, pa.int64()),
            "alpha_share": pa.array(alpha, pa.float64()),
            "placeholder": pa.array(ph, pa.int64())})

    res = ensure_tier_crawl("t1")
    out = rd.read_parquet(res["images_dir"],
                          columns=["image_id", "caption"])         .map_batches(screen, batch_format="pyarrow").to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def _caption_dedup(sf_dir: str):
    """q319: boilerplate-caption census — captions shared by ≥ 2
    images (the 'stock alt-text' screen: a caption attached to many
    distinct images carries no supervision signal). Exact grouping
    on the caption bytes; emits (caption, n_images, keeper)."""
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    res = ensure_tier_crawl("t1")
    df = rd.read_parquet(res["images_dir"],
                         columns=["image_id", "caption"]).to_pandas()
    from web_scrapper_ray.pipelines.pairs import coded_keys

    cj, restore = coded_keys(df, ["caption"])
    g = restore(cj.groupby("caption", as_index=False)
                .agg(n_images=("image_id", "size"),
                     keeper=("image_id", "min")))
    g = g[g["n_images"] >= 2].sort_values(
        ["n_images", "caption"],
        ascending=[False, True]).reset_index(drop=True)
    g["n_images"] = g["n_images"].astype("int64")
    return g[["caption", "n_images", "keeper"]]


def _image_format_census(sf_dir: str):
    """q339: image format × megapixel-bucket census over the crawl
    corpus — the storage/em-decode planning table (which codecs and
    sizes dominate the pipeline). Distributed as per-batch
    (fmt, size-bucket) count combiners over the COLUMN data only
    (bytes never leave the store); buckets are ⌊log2(w·h/1024)⌋
    clamped at 0."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    def census(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        px = w.astype(np.int64) * h.astype(np.int64)
        b = np.maximum(np.log2(np.maximum(px, 1) / 1024.0), 0.0)
        b = np.floor(b).astype(np.int64)
        g = (pd.DataFrame({"fmt": batch.column("fmt").to_pylist(),
                           "sb": b})
             .groupby(["fmt", "sb"], sort=False).size()
             .reset_index(name="n"))
        return pa.table({"fmt": pa.array(g["fmt"], pa.string()),
                         "size_bucket": pa.array(
                             g["sb"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    res = ensure_tier_crawl("t1")
    df = rd.read_parquet(res["images_dir"],
                         columns=["fmt", "w", "h"])         .map_batches(census, batch_format="pyarrow").to_pandas()
    out = (df.groupby(["fmt", "size_bucket"], as_index=False)
           ["n"].sum()
           .sort_values(["fmt", "size_bucket"])
           .reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out


def _cross_site_dups(sf_dir: str):
    """q353: pixel-identical images appearing on MULTIPLE sites (the
    CDN-mirror / hotlink signal a crawl dedup wants to know about —
    same-site duplicates are usually templates, cross-site ones are
    shared assets): decode+hash via the PixelHash actor pool
    (q276's stage), then group hashes and count distinct site ids
    (the image_id's site field). Emits only groups spanning ≥ 2
    sites plus a summary-friendly keeper id."""
    import pandas as pd
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.stages.multimodal import PixelHash

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"],
                         columns=["image_id", "bytes"])
    h = ds.map_batches(PixelHash, batch_format="pyarrow",
                       batch_size=128, concurrency=2).to_pandas()
    h["site"] = h["image_id"].str.split("-").str[1]
    g = (h.groupby("pixel_hash")
         .agg(n_images=("image_id", "size"),
              n_sites=("site", "nunique"),
              keeper=("image_id", "min"))
         .reset_index())
    g = g[g["n_sites"] >= 2].sort_values(
        ["n_images", "keeper"],
        ascending=[False, True]).reset_index(drop=True)
    g["n_images"] = g["n_images"].astype("int64")
    g["n_sites"] = g["n_sites"].astype("int64")
    return g[["keeper", "n_images", "n_sites"]]


def _pixel_dup_groups(sf_dir: str):
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.pipelines.dedup import pixel_dup_groups_ds

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "bytes"])
    return pixel_dup_groups_ds(ds)


def _tile_phash_neardup(sf_dir: str):
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.pipelines.dedup import tile_neardup_pairs_ds

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "bytes"])
    return tile_neardup_pairs_ds(ds)


def _entities(sf_dir: str):
    import os

    import ray.data as rd

    from web_scrapper_ray.stages.nlp import EntityExtract

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    # Ray auto-casts uniform-length list columns to its tensor
    # extension and HARD-ERRORS on a null entry (NULL text → NULL
    # entity list); scope the opt-out to this execution
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.enable_tensor_extension_casting
    ctx.enable_tensor_extension_casting = False
    try:
        out = ds.map_batches(EntityExtract, batch_format="pyarrow",
                             batch_size=256, concurrency=2,
                             num_cpus=0.5).to_pandas()
    finally:
        ctx.enable_tensor_extension_casting = prev
    if not len(out):  # zero-block empty arrives column-less
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             **{f"n_{c}": pd.Series(dtype="int64")
                for c in ("emails", "urls", "dates", "people",
                          "organizations", "locations")}})
    for col in ("emails", "urls", "dates", "people", "organizations", "locations"):
        # NULL list (NULL text) → NULL count, float64 like the
        # oracle's nullable BIGINT
        out["n_" + col] = out[col].map(
            lambda v: None if v is None else len(v))
        out["n_" + col] = out["n_" + col].astype(
            "float64" if out["n_" + col].isna().any() else "int64")
    return out[["doc_id", "n_emails", "n_urls", "n_dates", "n_people",
                "n_organizations", "n_locations"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


def _phash_dup_groups(sf_dir: str):
    """D4 near-dup images v1: exact-phash grouping over the crawl images
    (streaming parquet read → groupby; no driver-side table)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl

    res = ensure_tier_crawl("t1")
    out = (
        rd.read_parquet(res["images_dir"], columns=["image_id", "phash"])
        .groupby("phash")
        .aggregate(Min("image_id", alias_name="keep_image_id"), Count(alias_name="n"))
        .to_pandas()
    )
    return out.sort_values("phash").reset_index(drop=True)


def _phash_neardup(sf_dir: str):
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.pipelines.dedup import phash_neardup_pairs_ds

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "phash"])
    return phash_neardup_pairs_ds(ds, 10)


def _image_neardup_clusters(sf_dir: str):
    """q386: transitive near-dup CLUSTERS over the crawl image corpus
    (the image-payload twin of q53): exact multi-probe hamming banding
    of the 64-bit pHash → object-store pair buckets →
    ``cc_min_label_refs`` → one streamed per-image (image_id,
    cluster_id, keep) assignment; exemplar = lexicographically
    smallest image_id of the component. Rows-only (crawl corpus —
    not a DuckDB view); transitivity + exemplar contract pytested
    against a brute-force union-find."""
    import ray.data as rd

    from web_scrapper_ray.pipelines.crawl import ensure_tier_crawl
    from web_scrapper_ray.pipelines.dedup import \
        phash_neardup_clusters_ds

    res = ensure_tier_crawl("t1")
    ds = rd.read_parquet(res["images_dir"], columns=["image_id", "phash"])
    return (phash_neardup_clusters_ds(ds, 10).to_pandas()
            .sort_values("image_id").reset_index(drop=True))


def queries() -> dict[str, Callable[[str], Any]]:
    from web_scrapper_ray.pipelines import (analytics, dedup, graph,
                                            layout, rankstats, relational,
                                            similarity, sketches, textops)

    return {
        # relational / generic engine ops
        "q01_lineitem_agg": relational.q_lineitem_agg,
        "q02_top_customers": relational.q_top_customers,
        "q03_orders_filter_topk": relational.q_orders_filter_topk,
        "q04_events_window": relational.q_events_window,
        "q05_order_priority_join": relational.q_order_priority_join,
        "q06_orders_page2": relational.q_orders_page2,
        "q07_user_sessions": relational.q_user_sessions,
        "q08_suppliers_per_region": relational.q_suppliers_per_region,
        "q09_part_type_stats": relational.q_part_type_stats,
        "q28_docs_by_lang_source": relational.q_docs_by_lang_source,
        "q29_events_value_stats": relational.q_events_value_stats,
        "q41_events_sliding_window": relational.q_events_sliding_window,
        "q44_distinct_event_types": relational.q_distinct_event_types,
        "q45_brand_revenue_native_join": relational.q_brand_revenue_native_join,
        "q42_top_customers_per_segment": relational.q_top_customers_per_segment,
        "q43_events_asof_join": relational.q_events_asof_join,
        "q49_rolling_avg": relational.q_rolling_avg,
        "q50_orders_events_range_join": relational.q_orders_events_range_join,
        "q46_custkeys_intersect": relational.q_custkeys_intersect,
        "q47_custkeys_except": relational.q_custkeys_except,
        "q114_custkeys_union": relational.q_custkeys_union,
        "q61_top_percentile": relational.q_top_percentile_events,
        "q74_event_funnel": relational.q_event_funnel,
        "q76_event_anomaly": relational.q_event_anomaly,
        "q85_user_type_pivot": relational.q_user_type_pivot,
        "q86_event_gaps": relational.q_event_gaps,
        "q87_order_deciles": relational.q_order_deciles,
        "q88_bloom_semijoin": relational.q_bloom_semijoin,
        "q89_dup_spans": textops.q_dup_spans,
        "q90_mad_outliers": relational.q_mad_outliers,
        "q91_readability": textops.q_readability,
        "q92_event_regression": relational.q_event_regression,
        "q94_corr_matrix": relational.q_corr_matrix,
        "q95_running_total": relational.q_running_total,
        "q96_cube_agg": relational.q_cube_agg,
        "q97_next_event_gap": relational.q_next_event_gap,
        "q98_mode_per_user": relational.q_mode_per_user,
        "q99_median_value_disc": relational.q_median_value_disc,
        "q102_percentile_cont": relational.q_percentile_cont,
        "q103_part_heavy_left_join": relational.q_part_heavy_left_join,
        "q104_parts_never_heavy": relational.q_parts_never_heavy,
        "q105_fuzzy_name_join": relational.q_fuzzy_name_join,
        "q107_brand_name_concat": relational.q_brand_name_concat,
        "q109_customer_orders_full_join": relational.q_customer_orders_full_join,
        "q110_argmax_event": relational.q_argmax_event,
        "q111_value_histogram": relational.q_value_histogram,
        "q112_hourly_gapfill": relational.q_hourly_gapfill,
        "q115_max_concurrency": relational.q_max_concurrency,
        "q116_event_transitions": relational.q_event_transitions,
        "q117_source_entropy": textops.q_source_entropy,
        "q118_sliding_distinct_users": relational.q_sliding_distinct_users,
        "q119_supplier_cooccurrence": relational.q_supplier_cooccurrence,
        "q120_custkeys_except_all": relational.q_custkeys_except_all,
        "q121_shipping_priority": analytics.q_shipping_priority,
        "q122_pareto_parts": analytics.q_pareto_parts,
        "q123_new_users_hourly": analytics.q_new_users_hourly,
        "q124_trimmed_mean": analytics.q_trimmed_mean,
        "q125_top_orders_rank": analytics.q_top_orders_rank,
        "q126_connected_components": graph.q_connected_components,
        "q127_grouping_sets_docs": analytics.q_grouping_sets_docs,
        "q128_first_number": analytics.q_first_number,
        "q129_quiet_orders": analytics.q_quiet_orders,
        "q130_monthly_growth": analytics.q_monthly_growth,
        "q131_activity_streaks": analytics.q_activity_streaks,
        "q132_interval_coverage": analytics.q_interval_coverage,
        "q133_welch_ttest": analytics.q_welch_ttest,
        "q134_local_supplier_volume": analytics.q_local_supplier_volume,
        "q135_all_priority_customers": analytics.q_all_priority_customers,
        "q136_chi2_independence": analytics.q_chi2_independence,
        "q137_top_session_paths": analytics.q_top_session_paths,
        "q138_bfs_hops": graph.q_bfs_hops,
        "q139_type_jaccard": analytics.q_type_jaccard,
        "q140_triangle_count": graph.q_triangle_count,
        "q141_unpivot_lineitem": analytics.q_unpivot_lineitem,
        "q142_rolling_stddev": analytics.q_rolling_stddev,
        "q143_revenue_gini": analytics.q_revenue_gini,
        "q144_rfm_segments": analytics.q_rfm_segments,
        "q145_daily_locf": analytics.q_daily_locf,
        "q146_entity_conflicts": analytics.q_entity_conflicts,
        "q147_value_shape": analytics.q_value_shape,
        "q148_order_percentiles": analytics.q_order_percentiles,
        "q149_brand_price_means": analytics.q_brand_price_means,
        "q150_bitwise_event_ids": analytics.q_bitwise_event_ids,
        "q151_orderkey_gaps": analytics.q_orderkey_gaps,
        "q152_user_drawdown": analytics.q_user_drawdown,
        "q153_doc_sentences": textops.q_doc_sentences,
        "q154_price_outlier_fences": analytics.q_price_outlier_fences,
        "q155_returned_item_revenue": analytics.q_returned_item_revenue,
        "q156_large_volume_orders": analytics.q_large_volume_orders,
        "q157_late_order_priorities": analytics.q_late_order_priorities,
        "q158_small_quantity_revenue": analytics.q_small_quantity_revenue,
        "q159_user_hour_window": analytics.q_user_hour_window,
        "q160_idle_rich_customers": analytics.q_idle_rich_customers,
        "q161_two_nation_volume": analytics.q_two_nation_volume,
        "q162_sole_late_shipper": analytics.q_sole_late_shipper,
        "q163_nation_market_share": analytics.q_nation_market_share,
        "q164_top_revenue_supplier": analytics.q_top_revenue_supplier,
        "q165_user_time_weighted_avg": analytics.q_user_time_weighted_avg,
        "q166_brand_size_promo_revenue":
            analytics.q_brand_size_promo_revenue,
        "q167_customer_order_counts": analytics.q_customer_order_counts,
        "q168_promo_revenue_share": analytics.q_promo_revenue_share,
        "q169_min_balance_supplier":
            analytics.q_min_balance_supplier_per_part,
        "q170_important_parts": analytics.q_important_parts,
        "q171_brand_size_suppliers":
            analytics.q_brand_size_supplier_counts,
        "q172_priority_line_counts": analytics.q_priority_line_counts,
        "q173_dominant_red_suppliers":
            analytics.q_dominant_red_suppliers,
        "q174_value_percent_rank": analytics.q_value_percent_rank,
        "q175_zipf_slope": analytics.q_zipf_slope,
        "q176_weighted_median_price": analytics.q_weighted_median_price,
        "q177_nation_theil_index": analytics.q_nation_theil_index,
        "q178_user_type_signatures": analytics.q_user_type_signatures,
        "q179_benford_totalprice": analytics.q_benford_totalprice,
        "q180_topk_similar_pairs": similarity.q_topk_similar_pairs,
        "q181_source_cosine_matrix": analytics.q_source_cosine_matrix,
        "q182_last_touch_attribution":
            analytics.q_last_touch_attribution,
        "q183_order_total_audit": analytics.q_order_total_audit,
        "q184_hourly_top_type": analytics.q_hourly_top_type,
        "q185_part_skyline": analytics.q_part_skyline,
        "q186_time_to_convert": analytics.q_time_to_convert,
        "q187_gram_novelty": analytics.q_gram_novelty,
        "q188_quartile_bands": analytics.q_quartile_bands,
        "q189_type_pair_lift": analytics.q_type_pair_lift,
        "q190_asof_tolerance": analytics.q_asof_join_tolerance,
        "q191_weekday_seasonality": analytics.q_weekday_seasonality,
        "q192_reverse_top1": similarity.q_reverse_top1_counts,
        "q193_geometric_median": analytics.q_geometric_median_step,
        "q194_spearman_orders": rankstats.q_spearman_orders,
        "q195_mannwhitney_value": rankstats.q_mannwhitney,
        "q196_ks_distance": rankstats.q_ks_distance,
        "q197_topband_ties": analytics.q_topband_orders_ties,
        "q198_nation_balance_topshare": analytics.q_nation_balance_topshare,
        "q199_daily_autocorr": analytics.q_daily_autocorr,
        "q200_supplier_kcore": graph.q_k_core,
        "q201_long_words": textops.q_doc_long_words,
        "q202_moving_range": analytics.q_moving_range,
        "q203_anova_f": analytics.q_anova_f,
        "q204_kruskal_wallis": rankstats.q_kruskal_wallis,
        "q205_repeat_purchase": analytics.q_repeat_purchase,
        "q206_duplicate_invoices": analytics.q_duplicate_invoices,
        "q207_basket_rules": analytics.q_basket_rules,
        "q208_sorted_neighborhood": dedup.q_sorted_neighborhood,
        "q209_custkeys_intersect_all": relational.q_custkeys_intersect_all,
        "q210_supplier_sssp": graph.q_sssp_bounded,
        "q211_rolling_window_max": analytics.q_rolling_window_max,
        "q212_asof_forward": relational.q_events_asof_forward,
        "q213_cusum_changepoint": analytics.q_cusum_changepoint,
        "q214_weekly_detrended": analytics.q_weekly_detrended,
        "q215_recency_scores": analytics.q_recency_scores,
        "q216_systematic_sample": analytics.q_systematic_sample,
        "q217_sequence_pattern": analytics.q_sequence_pattern,
        "q218_best_split": rankstats.q_best_split,
        "q219_rrf_fusion": analytics.q_rrf_fusion,
        "q222_time_in_state": analytics.q_time_in_state,
        "q223_dup_rate_by_source": dedup.q_dup_rate_by_source,
        "q224_type_burstiness": analytics.q_type_burstiness,
        "q220_er_clusters": dedup.q_er_clusters,
        "q221_knn_classify": similarity.q_knn_classify,
        "q225_range_window_avg": analytics.q_range_window_avg,
        "q226_daily_interp": analytics.q_daily_interp,
        "q227_winsorized_mean": analytics.q_winsorized_mean,
        "q228_clustering_coefficient": graph.q_clustering_coefficient,
        "q229_theilsen_slope": analytics.q_theilsen_slope,
        "q232_seasonal_mase": analytics.q_mase,
        "q230_dbscan": similarity.q_dbscan,
        "q235_interval_overlap_join": relational.q_interval_overlap_join,
        "q236_snapshot_diff": analytics.q_snapshot_diff,
        "q237_silhouette": similarity.q_silhouette,
        "q239_fk_orphans": relational.q_fk_orphans,
        "q241_lexical_diversity": textops.q_lexical_diversity,
        "q242_late_events": analytics.q_late_events,
        "q244_source_cap_sample": textops.q_source_cap_sample,
        "q245_itemsets3": analytics.q_itemsets3,
        "q248_js_divergence": analytics.q_js_divergence,
        "q249_pmi_collocations": textops.q_pmi_collocations,
        "q246_calibration_curve": analytics.q_calibration_curve,
        "q247_auc": rankstats.q_auc,
        "q250_kendall_tau": rankstats.q_kendall_tau,
        "q251_hill_tail_index": analytics.q_hill_tail_index,
        "q252_eventually_follows": analytics.q_eventually_follows,
        "q253_vocab_containment": textops.q_vocab_containment,
        "q257_kaplan_meier": analytics.q_kaplan_meier,
        "q258_quadratic_fit": analytics.q_quadratic_fit,
        "q259_markov_stationary": analytics.q_markov_stationary,
        "q260_degree_assortativity": graph.q_degree_assortativity,
        "q261_sax_symbols": analytics.q_sax_symbols,
        "q262_hits_hubs": graph.q_hits_hubs,
        "q263_greedy_source_cover": textops.q_greedy_source_cover,
        "q264_weighted_jaccard": textops.q_weighted_jaccard,
        "q265_loo_source_impact": textops.q_loo_source_impact,
        "q267_holt_linear": analytics.q_holt_linear,
        "q271_page_hinkley": analytics.q_page_hinkley,
        "q272_hard_negatives": similarity.q_hard_negatives,
        "q278_label_mrr": similarity.q_label_mrr,
        "q282_holt_backtest": analytics.q_holt_backtest,
        "q284_wasserstein_drift": rankstats.q_wasserstein_distance,
        "q285_langid_eval": textops.q_langid_eval,
        "q286_binary_segmentation": analytics.q_binary_segmentation,
        "q288_did_estimate": analytics.q_did_estimate,
        "q273_user_erasure_audit": analytics.q_user_erasure_audit,
        "q275_decayed_type_scores": analytics.q_decayed_type_scores,
        "q279_props_key_profile": textops.q_props_key_profile,
        "q281_negative_sampling_dist": textops.q_negative_sampling_dist,
        "q274_psi_value_drift": analytics.q_psi_value_drift,
        "q290_nelson_aalen": analytics.q_nelson_aalen,
        "q291_common_neighbors": graph.q_common_neighbors,
        "q292_pr_curve": rankstats.q_pr_curve,
        "q293_ndcg_eval": similarity.q_ndcg_eval,
        "q294_ewma_chart": analytics.q_ewma_chart,
        "q295_source_skewness": textops.q_source_skewness,
        "q296_item_cf": graph.q_item_cf,
        "q297_lang_rebalance": textops.q_lang_rebalance,
        "q298_target_encoding": analytics.q_target_encoding,
        "q299_feature_hash_eval": textops.q_feature_hash_eval,
        "q300_split_leakage": analytics.q_split_leakage,
        "q301_heaps_law": textops.q_heaps_law,
        "q302_near_amount_pairs": analytics.q_near_amount_pairs,
        "q303_daily_mix_jaccard": analytics.q_daily_mix_jaccard,
        "q304_ship_lag_percentiles": analytics.q_ship_lag_percentiles,
        "q305_late_rate_wilson": analytics.q_late_rate_wilson,
        "q307_shuffle_quality": textops.q_shuffle_quality,
        "q309_pk_dup_audit": analytics.q_pk_dup_audit,
        "q310_brand_homophily": graph.q_brand_homophily,
        "q311_exp_arrival_ks": rankstats.q_exp_arrival_ks,
        "q312_token_budget_mix": textops.q_token_budget_mix,
        "q313_fd_histogram": rankstats.q_fd_histogram,
        "q314_blocking_quality": dedup.q_blocking_quality,
        "q315_dup_cluster_sizes": dedup.q_dup_cluster_sizes,
        "q320_numeric_profile": analytics.q_numeric_profile,
        "q321_dup_row_census": analytics.q_dup_row_census,
        "q322_hubness": similarity.q_hubness,
        "q323_top_share": analytics.q_top_share,
        "q324_length_quantile_report": textops.q_length_quantile_report,
        "q325_double_fire_rate": analytics.q_double_fire_rate,
        "q326_range_partitioner": layout.q_range_partitioner,
        "q327_skew_advisor": layout.q_skew_advisor,
        "q328_daily_ohlc": analytics.q_daily_ohlc,
        "q329_dau_mau": analytics.q_dau_mau,
        "q330_pii_rate": textops.q_pii_rate,
        "q331_sentence_stats": textops.q_sentence_stats,
        "q332_nonascii_share": textops.q_nonascii_share,
        "q333_term_burstiness": textops.q_term_burstiness,
        "q334_rank_overlap_rbo": analytics.q_rank_overlap_rbo,
        "q335_conversion_path_length": analytics.q_conversion_path_length,
        "q336_hour_anomalies": analytics.q_hour_anomalies,
        "q337_item_novelty_rate": analytics.q_item_novelty_rate,
        "q338_near_purchase_rate": analytics.q_near_purchase_rate,
        "q340_eccentricity_sample": graph.q_eccentricity_sample,
        "q341_srm_check": analytics.q_srm_check,
        "q342_cohort_ltv": analytics.q_cohort_ltv,
        "q343_type_conversion_lift": analytics.q_type_conversion_lift,
        "q344_split_balance_ks": rankstats.q_split_balance_ks,
        "q345_churn_curve": analytics.q_churn_curve,
        "q346_whale_curve": analytics.q_whale_curve,
        "q347_nation_hhi": analytics.q_nation_hhi,
        "q348_dedup_savings": dedup.q_dedup_savings,
        "q349_join_cardinality_est": analytics.q_join_cardinality_est,
        "q350_prefix_suggest": textops.q_prefix_suggest,
        "q351_weekday_hour_heatmap": analytics.q_weekday_hour_heatmap,
        "q352_brand_diversity_trend": analytics.q_brand_diversity_trend,
        "q354_behavior_coverage": analytics.q_behavior_coverage,
        "q355_revenue_jumps": analytics.q_revenue_jumps,
        "q356_cross_source_dups": dedup.q_cross_source_dups,
        "q357_constancy_screen": analytics.q_constancy_screen,
        "q359_hour_uniformity": analytics.q_hour_uniformity,
        "q360_benford_screen": analytics.q_benford_screen,
        "q361_k_anonymity": analytics.q_k_anonymity,
        "q362_scd2_history": analytics.q_scd2_history,
        "q363_gap_fill_locf": analytics.q_gap_fill_locf,
        "q364_calibration_brier": analytics.q_calibration_brier,
        "q365_contamination_13gram": textops.q_contamination_13gram,
        "q366_repetition_ratio": textops.q_repetition_ratio,
        "q367_gini_revenue": analytics.q_gini_revenue,
        "q368_bloom_semijoin": analytics.q_bloom_semijoin,
        "q369_cuped_adjustment": analytics.q_cuped_adjustment,
        "q370_rank_fusion": analytics.q_rank_fusion,
        "q371_label_centroid_drift": similarity.q_label_centroid_drift,
        "q372_independence_residuals": analytics.q_independence_residuals,
        "q373_permutation_fdr": analytics.q_permutation_fdr,
        "q374_poisson_bootstrap": analytics.q_poisson_bootstrap,
        "q375_mad_outliers": analytics.q_mad_outliers,
        "q376_boolean_retrieval": textops.q_boolean_retrieval,
        "q377_bm25_topk": textops.q_bm25_topk,
        "q378_load_fairness": analytics.q_load_fairness,
        "q379_filter_verdicts": textops.q_filter_verdicts,
        # MMR diversified re-rank (greedy sequential selection — no
        # SQL twin); planted-cluster pytest pins diversification
        "q380_mmr_rerank": similarity.q_mmr_rerank,
        "q381_label_dispersion": similarity.q_label_dispersion,
        "q382_markov_accuracy": analytics.q_markov_accuracy,
        "q383_segment_flows": analytics.q_segment_flows,
        "q385_ring_rebalance": analytics.q_ring_rebalance,
        # pHash-vs-pixel-truth threshold sweep over crawl images
        # (crawl corpus, no SQL twin); planted-twin pytest
        "q358_phash_threshold_sweep": dedup.q_phash_threshold_sweep,
        # Markov removal-effect attribution (absorbing-chain linear
        # solves on the journey graph — no SQL twin); hand-example
        # pytest pins the closed-form effects
        "q308_markov_attribution": analytics.q_markov_attribution,
        # 1-bit sign-quantization Hamming recall (data-dependent
        # approximate index eval, no SQL twin) — planted sign-
        # separable-cluster pytest pins perfect recall
        "q306_binary_hash_recall": similarity.q_binary_hash_recall,
        # approximate-index eval (recall vs exact ground truth) — no
        # SQL twin by design; recall floor pinned by pytest
        "q231_ann_recall_eval": similarity.q_ann_recall_eval,
        # trained-BPE corpus tokenization (iterative merge semantics,
        # no SQL twin); Sennrich hand-example pytest pins the encoding
        "q233_bpe_encode": textops.q_bpe_encode,
        # tokenizer fertility per lang (BPE upstream, no SQL twin) —
        # per-lang ratio pytest
        "q287_bpe_fertility": textops.q_bpe_fertility,
        # Poisson-bootstrap CI (hash-seeded draws, no SQL twin);
        # determinism + split-invariance pytest
        "q238_bootstrap_ci": rankstats.q_bootstrap_ci,
        # sketch-accuracy eval (HLL vs exact; estimate side has no
        # SQL twin) — error-bound pytest
        "q240_sketch_accuracy": sketches.q_sketch_accuracy,
        # TTL-window streaming dedup (stateful recurrence — a
        # suppressed event does NOT extend the window, so no SQL
        # window expresses it); chain-semantics pytest
        "q243_ttl_dedup": dedup.q_ttl_dedup,
        # MinHash estimate-vs-exact calibration (hash-deterministic,
        # no SQL twin) — error-bound pytest
        "q254_minhash_accuracy": dedup.q_minhash_accuracy,
        # Matryoshka truncated-dim retrieval eval (deterministic, no
        # SQL twin) — monotonicity pytest
        "q255_matryoshka_recall": similarity.q_matryoshka_recall,
        # isotonic PAVA fit (sequential pooling recursion, no SQL
        # window twin) — hand-example + monotonicity pytest
        "q268_isotonic_enrate": textops.q_isotonic_enrate,
        # zlib redundancy screen (no SQL compressor) — ordering pytest
        "q280_compression_ratio": textops.q_compression_ratio,
        # Mahalanobis top-k outliers (driver eig, no SQL twin) —
        # planted-outlier pytest
        "q283_mahalanobis_outliers": similarity.q_mahalanobis_outliers,
        # product-quantization ADC recall eval (seeded codebooks, no
        # SQL twin) — determinism + floor pytest
        "q289_pq_recall_eval": similarity.q_pq_recall_eval,
        # ZCA whitening + self-certifying covariance eval (driver
        # eigendecomposition, no SQL twin) — near-identity pytest
        "q269_whitening_eval": similarity.q_whitening_eval,
        # MMR diversity re-rank (greedy, no SQL twin) — determinism +
        # diversity-vs-topk pytest
        "q270_mmr_select": similarity.q_mmr_select,
        # k-means vs labels Adjusted Rand Index (iterative upstream,
        # no SQL twin) — planted-blob pytest
        "q256_cluster_ari": similarity.q_cluster_ari,
        # text analysis (q19 lives here — SQL-checkable, must never be
        # starved by the crawl block: r2's driver run dropped the last
        # two registry entries, so ordering is cheap/SQL-checked first)
        "q10_token_count": textops.q_token_count,
        "q11_reading_time": textops.q_reading_time,
        "q12_clean_text": textops.q_clean_text,
        "q13_keywords_topk": textops.q_keywords_topk,
        "q14_fingerprint": textops.q_fingerprint,
        "q15_quality": textops.q_quality,
        "q16_lang_id": textops.q_lang_id,
        "q17_json_valid": textops.q_json_valid,
        "q18_phone_digits": textops.q_phone_digits,
        "q113_json_field": textops.q_json_field,
        "q19_entities": _entities,
        "q39_bpe_token_count": textops.q_bpe_token_count,
        "q54_doc_chunks": textops.q_doc_chunks,
        "q55_tfidf_topk": textops.q_tfidf_topk,
        "q93_bm25_scores": textops.q_bm25_scores,
        "q56_decontaminate": textops.q_decontaminate,
        "q57_event_value_quantiles": relational.q_event_value_quantiles,
        "q58_shard_pack": textops.q_shard_pack,
        "q60_token_offsets": textops.q_token_offsets,
        "q62_hash_split": textops.q_hash_split,
        "q63_repetition_filter": textops.q_repetition_filter,
        "q52_stratified_sample": textops.q_stratified_sample,
        "q40_label_centroids": similarity.q_label_centroids,
        "q64_quantize_embeddings": similarity.q_quantize_embeddings,
        "q66_boilerplate_ngrams": textops.q_boilerplate_ngrams,
        "q67_pagerank": graph.q_pagerank_part_supplier,
        "q68_source_quality_filter": textops.q_source_quality_filter,
        "q69_embedding_gram": similarity.q_embedding_gram,
        "q70_consistent_sample": textops.q_consistent_sample,
        "q71_kmeans": similarity.q_kmeans,
        "q72_mix_allocation": textops.q_mix_allocation,
        "q75_normalize_by_label": similarity.q_normalize_by_label,
        "q73_inverted_index": textops.q_inverted_index,
        "q77_pii_redact": textops.q_pii_redact,
        "q78_unigram_nll": textops.q_unigram_nll,
        "q79_bigram_topk": textops.q_bigram_topk,
        "q80_semdedup": similarity.q_semdedup,
        "q81_pca_power": similarity.q_pca_power,
        "q82_rollup_docs": relational.q_rollup_docs,
        "q83_retention": relational.q_retention,
        # dedup + similarity, SQL-checked entries first (same truncation
        # hedge as above — every oracle-checked query precedes the
        # rows-only block)
        "q20_exact_dedup": dedup.q_exact_dedup,
        "q48_dedup_corpus": dedup.q_dedup_corpus,
        "q24_knn_bruteforce": similarity.q_knn_bruteforce,
        "q27_neardup_cosine": similarity.q_neardup_cosine,
        "q106_weighted_sample": textops.q_weighted_sample,
        "q108_zorder_layout": layout.q_zorder_layout,
        "q21_minhash_lsh_pairs": dedup.q_minhash_lsh_pairs,
        "q22_ngram_jaccard": dedup.q_ngram_jaccard_pairs,
        "q23_simhash": dedup.q_simhash,
        "q51_simhash_neardup": dedup.q_simhash_neardup,
        "q53_neardup_clusters": dedup.q_neardup_clusters,
        # no SQL twin (iterative merge loop); pinned by the Sennrich
        # hand-example pytest
        "q100_bpe_train": textops.q_bpe_train,
        "q59_distinct_users_hll": sketches.q_distinct_users_hll,
        "q101_users_per_type_hll": sketches.q_users_per_type_hll,
        "q84_quantile_sketch": sketches.q_value_quantile_sketch,
        "q65_heavy_hitters_cms": sketches.q_heavy_hitters_cms,
        "q25_knn_lsh": similarity.q_knn_lsh,
        "q26_knn_ivf": similarity.q_knn_ivf,
        "q38_neardup_cosine_lsh": similarity.q_neardup_cosine_lsh,
        # crawl engine (synthetic world; oracle-checked in pytest).
        # q33/q34 sit LAST deliberately: they are the most redundantly
        # pytest-covered entries (full shop/business parity suites), so
        # if the driver truncates the registry again they cost least.
        "q30_crawl_articles": _crawl_articles,
        "q31_crawl_log": _crawl_log,
        "q32_crawl_images": _crawl_images,
        "q37_phash_neardup": _phash_neardup,
        "q36_phash_dup_groups": _phash_dup_groups,
        "q35_image_features": _image_features,
        "q266_image_quality": _image_quality,
        "q276_pixel_dup_groups": _pixel_dup_groups,
        "q316_dhash_dup_groups": _dhash_dup_groups,
        "q317_border_screen": _border_screen,
        "q318_caption_quality": _caption_quality,
        "q319_caption_dedup": _caption_dedup,
        "q339_image_format_census": _image_format_census,
        "q353_cross_site_dups": _cross_site_dups,
        "q386_image_neardup_clusters": _image_neardup_clusters,
        "q277_tile_phash_neardup": _tile_phash_neardup,
        "q33_shop_products": _shop_products,
        "q34_directory_businesses": _directory_businesses,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(STOP_WORDS))

# NOTE: the reference's clean_text "normalize quotes" block does NOT
# normalize curly quotes (verified by executing the reference module):
# line 38 is a true no-op and line 39's mangled triple-quote actually
# replaces the literal code fragment `, "'").replace(` with a single
# apostrophe — reproduced by both the engine (functions/text.py
# _REF_QUOTE_GLITCH) and this oracle.
# chr(160) is replaced BEFORE the \s+ collapse: Python's \s matches
# \xa0 (so the reference's later nbsp line is dead code), but RE2's \s
# does not — pre-replacing makes the oracle collapse identically.
_CLEAN_SQL = (
    "regexp_replace("
    "replace("
    "trim(regexp_replace(replace(text, chr(160), ' '), '\\s+', ' ', 'g')), "
    "', \"''\").replace(', ''''), "
    "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')"
)

# q77 shares its RE2 literals with the engine (both sides are RE2);
# doubled backslashes survive the SQL string literal as-is
from web_scrapper_ray.pipelines.textops import (PII_EMAIL_RX as _PII_EMAIL,
                                                PII_IPV4_RX as _PII_IPV4,
                                                PII_PHONE_RX as _PII_PHONE)

_TOKS = "regexp_extract_all(lower(text), '\\w+')"
_NSTOP = f"len(list_filter({_TOKS}, x -> list_contains([{_STOPLIST_SQL}], x)))"
_WC = "len(regexp_extract_all(text, '\\w+'))"
# reference word_count (utils/text.py:344-363) counts on the CLEANED
# text — q11 must too (control chars/glitch can merge or drop words)
_WCC = f"len(regexp_extract_all({_CLEAN_SQL}, '\\w+'))"


def _kcore_sql(k: int = 3, rounds: int = 6) -> str:
    """Unrolled bounded k-core peel (q200's CONTRACT: exactly
    ``rounds`` rounds on both sides; the engine early-exits only at
    the fixpoint, where later rounds are identical)."""
    head = """
        WITH pairs AS MATERIALIZED (
          SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                          greatest(a.l_suppkey, b.l_suppkey) AS v
          FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey
              AND a.l_suppkey <> b.l_suppkey
          WHERE a.l_orderkey IS NOT NULL
            AND a.l_suppkey IS NOT NULL
            AND b.l_suppkey IS NOT NULL),
        dir AS MATERIALIZED (SELECT u AS node, v AS other FROM pairs
                UNION ALL SELECT v, u FROM pairs),
        alive0 AS MATERIALIZED (SELECT DISTINCT node FROM dir)"""
    body = []
    prev = "alive0"
    for i in range(1, rounds + 1):
        body.append(f"""
        deg{i} AS MATERIALIZED (SELECT e.node, count(*) AS d FROM dir e
                   JOIN {prev} a ON a.node = e.node
                   JOIN {prev} b ON b.node = e.other
                   GROUP BY e.node),
        alive{i} AS MATERIALIZED (SELECT node FROM deg{i} WHERE d >= {k})""")
        prev = f"alive{i}"
    tail = f"""
        SELECT e.node AS l_suppkey, count(*)::BIGINT AS deg
        FROM dir e
        JOIN {prev} a ON a.node = e.node
        JOIN {prev} b ON b.node = e.other
        GROUP BY 1 HAVING count(*) >= {k} ORDER BY 1"""
    return head + "," + ",".join(body) + tail


def _sssp_sql(rounds: int = 4) -> str:
    """Unrolled bounded Bellman-Ford (q210's CONTRACT: exactly
    ``rounds`` synchronous relaxation rounds on both sides; the engine
    early-exits only at the fixpoint)."""
    head = """
        WITH op AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
          FROM lineitem
          WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL),
        e0 AS MATERIALIZED (
          SELECT a.s AS u, b.s AS v, count(*) AS c
          FROM op a JOIN op b ON a.o = b.o AND b.s > a.s
          GROUP BY 1, 2),
        edges AS MATERIALIZED (SELECT u, v, 1.0 / c AS w FROM e0
                  UNION ALL SELECT v, u, 1.0 / c FROM e0),
        d0 AS MATERIALIZED (SELECT min(u) AS node, 0.0 AS d FROM edges)"""
    body = []
    for i in range(1, rounds + 1):
        body.append(f"""
        d{i} AS MATERIALIZED (
          SELECT node, min(d) AS d FROM (
            SELECT node, d FROM d{i - 1}
            UNION ALL
            SELECT e.v AS node, p.d + e.w AS d
            FROM d{i - 1} p JOIN edges e ON e.u = p.node) x
          GROUP BY node)""")
    tail = f"""
        SELECT node AS l_suppkey, round(d, 6) AS dist
        FROM d{rounds} WHERE node IS NOT NULL ORDER BY 1"""
    return head + "," + ",".join(body) + tail


def _er_sql(rounds: int = 8) -> str:
    """Unrolled bounded min-label propagation over the q208 SNM pair
    graph (q220's CONTRACT: exactly ``rounds`` rounds on both sides;
    the engine early-exits only at the fixpoint)."""
    head = """
        WITH s AS MATERIALIZED (
            SELECT doc_id, substr(text, 1, 32) AS key
            FROM documents WHERE text IS NOT NULL),
        r AS MATERIALIZED (
            SELECT doc_id, key,
                   row_number() OVER (ORDER BY key, doc_id) AS rk
            FROM s),
        pairs AS MATERIALIZED (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 4
            WHERE levenshtein(a.key, b.key) <= 2),
        e AS MATERIALIZED (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
        l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM e)"""
    body = []
    for i in range(1, rounds + 1):
        body.append(f"""
        l{i} AS MATERIALIZED (
            SELECT a.node, min(least(a.lbl, b.lbl)) AS lbl
            FROM l{i - 1} a JOIN e ON e.u = a.node
            JOIN l{i - 1} b ON b.node = e.v
            GROUP BY a.node)""")
    tail = f"""
        SELECT node AS doc_id, lbl::BIGINT AS cluster_id
        FROM l{rounds} ORDER BY 1"""
    return head + "," + ",".join(body) + tail


def _dbscan_sql(rounds: int = 8, thr: float = 0.35,
                min_pts: int = 3,
                sample_p: float | None = None) -> str:
    """Unrolled bounded min-label propagation over the core-core
    ε-graph (q230's CONTRACT: exactly ``rounds`` rounds on both
    sides; the engine early-exits only at the fixpoint). Core self-
    loops keep isolated cores alive through the propagation joins."""
    from web_scrapper_ray.pipelines.pairs import sql_coin

    coin = ("" if sample_p is None
            else f" AND {sql_coin('vec_id', sample_p)}")
    head = f"""
        WITH vv AS MATERIALIZED (
            -- MATERIALIZED: inlined, the optimizer reorders the join
            -- and evaluates list_cosine_similarity on NULL vectors
            -- (q24 rule)
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id IS NOT NULL AND embedding IS NOT NULL{coin}),
        e AS MATERIALIZED (
            SELECT a.vec_id AS u, b.vec_id AS v
            FROM vv a JOIN vv b ON a.vec_id <> b.vec_id
             AND list_cosine_similarity(a.embedding, b.embedding)
                 >= {thr}),
        deg AS MATERIALIZED (SELECT u, count(*) AS n FROM e GROUP BY 1),
        core AS MATERIALIZED (SELECT u FROM deg WHERE n >= {min_pts}),
        ce AS MATERIALIZED (
            SELECT e.u, e.v FROM e
            JOIN core ca ON ca.u = e.u JOIN core cb ON cb.u = e.v
            UNION ALL SELECT u, u FROM core),
        l0 AS MATERIALIZED (SELECT u AS node, u AS lbl FROM core)"""
    body = []
    for i in range(1, rounds + 1):
        body.append(f"""
        l{i} AS MATERIALIZED (
            SELECT a.node, min(least(a.lbl, b.lbl)) AS lbl
            FROM l{i - 1} a JOIN ce ON ce.u = a.node
            JOIN l{i - 1} b ON b.node = ce.v
            GROUP BY a.node)""")
    tail = f"""
        SELECT node AS vec_id, 'core' AS role,
               lbl::BIGINT AS cluster_id FROM l{rounds}
        UNION ALL
        SELECT e.u, 'border', min(l.lbl)::BIGINT
        FROM e JOIN core c ON c.u = e.v
        JOIN l{rounds} l ON l.node = e.v
        WHERE e.u NOT IN (SELECT u FROM core)
        GROUP BY e.u
        ORDER BY 1"""
    return head + "," + ",".join(body) + tail


def perrow_queries() -> dict[str, Callable[[str], Any]]:
    """Dataset-returning cores for queries whose RESULT is corpus-sized
    (one row per document) — the scale-safe oracle contract: the gate
    streams each of these to parquet with ``Dataset.write_parquet``
    and hash-compares against DuckDB over the files, so the full
    answer never rides ``to_pandas()`` through the driver. Every key
    here also has a ``queries()`` twin (the driver's row-compare
    contract at small sf is unchanged) and either an ``oracle_sql()``
    twin (hash-compared) or a ``perrow_rowcount_sql()`` entry
    (count-checked — hash-based values with no SQL twin)."""
    from web_scrapper_ray.pipelines import analytics, relational, \
        textops
    from web_scrapper_ray.pipelines import dedup as _dedup

    return {
        "q10_token_count": textops.q_token_count_ds,
        "q11_reading_time": textops.q_reading_time_ds,
        "q12_clean_text": textops.q_clean_text_ds,
        "q14_fingerprint": textops.q_fingerprint_ds,
        "q15_quality": textops.q_quality_ds,
        "q16_lang_id": textops.q_lang_id_ds,
        "q362_scd2_history": analytics.q_scd2_history_ds,
        "q363_gap_fill_locf": analytics.q_gap_fill_locf_ds,
        "q48_dedup_corpus": _dedup.q_dedup_corpus_ds,
        "q23_simhash": _dedup.q_simhash_ds,
        "q53_neardup_clusters": _dedup.q_neardup_clusters_ds,
        "q95_running_total": relational.q_running_total_ds,
    }


def perrow_rowcount_sql() -> dict[str, str]:
    """Weaker streamed contract for ``perrow_queries`` entries whose
    VALUES have no SQL twin (hash-based upstream — blake2b simhash,
    banding candidates): the gate still streams the Dataset to parquet
    (never ``to_pandas`` through the driver) but checks ROW COUNT
    against this SQL instead of a value hash. Both queries emit
    exactly one row per document by contract; their values are
    pytested against sequential references and the driver's rows-only
    check at sf0.01."""
    return {
        "q23_simhash": "SELECT count(*)::BIGINT FROM documents",
        "q53_neardup_clusters": "SELECT count(*)::BIGINT FROM documents",
    }


def sampled_oracles() -> dict[str, dict]:
    """Bounded oracle contracts for the queries whose FULL SQL twin is
    super-quadratic in the input (sf1-infeasible: q105's n² byte-
    levenshtein cross join, q230's ε-cosine graph, q250's n² sign
    pairs). When ``table`` at the gate's sf_dir exceeds
    ``max_full_rows``, the gate swaps in these twins: engine and SQL
    restrict the INPUT to the same deterministic md5-coin sample
    (``pairs.md5_coin_mask`` ↔ ``pairs.sql_coin``, probed identical),
    so the quadratic oracle runs on (p·n)² rows while the engine code
    path under test is the production one. Below the threshold the
    full compare runs as always (sf0.01 + fuzz stay exact-full)."""
    from web_scrapper_ray.pipelines import rankstats, relational, \
        similarity
    from web_scrapper_ray.pipelines import graph as _graph
    from web_scrapper_ray.pipelines.pairs import sql_coin

    q105 = f"""
        WITH sp AS MATERIALIZED (
            SELECT p_partkey, p_name FROM part
            WHERE {sql_coin('p_partkey', 0.02)})
        SELECT p1.p_partkey AS a_partkey, p2.p_partkey AS b_partkey,
               levenshtein(p1.p_name, p2.p_name)::BIGINT AS dist
        FROM sp p1, sp p2
        WHERE p1.p_partkey < p2.p_partkey
          AND levenshtein(p1.p_name, p2.p_name) <= 1
        ORDER BY 1, 2
    """
    q250 = f"""
        WITH s AS (
            SELECT o_totalprice AS x, epoch_us(o_orderdate) AS y
            FROM orders
            WHERE isfinite(o_totalprice)
              AND o_orderdate IS NOT NULL
              AND {sql_coin('o_orderkey', 0.004)}),
        r AS (SELECT x, y, row_number() OVER () AS rid FROM s),
        cd AS (SELECT coalesce(sum(
                   CASE WHEN (a.x < b.x AND a.y < b.y)
                          OR (a.x > b.x AND a.y > b.y) THEN 1
                        WHEN (a.x < b.x AND a.y > b.y)
                          OR (a.x > b.x AND a.y < b.y) THEN -1
                        ELSE 0 END), 0) AS sgn
               FROM r a JOIN r b ON b.rid > a.rid),
        nn AS (SELECT count(*) AS n FROM s),
        t1 AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS n1
               FROM (SELECT count(*) AS c FROM s GROUP BY x)),
        t2 AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS n2
               FROM (SELECT count(*) AS c FROM s GROUP BY y))
        SELECT n::BIGINT AS n,
               CASE WHEN n * (n - 1) // 2 > n1
                     AND n * (n - 1) // 2 > n2
                    THEN round(sgn / sqrt(
                        CAST(n * (n - 1) // 2 - n1 AS DOUBLE)
                        * CAST(n * (n - 1) // 2 - n2 AS DOUBLE)),
                        6)
               END AS tau_b
        FROM cd, nn, t1, t2
    """
    q228 = f"""
        WITH pairs AS MATERIALIZED (
          SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                          greatest(a.l_suppkey, b.l_suppkey) AS v
          FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey
              AND a.l_suppkey <> b.l_suppkey
          WHERE a.l_orderkey IS NOT NULL
            AND a.l_suppkey IS NOT NULL
            AND b.l_suppkey IS NOT NULL
            AND {sql_coin('a.l_suppkey', 0.3)}
            AND {sql_coin('b.l_suppkey', 0.3)}),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM pairs e1
          JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
          JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v),
        tn AS (SELECT a AS node FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri),
        tc AS (SELECT node, count(*) AS t FROM tn GROUP BY 1),
        deg AS (SELECT node, count(*) AS d FROM
                (SELECT u AS node FROM pairs
                 UNION ALL SELECT v FROM pairs)
                GROUP BY 1)
        SELECT deg.node AS l_suppkey, d::BIGINT AS degree,
               coalesce(t, 0)::BIGINT AS n_tri,
               round(2.0 * coalesce(t, 0) / (d * (d - 1.0)), 6)
                   AS cc
        FROM deg LEFT JOIN tc ON tc.node = deg.node
        WHERE d >= 2 ORDER BY 1
    """
    return {
        "q105_fuzzy_name_join": {
            "fn": lambda d: relational.q_fuzzy_name_join(
                d, sample_p=0.02),
            "sql": q105, "table": "part", "max_full_rows": 30_000},
        "q228_clustering_coefficient": {
            # the FULL oracle needs ~100 GB (RAM or spill) — feasible
            # standalone on this box only without a live Ray session
            # (probed: 285 s, BASELINE.md); the induced-subgraph coin
            # sample keeps the triple self-join ~p² smaller
            "fn": lambda d: _graph.q_clustering_coefficient(
                d, sample_p=0.3),
            "sql": q228, "table": "lineitem",
            "max_full_rows": 1_000_000},
        "q250_kendall_tau": {
            "fn": lambda d: rankstats.q_kendall_tau(
                d, sample_p=0.004),
            "sql": q250, "table": "orders",
            "max_full_rows": 200_000},
        "q230_dbscan": {
            "fn": lambda d: similarity.q_dbscan(d, sample_p=0.01),
            "sql": _dbscan_sql(sample_p=0.01),
            "table": "embeddings", "max_full_rows": 60_000},
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_lineitem_agg": f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*)::BIGINT AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q02_top_customers": """
            SELECT o_custkey AS c_custkey, any_value(c_name) AS c_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*)::BIGINT AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY o_custkey
            ORDER BY revenue DESC, c_custkey LIMIT 10
        """,
        "q03_orders_filter_topk": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_orderstatus = 'F'
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "q04_events_window": """
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q05_order_priority_join": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q06_orders_page2": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_orderstatus = 'F'
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 50
        """,
        "q07_user_sessions": """
            WITH gaps AS (
                SELECT user_id, ts, value,
                       CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
                SELECT user_id, ts,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM gaps
            ), per AS (
                SELECT user_id, session_id, count(*) AS n FROM sess
                GROUP BY user_id, session_id
            )
            SELECT user_id, count(*)::BIGINT AS n_sessions,
                   sum(n)::BIGINT AS n_events,
                   max(n)::BIGINT AS max_session_events
            FROM per GROUP BY user_id ORDER BY user_id
        """,
        "q08_suppliers_per_region": """
            SELECT r_name, count(*)::BIGINT AS n_suppliers,
                   round(sum(s_acctbal), 2) AS sum_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "q09_part_type_stats": """
            SELECT p_type, count(*)::BIGINT AS n_parts,
                   round(avg(p_size), 4) AS avg_size,
                   round(min(p_retailprice), 2) AS min_price,
                   round(max(p_retailprice), 2) AS max_price
            FROM part GROUP BY p_type ORDER BY p_type
        """,
        "q28_docs_by_lang_source": """
            SELECT lang, source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars
            FROM documents GROUP BY lang, source ORDER BY lang, source
        """,
        "q29_events_value_stats": """
            -- contract: NaN/±inf values excluded (DuckDB stddev
            -- raises 'out of range' on them); NULL values stay
            SELECT event_type, count(*)::BIGINT AS n,
                   round(avg(value), 4) AS avg_value,
                   round(stddev_samp(value), 4) AS std_value
            FROM events WHERE value IS NULL OR isfinite(value)
            GROUP BY event_type ORDER BY event_type
        """,
        "q44_distinct_event_types": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type
        """,
        "q50_orders_events_range_join": """
            SELECT o.o_orderkey, count(e.event_id)::BIGINT AS n_events_24h
            FROM orders o LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND e.ts >= o.o_orderdate
             AND e.ts < o.o_orderdate + INTERVAL 1 DAY
            GROUP BY o.o_orderkey ORDER BY o.o_orderkey
        """,
        "q49_rolling_avg": """
            -- contract: non-finite values out (pandas rolling skips
            -- NaN where SQL avg propagates; DuckDB's running-sum
            -- window lets one inf poison the whole partition tail);
            -- NULL values stay on both sides
            SELECT event_id, user_id,
                   round(avg(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
            FROM events WHERE value IS NULL OR isfinite(value)
            ORDER BY event_id
        """,
        "q43_events_asof_join": """
            SELECT e.event_id, e.user_id,
                   CAST(epoch(o.o_orderdate) AS BIGINT) AS last_order_ts
            FROM events e ASOF JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ORDER BY e.event_id
        """,
        "q46_custkeys_intersect": """
            SELECT o_custkey AS custkey FROM orders
            INTERSECT
            SELECT c_custkey FROM customer
            ORDER BY custkey
        """,
        "q47_custkeys_except": """
            SELECT c_custkey AS custkey FROM customer
            EXCEPT
            SELECT o_custkey FROM orders
            ORDER BY custkey
        """,
        "q45_brand_revenue_native_join": """
            -- exact-int revenue: price/discount are 2dp, so
            -- price*(1-disc) is exact in 1e-4 units; float sums of
            -- ~1e10 dollars are order-sensitive in the last cent at
            -- sf>=1 (engine does the identical int arithmetic)
            SELECT p_brand,
                   round(sum(round(l_extendedprice * 100)::BIGINT
                             * (100 - round(l_discount * 100)::BIGINT))
                         / 10000.0, 2) AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "q41_events_sliding_window": """
            SELECT event_type, window_start, count(*)::BIGINT AS n_events
            FROM (
                SELECT event_type,
                       unnest([CAST(epoch(date_trunc('hour', ts)) AS BIGINT),
                               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - 3600]) AS window_start
                FROM events
            ) GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "q42_top_customers_per_segment": """
            SELECT c_mktsegment, rank, c_custkey, c_acctbal FROM (
                SELECT c_mktsegment, c_custkey, c_acctbal,
                       row_number() OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey) AS rank
                FROM customer
            ) WHERE rank <= 5 ORDER BY c_mktsegment, rank
        """,
        "q10_token_count": f"""
            SELECT doc_id, {_WC}::BIGINT AS n_tokens FROM documents ORDER BY doc_id
        """,
        "q11_reading_time": f"""
            SELECT doc_id,
                   greatest(1, CASE WHEN {_WCC} % 200 = 100
                       THEN ({_WCC} // 200) + (({_WCC} // 200) % 2)
                       ELSE CAST(round({_WCC} / 200.0) AS BIGINT) END)::BIGINT AS reading_min
            FROM documents ORDER BY doc_id
        """,
        "q12_clean_text": f"""
            SELECT doc_id, {_CLEAN_SQL} AS clean FROM documents ORDER BY doc_id
        """,
        "q13_keywords_topk": f"""
            SELECT word, count(*)::BIGINT AS n_total FROM (
                SELECT unnest({_TOKS}) AS word FROM documents
            ) WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
            GROUP BY word ORDER BY n_total DESC, word ASC LIMIT 20
        """,
        "q14_fingerprint": """
            SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id
        """,
        "q15_quality": f"""
            SELECT doc_id, len(toks)::BIGINT AS n_tokens, n_stop::BIGINT AS n_stop,
                   (len(toks) BETWEEN 10 AND 1000) AND (20 * n_stop > len(toks)) AS is_good
            FROM (
                SELECT doc_id, {_TOKS} AS toks,
                       len(list_filter({_TOKS}, x -> list_contains([{_STOPLIST_SQL}], x))) AS n_stop
                FROM documents
            ) ORDER BY doc_id
        """,
        "q16_lang_id": f"""
            SELECT doc_id,
                   CASE WHEN 10 * {_NSTOP} > len({_TOKS}) THEN 'en' ELSE 'other' END AS lang_pred
            FROM documents ORDER BY doc_id
        """,
        "q17_json_valid": """
            SELECT event_id, coalesce(json_valid(props), false) AS valid_json
            FROM events ORDER BY event_id
        """,
        "q285_langid_eval": f"""
            WITH p AS (
                SELECT (CASE WHEN 10 * {_NSTOP} > len({_TOKS})
                             THEN 1 ELSE 0 END) AS pred_en,
                       (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                           AS act_en
                FROM documents),
            c AS (SELECT
                (count(*) FILTER (WHERE pred_en = 1 AND act_en = 1)
                )::BIGINT AS tp,
                (count(*) FILTER (WHERE pred_en = 1 AND act_en = 0)
                )::BIGINT AS fp,
                (count(*) FILTER (WHERE pred_en = 0 AND act_en = 1)
                )::BIGINT AS fn,
                (count(*) FILTER (WHERE pred_en = 0 AND act_en = 0)
                )::BIGINT AS tn
                FROM p)
            SELECT tp, fp, fn, tn,
                   round((2.0 * tp / (2 * tp + fp + fn)
                          + 2.0 * tn / (2 * tn + fn + fp)) / 2.0, 6)
                       AS macro_f1
            FROM c
        """,
        "q18_phone_digits": """
            SELECT c_custkey, digits,
                   (length(digits) BETWEEN 7 AND 15
                    AND NOT (length(digits) >= 7 AND digits = repeat(digits[1], length(digits)))
                    AND NOT starts_with(digits, '12345')) AS valid
            FROM (SELECT c_custkey,
                         regexp_replace(
                             '(' || (200 + c_custkey % 800) || ') '
                             || (100 + c_custkey % 900) || '-'
                             || lpad((c_custkey % 10000)::VARCHAR, 4, '0'),
                             '[^0-9+]', '', 'g') AS digits
                  FROM customer) ORDER BY c_custkey
        """,
        "q19_entities": r"""
            SELECT doc_id,
                   len(list_distinct(regexp_extract_all(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')))::BIGINT AS n_emails,
                   len(list_distinct(regexp_extract_all(text,
                       'https?://[^\s]+')))::BIGINT AS n_urls,
                   len(list_distinct(list_concat(list_concat(
                       regexp_extract_all(text, '\b\d{1,2}/\d{1,2}/\d{2,4}\b'),
                       regexp_extract_all(text, '\b\d{4}-\d{1,2}-\d{1,2}\b')),
                       regexp_extract_all(text,
                       '(?i)\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b'))))::BIGINT AS n_dates,
                   len(list_distinct(list_concat(list_concat(list_concat(list_concat(
                       regexp_extract_all(text, 'Mr\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*'),
                       regexp_extract_all(text, 'Ms\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*')),
                       regexp_extract_all(text, 'Mrs\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*')),
                       regexp_extract_all(text, 'Dr\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*')),
                       regexp_extract_all(text, 'Prof\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*'))))::BIGINT AS n_people,
                   len(list_distinct(regexp_extract_all(text,
                       '(?:[A-Z][a-z]*\s+)+(?:Inc|Corp|Corporation|LLC|Company|Ltd|Limited|Association|Foundation|Institute)')))::BIGINT AS n_organizations,
                   len(list_distinct(list_concat(list_concat(list_concat(
                       regexp_extract_all(text, 'in ([A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*)', 1),
                       regexp_extract_all(text, 'at ([A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*)', 1)),
                       regexp_extract_all(text, 'from ([A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*)', 1)),
                       regexp_extract_all(text, 'to ([A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*)', 1))))::BIGINT AS n_locations
            FROM documents ORDER BY doc_id
        """,
        "q52_stratified_sample": """
            SELECT lang, doc_id, rank FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY md5(text), doc_id) AS rank
                FROM documents
            ) WHERE rank <= 5 ORDER BY lang, rank
        """,
        "q39_bpe_token_count": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+|\s+'))::BIGINT
                       AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "q54_doc_chunks": f"""
            SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
                   least(32, n - chunk_idx*32)::BIGINT AS chunk_tokens
            FROM (SELECT doc_id, {_WC} AS n,
                         unnest(range(CAST(ceil({_WC}/32.0) AS BIGINT))) AS chunk_idx
                  FROM documents)
            ORDER BY doc_id, chunk_idx
        """,
        "q55_tfidf_topk": r"""
            WITH toks AS (
              SELECT doc_id, t AS term
              FROM documents, unnest(regexp_extract_all(lower(text), '\w+')) AS u(t)
            ),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM toks GROUP BY 1, 2),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*)::DOUBLE AS nd FROM documents)
            SELECT doc_id, term, round(score, 6) AS score FROM (
              SELECT tf.doc_id, tf.term, tf.tf * ln(n.nd / df.df) AS score,
                     row_number() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf * ln(n.nd / df.df) DESC,
                                                 tf.term) AS rk
              FROM tf JOIN df USING (term) CROSS JOIN n
            ) WHERE rk <= 5 ORDER BY doc_id, term
        """,
        "q57_event_value_quantiles": """
            -- contract (mirrors q102): NULL/NaN values out — DuckDB's
            -- quantile_cont is implementation-defined under NaN
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.95), 4) AS p95
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY event_type ORDER BY event_type
        """,
        "q58_shard_pack": r"""
            WITH t AS (SELECT doc_id,
                              coalesce(len(regexp_extract_all(text, '\w+')), 0)::BIGINT AS n_tokens
                       FROM documents),
            r AS (SELECT doc_id, n_tokens,
                         row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS idx
                  FROM t)
            SELECT doc_id, n_tokens,
                   (CASE WHEN idx % 16 < 8 THEN idx % 16
                         ELSE 15 - idx % 16 END)::BIGINT AS shard
            FROM r ORDER BY doc_id
        """,
        "q60_token_offsets": r"""
            WITH t AS (SELECT doc_id,
                              coalesce(len(regexp_extract_all(text, '\w+')), 0)::BIGINT AS n_tokens
                       FROM documents)
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0)::BIGINT AS start_offset,
                   (coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) // 256)::BIGINT AS block_id
            FROM t ORDER BY doc_id
        """,
        "q61_top_percentile": """
            SELECT event_id, round(value, 4) AS value FROM (
                SELECT event_id, value,
                       row_number() OVER (ORDER BY value DESC, event_id) AS rn,
                       count(*) OVER () AS n
                FROM events WHERE value IS NOT NULL AND NOT isnan(value)
            ) WHERE rn <= CAST(ceil(0.01 * n) AS BIGINT)
        """,
        "q62_hash_split": """
            SELECT source,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*)::BIGINT AS n_docs
            FROM (SELECT source,
                         ('0x' || substr(md5(source), 1, 8))::UBIGINT % 100 AS b
                  FROM documents)
            GROUP BY source, split ORDER BY source, split
        """,
        "q63_repetition_filter": r"""
            WITH per AS (
                SELECT doc_id, tok, count(*)::BIGINT AS c
                FROM (SELECT doc_id,
                             unnest(regexp_extract_all(text, '\w+')) AS tok
                      FROM documents)
                GROUP BY doc_id, tok
            ), agg AS (
                SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                       count(*)::BIGINT AS n_distinct,
                       max(c)::BIGINT AS top_count
                FROM per GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
                   coalesce(a.n_distinct, 0)::BIGINT AS n_distinct,
                   coalesce(a.top_count, 0)::BIGINT AS top_count,
                   ((coalesce(a.n_tokens, 0) - coalesce(a.n_distinct, 0)) * 1000
                    // greatest(coalesce(a.n_tokens, 0), 1))::BIGINT AS dup_permille,
                   (coalesce(a.top_count, 0) * 1000
                    // greatest(coalesce(a.n_tokens, 0), 1))::BIGINT AS top_permille,
                   (((coalesce(a.n_tokens, 0) - coalesce(a.n_distinct, 0)) * 1000
                     // greatest(coalesce(a.n_tokens, 0), 1) >= 500)
                    OR (coalesce(a.top_count, 0) * 1000
                        // greatest(coalesce(a.n_tokens, 0), 1) >= 200)
                   )::BIGINT AS flagged
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
            ORDER BY d.doc_id
        """,
        "q56_decontaminate": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws
                       FROM documents),
            g AS (SELECT doc_id, array_to_string(ws[x+1 : x+8], ' ') AS gram
                  FROM d, unnest(range(greatest(len(ws) - 7, 0))) AS r(x)),
            b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
            h AS (SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
                  FROM g JOIN b USING (gram)
                  WHERE g.doc_id % 50 <> 0 GROUP BY 1)
            SELECT d2.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d2 LEFT JOIN h USING (doc_id)
            WHERE d2.doc_id % 50 <> 0 ORDER BY doc_id
        """,
        "q40_label_centroids": """
            SELECT label, pos, round(avg(v), 6) AS c
            FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS pos
                  FROM embeddings)
            GROUP BY label, pos ORDER BY label, pos
        """,
        "q64_quantize_embeddings": """
            SELECT vec_id, pos,
                   CASE WHEN m = 0 THEN 0
                        ELSE CAST(round(127 * v / m) AS BIGINT) END AS q
            FROM (SELECT vec_id,
                         CAST(unnest(embedding) AS DOUBLE) AS v,
                         generate_subscripts(embedding, 1) AS pos,
                         list_max(list_transform(
                             embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
                  FROM embeddings)
            ORDER BY vec_id, pos
        """,
        "q66_boilerplate_ngrams": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws
                       FROM documents),
            g AS (SELECT DISTINCT doc_id, array_to_string(ws[x+1 : x+3], ' ') AS gram
                  FROM d, unnest(range(greatest(len(ws) - 2, 0))) AS r(x)),
            f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 4),
            h AS (SELECT doc_id, count(*) AS n_frequent
                  FROM g JOIN f USING (gram) GROUP BY 1)
            SELECT d2.doc_id, coalesce(h.n_frequent, 0)::BIGINT AS n_frequent,
                   coalesce(h.n_frequent, 0) >= 5 AS flagged
            FROM documents d2 LEFT JOIN h USING (doc_id) ORDER BY doc_id
        """,
        "q67_pagerank": """
            WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
            edges AS (SELECT 'p' || p AS src, 's' || s AS dst FROM e
                      UNION ALL SELECT 's' || s AS src, 'p' || p AS dst FROM e),
            deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY 1),
            nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
            r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM deg),
            r1 AS (SELECT e.dst AS node,
                          0.15 / (SELECT n FROM nn) + 0.85 * sum(r0.r / deg.d) AS r
                   FROM edges e JOIN r0 ON e.src = r0.node
                   JOIN deg ON e.src = deg.node GROUP BY 1),
            r2 AS (SELECT e.dst AS node,
                          0.15 / (SELECT n FROM nn) + 0.85 * sum(r1.r / deg.d) AS r
                   FROM edges e JOIN r1 ON e.src = r1.node
                   JOIN deg ON e.src = deg.node GROUP BY 1),
            r3 AS (SELECT e.dst AS node,
                          0.15 / (SELECT n FROM nn) + 0.85 * sum(r2.r / deg.d) AS r
                   FROM edges e JOIN r2 ON e.src = r2.node
                   JOIN deg ON e.src = deg.node GROUP BY 1)
            SELECT node, round(r, 6) AS pr FROM r3 ORDER BY node
        """,
        "q68_source_quality_filter": f"""
            WITH q AS (SELECT doc_id, source,
                              (len({_TOKS}) BETWEEN 10 AND 1000)
                              AND (20 * {_NSTOP} > len({_TOKS})) AS is_good
                       FROM documents),
            s AS (SELECT source, count(*) AS n_docs,
                         count(CASE WHEN is_good THEN 1 END) AS n_good
                  FROM q GROUP BY source)
            SELECT q.doc_id, q.source, (2 * s.n_good >= s.n_docs) AS keep
            FROM q JOIN s USING (source) ORDER BY doc_id
        """,
        "q69_embedding_gram": """
            WITH ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                               generate_subscripts(embedding, 1) AS pos
                        FROM embeddings)
            SELECT a.pos AS i, b.pos AS j, round(sum(a.v * b.v), 6) AS g
            FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
            GROUP BY 1, 2 ORDER BY i, j
        """,
        "q70_consistent_sample": """
            SELECT doc_id, h FROM (
                SELECT doc_id, md5(doc_id::VARCHAR || ':' || coalesce(text, '')) AS h
                FROM documents ORDER BY h, doc_id LIMIT 20
            ) ORDER BY doc_id
        """,
        "q71_kmeans": """
            WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                               CAST(unnest(embedding) AS DOUBLE) AS v
                        FROM embeddings),
            c0 AS (SELECT vec_id AS cluster, pos, v AS c FROM ex WHERE vec_id < 4),
            d1 AS (SELECT e.vec_id, c.cluster, sum((e.v - c.c) * (e.v - c.c)) AS d2
                   FROM ex e JOIN c0 c USING (pos) GROUP BY 1, 2),
            a1 AS (SELECT vec_id, cluster FROM (
                       SELECT vec_id, cluster,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY d2, cluster) AS rn
                       FROM d1) WHERE rn = 1),
            m1 AS (SELECT a.cluster, e.pos, avg(e.v) AS c
                   FROM a1 a JOIN ex e USING (vec_id) GROUP BY 1, 2),
            c1 AS (SELECT c0.cluster, c0.pos, coalesce(m1.c, c0.c) AS c
                   FROM c0 LEFT JOIN m1 ON c0.cluster = m1.cluster
                                       AND c0.pos = m1.pos),
            d2_ AS (SELECT e.vec_id, c.cluster, sum((e.v - c.c) * (e.v - c.c)) AS d2
                    FROM ex e JOIN c1 c USING (pos) GROUP BY 1, 2),
            a2 AS (SELECT vec_id, cluster FROM (
                       SELECT vec_id, cluster,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY d2, cluster) AS rn
                       FROM d2_) WHERE rn = 1),
            m2 AS (SELECT a.cluster, e.pos, avg(e.v) AS c
                   FROM a2 a JOIN ex e USING (vec_id) GROUP BY 1, 2),
            c2 AS (SELECT c1.cluster, c1.pos, coalesce(m2.c, c1.c) AS c
                   FROM c1 LEFT JOIN m2 ON c1.cluster = m2.cluster
                                       AND c1.pos = m2.pos)
            SELECT cluster, pos, round(c, 6) AS c FROM c2 ORDER BY cluster, pos
        """,
        "q72_mix_allocation": r"""
            WITH tok AS (SELECT source,
                                sum(coalesce(len(regexp_extract_all(text, '\w+')), 0))::BIGINT AS n_tokens
                         FROM documents GROUP BY source),
            w AS (SELECT source, n_tokens, sqrt(n_tokens::DOUBLE) AS wt FROM tok),
            q AS (SELECT source, n_tokens,
                         CASE WHEN (SELECT sum(wt) FROM w) = 0 THEN 0
                              ELSE 100000 * wt / (SELECT sum(wt) FROM w)
                         END AS quota FROM w),
            fl AS (SELECT source, n_tokens, floor(quota)::BIGINT AS base,
                          quota - floor(quota) AS rem FROM q),
            r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
                  FROM fl),
            x AS (SELECT CASE WHEN (SELECT sum(wt) FROM w) = 0 THEN 0
                              ELSE 100000 - sum(base) END AS extra FROM fl)
            SELECT source, n_tokens,
                   (base + CASE WHEN rk <= (SELECT extra FROM x)
                                THEN 1 ELSE 0 END)::BIGINT AS alloc
            FROM r ORDER BY source
        """,
        "q73_inverted_index": rf"""
            WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws
                       FROM documents),
            wd AS (SELECT DISTINCT doc_id, w
                   FROM (SELECT doc_id, unnest(ws) AS w FROM d)
                   WHERE len(w) > 2 AND w NOT IN ({_STOPLIST_SQL})),
            f AS (SELECT w, count(*) AS df FROM wd GROUP BY w),
            top AS (SELECT w, df FROM f ORDER BY df DESC, w LIMIT 100)
            SELECT t.w AS word, t.df, wd.doc_id
            FROM top t JOIN wd ON wd.w = t.w
            ORDER BY word, doc_id
        """,
        "q74_event_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
            SELECT u.user_id,
                   (CASE WHEN s3.user_id IS NOT NULL THEN 3
                         WHEN s2.user_id IS NOT NULL THEN 2
                         WHEN s1.user_id IS NOT NULL THEN 1
                         ELSE 0 END)::BIGINT AS reached
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
            ORDER BY user_id
        """,
        "q75_normalize_by_label": """
            WITH ex AS (SELECT vec_id, label,
                               CAST(unnest(embedding) AS DOUBLE) AS v,
                               generate_subscripts(embedding, 1) AS pos
                        FROM embeddings),
            st AS (SELECT label, pos, avg(v) AS mu,
                          avg(v * v) - avg(v) * avg(v) AS var
                   FROM ex GROUP BY 1, 2)
            SELECT e.vec_id, e.pos,
                   round(CASE WHEN st.var <= 0 THEN 0
                              ELSE (e.v - st.mu) / sqrt(st.var) END, 6) AS z
            FROM ex e JOIN st USING (label, pos)
            ORDER BY vec_id, pos
        """,
        "q76_event_anomaly": """
            WITH b AS (SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT AS hour_start,
                              count(*)::BIGINT AS n
                       FROM events
                       WHERE ts IS NOT NULL AND event_type IS NOT NULL
                       GROUP BY 1, 2),
            st AS (SELECT event_type, avg(n::DOUBLE) AS mu,
                          avg(n::DOUBLE * n) - avg(n::DOUBLE) * avg(n::DOUBLE) AS var
                   FROM b GROUP BY 1)
            SELECT b.event_type, b.hour_start, b.n,
                   round(CASE WHEN st.var <= 0 THEN 0
                              ELSE (b.n - st.mu) / sqrt(st.var) END, 6) AS z,
                   abs(round(CASE WHEN st.var <= 0 THEN 0
                                  ELSE (b.n - st.mu) / sqrt(st.var) END, 6)) > 2
                       AS flagged
            FROM b JOIN st USING (event_type)
            ORDER BY event_type, hour_start
        """,
        "q77_pii_redact": f"""
            SELECT doc_id,
                   length(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_emails,
                   length(regexp_extract_all(text, '{_PII_IPV4}'))::BIGINT AS n_ips,
                   length(regexp_extract_all(text, '{_PII_PHONE}'))::BIGINT AS n_phones,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_IPV4}', '<IP>', 'g'),
                       '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
            FROM documents ORDER BY doc_id
        """,
        "q78_unigram_nll": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ),
            vocab AS (SELECT w, count(*)::DOUBLE AS n FROM toks GROUP BY w),
            tot AS (SELECT sum(n) AS total FROM vocab)
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   round(avg(ln(tot.total) - ln(v.n)), 6) AS avg_nll
            FROM toks t JOIN vocab v ON t.w = v.w CROSS JOIN tot
            GROUP BY t.doc_id ORDER BY t.doc_id
        """,
        "q83_retention": """
            WITH e AS (SELECT DISTINCT user_id,
                              epoch(date_trunc('hour', ts))::BIGINT AS h
                       FROM events
                       WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            f AS (SELECT user_id, min(h) AS cohort FROM e GROUP BY 1)
            SELECT f.cohort AS cohort_hour,
                   ((e.h - f.cohort) / 3600)::BIGINT AS offset_h,
                   count(DISTINCT e.user_id)::BIGINT AS n_users
            FROM e JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q85_user_type_pivot": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
                   count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view,
                   count(*)::BIGINT AS n_total,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "q86_event_gaps": """
            WITH g AS (SELECT user_id, ts,
                              epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                                       ORDER BY ts)) AS gap_s
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   CASE WHEN count(*) > 1 THEN
                       round((date_diff('microsecond', min(ts), max(ts))
                              / (count(*) - 1)) / 1000000.0, 6)
                   END AS avg_gap_s,
                   round(max(gap_s), 6) AS max_gap_s
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        "q87_order_deciles": """
            WITH r AS (SELECT o_totalprice,
                              ntile(10) OVER (ORDER BY o_totalprice,
                                              o_orderkey) AS tile
                       FROM orders)
            SELECT tile::BIGINT AS tile, count(*)::BIGINT AS n_orders,
                   min(o_totalprice) AS min_price,
                   max(o_totalprice) AS max_price,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM r GROUP BY tile ORDER BY tile
        """,
        "q88_bloom_semijoin": """
            SELECT l_returnflag, count(*)::BIGINT AS n_items,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_totalprice > 475000.0)
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q89_dup_spans": r"""
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '\w+') AS t
                          FROM documents),
            idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 5)) AS i
                    FROM toks WHERE len(t) >= 7),
            sh AS (SELECT doc_id, array_to_string(t[i:i+6], ' ') AS shingle
                   FROM idx)
            SELECT shingle, count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM sh GROUP BY shingle
            HAVING count(DISTINCT doc_id) >= 2 ORDER BY shingle
        """,
        "q90_mad_outliers": """
            -- contract: NaN values out on both sides (the engine
            -- treats NaN as missing; DuckDB's median sorts NaN last)
            WITH m AS (SELECT event_type, median(value) AS med
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                         AND event_type IS NOT NULL
                       GROUP BY 1),
            d AS (SELECT e.event_type, m.med,
                         abs(e.value - m.med) AS ad
                  FROM events e JOIN m USING (event_type)
                  WHERE e.value IS NOT NULL AND NOT isnan(e.value)),
            md AS (SELECT event_type, median(ad) AS mad FROM d GROUP BY 1)
            SELECT d.event_type, round(any_value(d.med), 6) AS med,
                   round(any_value(md.mad), 6) AS mad,
                   count(*) FILTER (WHERE d.ad > 3 * md.mad)::BIGINT
                       AS n_outliers
            FROM d JOIN md USING (event_type)
            GROUP BY d.event_type ORDER BY d.event_type
        """,
        "q91_readability": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\w+'))::BIGINT AS n_words,
                   greatest(len(regexp_extract_all(text, '[.!?]+')),
                            1)::BIGINT AS n_sentences,
                   len(regexp_extract_all(lower(text),
                                          '[aeiouy]+'))::BIGINT
                       AS n_syllables,
                   CASE WHEN len(regexp_extract_all(text, '\w+')) > 0 THEN
                       round(206.835
                             - 1.015 * (len(regexp_extract_all(text, '\w+'))
                                        / greatest(len(regexp_extract_all(
                                              text, '[.!?]+')), 1))
                             - 84.6 * (len(regexp_extract_all(lower(text),
                                                              '[aeiouy]+'))
                                       / len(regexp_extract_all(text,
                                                                '\w+'))), 4)
                   END AS fre
            FROM documents ORDER BY doc_id
        """,
        "q92_event_regression": """
            -- non-finite y masked to NULL inside the aggregates (not
            -- WHERE): VARPOP raises on NaN/±inf among finite values,
            -- but the group row must still surface (regr_count 0)
            SELECT event_type,
                   regr_count(CASE WHEN isfinite(value) THEN value END,
                              (epoch(ts) - 1700000000.0)
                              / 3600.0)::BIGINT AS n,
                   round(regr_slope(CASE WHEN isfinite(value)
                                         THEN value END,
                                    (epoch(ts) - 1700000000.0)
                                    / 3600.0), 6) AS slope,
                   round(regr_intercept(CASE WHEN isfinite(value)
                                             THEN value END,
                                        (epoch(ts) - 1700000000.0)
                                        / 3600.0), 6) AS icept,
                   round(regr_r2(CASE WHEN isfinite(value)
                                      THEN value END,
                                 (epoch(ts) - 1700000000.0)
                                 / 3600.0), 6) AS r2
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q93_bm25_scores": r"""
            WITH toks AS (
              SELECT doc_id, t AS term
              FROM documents, unnest(regexp_extract_all(lower(text), '\w+')) AS u(t)
            ),
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
            stats AS (SELECT sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl),
            n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
                   WHERE term IN ('hash', 'join', 'vector', 'scan', 'filter')
                   GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                   FROM tf GROUP BY 1)
            SELECT tf.doc_id,
                   round(sum(ln(1.0 + (n.nd - df.df + 0.5) / (df.df + 0.5))
                             * tf.tf * (1.2 + 1.0)
                             / (tf.tf + 1.2 * (1.0 - 0.75
                                               + 0.75 * dl.dl / stats.avgdl))),
                         6) AS score
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN n CROSS JOIN stats
            GROUP BY tf.doc_id ORDER BY tf.doc_id
        """,
        "q94_corr_matrix": """
            SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
                   round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
                   round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              AND l_discount IS NOT NULL
        """,
        "q95_running_total": """
            SELECT o_orderkey, o_custkey,
                   round(sum(cast(round(o_totalprice * 100) AS BIGINT))
                         OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey)
                         / 100.0, 2) AS running_spend
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
              AND o_totalprice IS NOT NULL
            ORDER BY o_orderkey
        """,
        "q96_cube_agg": """
            SELECT l_returnflag, l_linestatus,
                   grouping(l_returnflag, l_linestatus)::BIGINT AS lvl,
                   count(*)::BIGINT AS n_items,
                   sum(cast(l_quantity AS BIGINT))::BIGINT AS sum_qty
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY lvl, l_returnflag, l_linestatus
        """,
        "q97_next_event_gap": """
            SELECT event_id,
                   date_diff('microsecond', ts,
                             lead(ts) OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id)) AS next_gap_us
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
              AND ts IS NOT NULL
            ORDER BY event_id
        """,
        "q98_mode_per_user": """
            WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS n
                       FROM events
                       WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                       GROUP BY 1, 2)
            SELECT user_id, event_type AS mode_type, n AS n_events
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY n DESC, event_type) AS rk
                  FROM c)
            WHERE rk = 1 ORDER BY user_id
        """,
        "q99_median_value_disc": """
            -- NaN excluded on BOTH sides: quantile_disc's selection
            -- network has no consistent NaN placement with >1 NaN
            -- (probed) — same contract as q102's quantile_cont
            SELECT event_type, count(*)::BIGINT AS n_events,
                   quantile_disc(value, 0.5) AS median_value
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
              AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """,
        "q102_percentile_cont": """
            SELECT event_type, count(*)::BIGINT AS n_events,
                   quantile_cont(value, 0.9) AS p90
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
              AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """,
        "q103_part_heavy_left_join": """
            -- n_ship::DOUBLE: the engine always emits float64 (the
            -- LEFT JOIN makes counts nullable); without the cast the
            -- oracle column dtype would flip int64/float64 depending
            -- on whether any part is unmatched
            SELECT p.p_partkey, p.p_brand,
                   CAST(l.n_ship AS DOUBLE) AS n_ship, l.ship_qty
            FROM part p LEFT JOIN (
                SELECT l_partkey, count(*) AS n_ship,
                       sum(l_quantity) AS ship_qty
                FROM lineitem WHERE l_quantity > 45 GROUP BY l_partkey
            ) l ON p.p_partkey = l.l_partkey
            ORDER BY p.p_partkey
        """,
        "q104_parts_never_heavy": """
            SELECT p.p_partkey, p.p_brand FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
            ORDER BY p.p_partkey
        """,
        "q105_fuzzy_name_join": """
            SELECT p1.p_partkey AS a_partkey, p2.p_partkey AS b_partkey,
                   levenshtein(p1.p_name, p2.p_name)::BIGINT AS dist
            FROM part p1, part p2
            WHERE p1.p_partkey < p2.p_partkey
              AND levenshtein(p1.p_name, p2.p_name) <= 1
            ORDER BY 1, 2
        """,
        "q107_brand_name_concat": """
            SELECT p_brand,
                   string_agg(DISTINCT p_name, '|' ORDER BY p_name)
                       AS names,
                   count(DISTINCT p_name)::BIGINT AS n_names
            FROM part WHERE p_brand IS NOT NULL AND p_name IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "q114_custkeys_union": """
            SELECT o_custkey AS custkey FROM orders
            UNION
            SELECT c_custkey FROM customer
            ORDER BY custkey
        """,
        "q113_json_field": """
            SELECT event_id,
                   CASE WHEN json_valid(props)
                        THEN json_extract_string(props, '$.k') END AS k
            FROM events ORDER BY event_id
        """,
        "q109_customer_orders_full_join": """
            WITH o AS (SELECT o_custkey, count(*)::BIGINT AS n_orders,
                              round(sum(o_totalprice), 4) AS total_price
                       FROM orders GROUP BY o_custkey)
            SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
                   c.c_mktsegment, o.n_orders, o.total_price
            FROM customer c FULL JOIN o ON c.c_custkey = o.o_custkey
            ORDER BY custkey, c_mktsegment, n_orders
        """,
        "q110_argmax_event": """
            WITH mx AS (SELECT event_type, max(value) AS vmax
                        FROM events GROUP BY event_type)
            SELECT mx.event_type, mx.vmax, min(e.event_id) AS argmax_id
            FROM events e
            JOIN mx ON e.event_type IS NOT DISTINCT FROM mx.event_type
            WHERE e.value IS NOT DISTINCT FROM mx.vmax
            GROUP BY mx.event_type, mx.vmax
            ORDER BY mx.event_type
        """,
        "q111_value_histogram": """
            SELECT CASE WHEN value < 0 THEN -1
                        WHEN value >= 10 THEN 20
                        ELSE CAST(floor(value / 0.5) AS BIGINT) END AS bin,
                   count(*) AS n
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY bin ORDER BY bin
        """,
        "q112_hourly_gapfill": """
            WITH b AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n,
                              sum(value) AS s
                       FROM events WHERE ts IS NOT NULL GROUP BY 1),
            s AS (SELECT unnest(generate_series((SELECT min(h) FROM b),
                                                (SELECT max(h) FROM b),
                                                INTERVAL 1 HOUR)) AS h)
            SELECT CAST(epoch(s.h) AS BIGINT) AS hour_start,
                   coalesce(b.n, 0)::BIGINT AS n_events,
                   round(b.s, 4) AS sum_value
            FROM s LEFT JOIN b USING (h) ORDER BY 1
        """,
        "q115_max_concurrency": """
            WITH iv AS (
              SELECT event_type, epoch_us(ts) AS s,
                     epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e
              FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
            b AS (SELECT event_type, s AS t, 1 AS d FROM iv
                  UNION ALL SELECT event_type, e, -1 FROM iv),
            r AS (SELECT event_type,
                         sum(d) OVER (PARTITION BY event_type
                                      ORDER BY t, d
                                      ROWS UNBOUNDED PRECEDING) AS c
                  FROM b)
            SELECT event_type, max(c)::BIGINT AS max_concurrent
            FROM r GROUP BY event_type ORDER BY event_type
        """,
        "q116_event_transitions": """
            WITH s AS (
              SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS nxt
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
                AND event_type IS NOT NULL)
            SELECT event_type AS src, nxt AS dst, count(*)::BIGINT AS n
            FROM s WHERE nxt IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q117_source_entropy": """
            WITH toks AS (
              SELECT source, t AS term
              FROM documents,
                   unnest(regexp_extract_all(lower(text), '\\w+')) AS u(t)
              WHERE text IS NOT NULL),
            cnt AS (SELECT source, term, count(*)::DOUBLE AS c
                    FROM toks GROUP BY 1, 2),
            tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY 1)
            SELECT t.source,
                   round(log2(t.n) - sum(c * log2(c)) / t.n, 6) AS entropy
            FROM cnt JOIN tot t ON cnt.source IS NOT DISTINCT FROM t.source
            GROUP BY t.source, t.n ORDER BY t.source
        """,
        "q118_sliding_distinct_users": """
            WITH hu AS (SELECT DISTINCT date_trunc('hour', ts) AS h,
                                        user_id
                        FROM events
                        WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            hrs AS (SELECT DISTINCT h FROM hu),
            w AS (SELECT DISTINCT hrs.h AS wh, hu.user_id
                  FROM hu JOIN hrs
                    ON hu.h BETWEEN hrs.h - INTERVAL 2 HOUR AND hrs.h)
            SELECT CAST(epoch(wh) AS BIGINT) AS hour_start,
                   count(*)::BIGINT AS n_users
            FROM w GROUP BY wh ORDER BY wh
        """,
        "q119_supplier_cooccurrence": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                        FROM lineitem
                        WHERE l_partkey IS NOT NULL
                          AND l_suppkey IS NOT NULL)
            SELECT a.s AS s1, b.s AS s2, count(*)::BIGINT AS shared_parts
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
            GROUP BY 1, 2 HAVING count(*) >= 2
            ORDER BY shared_parts DESC, s1, s2 LIMIT 100
        """,
        "q120_custkeys_except_all": """
            SELECT o_custkey AS custkey FROM orders
            EXCEPT ALL
            SELECT c_custkey FROM customer
            ORDER BY 1
        """,
        "q121_shipping_priority": """
            SELECT l_orderkey AS orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC NULLS LAST, orderkey LIMIT 10
        """,
        "q122_pareto_parts": """
            -- 2-D skyline: minimize price, maximize size; equal pairs
            -- both survive (dominance needs one STRICT inequality)
            SELECT p_partkey, p_retailprice, p_size FROM part a
            WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
              AND NOT isnan(p_retailprice)
              AND NOT EXISTS (
                SELECT 1 FROM part b
                WHERE b.p_retailprice IS NOT NULL AND b.p_size IS NOT NULL
                  AND NOT isnan(b.p_retailprice)
                  AND b.p_retailprice <= a.p_retailprice
                  AND b.p_size >= a.p_size
                  AND (b.p_retailprice < a.p_retailprice
                       OR b.p_size > a.p_size))
            ORDER BY p_retailprice, p_partkey
        """,
        "q123_new_users_hourly": """
            WITH fu AS (SELECT user_id, min(ts) AS first_ts FROM events
                        WHERE user_id IS NOT NULL AND ts IS NOT NULL
                        GROUP BY 1)
            SELECT CAST(epoch(date_trunc('hour', first_ts)) AS BIGINT)
                       AS hour_start,
                   count(*)::BIGINT AS n_new_users
            FROM fu GROUP BY 1 ORDER BY 1
        """,
        "q124_trimmed_mean": """
            -- contract (q57/q102): NULL/NaN values out on both sides;
            -- ±inf stay as orderable extremes
            WITH v AS (SELECT event_type, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            q AS (SELECT event_type,
                         quantile_cont(value, 0.05) AS lo,
                         quantile_cont(value, 0.95) AS hi
                  FROM v GROUP BY event_type)
            SELECT v.event_type,
                   round(avg(v.value), 4) AS trimmed_mean,
                   count(*)::BIGINT AS n_kept
            FROM v JOIN q ON v.event_type IS NOT DISTINCT FROM q.event_type
            WHERE v.value BETWEEN q.lo AND q.hi
            GROUP BY v.event_type ORDER BY v.event_type
        """,
        "q125_top_orders_rank": """
            SELECT o_orderkey, o_totalprice, rk FROM (
                SELECT o_orderkey, o_totalprice,
                       rank() OVER (ORDER BY o_totalprice DESC) AS rk
                FROM orders WHERE o_totalprice IS NOT NULL) t
            WHERE rk <= 10 ORDER BY rk, o_orderkey
        """,
        "q126_connected_components": """
            -- min-label propagation, 4 synchronous rounds unrolled
            -- (fixed round count = the SQL-checkable contract, like
            -- q67's unrolled PageRank); node codes: part pk*2, supp
            -- sk*2+1, labels initialized to the node's own code
            WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                        FROM lineitem
                        WHERE l_partkey IS NOT NULL
                          AND l_suppkey IS NOT NULL),
            e AS (SELECT pk * 2 AS src, sk * 2 + 1 AS dst FROM ps
                  UNION ALL SELECT sk * 2 + 1, pk * 2 FROM ps),
            r0 AS (SELECT DISTINCT src AS v, src AS lab FROM e),
            r1 AS (SELECT v, min(lab) AS lab FROM (
                     SELECT e.dst AS v, r0.lab FROM e JOIN r0 ON r0.v = e.src
                     UNION ALL SELECT v, lab FROM r0) GROUP BY v),
            r2 AS (SELECT v, min(lab) AS lab FROM (
                     SELECT e.dst AS v, r1.lab FROM e JOIN r1 ON r1.v = e.src
                     UNION ALL SELECT v, lab FROM r1) GROUP BY v),
            r3 AS (SELECT v, min(lab) AS lab FROM (
                     SELECT e.dst AS v, r2.lab FROM e JOIN r2 ON r2.v = e.src
                     UNION ALL SELECT v, lab FROM r2) GROUP BY v),
            r4 AS (SELECT v, min(lab) AS lab FROM (
                     SELECT e.dst AS v, r3.lab FROM e JOIN r3 ON r3.v = e.src
                     UNION ALL SELECT v, lab FROM r3) GROUP BY v)
            SELECT CASE WHEN v % 2 = 0 THEN 'p' || (v // 2)
                        ELSE 's' || (v // 2) END AS node,
                   lab::BIGINT AS component
            FROM r4 ORDER BY node
        """,
        "q127_grouping_sets_docs": """
            SELECT lang, source, grouping(lang, source)::BIGINT AS lvl,
                   count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY GROUPING SETS ((lang), (source))
            ORDER BY lvl, lang, source
        """,
        "q128_first_number": """
            -- explicit ASCII class so RE2 and the engine's re agree
            SELECT doc_id, regexp_extract(text, '[0-9]+') AS first_num
            FROM documents ORDER BY doc_id
        """,
        "q129_quiet_orders": """
            SELECT o_orderkey FROM orders o
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
              AND NOT EXISTS (
                SELECT 1 FROM events e
                WHERE e.user_id = o.o_custkey
                  AND e.ts >= o.o_orderdate
                  AND e.ts < o.o_orderdate + INTERVAL 24 HOUR)
            ORDER BY 1
        """,
        "q130_monthly_growth": """
            WITH m AS (SELECT date_trunc('month', o_orderdate) AS mo,
                              sum(o_totalprice) AS rev
                       FROM orders WHERE o_orderdate IS NOT NULL
                       GROUP BY 1)
            SELECT CAST(floor(epoch(mo)) AS BIGINT) AS month_start,
                   round(rev, 2) AS revenue,
                   round(100.0 * (rev - lag(rev) OVER (ORDER BY mo))
                         / lag(rev) OVER (ORDER BY mo), 4) AS pct_growth
            FROM m ORDER BY 1
        """,
        "q131_activity_streaks": """
            WITH days AS (
              SELECT DISTINCT user_id,
                     CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT)
                       AS d
              FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            runs AS (
              SELECT user_id,
                     d - row_number() OVER (PARTITION BY user_id
                                            ORDER BY d) AS grp
              FROM days),
            streaks AS (SELECT user_id, count(*)::BIGINT AS len
                        FROM runs GROUP BY user_id, grp),
            longest AS (SELECT user_id, max(len) AS streak
                        FROM streaks GROUP BY user_id)
            SELECT streak AS streak_days, count(*)::BIGINT AS n_users
            FROM longest GROUP BY 1 ORDER BY 1
        """,
        "q132_interval_coverage": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS s,
                              epoch_us(ts) + 1800000000 AS f
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            m AS (SELECT user_id, s, f,
                         max(f) OVER (PARTITION BY user_id ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS mx
                  FROM e),
            i AS (SELECT user_id, s, f,
                         sum(CASE WHEN mx IS NULL OR s > mx
                                  THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY s
                                 ROWS UNBOUNDED PRECEDING) AS isl
                  FROM m),
            u AS (SELECT user_id, isl, max(f) - min(s) AS len
                  FROM i GROUP BY user_id, isl)
            SELECT user_id, sum(len)::BIGINT AS covered_us
            FROM u GROUP BY user_id ORDER BY user_id
        """,
        "q133_welch_ttest": """
            WITH s AS (SELECT event_type, count(*)::BIGINT AS n,
                              avg(value) AS m, var_samp(value) AS v
                       FROM events
                       WHERE isfinite(value)
                         AND event_type IN ('click', 'purchase')
                       GROUP BY 1),
            a AS (SELECT * FROM s WHERE event_type = 'click'),
            b AS (SELECT * FROM s WHERE event_type = 'purchase')
            SELECT a.n AS n_a, b.n AS n_b,
                   round((a.m - b.m) / sqrt(a.v/a.n + b.v/b.n), 4)
                     AS t_stat,
                   round((a.v/a.n + b.v/b.n) * (a.v/a.n + b.v/b.n)
                         / ((a.v/a.n) * (a.v/a.n) / (a.n - 1)
                            + (b.v/b.n) * (b.v/b.n) / (b.n - 1)), 4)
                     AS dof
            FROM a, b
        """,
        "q134_local_supplier_volume": """
            -- exact-int revenue (q45 form): the float sum flipped a
            -- half-cent at sf1 run-to-run with summation order
            SELECT n_name,
                   round(sum(round(l_extendedprice * 100)::BIGINT
                             * (100 - round(l_discount * 100)::BIGINT))
                         / 10000.0, 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY n_name
        """,
        "q135_all_priority_customers": """
            SELECT o_custkey AS c_custkey, count(*)::BIGINT AS n_orders
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
            GROUP BY 1
            HAVING count(DISTINCT o_orderpriority) = 5
            ORDER BY 1
        """,
        "q136_chi2_independence": """
            WITH obs AS (SELECT event_type AS t, hour(ts) AS h,
                                count(*)::DOUBLE AS o
                         FROM events
                         WHERE event_type IS NOT NULL AND ts IS NOT NULL
                         GROUP BY 1, 2),
            r AS (SELECT t, sum(o) AS rt FROM obs GROUP BY 1),
            c AS (SELECT h, sum(o) AS ct FROM obs GROUP BY 1),
            n AS (SELECT sum(o) AS tot FROM obs),
            cells AS (SELECT coalesce(o.o, 0) AS o,
                             r.rt * c.ct / n.tot AS e
                      FROM r CROSS JOIN c CROSS JOIN n
                      LEFT JOIN obs o ON o.t = r.t AND o.h = c.h)
            SELECT round(sum((o - e) * (o - e) / e), 4) AS chi2,
                   ((SELECT count(*) FROM r) - 1)::BIGINT
                   * ((SELECT count(*) FROM c) - 1)::BIGINT AS dof
            FROM cells
        """,
        "q137_top_session_paths": """
            WITH e AS (SELECT user_id, ts, event_type FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            l AS (SELECT user_id, ts, event_type,
                         CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w
                                 > INTERVAL 30 MINUTE
                              THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id
                                      ORDER BY ts, event_type)),
            s AS (SELECT user_id, event_type, ts,
                         sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_type
                                        ROWS UNBOUNDED PRECEDING) AS sid
                  FROM l),
            p AS (SELECT user_id, sid,
                         string_agg(event_type, '>'
                                    ORDER BY ts, event_type) AS path
                  FROM s GROUP BY 1, 2)
            SELECT path, count(*)::BIGINT AS n
            FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 20
        """,
        "q138_bfs_hops": """
            -- BFS frontier, 4 synchronous rounds unrolled (fixed
            -- round count = the SQL-checkable contract, q126's shape);
            -- seeds: parts with p_size = 1 (h = 0 even when edgeless)
            WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                        FROM lineitem
                        WHERE l_partkey IS NOT NULL
                          AND l_suppkey IS NOT NULL),
            e AS (SELECT pk * 2 AS src, sk * 2 + 1 AS dst FROM ps
                  UNION ALL SELECT sk * 2 + 1, pk * 2 FROM ps),
            d0 AS (SELECT DISTINCT p_partkey * 2 AS v, 0 AS h
                   FROM part
                   WHERE p_partkey IS NOT NULL AND p_size = 1),
            d1 AS (SELECT v, min(h) AS h FROM (
                     SELECT e.dst AS v, d0.h + 1 AS h
                     FROM e JOIN d0 ON d0.v = e.src
                     UNION ALL SELECT v, h FROM d0) GROUP BY v),
            d2 AS (SELECT v, min(h) AS h FROM (
                     SELECT e.dst AS v, d1.h + 1 AS h
                     FROM e JOIN d1 ON d1.v = e.src
                     UNION ALL SELECT v, h FROM d1) GROUP BY v),
            d3 AS (SELECT v, min(h) AS h FROM (
                     SELECT e.dst AS v, d2.h + 1 AS h
                     FROM e JOIN d2 ON d2.v = e.src
                     UNION ALL SELECT v, h FROM d2) GROUP BY v),
            d4 AS (SELECT v, min(h) AS h FROM (
                     SELECT e.dst AS v, d3.h + 1 AS h
                     FROM e JOIN d3 ON d3.v = e.src
                     UNION ALL SELECT v, h FROM d3) GROUP BY v)
            SELECT CASE WHEN v % 2 = 0 THEN 'p' || (v // 2)
                        ELSE 's' || (v // 2) END AS node,
                   h::BIGINT AS hops
            FROM d4 ORDER BY node
        """,
        "q139_type_jaccard": """
            WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t
                        FROM events
                        WHERE user_id IS NOT NULL
                          AND event_type IS NOT NULL),
            p AS (SELECT a.t AS type_a, b.t AS type_b,
                         count(*)::BIGINT AS n_both
                  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
                  GROUP BY 1, 2),
            s AS (SELECT t, count(*)::BIGINT AS n FROM ut GROUP BY 1)
            SELECT type_a, type_b, n_both,
                   round(n_both / (sa.n + sb.n - n_both), 4) AS jaccard
            FROM p JOIN s sa ON sa.t = type_a
                   JOIN s sb ON sb.t = type_b
            ORDER BY type_a, type_b
        """,
        "q140_triangle_count": """
            WITH pairs AS (
              SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                              greatest(a.l_suppkey, b.l_suppkey) AS v
              FROM lineitem a JOIN lineitem b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey <> b.l_suppkey
              WHERE a.l_orderkey IS NOT NULL
                AND a.l_suppkey IS NOT NULL
                AND b.l_suppkey IS NOT NULL)
            SELECT count(*)::BIGINT AS n_triangles
            FROM pairs e1
            JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v
        """,
        "q141_unpivot_lineitem": """
            -- UNPIVOT's NULL-exclusion semantics via the explicit
            -- UNION ALL twin
            SELECT l_orderkey, l_linenumber,
                   'quantity' AS measure, l_quantity AS val
            FROM lineitem WHERE l_quantity IS NOT NULL
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
            FROM lineitem WHERE l_extendedprice IS NOT NULL
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount
            FROM lineitem WHERE l_discount IS NOT NULL
            ORDER BY 1, 2, 3
        """,
        "q142_rolling_stddev": """
            SELECT event_id, event_type,
                   round(stddev_samp(value) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
                     AS mstd
            FROM events
            WHERE event_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL AND isfinite(value)
            ORDER BY event_id
        """,
        "q143_revenue_gini": """
            WITH c AS (SELECT o_custkey AS k, sum(o_totalprice) AS rev
                       FROM orders
                       WHERE o_custkey IS NOT NULL
                         AND o_totalprice IS NOT NULL
                       GROUP BY 1),
            r AS (SELECT rev,
                         row_number() OVER (ORDER BY rev, k) AS i,
                         count(*) OVER () AS n,
                         sum(rev) OVER () AS tot
                  FROM c)
            -- GROUP BY a constant so an empty r emits ZERO rows (a
            -- bare ungrouped aggregate would emit one NULL row the
            -- engine's empty frame can't mirror)
            SELECT round(2.0 * sum(i * rev) / (max(n) * max(tot))
                         - (max(n) + 1.0) / max(n), 6) AS gini,
                   max(n)::BIGINT AS n_customers
            FROM r GROUP BY 1 = 1
        """,
        "q144_rfm_segments": """
            -- exact-int cents (q45 rule): the ntile ORDER BY mon is
            -- last-ulp-sensitive under float partial sums at sf>=1
            WITH c AS (SELECT o_custkey AS k,
                              max(o_orderdate) AS last_dt,
                              count(*)::BIGINT AS freq,
                              sum(round(o_totalprice * 100)::BIGINT)
                                  AS mon
                       FROM orders WHERE o_custkey IS NOT NULL
                       GROUP BY 1)
            SELECT k AS c_custkey,
                   ntile(4) OVER (ORDER BY last_dt, k) AS r_q,
                   ntile(4) OVER (ORDER BY freq, k) AS f_q,
                   ntile(4) OVER (ORDER BY mon, k) AS m_q
            FROM c ORDER BY 1
        """,
        "q145_daily_locf": """
            -- (user, ts) ties collapse to max(value) FIRST: ASOF's
            -- pick among tied right rows is implementation-defined
            WITH b AS (SELECT user_id, ts, max(value) AS v FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND value IS NOT NULL
                       GROUP BY 1, 2),
            r AS (SELECT user_id, date_trunc('day', min(ts)) AS lo,
                         max(ts) AS hi
                  FROM b GROUP BY 1),
            s AS (SELECT user_id,
                         unnest(generate_series(lo, hi,
                                                INTERVAL 1 DAY)) AS h
                  FROM r)
            SELECT s.user_id, epoch_us(s.h) AS day_us, b.v AS filled
            FROM s ASOF LEFT JOIN b
                 ON b.user_id = s.user_id AND b.ts <= s.h
            ORDER BY 1, 2
        """,
        "q146_entity_conflicts": """
            SELECT c_custkey, count(DISTINCT c_name)::BIGINT AS n_names
            FROM customer
            WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
            GROUP BY 1 HAVING count(DISTINCT c_name) > 1
            ORDER BY 1
        """,
        "q147_value_shape": """
            -- non-finite masked INSIDE the aggregate (CASE, not
            -- WHERE): DuckDB skewness raises on ±inf, and the
            -- all-masked group must still emit its row (n=0)
            SELECT event_type,
                   count(CASE WHEN isfinite(value) THEN value END)
                       ::BIGINT AS n,
                   round(skewness(CASE WHEN isfinite(value)
                                       THEN value END), 6) AS skew,
                   round(kurtosis(CASE WHEN isfinite(value)
                                       THEN value END), 6) AS kurt
            FROM events GROUP BY event_type
            ORDER BY event_type NULLS LAST
        """,
        "q148_order_percentiles": """
            SELECT o_orderkey, o_custkey,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
            ORDER BY o_custkey NULLS LAST, o_orderkey NULLS LAST, pr
        """,
        "q149_brand_price_means": """
            -- finite-positive on BOTH sides: ln() raises on x <= 0,
            -- and NaN > 0 is TRUE in DuckDB's comparison total order
            -- but false in Arrow's — isfinite keeps filters identical
            SELECT p_brand, count(*)::BIGINT AS n,
                   round(exp(avg(ln(p_retailprice))), 6) AS gm,
                   round(count(*) / sum(1.0 / p_retailprice), 6) AS hm
            FROM part
            WHERE p_retailprice > 0 AND isfinite(p_retailprice)
            GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q150_bitwise_event_ids": """
            -- ::DOUBLE so the dtype stops depending on whether an
            -- all-NULL-id group exists (q103 nullable-dtype contract)
            SELECT event_type, count(event_id)::BIGINT AS n,
                   bit_and(event_id)::DOUBLE AS ba,
                   bit_or(event_id)::DOUBLE AS bo,
                   bit_xor(event_id)::DOUBLE AS bx
            FROM events GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q151_orderkey_gaps": """
            WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
                       WHERE o_orderkey IS NOT NULL),
            p AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
            SELECT (k + 1)::BIGINT AS gap_start,
                   (nk - 1)::BIGINT AS gap_end,
                   (nk - k - 1)::BIGINT AS n_missing
            FROM p WHERE nk - k > 1 ORDER BY 1
        """,
        "q152_user_drawdown": """
            -- integer cents (q95 exact-int contract); non-finite
            -- WHERE-filtered on both sides (the cast raises on them);
            -- default RANGE frame makes (ts, event_id) ties peers
            WITH b AS (SELECT user_id, ts, event_id,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events
                       WHERE value IS NOT NULL AND isfinite(value)),
            r AS (SELECT user_id, ts, event_id, cents,
                         sum(cents) OVER w AS cum
                  FROM b
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id)),
            m AS (SELECT user_id, cum,
                         max(cum) OVER w AS runmax
                  FROM r
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id))
            SELECT user_id, count(*)::BIGINT AS n,
                   max(runmax - cum) / 100.0 AS max_drawdown
            FROM m GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q153_doc_sentences": """
            -- fixed-separator split parity (probed): '' -> one ''
            -- row, trailing sep -> trailing '', NULL text -> 0 rows
            WITH s AS (SELECT doc_id,
                              generate_subscripts(
                                  string_split(text, '. '), 1)::BIGINT
                                  AS pos,
                              unnest(string_split(text, '. '))
                                  AS sentence
                       FROM documents)
            SELECT doc_id, pos, sentence,
                   length(sentence)::BIGINT AS n_chars
            FROM s ORDER BY doc_id, pos
        """,
        "q154_price_outlier_fences": """
            WITH v AS (SELECT p_brand, p_retailprice AS x FROM part
                       WHERE p_retailprice IS NOT NULL
                         AND NOT isnan(p_retailprice)),
            q AS (SELECT p_brand, count(*)::BIGINT AS n,
                         quantile_cont(x, 0.25) AS q1,
                         quantile_cont(x, 0.75) AS q3
                  FROM v GROUP BY 1),
            j AS (SELECT v.p_brand AS p_brand, v.x, q.n, q.q1, q.q3
                  FROM v JOIN q
                       ON v.p_brand IS NOT DISTINCT FROM q.p_brand)
            SELECT p_brand, max(n) AS n, max(q1) AS q1, max(q3) AS q3,
                   sum(CASE WHEN x < q1 - 1.5 * (q3 - q1)
                             OR x > q3 + 1.5 * (q3 - q1)
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers
            FROM j GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q155_returned_item_revenue": """
            -- exact-cents form (CLAUDE.md exact-int rule): prices and
            -- discounts are 2dp decimals, so summing in 1e-4 units is
            -- exact on both sides — a float sum landed within one ulp
            -- of a .xx5 half boundary and flipped the 2dp rounding
            SELECT c_custkey, c_name,
                   round(sum(CAST(round(l_extendedprice * 100)
                                  AS BIGINT)
                             * (100 - CAST(round(l_discount * 100)
                                           AS BIGINT)))
                         / 10000.0, 2) AS revenue,
                   c_acctbal, n_name
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY c_custkey, revenue
        """,
        "q156_large_volume_orders": """
            SELECT c_name, c_custkey, o_orderkey,
                   CAST(epoch_us(o_orderdate) AS DOUBLE) AS odate_us,
                   o_totalprice, sum(l_quantity) AS sum_qty
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY 1 HAVING sum(l_quantity) > 300)
            GROUP BY 1, 2, 3, 4, 5
            ORDER BY c_custkey, o_orderkey
        """,
        "q157_late_order_priorities": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate >
                                o_orderdate + INTERVAL 60 DAY)
            GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q158_small_quantity_revenue": """
            SELECT p_brand,
                   round(sum(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
            WHERE l1.l_quantity < (
                SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                WHERE l2.l_partkey = l1.l_partkey)
            GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q159_user_hour_window": """
            SELECT event_id,
                   count(*) OVER w AS n_win,
                   round(sum(value) OVER w, 4) AS sum_win
            FROM events
            WHERE event_id IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL AND isfinite(value)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
            ORDER BY event_id
        """,
        "q160_idle_rich_customers": """
            WITH thr AS (SELECT avg(c_acctbal) AS a FROM customer
                         WHERE c_acctbal > 0)
            SELECT CAST(c_custkey % 7 AS DOUBLE) AS cc,
                   count(*)::BIGINT AS n_cust,
                   round(sum(c_acctbal), 2) AS total_bal
            FROM customer, thr
            WHERE c_acctbal > thr.a
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >=
                                    TIMESTAMP '2000-01-01')
            GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q161_two_nation_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q162_sole_late_shipper": """
            SELECT s_name, count(*)::BIGINT AS numwait
            FROM supplier
            JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            JOIN orders ON o_orderkey = l1.l_orderkey
            WHERE o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate >
                                    o_orderdate + INTERVAL 60 DAY)
            GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q163_nation_market_share": """
            WITH an AS (
                SELECT year(o_orderdate) AS o_year,
                       l_extendedprice * (1 - l_discount) AS volume,
                       n2.n_name AS supp_nation
                FROM part
                JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
                  AND o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1997-01-01')
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_5'
                                  THEN volume ELSE 0 END)
                         / sum(volume), 6) AS mkt_share
            FROM an GROUP BY 1 ORDER BY 1
        """,
        "q164_top_revenue_supplier": """
            -- exact-int revenue (q45 rule): the max-equality tie set
            -- is order-sensitive under float partial sums at sf>=1
            WITH rev AS (
                SELECT l_suppkey AS sk,
                       sum(round(l_extendedprice * 100)::BIGINT
                           * (100 - round(l_discount * 100)::BIGINT))
                           AS total4
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                  AND l_suppkey IS NOT NULL
                GROUP BY 1),
            m AS (SELECT sk, total4, max(total4) OVER () AS mx
                  FROM rev)
            SELECT s_suppkey, s_name,
                   round(total4 / 10000.0, 2) AS total_revenue
            FROM supplier JOIN m ON s_suppkey = sk
            WHERE total4 = mx
            ORDER BY 1
        """,
        "q165_user_time_weighted_avg": """
            WITH e AS (
                SELECT user_id, ts, value,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nts
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND event_id IS NOT NULL AND isfinite(value))
            SELECT user_id,
                   round(sum(value * (epoch_us(nts) - epoch_us(ts)))
                         / sum(epoch_us(nts) - epoch_us(ts)), 6) AS twa
            FROM e WHERE nts IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "q166_brand_size_promo_revenue": """
            SELECT count(*)::BIGINT AS n_items,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity >= 10)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                   AND l_quantity >= 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                   AND l_quantity >= 30)
        """,
        "q167_customer_order_counts": """
            WITH c AS (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey
                 AND o_orderpriority <> '4-NOT SPECIFIED'
                GROUP BY 1)
            SELECT c_count::BIGINT AS c_count,
                   count(*)::BIGINT AS custdist
            FROM c GROUP BY 1
            ORDER BY custdist DESC, c_count DESC
        """,
        "q168_promo_revenue_share": """
            SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                          THEN l_extendedprice
                                               * (1 - l_discount)
                                          ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6)
                       AS promo_share
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-09-01'
              AND l_shipdate < TIMESTAMP '1996-10-01'
        """,
        "q169_min_balance_supplier": """
            WITH ps AS (
                SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                FROM lineitem
                WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
            j AS (SELECT pk, sk, s_name, s_acctbal
                  FROM ps JOIN supplier ON s_suppkey = sk),
            m AS (SELECT pk, min(s_acctbal) AS mn FROM j GROUP BY 1)
            SELECT j.pk AS p_partkey, j.sk AS s_suppkey,
                   j.s_name, j.s_acctbal
            FROM j JOIN m ON j.pk = m.pk
            WHERE j.s_acctbal = m.mn
            ORDER BY 1, 2, 3
        """,
        "q170_important_parts": """
            -- exact-int revenue (q45 rule): per-part sums land on
            -- REAL x.xx5 half-boundaries; the threshold compare is
            -- cross-multiplied into pure integers (1.5 = 3/2)
            WITH pv AS (
                SELECT l_partkey AS pk,
                       sum(round(l_extendedprice * 100)::BIGINT
                           * (100 - round(l_discount * 100)::BIGINT))
                           AS val4
                FROM lineitem WHERE l_partkey IS NOT NULL
                GROUP BY 1),
            g AS (SELECT sum(val4) AS tot4, count(val4) AS cnt FROM pv)
            SELECT pk AS p_partkey, round(val4 / 10000.0, 2) AS value
            FROM pv, g
            WHERE val4::HUGEINT * 2 * cnt > tot4::HUGEINT * 3
            ORDER BY 1
        """,
        "q171_brand_size_suppliers": """
            SELECT p_brand, p_size::DOUBLE AS p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier
                WHERE s_acctbal < 0 AND s_suppkey IS NOT NULL)
            GROUP BY 1, 2
            ORDER BY supplier_cnt DESC, p_brand, p_size
        """,
        "q172_priority_line_counts": """
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT
                       AS high_line_count,
                   sum(CASE WHEN o_orderpriority NOT IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT
                       AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        "q173_dominant_red_suppliers": """
            WITH rp AS (
                SELECT p_partkey AS pk FROM part
                WHERE p_name LIKE 'red%' AND p_partkey IS NOT NULL),
            l AS (
                SELECT l_partkey AS pk, l_suppkey AS sk,
                       l_quantity AS q
                FROM lineitem JOIN rp ON l_partkey = rp.pk
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                  AND l_suppkey IS NOT NULL),
            ps AS (SELECT pk, sk, sum(q) AS sq FROM l GROUP BY 1, 2),
            pt AS (SELECT pk, sum(q) AS tq FROM l GROUP BY 1),
            qual AS (SELECT DISTINCT sk FROM ps
                     JOIN pt ON ps.pk = pt.pk
                     WHERE ps.sq > 0.5 * pt.tq)
            SELECT s_suppkey, s_name
            FROM supplier JOIN qual ON s_suppkey = qual.sk
            ORDER BY 1, 2
        """,
        "q174_value_percent_rank": """
            SELECT event_id,
                   percent_rank() OVER (PARTITION BY user_id
                                        ORDER BY value) AS pr,
                   cume_dist() OVER (PARTITION BY user_id
                                     ORDER BY value) AS cd
            FROM events
            WHERE event_id IS NOT NULL AND user_id IS NOT NULL
              AND isfinite(value)
            ORDER BY event_id
        """,
        "q175_zipf_slope": """
            WITH w AS (
                SELECT unnest(regexp_extract_all(lower(text), '\\w+'))
                    AS word
                FROM documents),
            f AS (SELECT word, count(*)::DOUBLE AS f FROM w GROUP BY 1
                  ORDER BY f DESC, word LIMIT 100),
            r AS (SELECT f, row_number() OVER (ORDER BY f DESC, word)
                         AS rk
                  FROM f)
            SELECT round(regr_slope(ln(f), ln(rk)), 6) AS zipf_slope,
                   count(*)::BIGINT AS n_words
            FROM r
        """,
        "q176_weighted_median_price": """
            WITH d AS (
                SELECT l_returnflag AS rf, l_extendedprice AS x,
                       l_quantity AS w
                FROM lineitem
                WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL),
            g AS (SELECT rf, x, sum(w) AS wx FROM d GROUP BY 1, 2),
            c AS (SELECT rf, x,
                         sum(wx) OVER (PARTITION BY rf ORDER BY x)
                             AS cw,
                         sum(wx) OVER (PARTITION BY rf) AS tw
                  FROM g)
            SELECT rf AS l_returnflag,
                   min(CASE WHEN cw >= 0.5 * tw THEN x END) AS wmedian
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "q177_nation_theil_index": """
            WITH j AS (
                SELECT n_name, c_acctbal AS x
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                WHERE isfinite(c_acctbal) AND c_acctbal > 0),
            w AS (
                SELECT n_name, x,
                       avg(x) OVER (PARTITION BY n_name) AS mu,
                       count(*) OVER (PARTITION BY n_name) AS n
                FROM j)
            SELECT n_name,
                   round(sum((x / mu) * ln(x / mu)) / any_value(n), 6)
                       AS theil,
                   any_value(n)::BIGINT AS n_customers
            FROM w GROUP BY 1 ORDER BY 1
        """,
        "q178_user_type_signatures": """
            WITH u AS (
                SELECT user_id,
                       bool_or(event_type = 'click') AS has_click,
                       bool_or(event_type = 'purchase') AS has_purchase,
                       bool_or(event_type = 'error') AS has_error
                FROM events WHERE user_id IS NOT NULL
                GROUP BY 1)
            SELECT has_click, has_purchase, has_error,
                   count(*)::BIGINT AS n_users
            FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q179_benford_totalprice": """
            WITH d AS (
                SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
                                AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                           AS digit
                FROM orders
                WHERE isfinite(o_totalprice) AND o_totalprice >= 1),
            h AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1),
            t AS (SELECT sum(n)::DOUBLE AS tot FROM h)
            SELECT digit, round(n / tot, 6) AS observed,
                   round(log10(1 + 1.0 / digit), 6) AS expected, n
            FROM h, t ORDER BY digit
        """,
        "q180_topk_similar_pairs": """
            -- cast to DOUBLE[]: on FLOAT[] input DuckDB's
            -- list_cosine_similarity accumulates in float32, whose
            -- ~1e-7 relative error flips the 6th rounded digit
            WITH e2 AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
                FROM embeddings WHERE embedding IS NOT NULL),
            s AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                         round(list_cosine_similarity(a.embedding,
                                                      b.embedding), 6)
                             AS sim
                  FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id)
            SELECT vec_a, vec_b, sim FROM s
            ORDER BY sim DESC, vec_a, vec_b LIMIT 50
        """,
        "q181_source_cosine_matrix": """
            WITH w AS (
                SELECT source,
                       unnest(regexp_extract_all(lower(text), '\\w+'))
                           AS word
                FROM documents WHERE source IS NOT NULL),
            f AS (SELECT source, word, count(*)::DOUBLE AS c
                  FROM w GROUP BY 1, 2),
            n AS (SELECT source, sum(c * c) AS nn FROM f GROUP BY 1),
            d AS (SELECT a.source AS src_a, b.source AS src_b,
                         sum(a.c * b.c) AS dot
                  FROM f a JOIN f b
                    ON a.word = b.word AND a.source < b.source
                  GROUP BY 1, 2)
            SELECT src_a, src_b,
                   round(dot / (sqrt(na.nn) * sqrt(nb.nn)), 6) AS cosine
            FROM d JOIN n na ON na.source = d.src_a
                 JOIN n nb ON nb.source = d.src_b
            ORDER BY 1, 2
        """,
        "q182_last_touch_attribution": """
            WITH e AS (
                SELECT event_type,
                       lag(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS attr
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND event_id IS NOT NULL)
            SELECT attr, count(*)::BIGINT AS n_purchases
            FROM e WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY 1
        """,
        "q183_order_total_audit": """
            WITH ls AS (
                SELECT l_orderkey AS k,
                       sum(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax)) AS lsum
                FROM lineitem WHERE l_orderkey IS NOT NULL
                GROUP BY 1),
            j AS (
                SELECT o_totalprice AS tot, lsum,
                       abs(lsum - o_totalprice) / abs(o_totalprice)
                           AS rel
                FROM orders JOIN ls ON o_orderkey = k)
            SELECT count(*) FILTER (tot IS NOT NULL AND lsum IS NOT NULL
                                    AND tot <> 0)::BIGINT AS n_checked,
                   count(*) FILTER (tot IS NOT NULL AND lsum IS NOT NULL
                                    AND tot <> 0
                                    AND NOT (rel <= 0.05))::BIGINT
                       AS n_mismatch,
                   round(sum(rel) FILTER (tot IS NOT NULL
                                          AND lsum IS NOT NULL
                                          AND tot <> 0)
                         / count(*) FILTER (tot IS NOT NULL
                                            AND lsum IS NOT NULL
                                            AND tot <> 0), 6)
                       AS avg_rel_dev
            FROM j
        """,
        "q184_hourly_top_type": """
            WITH h AS (
                SELECT epoch(date_trunc('hour', ts))::BIGINT
                           AS hour_start,
                       event_type, count(*)::BIGINT AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            r AS (SELECT hour_start, event_type, n,
                         dense_rank() OVER (PARTITION BY hour_start
                                            ORDER BY n DESC) AS rk
                  FROM h)
            SELECT hour_start, event_type, n FROM r WHERE rk = 1
            ORDER BY 1, 2
        """,
        "q185_part_skyline": """
            WITH p AS (
                SELECT p_partkey, p_retailprice AS price, p_size AS size
                FROM part
                WHERE p_partkey IS NOT NULL AND p_size IS NOT NULL
                  AND isfinite(p_retailprice))
            SELECT a.p_partkey, a.price, a.size::BIGINT AS size
            FROM p a WHERE NOT EXISTS (
                SELECT 1 FROM p b
                WHERE b.price <= a.price AND b.size <= a.size
                  AND (b.price < a.price OR b.size < a.size))
            ORDER BY 1
        """,
        "q186_time_to_convert": """
            WITH u AS (
                SELECT user_id,
                       min(ts) FILTER (event_type = 'signup') AS s,
                       min(ts) FILTER (event_type = 'purchase') AS p
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                GROUP BY 1),
            d AS (SELECT (epoch_us(p) - epoch_us(s)) / 1e6 AS dt
                  FROM u WHERE s IS NOT NULL AND p IS NOT NULL
                    AND p >= s)
            SELECT count(*)::BIGINT AS n_converted,
                   round(quantile_cont(dt, 0.5), 4) AS median_sec,
                   round(quantile_cont(dt, 0.9), 4) AS p90_sec
            FROM d
        """,
        "q187_gram_novelty": r"""
            WITH d AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '\w+')
                                  AS ws
                       FROM documents WHERE doc_id IS NOT NULL),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(ws[x+1 : x+3], ' ') AS gram
                  FROM d, unnest(range(greatest(len(ws) - 2, 0)))
                       AS r(x)),
            f AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
            agg AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams,
                           count(*) FILTER (f.df = 1)::BIGINT
                               AS n_novel
                    FROM g JOIN f USING (gram) GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(agg.n_grams, 0)::BIGINT AS n_grams,
                   coalesce(agg.n_novel, 0)::BIGINT AS n_novel,
                   round(CASE WHEN agg.n_grams > 0
                              THEN agg.n_novel / agg.n_grams::DOUBLE
                         END, 6) AS novelty
            FROM d LEFT JOIN agg USING (doc_id) ORDER BY 1
        """,
        "q188_quartile_bands": """
            WITH f AS (
                SELECT event_type, value FROM events
                WHERE event_type IS NOT NULL AND value IS NOT NULL
                  AND NOT isnan(value)),
            q AS (SELECT event_type,
                         quantile_cont(value, 0.25) AS q1,
                         quantile_cont(value, 0.50) AS q2,
                         quantile_cont(value, 0.75) AS q3
                  FROM f GROUP BY 1),
            b AS (SELECT f.event_type,
                         CASE WHEN f.value <= q.q1 THEN 1
                              WHEN f.value <= q.q2 THEN 2
                              WHEN f.value <= q.q3 THEN 3
                              ELSE 4 END AS band
                  FROM f JOIN q USING (event_type))
            SELECT event_type, band::BIGINT AS band,
                   count(*)::BIGINT AS n
            FROM b GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q189_type_pair_lift": """
            WITH e AS (
                SELECT DISTINCT user_id, event_type FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
            nn AS (SELECT count(DISTINCT user_id)::DOUBLE AS nu FROM e),
            s AS (SELECT event_type, count(*)::DOUBLE AS na
                  FROM e GROUP BY 1),
            p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         count(*)::DOUBLE AS nab
                  FROM e a JOIN e b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
                  GROUP BY 1, 2)
            SELECT type_a, type_b,
                   round(ln((nab * nn.nu) / (sa.na * sb.na)), 6) AS pmi,
                   nab::BIGINT AS n_both
            FROM p JOIN s sa ON sa.event_type = p.type_a
                 JOIN s sb ON sb.event_type = p.type_b, nn
            ORDER BY 1, 2
        """,
        "q190_asof_tolerance": """
            SELECT b.event_id, b.user_id,
                   (epoch_us(b.ts) - epoch_us(c.ts)) / 1e6
                       AS click_gap_sec
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL
                    AND event_id IS NOT NULL
                    AND event_type = 'purchase') b
            ASOF JOIN (SELECT user_id, ts FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_id IS NOT NULL
                         AND event_type = 'click') c
              ON b.user_id = c.user_id AND c.ts <= b.ts
            WHERE b.ts - c.ts <= INTERVAL 60 MINUTE
            ORDER BY b.event_id
        """,
        "q191_weekday_seasonality": """
            WITH d AS (
                SELECT dayofweek(ts)::BIGINT AS dow, value FROM events
                WHERE ts IS NOT NULL AND isfinite(value)),
            t AS (SELECT avg(value) AS g FROM d)
            SELECT dow, count(*)::BIGINT AS n,
                   round(avg(value), 6) AS avg_value,
                   round(avg(value) / t.g, 6) AS seasonal_idx
            FROM d, t GROUP BY dow, t.g ORDER BY dow
        """,
        "q192_reverse_top1": """
            WITH e2 AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings WHERE embedding IS NOT NULL),
            s AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                         round(list_cosine_similarity(a.emb, b.emb), 6)
                             AS sim
                  FROM e2 a JOIN e2 b ON a.vec_id <> b.vec_id),
            t AS (SELECT qid, nid FROM (
                      SELECT qid, nid,
                             row_number() OVER (PARTITION BY qid
                                 ORDER BY sim DESC, nid) AS rk
                      FROM s)
                  WHERE rk = 1)
            SELECT nid AS vec_id, count(*)::BIGINT AS rnn_count
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "q193_geometric_median": """
            WITH ex AS (
                SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings WHERE embedding IS NOT NULL),
            m AS (SELECT pos, avg(v) AS mu FROM ex GROUP BY 1),
            d AS (SELECT vec_id,
                         sqrt(sum((v - mu) * (v - mu))) AS dist
                  FROM ex JOIN m USING (pos) GROUP BY 1),
            w AS (SELECT vec_id, 1.0 / dist AS wt FROM d
                  WHERE dist > 0)
            SELECT pos, round(sum(ex.v * w.wt) / (SELECT sum(wt) FROM w),
                              6) AS gm
            FROM ex JOIN w USING (vec_id)
            GROUP BY pos ORDER BY pos
        """,
        "q194_spearman_orders": """
            WITH s AS (
                SELECT o_totalprice AS x, o_orderdate AS d FROM orders
                WHERE isfinite(o_totalprice) AND o_orderdate IS NOT NULL),
            r AS (
                SELECT rank() OVER (ORDER BY x)
                           + (count(*) OVER (PARTITION BY x) - 1) / 2.0
                           AS rx,
                       rank() OVER (ORDER BY d)
                           + (count(*) OVER (PARTITION BY d) - 1) / 2.0
                           AS ry
                FROM s)
            SELECT count(*)::BIGINT AS n, round(corr(rx, ry), 6) AS rho
            FROM r
        """,
        "q195_mannwhitney_value": """
            WITH s AS (
                SELECT value AS v,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                           AS g1
                FROM events
                WHERE event_type IN ('click', 'purchase')
                  AND isfinite(value)),
            r AS (
                SELECT g1,
                       rank() OVER (ORDER BY v)
                           + (count(*) OVER (PARTITION BY v) - 1) / 2.0
                           AS mr
                FROM s),
            agg AS (
                SELECT coalesce(sum(mr) FILTER (WHERE g1 = 1), 0)
                           AS r1,
                       count(*) FILTER (WHERE g1 = 1) AS n1,
                       count(*) FILTER (WHERE g1 = 0) AS n2,
                       count(*) AS n
                FROM r),
            ties AS (
                SELECT coalesce(sum(c * c * c - c), 0) AS tsum
                FROM (SELECT count(*)::DOUBLE AS c FROM s GROUP BY v) t)
            SELECT n1, n2,
                   round(CASE WHEN n > 0
                              THEN r1 - n1 * (n1 + 1) / 2.0 END, 6)
                       AS u1,
                   round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                         / sqrt(nullif(n1::DOUBLE * n2 / 12.0
                                       * ((n + 1) - tsum
                                          / (n::DOUBLE * (n - 1))),
                                       0)), 6) AS z
            FROM agg, ties
        """,
        "q196_ks_distance": """
            WITH s AS (
                SELECT value AS v,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                           AS g1
                FROM events
                WHERE event_type IN ('click', 'purchase')
                  AND isfinite(value)),
            c AS (
                SELECT v, count(*) FILTER (WHERE g1 = 1) AS c1,
                       count(*) FILTER (WHERE g1 = 0) AS c2
                FROM s GROUP BY v),
            tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c),
            k AS (
                SELECT sum(c.c1) OVER (ORDER BY c.v) / tot.n1 AS f1,
                       sum(c.c2) OVER (ORDER BY c.v) / tot.n2 AS f2
                FROM c, tot)
            SELECT coalesce((SELECT n1 FROM tot), 0)::BIGINT AS n1,
                   coalesce((SELECT n2 FROM tot), 0)::BIGINT AS n2,
                   (SELECT round(max(abs(f1 - f2)), 6) FROM k) AS d
        """,
        "q197_topband_ties": """
            -- FETCH FIRST 10 ROWS WITH TIES (DuckDB lacks the literal
            -- syntax; rank() <= k is the SQL-92 equivalent)
            WITH s AS (
                SELECT o_orderkey, o_totalprice,
                       CAST(floor(o_totalprice / 100) AS BIGINT) AS band
                FROM orders WHERE isfinite(o_totalprice)),
            r AS (SELECT *, rank() OVER (ORDER BY band DESC) AS rnk
                  FROM s)
            SELECT o_orderkey, o_totalprice, band
            FROM r WHERE rnk <= 10 ORDER BY band DESC, o_orderkey
        """,
        "q198_nation_balance_topshare": """
            -- ratio_to_report: share uses the WHOLE nation's balance
            -- (window sum), not just the top-k rows; exact-cents ints
            -- keep the 6dp rounding off the float-sum knife edge
            WITH j AS (
                SELECT n_name, c_custkey,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS balc
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                WHERE isfinite(c_acctbal)),
            w AS (
                SELECT n_name, c_custkey, balc,
                       sum(balc) OVER (PARTITION BY n_name) AS totc,
                       row_number() OVER (PARTITION BY n_name
                                          ORDER BY balc DESC, c_custkey)
                           AS rnk
                FROM j)
            SELECT n_name, rnk::BIGINT AS rnk, c_custkey,
                   balc / 100.0 AS c_acctbal,
                   round(balc / CAST(nullif(totc, 0) AS DOUBLE), 6)
                       AS share
            FROM w WHERE rnk <= 3 ORDER BY n_name NULLS LAST, rnk
        """,
        "q199_daily_autocorr": """
            WITH d AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            lags AS (SELECT unnest(generate_series(1, 7)) AS lag)
            SELECT lag::BIGINT AS lag, count(*)::BIGINT AS n,
                   round(corr(a.revc, b.revc), 6) AS ac
            FROM lags, d a JOIN d b
                 ON b.day = a.day + lag * INTERVAL 1 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "q200_supplier_kcore": _kcore_sql(),
        "q209_custkeys_intersect_all": """
            SELECT o_custkey AS custkey FROM orders
            INTERSECT ALL
            SELECT c_custkey FROM customer
            ORDER BY 1 NULLS LAST
        """,
        "q210_supplier_sssp": _sssp_sql(),
        "q220_er_clusters": _er_sql(),
        "q230_dbscan": _dbscan_sql(),
        "q223_dup_rate_by_source": """
            -- IS NOT DISTINCT join: md5(NULL) = NULL must meet its
            -- own group (the engine's sentinel hash does)
            WITH s AS (SELECT source, md5(text) AS h FROM documents),
            c AS (SELECT h, count(*) AS tot FROM s GROUP BY h)
            SELECT source, count(*)::BIGINT AS n_docs,
                   count(*) FILTER (WHERE tot > 1)::BIGINT AS n_dup,
                   round(count(*) FILTER (WHERE tot > 1)::DOUBLE
                         / count(*), 6) AS dup_rate
            FROM s JOIN c ON s.h IS NOT DISTINCT FROM c.h
            GROUP BY source ORDER BY source NULLS LAST
        """,
        "q222_time_in_state": """
            WITH s AS (SELECT user_id, event_id, event_type, ts
                       FROM events WHERE ts IS NOT NULL),
            d AS (SELECT event_type,
                         epoch_us(lead(ts) OVER (
                             PARTITION BY user_id
                             ORDER BY ts, event_id, event_type))
                             - epoch_us(ts) AS d
                  FROM s)
            SELECT event_type, count(d)::BIGINT AS n,
                   round(sum(d) / 1000000.0, 6) AS total_s,
                   round(sum(d) / 1000000.0 / count(d), 6) AS avg_s
            FROM d WHERE d IS NOT NULL
            GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q225_range_window_avg": """
            WITH s AS (
                SELECT o_orderkey AS k, o_custkey AS c,
                       o_orderdate AS d,
                       CAST(round(o_totalprice * 100) AS BIGINT)
                           AS cents
                FROM orders
                WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
                  AND o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice))
            SELECT k AS o_orderkey,
                   count(*) OVER w AS n_w,
                   round(sum(cents) OVER w / 100.0
                         / count(*) OVER w, 6) AS w_avg
            FROM s
            WINDOW w AS (PARTITION BY c ORDER BY d
                         RANGE BETWEEN INTERVAL 30 DAY PRECEDING
                               AND CURRENT ROW)
            ORDER BY o_orderkey
        """,
        "q226_daily_interp": """
            WITH d AS (
                SELECT CAST(floor(epoch_us(o_orderdate)
                                  / 86400000000.0) AS BIGINT) AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            spine AS (
                SELECT unnest(generate_series(
                    (SELECT min(day) FROM d),
                    (SELECT max(day) FROM d))) AS day),
            j AS (SELECT s.day, d.revc
                  FROM spine s LEFT JOIN d USING (day)),
            f AS (SELECT day, revc,
                         last_value(revc IGNORE NULLS) OVER (
                             ORDER BY day ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS pv,
                         last_value(CASE WHEN revc IS NOT NULL
                                         THEN day END IGNORE NULLS)
                             OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW) AS pd,
                         first_value(revc IGNORE NULLS) OVER (
                             ORDER BY day ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS nv,
                         first_value(CASE WHEN revc IS NOT NULL
                                          THEN day END IGNORE NULLS)
                             OVER (ORDER BY day ROWS BETWEEN CURRENT
                                   ROW AND UNBOUNDED FOLLOWING) AS nd
                  FROM j)
            SELECT day,
                   round(CASE WHEN revc IS NOT NULL THEN revc / 100.0
                              ELSE (pv + (nv - pv) * (day - pd)
                                    / CAST(nd - pd AS DOUBLE))
                                   / 100.0 END, 6) AS rev,
                   (revc IS NULL) AS interpolated
            FROM f ORDER BY day
        """,
        "q235_interval_overlap_join": """
            -- interval×interval overlap, arithmetic kept on the
            -- ORDER side (o_orderdate ± interval) so event extremes
            -- never overflow; count(e.event_id) skips NULL event_ids
            SELECT o.o_orderkey,
                   count(e.event_id)::BIGINT AS n_overlap
            FROM orders o LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND e.ts < o.o_orderdate + INTERVAL 7 DAY
             AND e.ts > o.o_orderdate - INTERVAL 1 HOUR
            GROUP BY o.o_orderkey ORDER BY o.o_orderkey NULLS LAST
        """,
        "q237_silhouette": """
            -- exact cosine silhouette via label-sum closed form;
            -- rid keys duplicate vec_ids apart (dots must stay
            -- per-ROW); zero vectors out on both sides
            WITH e AS MATERIALIZED (
                SELECT row_number() OVER (ORDER BY vec_id) AS rid,
                       label,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
                WHERE vec_id IS NOT NULL AND label IS NOT NULL
                  AND embedding IS NOT NULL),
            nrm AS (SELECT rid, label, v,
                           sqrt(list_sum(list_transform(v,
                                x -> x * x))) AS nv
                    FROM e),
            u AS (SELECT rid, label,
                         list_transform(v, x -> x / nv) AS uv
                  FROM nrm WHERE nv > 0),
            flat AS (SELECT rid, label, unnest(uv) AS x,
                            unnest(range(1, len(uv) + 1)) AS i
                     FROM u),
            s AS (SELECT label, i, sum(x) AS sx
                  FROM flat GROUP BY 1, 2),
            cn AS (SELECT label, count(*) AS n FROM u GROUP BY 1),
            dots AS (SELECT f.rid, f.label AS own, s.label AS other,
                            sum(f.x * s.sx) AS dot
                     FROM flat f JOIN s ON s.i = f.i
                     GROUP BY 1, 2, 3),
            a AS (SELECT d.rid, d.own,
                         1.0 - (dot - 1.0) / (n - 1) AS aval
                  FROM dots d JOIN cn ON cn.label = d.own
                  WHERE d.other = d.own AND n > 1),
            b AS (SELECT d.rid, d.own, min(1.0 - dot / n) AS bval
                  FROM dots d JOIN cn ON cn.label = d.other
                  WHERE d.other <> d.own GROUP BY 1, 2),
            si AS (SELECT a.own AS label,
                          (bval - aval) / greatest(aval, bval) AS sv
                   FROM a JOIN b ON a.rid = b.rid AND a.own = b.own)
            SELECT label, count(*)::BIGINT AS n,
                   round(avg(sv), 6) AS mean_silhouette
            FROM si GROUP BY 1 ORDER BY 1
        """,
        "q249_pmi_collocations": """
            WITH w AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(text), '\\w+'))
                           AS word
                FROM documents WHERE doc_id IS NOT NULL),
            pairs AS (
                SELECT a.word AS wa, b.word AS wb, count(*) AS sup
                FROM w a JOIN w b
                     ON a.doc_id = b.doc_id AND a.word < b.word
                GROUP BY 1, 2 HAVING count(*) >= 5),
            item AS (SELECT word, count(*) AS s FROM w GROUP BY 1),
            tot AS (SELECT count(DISTINCT doc_id) AS n FROM w)
            SELECT wa, wb, sup::BIGINT AS sup,
                   round(ln(sup * n
                            / (ia.s * CAST(ib.s AS DOUBLE))), 6)
                       AS pmi
            FROM pairs JOIN item ia ON ia.word = wa
                       JOIN item ib ON ib.word = wb, tot
            ORDER BY ln(sup * n / (ia.s * CAST(ib.s AS DOUBLE)))
                     DESC, wa, wb
            LIMIT 20
        """,
        "q357_constancy_screen": """
            WITH u AS (
                SELECT 'documents' AS tbl, 'lang' AS col,
                       coalesce('V' || lang, chr(1) || 'NULLVAL')
                           AS k
                FROM documents
                UNION ALL
                SELECT 'documents', 'source',
                       coalesce('V' || source, chr(1) || 'NULLVAL')
                FROM documents
                UNION ALL
                SELECT 'events', 'event_type',
                       coalesce('V' || event_type,
                                chr(1) || 'NULLVAL')
                FROM events
                UNION ALL
                SELECT 'lineitem', 'l_returnflag',
                       coalesce('V' || l_returnflag,
                                chr(1) || 'NULLVAL')
                FROM lineitem
                UNION ALL
                SELECT 'lineitem', 'l_linestatus',
                       coalesce('V' || l_linestatus,
                                chr(1) || 'NULLVAL')
                FROM lineitem
                UNION ALL
                SELECT 'orders', 'o_orderpriority',
                       coalesce('V' || o_orderpriority,
                                chr(1) || 'NULLVAL')
                FROM orders),
            g AS (SELECT tbl, col, k, count(*)::BIGINT AS c
                  FROM u GROUP BY tbl, col, k),
            t AS (SELECT tbl, col, sum(c)::BIGINT AS n_rows,
                         count(*)::BIGINT AS n_distinct
                  FROM g GROUP BY tbl, col),
            m AS (SELECT tbl, col, k, c,
                         row_number() OVER (
                             PARTITION BY tbl, col
                             ORDER BY c DESC, k) AS rn
                  FROM g)
            SELECT t.tbl, t.col, t.n_rows, t.n_distinct,
                   CASE WHEN m.k LIKE 'V%'
                        THEN substr(m.k, 2) END AS mode_value,
                   m.c AS mode_count,
                   round(m.c::DOUBLE / t.n_rows, 6) AS mode_share
            FROM t JOIN m ON t.tbl = m.tbl AND t.col = m.col
            WHERE m.rn = 1 ORDER BY t.tbl, t.col
        """,
        "q360_benford_screen": """
            WITH v AS (
                SELECT round(o_totalprice * 100)::BIGINT AS cents
                FROM orders
                WHERE o_totalprice IS NOT NULL
                      AND isfinite(o_totalprice)
                      AND o_totalprice > 0
                      AND round(o_totalprice * 100) >= 1),
            c AS (SELECT substr(cents::VARCHAR, 1, 1)::BIGINT AS digit,
                         count(*)::BIGINT AS n_obs
                  FROM v GROUP BY 1),
            t AS (SELECT coalesce(sum(n_obs), 0)::BIGINT AS n FROM c),
            d0(digit, p0) AS (VALUES
                (1, '0.3010299956639812'),
                (2, '0.17609125905568124'),
                (3, '0.12493873660829992'),
                (4, '0.09691001300805642'),
                (5, '0.07918124604762482'),
                (6, '0.06694678963061323'),
                (7, '0.05799194697768673'),
                (8, '0.05115252244738129'),
                (9, '0.04575749056067514')),
            d AS (SELECT digit, CAST(p0 AS DOUBLE) AS p FROM d0)
            SELECT d.digit::BIGINT AS digit,
                   coalesce(c.n_obs, 0)::BIGINT AS n_obs,
                   CASE WHEN t.n = 0 THEN NULL
                        ELSE round(coalesce(c.n_obs, 0)
                                   / CAST(t.n AS DOUBLE), 6)
                   END AS share,
                   round(d.p, 6) AS benford_p,
                   CASE WHEN t.n = 0 THEN NULL
                        ELSE round(
                            (coalesce(c.n_obs, 0) - t.n * d.p)
                            * (coalesce(c.n_obs, 0) - t.n * d.p)
                            / (t.n * d.p), 6)
                   END AS chi2_term
            FROM d LEFT JOIN c ON c.digit = d.digit CROSS JOIN t
            ORDER BY d.digit
        """,
        "q361_k_anonymity": """
            WITH g AS (
                SELECT c_nationkey, c_mktsegment,
                       count(*)::BIGINT AS sz
                FROM customer GROUP BY c_nationkey, c_mktsegment),
            t AS (SELECT coalesce(sum(sz), 0)::BIGINT AS n_rows,
                         count(*)::BIGINT AS n_groups,
                         CAST(min(sz) AS DOUBLE) AS min_sz
                  FROM g),
            ks(k) AS (VALUES (2), (5), (10))
            SELECT ks.k::BIGINT AS k,
                   coalesce(sum(CASE WHEN g.sz < ks.k
                                     THEN 1 END), 0)::BIGINT
                       AS groups_below,
                   coalesce(sum(CASE WHEN g.sz < ks.k
                                     THEN g.sz END), 0)::BIGINT
                       AS rows_below,
                   CASE WHEN t.n_rows = 0 THEN NULL
                        ELSE round(
                            coalesce(sum(CASE WHEN g.sz < ks.k
                                              THEN g.sz END), 0)
                            / CAST(t.n_rows AS DOUBLE), 6)
                   END AS pct_rows_below,
                   t.n_rows, t.n_groups, t.min_sz AS min_group_size
            FROM ks CROSS JOIN t LEFT JOIN g ON TRUE
            GROUP BY ks.k, t.n_rows, t.n_groups, t.min_sz
            ORDER BY k
        """,
        "q362_scd2_history": """
            WITH e AS (
                SELECT user_id, event_type, ts,
                       coalesce(event_id, 9223372036854775807) AS eid
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_type IS NOT NULL),
            o AS (
                SELECT user_id, event_type, ts, eid,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, eid, event_type) AS prev_ty
                FROM e),
            s AS (
                SELECT user_id, event_type, ts, eid
                FROM o
                WHERE prev_ty IS NULL OR prev_ty <> event_type),
            f AS (
                SELECT user_id, event_type AS attr,
                       epoch_us(ts)::BIGINT AS valid_from_us,
                       epoch_us(lead(ts) OVER w)::BIGINT
                           AS valid_to_us,
                       row_number() OVER w AS version
                FROM s WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, eid, event_type))
            SELECT user_id, attr, valid_from_us, valid_to_us,
                   version::BIGINT AS version
            FROM f ORDER BY user_id, version
        """,
        "q363_gap_fill_locf": """
            WITH e AS (
                SELECT event_type AS ty,
                       epoch_us(date_trunc('hour', ts))
                           // 3600000000 AS h,
                       value AS v
                FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL
                      AND isfinite(value)),
            g AS (SELECT ty, h, max(v) AS v FROM e GROUP BY ty, h),
            b AS (SELECT ty, min(h) AS h0, max(h) AS h1
                  FROM g GROUP BY ty),
            grid AS (SELECT ty, unnest(generate_series(h0, h1)) AS h
                     FROM b),
            j AS (SELECT grid.ty, grid.h, g.v
                  FROM grid LEFT JOIN g
                       ON g.ty = grid.ty AND g.h = grid.h),
            f AS (SELECT ty, h,
                         last_value(v IGNORE NULLS) OVER (
                             PARTITION BY ty ORDER BY h
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS vmax,
                         (v IS NULL)::BIGINT AS is_gap
                  FROM j)
            SELECT ty AS event_type, h::BIGINT AS h, vmax, is_gap
            FROM f ORDER BY event_type, h
        """,
        "q364_calibration_brier": """
            WITH u AS (
                SELECT user_id,
                       max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS y
                FROM events WHERE user_id IS NOT NULL
                GROUP BY user_id),
            s AS (
                SELECT y,
                       (('0x' || substr(md5('cal|'
                            || user_id::VARCHAR), 1, 13))::BIGINT)
                           % 1000 AS m
                FROM u),
            b AS (
                SELECT m // 100 AS bin,
                       count(*)::BIGINT AS n,
                       sum(m)::BIGINT AS sm,
                       sum(y)::BIGINT AS pos,
                       sum((2 * m + 1) * (2 * m + 1))::BIGINT AS a,
                       (2 * sum(CASE WHEN y = 1 THEN m ELSE 0 END)
                        + sum(y))::BIGINT AS bb
                FROM s GROUP BY 1),
            bins(bin) AS (VALUES (0), (1), (2), (3), (4), (5), (6),
                                 (7), (8), (9))
            SELECT bins.bin::BIGINT AS bin,
                   coalesce(b.n, 0)::BIGINT AS n,
                   CASE WHEN b.n IS NULL THEN NULL
                        ELSE round(CAST(2 * b.sm + b.n AS DOUBLE)
                                   / (2000.0 * b.n), 6)
                   END AS mean_p,
                   CASE WHEN b.n IS NULL THEN NULL
                        ELSE round(b.pos / CAST(b.n AS DOUBLE), 6)
                   END AS frac_pos,
                   CASE WHEN b.n IS NULL THEN NULL
                        ELSE round((b.a / 4000000.0 - b.bb / 1000.0
                                    + b.pos) / b.n, 6)
                   END AS brier
            FROM bins LEFT JOIN b ON b.bin = bins.bin
            ORDER BY bin
        """,
        "q365_contamination_13gram": """
            WITH d AS (
                SELECT doc_id, source, text,
                       (doc_id % 100 = 0) AS bench
                FROM documents WHERE doc_id IS NOT NULL),
            tok AS (
                SELECT doc_id, source, bench,
                       list_filter(regexp_split_to_array(
                           coalesce(text, ''), '[ \t\n\r\f\v]+'),
                           x -> x <> '') AS ts
                FROM d),
            g AS (
                SELECT DISTINCT doc_id, source, bench,
                       array_to_string(list_slice(ts, i, i + 12),
                                       ' ') AS gram
                FROM (SELECT doc_id, source, bench, ts,
                             unnest(range(1, len(ts) - 11)) AS i
                      FROM tok WHERE len(ts) >= 13)),
            bg AS (SELECT DISTINCT gram FROM g WHERE bench),
            cont AS (SELECT DISTINCT g.doc_id, g.source
                     FROM g
                     WHERE NOT bench
                           AND gram IN (SELECT gram FROM bg)),
            tot AS (SELECT source, count(*)::BIGINT AS n_docs
                    FROM d WHERE NOT bench GROUP BY source),
            c AS (SELECT source, count(*)::BIGINT AS n_cont
                  FROM cont GROUP BY source)
            SELECT t.source, t.n_docs,
                   coalesce(c.n_cont, 0)::BIGINT AS n_contaminated,
                   round(coalesce(c.n_cont, 0)
                         / CAST(t.n_docs AS DOUBLE), 6) AS rate
            FROM tot t
            LEFT JOIN c ON c.source IS NOT DISTINCT FROM t.source
            ORDER BY t.source
        """,
        "q366_repetition_ratio": """
            WITH d AS (
                SELECT doc_id, source, text
                FROM documents WHERE doc_id IS NOT NULL),
            tok AS (
                SELECT doc_id, source,
                       list_filter(regexp_split_to_array(
                           coalesce(text, ''), '[ \t\n\r\f\v]+'),
                           x -> x <> '') AS ts
                FROM d),
            g AS (
                SELECT doc_id, source,
                       array_to_string(list_slice(ts, i, i + 2),
                                       ' ') AS gram
                FROM (SELECT doc_id, source, ts,
                             unnest(range(1, len(ts) - 1)) AS i
                      FROM tok WHERE len(ts) >= 3)),
            perdoc AS (
                SELECT doc_id, source,
                       count(*)::BIGINT AS tot,
                       count(DISTINCT gram)::BIGINT AS dst
                FROM g GROUP BY doc_id, source),
            s AS (
                SELECT source,
                       count(*)::BIGINT AS n_docs,
                       sum(tot)::BIGINT AS total_3grams,
                       sum(tot - dst)::BIGINT AS dup_3grams,
                       sum((5 * (tot - dst) > tot)::INT)::BIGINT
                           AS n_high_rep
                FROM perdoc GROUP BY source)
            SELECT source, n_docs, total_3grams, dup_3grams,
                   round(dup_3grams
                         / CAST(total_3grams AS DOUBLE), 6)
                       AS dup_rate,
                   n_high_rep
            FROM s ORDER BY source
        """,
        "q367_gini_revenue": """
            WITH o AS (
                SELECT o_custkey,
                       round(o_totalprice * 100)::BIGINT AS cents
                FROM orders
                WHERE o_totalprice IS NOT NULL
                      AND isfinite(o_totalprice)
                      AND o_custkey IS NOT NULL),
            j AS (
                SELECT c.c_nationkey AS nk, o.cents
                FROM o JOIN customer c ON c.c_custkey = o.o_custkey),
            r AS (
                SELECT nk, cents,
                       row_number() OVER (PARTITION BY nk
                                          ORDER BY cents) AS i
                FROM j),
            g AS (
                SELECT nk, count(*)::BIGINT AS n,
                       sum(cents) AS sx,
                       sum(i::HUGEINT * cents) AS six
                FROM r GROUP BY nk)
            SELECT CAST(nk AS DOUBLE) AS nationkey, n,
                   CASE WHEN sx = 0 THEN NULL
                        ELSE round(
                            CAST(2 * six - (n + 1)::HUGEINT * sx
                                 AS DOUBLE)
                            / (CAST(n AS DOUBLE)
                               * CAST(sx AS DOUBLE)), 6)
                   END AS gini
            FROM g ORDER BY nationkey
        """,
        "q368_bloom_semijoin": """
            WITH p AS (
                SELECT DISTINCT p_partkey
                FROM part
                WHERE p_partkey IS NOT NULL AND p_size >= 45),
            l AS (
                SELECT l_returnflag AS f,
                       round(l_extendedprice * 100)::BIGINT AS cents
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL
                      AND isfinite(l_extendedprice)
                      AND l_partkey IN (SELECT p_partkey FROM p))
            SELECT f AS returnflag, count(*)::BIGINT AS n_items,
                   sum(cents)::BIGINT AS revenue_cents
            FROM l GROUP BY f ORDER BY f
        """,
        "q369_cuped_adjustment": """
            WITH o AS (
                SELECT o_custkey AS ck,
                       sum(CASE WHEN o_orderdate
                                     < TIMESTAMP '2024-01-15'
                                THEN round(o_totalprice
                                           * 100)::BIGINT
                                ELSE 0 END)::BIGINT AS x,
                       sum(CASE WHEN o_orderdate
                                     >= TIMESTAMP '2024-01-15'
                                THEN round(o_totalprice
                                           * 100)::BIGINT
                                ELSE 0 END)::BIGINT AS y
                FROM orders
                WHERE o_custkey IS NOT NULL
                      AND o_totalprice IS NOT NULL
                      AND isfinite(o_totalprice)
                      AND o_orderdate IS NOT NULL
                GROUP BY o_custkey),
            j AS (
                SELECT c.c_mktsegment AS seg, o.x, o.y
                FROM o JOIN customer c ON c.c_custkey = o.ck),
            g AS (
                SELECT seg, count(*)::BIGINT AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x::HUGEINT * x) AS sxx,
                       sum(y::HUGEINT * y) AS syy,
                       sum(x::HUGEINT * y) AS sxy
                FROM j GROUP BY seg),
            m AS (
                SELECT seg, n,
                       n::HUGEINT * sxy - sx::HUGEINT * sy AS cov,
                       n::HUGEINT * sxx - sx::HUGEINT * sx AS vx,
                       n::HUGEINT * syy - sy::HUGEINT * sy AS vy
                FROM g)
            SELECT seg AS segment, n,
                   CASE WHEN vx = 0 THEN NULL
                        ELSE round(CAST(cov AS DOUBLE)
                                   / CAST(vx AS DOUBLE), 6)
                   END AS theta,
                   CASE WHEN vx = 0 OR vy = 0 THEN NULL
                        ELSE round(
                            (CAST(cov AS DOUBLE)
                             * CAST(cov AS DOUBLE))
                            / (CAST(vx AS DOUBLE)
                               * CAST(vy AS DOUBLE)), 6)
                   END AS var_reduction
            FROM m ORDER BY segment
        """,
        "q370_rank_fusion": """
            WITH j AS (
                SELECT p.p_brand AS brand,
                       round(l.l_extendedprice * 100)::BIGINT
                           AS cents
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                WHERE l.l_extendedprice IS NOT NULL
                      AND isfinite(l.l_extendedprice)),
            g AS (
                SELECT brand, count(*)::BIGINT AS n,
                       sum(cents)::BIGINT AS rc
                FROM j GROUP BY brand),
            r AS (
                SELECT brand, n, rc,
                       rank() OVER (ORDER BY rc DESC) AS r_rev,
                       rank() OVER (ORDER BY n DESC) AS r_cnt
                FROM g)
            SELECT brand, n AS n_items, rc AS revenue_cents,
                   r_rev::BIGINT AS r_rev, r_cnt::BIGINT AS r_cnt,
                   round(1.0 / (60 + r_rev) + 1.0 / (60 + r_cnt), 6)
                       AS rrf
            FROM r ORDER BY rrf DESC, brand
        """,
        "q371_label_centroid_drift": """
            WITH e AS (
                SELECT label, embedding FROM embeddings
                WHERE embedding IS NOT NULL),
            u AS (
                SELECT label, unnest(embedding)::DOUBLE AS x,
                       unnest(range(1, len(embedding) + 1)) AS i
                FROM e),
            lc AS (
                SELECT label, i, sum(x) AS s, count(*)::BIGINT AS c
                FROM u GROUP BY label, i),
            g AS (
                SELECT i, sum(s) AS gs, sum(c)::BIGINT AS gc
                FROM lc GROUP BY i),
            d AS (
                SELECT lc.label,
                       lc.s / lc.c AS cl, g.gs / g.gc AS cg
                FROM lc JOIN g ON g.i = lc.i),
            m AS (
                SELECT label,
                       sum(cl * cg) AS dot, sum(cl * cl) AS nl,
                       sum(cg * cg) AS ng,
                       sum((cl - cg) * (cl - cg)) AS l2s
                FROM d GROUP BY label),
            cnt AS (SELECT label, count(*)::BIGINT AS n
                    FROM e GROUP BY label)
            SELECT CAST(m.label AS DOUBLE) AS label, cnt.n,
                   CASE WHEN nl > 0 AND ng > 0
                        THEN round(dot / sqrt(nl * ng), 6)
                        ELSE NULL END AS cos_to_global,
                   round(sqrt(l2s), 6) AS l2_to_global
            FROM m JOIN cnt
                 ON cnt.label IS NOT DISTINCT FROM m.label
            ORDER BY label
        """,
        "q372_independence_residuals": """
            WITH e AS (
                SELECT event_type AS ty,
                       ((epoch_us(date_trunc('day', ts))
                         // 86400000000) % 7 + 7) % 7 AS wd
                FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL),
            o AS (SELECT ty, wd, count(*)::BIGINT AS obs
                  FROM e GROUP BY ty, wd),
            r AS (SELECT ty, sum(obs)::BIGINT AS rt
                  FROM o GROUP BY ty),
            c AS (SELECT wd, sum(obs)::BIGINT AS ct
                  FROM o GROUP BY wd),
            n AS (SELECT sum(obs)::BIGINT AS nt FROM o),
            wds(wd) AS (VALUES (0), (1), (2), (3), (4), (5), (6)),
            grid AS (SELECT r.ty, wds.wd::BIGINT AS wd, r.rt
                     FROM r CROSS JOIN wds),
            f AS (SELECT grid.ty, grid.wd,
                         coalesce(o.obs, 0)::BIGINT AS obs,
                         CAST(grid.rt::HUGEINT * c.ct AS DOUBLE)
                             / n.nt AS e
                  FROM grid
                  LEFT JOIN o ON o.ty = grid.ty AND o.wd = grid.wd
                  JOIN c ON c.wd = grid.wd CROSS JOIN n)
            SELECT ty AS event_type, wd, obs,
                   round(e, 6) AS expected,
                   round((obs - e) / sqrt(e), 6) AS std_resid
            FROM f ORDER BY event_type, wd
        """,
        "q374_poisson_bootstrap": """
            WITH o AS (
                SELECT o_orderkey AS okey, o_custkey AS ck,
                       round(o_totalprice * 100)::BIGINT AS cents
                FROM orders
                WHERE o_orderkey IS NOT NULL
                      AND o_custkey IS NOT NULL
                      AND o_totalprice IS NOT NULL
                      AND isfinite(o_totalprice)),
            j AS (SELECT c.c_mktsegment AS seg, o.okey, o.cents
                  FROM o JOIN customer c ON c.c_custkey = o.ck),
            r AS (SELECT seg, okey, cents,
                         unnest(range(0, 32)) AS b
                  FROM j),
            w AS (SELECT seg, b, cents,
                         ('0x' || substr(md5('pb|' || b::VARCHAR
                             || '|' || okey::VARCHAR), 1, 13))
                             ::BIGINT AS u
                  FROM r),
            ww AS (SELECT seg, b, cents,
                          CASE WHEN u < 1656781714176974 THEN 0
                               WHEN u < 3313563428353948 THEN 1
                               WHEN u < 4141954285442435 THEN 2
                               WHEN u < 4418084571138597 THEN 3
                               WHEN u < 4487117142562638 THEN 4
                               ELSE 5 END AS w
                   FROM w),
            rep AS (SELECT seg, b,
                           sum(w::BIGINT * cents)::BIGINT AS sw,
                           sum(w)::BIGINT AS nw
                    FROM ww GROUP BY seg, b),
            rm AS (SELECT seg, b,
                          CASE WHEN nw > 0
                               THEN CAST(sw AS DOUBLE) / nw
                          END AS mean_b
                   FROM rep),
            ci AS (SELECT seg, quantile_disc(mean_b, 0.025) AS lo,
                          quantile_disc(mean_b, 0.975) AS hi
                   FROM rm GROUP BY seg),
            tot AS (SELECT seg, count(*)::BIGINT AS n,
                           sum(cents)::BIGINT AS sc
                    FROM j GROUP BY seg)
            SELECT t.seg AS segment, t.n,
                   round(CAST(t.sc AS DOUBLE) / t.n, 6)
                       AS mean_cents,
                   round(ci.lo, 6) AS ci_lo,
                   round(ci.hi, 6) AS ci_hi
            FROM tot t
            JOIN ci ON ci.seg IS NOT DISTINCT FROM t.seg
            ORDER BY t.seg
        """,
        "q375_mad_outliers": """
            WITH e AS (
                SELECT event_type AS ty, value AS x
                FROM events
                WHERE event_type IS NOT NULL AND isfinite(value)),
            m AS (SELECT ty, quantile_disc(x, 0.5) AS med
                  FROM e GROUP BY ty),
            a AS (SELECT e.ty, abs(e.x - m.med) AS ad
                  FROM e JOIN m ON m.ty = e.ty),
            d AS (SELECT ty, quantile_disc(ad, 0.5) AS mad
                  FROM a GROUP BY ty),
            f AS (SELECT a.ty, count(*)::BIGINT AS n,
                         sum((a.ad > 5.1891 * d.mad)::INT)::BIGINT
                             AS n_out
                  FROM a JOIN d ON d.ty = a.ty GROUP BY a.ty)
            SELECT f.ty AS event_type, f.n, m.med, d.mad,
                   f.n_out AS n_outliers,
                   round(f.n_out / CAST(f.n AS DOUBLE), 6)
                       AS outlier_rate
            FROM f JOIN m ON m.ty = f.ty JOIN d ON d.ty = f.ty
            ORDER BY event_type
        """,
        "q376_boolean_retrieval": f"""
            WITH toks AS (
                SELECT doc_id, source, {_TOKS} AS ts
                FROM documents WHERE doc_id IS NOT NULL),
            dt AS (SELECT DISTINCT doc_id, unnest(ts) AS w
                   FROM toks),
            dfq AS (SELECT w, count(*)::BIGINT AS df
                    FROM dt
                    WHERE length(w) > 2
                          AND w NOT IN ({_STOPLIST_SQL})
                    GROUP BY w),
            terms AS (SELECT w FROM dfq
                      ORDER BY df DESC, w ASC LIMIT 3),
            nt AS (SELECT count(*)::BIGINT AS c FROM terms),
            hits AS (SELECT dt.doc_id
                     FROM dt JOIN terms ON terms.w = dt.w
                     GROUP BY dt.doc_id
                     HAVING count(*) = (SELECT c FROM nt)
                            AND (SELECT c FROM nt) > 0),
            t AS (SELECT source, count(*)::BIGINT AS n_docs
                  FROM toks GROUP BY source),
            h AS (SELECT tk.source, count(*)::BIGINT AS n_hits
                  FROM hits JOIN toks tk ON tk.doc_id = hits.doc_id
                  GROUP BY tk.source),
            ts AS (SELECT string_agg(w, ' '
                              ORDER BY df DESC, w ASC) AS terms
                   FROM (SELECT w, df FROM dfq
                         ORDER BY df DESC, w ASC LIMIT 3))
            SELECT t.source, t.n_docs,
                   coalesce(h.n_hits, 0)::BIGINT AS n_hits,
                   round(coalesce(h.n_hits, 0)
                         / CAST(t.n_docs AS DOUBLE), 6) AS hit_rate,
                   (SELECT terms FROM ts) AS terms
            FROM t LEFT JOIN h
                 ON h.source IS NOT DISTINCT FROM t.source
            ORDER BY t.source
        """,
        "q377_bm25_topk": f"""
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS ts
                FROM documents WHERE doc_id IS NOT NULL),
            n AS (SELECT count(*)::BIGINT AS nd,
                         coalesce(sum(len(ts)), 0)::BIGINT AS tl
                  FROM toks),
            dt AS (SELECT DISTINCT doc_id, unnest(ts) AS w
                   FROM toks),
            dfq AS (SELECT w, count(*)::BIGINT AS df
                    FROM dt
                    WHERE length(w) > 2
                          AND w NOT IN ({_STOPLIST_SQL})
                    GROUP BY w),
            terms AS (SELECT w, df,
                             row_number() OVER (ORDER BY df DESC,
                                                w ASC) AS ti
                      FROM dfq ORDER BY df DESC, w ASC LIMIT 3),
            tf AS (SELECT s.doc_id, len(s.ts)::BIGINT AS dl, t.ti,
                          t.df,
                          len(list_filter(s.ts, x -> x = t.w))
                              ::BIGINT AS tf
                   FROM toks s CROSS JOIN terms t),
            comp AS (
                SELECT doc_id, dl, ti,
                       CASE WHEN tf > 0 THEN
                           ln(1 + (n.nd - df + 0.5) / (df + 0.5))
                           * (tf * 2.2)
                           / (tf + 1.2 * (0.25 + 0.75 * dl
                               / (CAST(n.tl AS DOUBLE) / n.nd)))
                       ELSE 0.0 END AS s
                FROM tf CROSS JOIN n),
            p AS (SELECT doc_id, min(dl)::BIGINT AS dl,
                         coalesce(max(CASE WHEN ti = 1
                                           THEN s END), 0) AS s1,
                         coalesce(max(CASE WHEN ti = 2
                                           THEN s END), 0) AS s2,
                         coalesce(max(CASE WHEN ti = 3
                                           THEN s END), 0) AS s3
                  FROM comp GROUP BY doc_id)
            SELECT doc_id, dl, round(s1 + s2 + s3, 6) AS bm25
            FROM p WHERE s1 + s2 + s3 > 0
            ORDER BY bm25 DESC, doc_id LIMIT 10
        """,
        "q378_load_fairness": """
            WITH e AS (
                SELECT event_type AS ty, user_id AS u
                FROM events
                WHERE event_type IS NOT NULL
                      AND user_id IS NOT NULL),
            g AS (SELECT ty, u, count(*)::BIGINT AS x
                  FROM e GROUP BY ty, u),
            s AS (SELECT ty, count(*)::BIGINT AS nu,
                         sum(x)::BIGINT AS sx,
                         sum(x::HUGEINT * x) AS sxx,
                         max(x)::BIGINT AS mx
                  FROM g GROUP BY ty)
            SELECT ty AS event_type, nu AS n_users,
                   sx AS n_events,
                   round(CAST(sx::HUGEINT * sx AS DOUBLE)
                         / (CAST(nu AS DOUBLE)
                            * CAST(sxx AS DOUBLE)), 6) AS jain,
                   round(CAST(mx::HUGEINT * nu AS DOUBLE) / sx, 6)
                       AS max_over_mean
            FROM s ORDER BY ty
        """,
        "q379_filter_verdicts": f"""
            WITH d AS (
                SELECT doc_id, source, coalesce(text, '') AS text
                FROM documents WHERE doc_id IS NOT NULL),
            m AS (
                SELECT doc_id, source,
                       len(regexp_extract_all(text, '\\w+'))
                           ::BIGINT AS n,
                       length(array_to_string(
                           regexp_extract_all(text, '\\w+'), ''))
                           ::BIGINT AS chars,
                       len(list_filter({_TOKS},
                           x -> list_contains([{_STOPLIST_SQL}], x)))
                           ::BIGINT AS nstop,
                       list_filter(regexp_split_to_array(text,
                           '[ \t\n\r\f\v]+'), x -> x <> '') AS wt,
                       len(regexp_extract_all(text,
                           '[^\\w\t\n\f\r ]'))::BIGINT AS nsym,
                       length(text)::BIGINT AS call
                FROM d),
            gr AS (
                SELECT doc_id,
                       array_to_string(list_slice(wt, i, i + 2),
                                       ' ') AS gram
                FROM (SELECT doc_id, wt,
                             unnest(range(1, len(wt) - 1)) AS i
                      FROM m WHERE len(wt) >= 3)),
            dd AS (SELECT doc_id, count(*)::BIGINT AS tot3,
                          count(DISTINCT gram)::BIGINT AS dst
                   FROM gr GROUP BY doc_id),
            g3 AS (
                SELECT m.source, m.n, m.chars, m.nstop, m.nsym,
                       m.call,
                       coalesce(dd.tot3, 0) AS tot3,
                       coalesce(dd.tot3 - dd.dst, 0) AS dup
                FROM m LEFT JOIN dd ON dd.doc_id = m.doc_id),
            v AS (
                SELECT source,
                       (n < 50 OR n > 100000) AS r1,
                       ((3 * n > chars) OR (chars > 10 * n)) AS r2,
                       (20 * nstop < n) AS r3,
                       (5 * dup > tot3) AS r4,
                       (10 * nsym > call) AS r5
                FROM g3)
            SELECT source,
                   count(*)::BIGINT AS n_docs,
                   sum((NOT (r1 OR r2 OR r3 OR r4 OR r5))::INT)
                       ::BIGINT AS n_kept,
                   sum(r1::INT)::BIGINT AS r1_size,
                   sum(r2::INT)::BIGINT AS r2_shape,
                   sum(r3::INT)::BIGINT AS r3_stopword,
                   sum(r4::INT)::BIGINT AS r4_repetition,
                   sum(r5::INT)::BIGINT AS r5_symbol,
                   round(sum((NOT (r1 OR r2 OR r3 OR r4 OR r5))
                             ::INT) / CAST(count(*) AS DOUBLE), 6)
                       AS keep_rate
            FROM v GROUP BY source ORDER BY source
        """,
        "q381_label_dispersion": """
            WITH e AS (
                SELECT label, embedding FROM embeddings
                WHERE embedding IS NOT NULL),
            v AS (
                SELECT label, embedding::DOUBLE[] AS emb,
                       sqrt(list_inner_product(
                           embedding::DOUBLE[],
                           embedding::DOUBLE[])) AS nrm
                FROM e),
            w AS (SELECT label, emb, nrm FROM v WHERE nrm > 0),
            un AS (
                SELECT label, unnest(emb) / nrm AS x,
                       unnest(range(1, len(emb) + 1)) AS i
                FROM w),
            s AS (SELECT label, i, sum(x) AS sx
                  FROM un GROUP BY label, i),
            ss AS (SELECT label, sum(sx * sx) AS ss2
                   FROM s GROUP BY label),
            n AS (SELECT label, count(*)::BIGINT AS n
                  FROM w GROUP BY label)
            SELECT CAST(n.label AS DOUBLE) AS label, n.n,
                   CASE WHEN n.n < 2 THEN NULL
                        ELSE round((ss.ss2 - n.n)
                                   / (CAST(n.n AS DOUBLE)
                                      * (n.n - 1)), 6)
                   END AS mean_pairwise_cos
            FROM n LEFT JOIN ss
                 ON ss.label IS NOT DISTINCT FROM n.label
            ORDER BY label
        """,
        "q382_markov_accuracy": """
            WITH e AS (
                SELECT user_id, event_type, ts,
                       coalesce(event_id, 9223372036854775807) AS eid
                FROM events
                WHERE user_id IS NOT NULL
                      AND event_type IS NOT NULL
                      AND ts IS NOT NULL),
            o AS (
                SELECT event_type AS prev,
                       lead(event_type) OVER w AS nxt,
                       lead(ts) OVER w AS nts
                FROM e WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, eid, event_type)),
            b AS (SELECT prev, nxt, nts FROM o
                  WHERE nxt IS NOT NULL),
            tr AS (SELECT prev, nxt, count(*)::BIGINT AS c
                   FROM b
                   WHERE nts < TIMESTAMP '2024-01-22'
                   GROUP BY prev, nxt),
            pred AS (SELECT prev, nxt AS p FROM (
                         SELECT prev, nxt,
                                row_number() OVER (
                                    PARTITION BY prev
                                    ORDER BY c DESC, nxt ASC) AS rn
                         FROM tr) WHERE rn = 1),
            te AS (SELECT prev, nxt, count(*)::BIGINT AS c
                   FROM b
                   WHERE nts >= TIMESTAMP '2024-01-22'
                   GROUP BY prev, nxt),
            acc AS (SELECT te.prev, pred.p,
                           sum(te.c)::BIGINT AS n_test,
                           coalesce(sum(CASE WHEN te.nxt = pred.p
                                             THEN te.c END), 0)
                               ::BIGINT AS n_correct
                    FROM te LEFT JOIN pred ON pred.prev = te.prev
                    GROUP BY te.prev, pred.p)
            SELECT prev AS prev_type, p AS predicted, n_test,
                   n_correct,
                   round(n_correct / CAST(n_test AS DOUBLE), 6)
                       AS accuracy
            FROM acc ORDER BY prev_type
        """,
        "q383_segment_flows": """
            WITH e AS (
                SELECT user_id AS u, event_type AS ty,
                       CAST(floor((epoch_us(date_trunc('day', ts))
                                   // 86400000000) / 7.0) AS BIGINT)
                           AS wk
                FROM events
                WHERE user_id IS NOT NULL
                      AND event_type IS NOT NULL
                      AND ts IS NOT NULL),
            w AS (SELECT u, wk, ty, count(*)::BIGINT AS c
                  FROM e GROUP BY u, wk, ty),
            dom AS (SELECT u, wk, ty FROM (
                        SELECT u, wk, ty,
                               row_number() OVER (
                                   PARTITION BY u, wk
                                   ORDER BY c DESC, ty ASC) AS rn
                        FROM w) WHERE rn = 1),
            f AS (SELECT a.ty AS from_type, b.ty AS to_type
                  FROM dom a
                  JOIN dom b ON b.u = a.u AND b.wk = a.wk + 1)
            SELECT from_type, to_type, count(*)::BIGINT AS n_users
            FROM f GROUP BY from_type, to_type
            ORDER BY from_type, to_type
        """,
        "q373_permutation_fdr": """
            WITH o AS (
                SELECT o_orderkey AS okey,
                       o_orderpriority AS pri,
                       round(o_totalprice * 100)::BIGINT AS cents
                FROM orders
                WHERE o_orderkey IS NOT NULL
                      AND o_totalprice IS NOT NULL
                      AND isfinite(o_totalprice)),
            g AS (SELECT pri, count(*)::BIGINT AS n,
                         sum(cents)::BIGINT AS s
                  FROM o GROUP BY pri),
            tot AS (SELECT sum(n)::BIGINT AS nn,
                           sum(s)::BIGINT AS ss,
                           count(*)::BIGINT AS m
                    FROM g),
            gg AS (SELECT pri, n, s,
                          (n::HUGEINT * 4503599627370496)
                              // (SELECT nn FROM tot) AS thr,
                          abs(((SELECT nn FROM tot) - n)::HUGEINT
                              * s - n::HUGEINT
                              * ((SELECT ss FROM tot) - s)) AS tobs
                   FROM g),
            r AS (SELECT okey, cents, unnest(range(0, 32)) AS b
                  FROM o),
            u AS (SELECT b, cents,
                         ('0x' || substr(md5('pf|' || b::VARCHAR
                             || '|' || okey::VARCHAR), 1, 13))
                             ::BIGINT AS u
                  FROM r),
            cell AS (SELECT gg.pri, u.b,
                            sum(CASE WHEN u.u < gg.thr
                                     THEN 1 ELSE 0 END)::BIGINT
                                AS n1,
                            sum(CASE WHEN u.u < gg.thr
                                     THEN u.cents ELSE 0 END)
                                ::BIGINT AS s1
                     FROM u CROSS JOIN gg GROUP BY gg.pri, u.b),
            tb AS (SELECT pri, b,
                          abs(((SELECT nn FROM tot) - n1)::HUGEINT
                              * s1 - n1::HUGEINT
                              * ((SELECT ss FROM tot) - s1)) AS t
                   FROM cell),
            ce AS (SELECT tb.pri,
                          sum((tb.t >= gg.tobs)::INT)::BIGINT AS c
                   FROM tb JOIN gg
                        ON gg.pri IS NOT DISTINCT FROM tb.pri
                   GROUP BY tb.pri),
            bh AS (SELECT pri, c,
                          row_number() OVER (ORDER BY c, pri)
                              AS rk
                   FROM ce),
            kk AS (SELECT coalesce(max(rk), 0) AS k
                   FROM bh, tot
                   WHERE 10 * tot.m * (1 + c) <= rk * 33)
            SELECT bh.pri AS priority, g.n,
                   bh.c AS c_exceed,
                   round((1 + bh.c) / 33.0, 6) AS p_value,
                   (bh.rk <= (SELECT k FROM kk))::BIGINT
                       AS bh_reject
            FROM bh JOIN g ON g.pri IS NOT DISTINCT FROM bh.pri
            ORDER BY priority
        """,
        "q385_ring_rebalance": """
            WITH k AS (
                SELECT c_custkey AS key, count(*)::BIGINT AS m
                FROM customer WHERE c_custkey IS NOT NULL
                GROUP BY c_custkey),
            kn AS (SELECT key, m, unnest(range(0, 17)) AS nd
                   FROM k),
            h AS (SELECT key, m, nd,
                         ('0x' || substr(md5('ring|' || nd::VARCHAR
                             || '|' || key::VARCHAR), 1, 13))
                             ::BIGINT AS hv
                  FROM kn),
            a17 AS (SELECT key, m, nd FROM (
                        SELECT key, m, nd,
                               row_number() OVER (
                                   PARTITION BY key
                                   ORDER BY hv DESC, nd ASC) AS rn
                        FROM h) WHERE rn = 1),
            a16 AS (SELECT key, m, nd FROM (
                        SELECT key, m, nd,
                               row_number() OVER (
                                   PARTITION BY key
                                   ORDER BY hv DESC, nd ASC) AS rn
                        FROM h WHERE nd < 16) WHERE rn = 1),
            mv AS (SELECT
                       coalesce(sum(CASE WHEN a17.nd <> a16.nd
                                         THEN a16.m END), 0)::BIGINT
                           AS moved,
                       coalesce(sum(a16.m), 0)::BIGINT AS total
                   FROM a16 JOIN a17 ON a17.key = a16.key),
            lb AS (SELECT nd, sum(m)::BIGINT AS c
                   FROM a16 GROUP BY nd),
            la AS (SELECT nd, sum(m)::BIGINT AS c
                   FROM a17 GROUP BY nd),
            grid(node) AS (VALUES (0), (1), (2), (3), (4), (5),
                                  (6), (7), (8), (9), (10), (11),
                                  (12), (13), (14), (15), (16))
            SELECT grid.node::BIGINT AS node,
                   coalesce(lb.c, 0)::BIGINT AS n_before,
                   coalesce(la.c, 0)::BIGINT AS n_after,
                   mv.moved AS moved_keys,
                   round(mv.moved / CAST(mv.total AS DOUBLE), 6)
                       AS moved_frac
            FROM grid
            LEFT JOIN lb ON lb.nd = grid.node
            LEFT JOIN la ON la.nd = grid.node
            CROSS JOIN mv
            WHERE mv.total > 0
            ORDER BY node
        """,
        "q359_hour_uniformity": """
            WITH e AS (
                SELECT event_type,
                       hour(ts)::BIGINT AS h
                FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL),
            g AS (SELECT event_type, h, count(*)::BIGINT AS c
                  FROM e GROUP BY event_type, h),
            t AS (SELECT event_type, sum(c)::BIGINT AS n,
                         sum(c::HUGEINT * c) AS s2
                  FROM g GROUP BY event_type)
            SELECT event_type, n,
                   round(CAST(24 * s2 - n::HUGEINT * n AS DOUBLE)
                         / n, 6) AS chi2,
                   ((CAST(24 * s2 - n::HUGEINT * n AS DOUBLE) / n)
                    > 35.17)::BIGINT AS nonuniform
            FROM t ORDER BY event_type
        """,
        "q248_js_divergence": """
            WITH s AS (
                SELECT event_type AS ty,
                       ((CAST(floor(epoch_us(ts) / 86400000000.0)
                              AS BIGINT) % 7) + 7) % 7 IN (2, 3)
                           AS wk
                FROM events WHERE ts IS NOT NULL),
            c AS (SELECT ty,
                         coalesce(sum(CASE WHEN NOT wk THEN 1 END),
                                  0) AS cwd,
                         coalesce(sum(CASE WHEN wk THEN 1 END), 0)
                             AS cwe
                  FROM s GROUP BY ty),
            tot AS (SELECT coalesce(sum(cwd), 0) AS n1,
                           coalesce(sum(cwe), 0) AS n2 FROM c),
            pq AS (SELECT cwd / CAST(n1 AS DOUBLE) AS p,
                          cwe / CAST(n2 AS DOUBLE) AS q
                   FROM c, tot),
            terms AS (
                SELECT CASE WHEN p > 0
                            THEN p * ln(p / ((p + q) / 2.0))
                            ELSE 0 END AS tp,
                       CASE WHEN q > 0
                            THEN q * ln(q / ((p + q) / 2.0))
                            ELSE 0 END AS tq
                FROM pq)
            SELECT (SELECT n1 FROM tot)::BIGINT AS n_weekday,
                   (SELECT n2 FROM tot)::BIGINT AS n_weekend,
                   CASE WHEN (SELECT n1 FROM tot) = 0
                          OR (SELECT n2 FROM tot) = 0 THEN NULL
                        ELSE round(0.5 * sum(tp) + 0.5 * sum(tq), 6)
                   END AS js
            FROM terms
        """,
        "q245_itemsets3": """
            -- MATERIALIZED pair-then-extend: the flat triple join
            -- plans the p-inequality as a PIECEWISE_MERGE_JOIN
            -- near-cross-product at sf>=1 (78 GB spill); pinning the
            -- (a,b) pair build first keeps every join an o-hash join
            WITH op AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL),
            pr AS MATERIALIZED (
                SELECT a.o AS o, a.p AS pa_key, b.p AS pb_key
                FROM op a JOIN op b ON b.o = a.o AND b.p > a.p),
            tri AS (
                SELECT pa_key, pb_key, c.p AS pc_key,
                       count(*) AS sup
                FROM pr JOIN op c ON c.o = pr.o AND c.p > pr.pb_key
                GROUP BY 1, 2, 3),
            item AS (SELECT p, count(*) AS s FROM op GROUP BY p),
            tot AS (SELECT count(DISTINCT o) AS n FROM op)
            SELECT pa_key, pb_key, pc_key, sup::BIGINT AS sup,
                   round(sup * n * n
                         / (ia.s * ib.s * CAST(ic.s AS DOUBLE)), 6)
                       AS lift
            FROM tri JOIN item ia ON ia.p = pa_key
                     JOIN item ib ON ib.p = pb_key
                     JOIN item ic ON ic.p = pc_key, tot
            ORDER BY sup DESC, pa_key, pb_key, pc_key LIMIT 20
        """,
        "q246_calibration_curve": """
            WITH s AS (
                SELECT event_id, value AS v,
                       CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END AS y
                FROM events
                WHERE event_id IS NOT NULL AND isfinite(value)),
            t AS (SELECT y, v,
                         ntile(10) OVER (ORDER BY v, event_id)
                             AS decile
                  FROM s)
            SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n,
                   round(avg(v), 6) AS mean_score,
                   round(sum(y) / CAST(count(*) AS DOUBLE), 6)
                       AS pos_rate
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "q253_vocab_containment": """
            WITH w AS (
                SELECT DISTINCT source,
                       unnest(regexp_extract_all(lower(text), '\\w+'))
                           AS word
                FROM documents WHERE source IS NOT NULL),
            v AS (SELECT source, count(*) AS nv FROM w GROUP BY 1),
            i AS (SELECT a.source AS sa, b.source AS sb,
                         count(*) AS ninter
                  FROM w a JOIN w b
                       ON a.word = b.word AND a.source < b.source
                  GROUP BY 1, 2)
            SELECT sa AS source_a, sb AS source_b,
                   ninter::BIGINT AS n_common,
                   round(ninter / CAST(va.nv AS DOUBLE), 6)
                       AS containment_a,
                   round(ninter / CAST(vb.nv AS DOUBLE), 6)
                       AS containment_b
            FROM i JOIN v va ON va.source = sa
                   JOIN v vb ON vb.source = sb
            ORDER BY 1, 2
        """,
        "q257_kaplan_meier": """
            WITH e AS (
                SELECT user_id, ts, event_type FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            pu AS (
                SELECT user_id, min(ts) AS st, max(ts) AS la,
                       min(CASE WHEN event_type = 'purchase'
                                THEN ts END) AS pt
                FROM e GROUP BY user_id),
            dur AS (
                SELECT (epoch_us(coalesce(pt, la)) - epoch_us(st))
                           // 3600000000 AS h,
                       (pt IS NOT NULL) AS obs
                FROM pu),
            g AS (
                SELECT h, count(*)::BIGINT AS m,
                       (count(*) FILTER (WHERE obs))::BIGINT AS d
                FROM dur GROUP BY h),
            k AS (
                SELECT h, d,
                       (sum(m) OVER (ORDER BY h DESC))::BIGINT
                           AS n_risk
                FROM g),
            k2 AS (
                SELECT h, d, n_risk,
                       product(1.0 - d::DOUBLE / n_risk)
                           OVER (ORDER BY h) AS surv
                FROM k)
            SELECT h::BIGINT AS h, n_risk, d, round(surv, 6) AS surv
            FROM k2 WHERE d > 0 ORDER BY h
        """,
        "q290_nelson_aalen": """
            WITH e AS (
                SELECT user_id, ts, event_type FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            pu AS (
                SELECT user_id, min(ts) AS st, max(ts) AS la,
                       min(CASE WHEN event_type = 'purchase'
                                THEN ts END) AS pt
                FROM e GROUP BY user_id),
            dur AS (
                SELECT (epoch_us(coalesce(pt, la)) - epoch_us(st))
                           // 3600000000 AS h,
                       (pt IS NOT NULL) AS obs
                FROM pu),
            g AS (
                SELECT h, count(*)::BIGINT AS m,
                       (count(*) FILTER (WHERE obs))::BIGINT AS d
                FROM dur GROUP BY h),
            k AS (
                SELECT h, d,
                       (sum(m) OVER (ORDER BY h DESC))::BIGINT
                           AS n_risk
                FROM g),
            k2 AS (
                SELECT h, d, n_risk,
                       sum(d::DOUBLE / n_risk) OVER (ORDER BY h)
                           AS cumhaz
                FROM k)
            SELECT h::BIGINT AS h, n_risk, d,
                   round(cumhaz, 6) AS cumhaz,
                   round(exp(-cumhaz), 6) AS surv_na
            FROM k2 WHERE d > 0 ORDER BY h
        """,
        "q291_common_neighbors": """
            WITH op AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL),
            e AS (
                SELECT DISTINCT a.p AS u, b.p AS v
                FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
            adj AS (
                SELECT u, v FROM e
                UNION ALL SELECT v AS u, u AS v FROM e),
            cn AS (
                SELECT a.u AS p1, b.u AS p2, count(*)::BIGINT
                           AS n_common
                FROM adj a JOIN adj b ON a.v = b.v AND a.u < b.u
                GROUP BY 1, 2),
            ne AS (
                SELECT cn.p1, cn.p2, cn.n_common
                FROM cn LEFT JOIN e ON cn.p1 = e.u AND cn.p2 = e.v
                WHERE e.u IS NULL)
            SELECT p1, p2, n_common FROM ne
            ORDER BY n_common DESC, p1, p2 LIMIT 50
        """,
        "q292_pr_curve": """
            WITH e AS (
                SELECT value,
                       coalesce(event_type = 'purchase', FALSE) AS pos
                FROM events WHERE isfinite(value)),
            g AS (
                SELECT value,
                       (count(*) FILTER (WHERE pos))::BIGINT AS np,
                       (count(*) FILTER (WHERE NOT pos))::BIGINT AS nn
                FROM e GROUP BY value),
            c AS (
                SELECT value, np,
                       (sum(np) OVER (ORDER BY value DESC))::BIGINT
                           AS tp,
                       (sum(nn) OVER (ORDER BY value DESC))::BIGINT
                           AS fp
                FROM g),
            p AS (SELECT sum(np)::BIGINT AS ptot FROM g)
            SELECT value AS threshold, tp, fp,
                   round(tp::DOUBLE / (tp + fp), 6) AS prec,
                   round(tp::DOUBLE / p.ptot, 6) AS rec
            FROM c, p WHERE np > 0
            ORDER BY threshold DESC LIMIT 200
        """,
        "q293_ndcg_eval": """
            WITH e2 AS MATERIALIZED (
                SELECT vec_id, embedding, label FROM embeddings
                WHERE embedding IS NOT NULL AND label IS NOT NULL),
            q AS (SELECT vec_id AS qid, embedding AS qe,
                         label AS ql
                  FROM e2 WHERE vec_id IN (0, 1, 2, 3, 4, 5, 6, 7)),
            s AS (SELECT q.qid, e.vec_id AS nid,
                         (e.label = q.ql) AS rel,
                         list_cosine_similarity(e.embedding, q.qe)
                             AS sim
                  FROM e2 e, q WHERE e.vec_id <> q.qid),
            r AS (SELECT qid, nid, rel,
                         row_number() OVER (
                             PARTITION BY qid
                             ORDER BY sim DESC, nid) AS rank
                  FROM s),
            t AS (SELECT qid, rank, nid, rel,
                         CASE WHEN rel THEN 1.0 / log2(rank + 1)
                              ELSE 0.0 END AS gain
                  FROM r WHERE rank <= 10),
            w AS (SELECT qid, rank, nid, rel, gain,
                         sum(gain) OVER (PARTITION BY qid
                                         ORDER BY rank) AS dcg
                  FROM t)
            SELECT qid AS query_id, rank, nid AS neighbor_id,
                   rel::BIGINT AS rel, round(gain, 6) AS gain,
                   round(dcg, 6) AS running_dcg
            FROM w ORDER BY query_id, rank
        """,
        "q294_ewma_chart": """
            WITH RECURSIVE d AS (
                SELECT row_number() OVER (ORDER BY day) AS rn,
                       CAST(epoch_us(day) / 86400000000 AS BIGINT)
                           AS dayi,
                       revc, revc::DOUBLE AS y FROM (
                    SELECT date_trunc('day', o_orderdate) AS day,
                           sum(CAST(round(o_totalprice * 100)
                                    AS BIGINT)) AS revc
                    FROM orders
                    WHERE o_orderdate IS NOT NULL
                      AND isfinite(o_totalprice)
                    GROUP BY 1)),
            st AS (SELECT count(*)::BIGINT AS n,
                          sum(revc)::HUGEINT AS s1,
                          sum(revc::HUGEINT * revc)::HUGEINT AS s2
                   FROM d),
            sg AS (SELECT sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                               / CAST(n * n AS DOUBLE)) AS sigma
                   FROM st),
            it(i, s, resid) AS (
                SELECT 1::BIGINT, (SELECT y FROM d WHERE rn = 1),
                       0.0::DOUBLE
                WHERE (SELECT count(*) FROM d) >= 1
                UNION ALL
                SELECT i + 1, 0.25 * d.y + 0.75 * s, d.y - s
                FROM it JOIN d ON d.rn = i + 1
                WHERE i < (SELECT count(*) FROM d))
            SELECT d.dayi AS day, d.revc::BIGINT AS revc,
                   round(it.s, 6) AS ewma,
                   round(it.resid, 6) AS resid,
                   (abs(it.resid) > 3.0 * sg.sigma)::BIGINT AS viol
            FROM it JOIN d ON d.rn = it.i, sg
            ORDER BY day
        """,
        "q295_source_skewness": """
            WITH x AS (
                SELECT source, n_chars FROM documents
                WHERE n_chars IS NOT NULL),
            g AS (
                SELECT source, count(*)::BIGINT AS n,
                       sum(n_chars)::HUGEINT AS s1,
                       sum(n_chars::HUGEINT * n_chars) AS s2,
                       sum(n_chars::HUGEINT * n_chars * n_chars)
                           AS s3,
                       min(n_chars) AS mn, max(n_chars) AS mx
                FROM x GROUP BY source)
            SELECT source, n,
                   CASE WHEN mn = mx THEN NULL ELSE
                     round((CAST(s3 AS DOUBLE) / n
                            - 3.0 * (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s2 AS DOUBLE) / n)
                            + 2.0 * (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s1 AS DOUBLE) / n))
                           / pow(CAST(s2 AS DOUBLE) / n
                                 - (CAST(s1 AS DOUBLE) / n)
                                   * (CAST(s1 AS DOUBLE) / n),
                                 1.5), 6)
                   END AS skew
            FROM g ORDER BY source
        """,
        "q296_item_cf": """
            WITH op AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL),
            d AS (SELECT p, count(*)::BIGINT AS dp FROM op GROUP BY p),
            e AS (
                SELECT a.p AS p1, b.p AS p2, count(*)::BIGINT AS n
                FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2),
            s AS (
                SELECT e.p1, e.p2, e.n,
                       round(e.n / sqrt(d1.dp * d2.dp), 6) AS sim
                FROM e JOIN d d1 ON e.p1 = d1.p
                       JOIN d d2 ON e.p2 = d2.p)
            SELECT p1, p2, n, sim FROM s
            ORDER BY sim DESC, p1, p2 LIMIT 50
        """,
        "q297_lang_rebalance": """
            WITH x AS (
                SELECT lang, doc_id FROM documents
                WHERE lang IS NOT NULL AND doc_id IS NOT NULL),
            c AS (SELECT lang, count(*)::BIGINT AS n_before
                  FROM x GROUP BY lang),
            t AS (SELECT sum(n_before)::BIGINT AS tot,
                         count(*)::BIGINT AS l FROM c),
            p AS (SELECT lang, n_before,
                         least(1.0, (tot::DOUBLE / l) / n_before)
                             AS p_keep,
                         CAST(floor(least(1.0, (tot::DOUBLE / l)
                                               / n_before)
                                    * 4503599627370496.0) AS BIGINT)
                             AS thr
                  FROM c, t),
            k AS (SELECT x.lang, count(*)::BIGINT AS n_kept
                  FROM x JOIN p ON x.lang = p.lang
                  WHERE ('0x' || substr(md5(CAST(x.doc_id
                                                 AS VARCHAR)),
                                        1, 13))::BIGINT < p.thr
                  GROUP BY x.lang)
            SELECT p.lang, p.n_before,
                   coalesce(k.n_kept, 0)::BIGINT AS n_kept,
                   round(p.p_keep, 6) AS p_keep
            FROM p LEFT JOIN k ON p.lang = k.lang
            ORDER BY p.lang
        """,
        "q298_target_encoding": """
            WITH x AS (
                SELECT o_orderpriority AS priority,
                       CAST(round(o_totalprice * 100) AS BIGINT)
                           AS cents
                FROM orders WHERE isfinite(o_totalprice)),
            g AS (SELECT priority, count(*)::BIGINT AS n,
                         sum(cents)::HUGEINT AS s
                  FROM x GROUP BY priority),
            t AS (SELECT sum(n)::BIGINT AS tn,
                         sum(s)::HUGEINT AS ts FROM g)
            SELECT priority, n,
                   round(CAST(s AS DOUBLE) / n, 6) AS mean_cents,
                   round((CAST(s AS DOUBLE)
                          + 20.0 * (CAST(ts AS DOUBLE) / tn))
                         / (n + 20.0), 6) AS enc_cents
            FROM g, t ORDER BY priority
        """,
        "q299_feature_hash_eval": """
            WITH w AS (
                SELECT DISTINCT unnest(regexp_extract_all(
                    lower(text), '\w+')) AS word
                FROM documents),
            b AS (SELECT word,
                         ('0x' || substr(md5(word), 1, 13))::BIGINT
                             % 4096 AS fb
                  FROM w),
            g AS (SELECT fb, count(*)::BIGINT AS c FROM b GROUP BY fb)
            SELECT (SELECT count(*) FROM w)::BIGINT AS n_words,
                   (SELECT count(*) FROM g)::BIGINT AS n_used,
                   (SELECT max(c) FROM g)::BIGINT AS max_load,
                   round(((SELECT count(*) FROM w)
                          - (SELECT count(*) FROM g))::DOUBLE
                         / (SELECT count(*) FROM w), 6)
                       AS collision_share
        """,
        "q300_split_leakage": """
            WITH e AS (
                SELECT event_id, user_id FROM events
                WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
            s AS (
                SELECT user_id,
                       (('0x' || substr(md5(CAST(event_id
                                                 AS VARCHAR)),
                                        1, 13))::BIGINT
                        < 3602879701896396) AS tr
                FROM e),
            u AS (SELECT user_id, max(tr::INT) AS a,
                         max((NOT tr)::INT) AS b
                  FROM s GROUP BY user_id),
            t AS (SELECT count(*)::BIGINT AS n_users,
                         sum(a)::BIGINT AS n_tr,
                         sum(b)::BIGINT AS n_te,
                         (count(*) FILTER (WHERE a = 1 AND b = 1))
                             ::BIGINT AS n_both
                  FROM u)
            SELECT n_users, n_tr AS n_train_users,
                   n_te AS n_test_users, n_both AS n_leaked,
                   round(n_both::DOUBLE / n_users, 6) AS leak_share
            FROM t
        """,
        "q301_heaps_law": """
            WITH d AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '\w+') AS ws
                FROM documents WHERE doc_id IS NOT NULL),
            tok AS (SELECT doc_id, unnest(ws) AS word FROM d),
            ty AS (SELECT word, min(doc_id) AS md FROM tok
                   GROUP BY word),
            cp(c) AS (VALUES (125), (250), (500), (1000), (2000),
                             (4000), (8000), (16000), (32000),
                             (64000))
            SELECT c::BIGINT AS checkpoint,
                   (SELECT count(*) FROM tok
                    WHERE doc_id < cp.c)::BIGINT AS n_tokens,
                   (SELECT count(*) FROM ty
                    WHERE md < cp.c)::BIGINT AS n_types
            FROM cp ORDER BY 1
        """,
        "q302_near_amount_pairs": """
            -- band via bucket-equality joins: the bare |diff|<=50
            -- predicate plans as a PIECEWISE_MERGE_JOIN on a.k<b.k
            -- (a 1e12-pair sweep at sf1). Width-51 buckets partition
            -- the axis, so every qualifying pair is same-bucket
            -- (counted once via a.k<b.k) or adjacent-bucket (counted
            -- once by orientation) - identical pair set, hash joins
            WITH x AS MATERIALIZED (
                SELECT o_orderkey AS k,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS c
                FROM orders
                WHERE o_orderkey IS NOT NULL
                  AND isfinite(o_totalprice)),
            xb AS MATERIALIZED (SELECT k, c, c // 51 AS b FROM x),
            cand AS (
              SELECT a.k AS ka, b.k AS kb, abs(a.c - b.c) AS d
              FROM xb a JOIN xb b ON b.b = a.b AND a.k < b.k
              UNION ALL
              SELECT a.k, b.k, abs(a.c - b.c)
              FROM xb a JOIN xb b ON b.b = a.b + 1)
            SELECT least(ka, kb) AS k1, greatest(ka, kb) AS k2,
                   d AS diff_cents
            FROM cand WHERE d <= 50
            ORDER BY diff_cents, k1, k2 LIMIT 100
        """,
        "q303_daily_mix_jaccard": """
            WITH e AS (
                SELECT CAST(epoch_us(date_trunc('day', ts))
                            / 86400000000 AS BIGINT) AS d,
                       event_type AS ty
                FROM events WHERE ts IS NOT NULL),
            g AS (SELECT d, ty, count(*)::BIGINT AS c
                  FROM e GROUP BY d, ty),
            t AS (SELECT d, sum(c)::BIGINT AS tot FROM g GROUP BY d),
            m AS (SELECT a.d AS day,
                         sum(least(a.c, b.c))::BIGINT AS smin
                  FROM g a JOIN g b
                    ON a.d = b.d + 1
                   AND a.ty IS NOT DISTINCT FROM b.ty
                  GROUP BY a.d),
            p AS (SELECT ta.d AS day, ta.tot AS tot_a,
                         tb.tot AS tot_b
                  FROM t ta JOIN t tb ON ta.d = tb.d + 1)
            SELECT p.day, coalesce(m.smin, 0)::BIGINT AS smin,
                   (p.tot_a + p.tot_b - coalesce(m.smin, 0))::BIGINT
                       AS smax,
                   round(coalesce(m.smin, 0)::DOUBLE
                         / (p.tot_a + p.tot_b
                            - coalesce(m.smin, 0)), 6) AS jaccard
            FROM p LEFT JOIN m ON p.day = m.day ORDER BY p.day
        """,
        "q304_ship_lag_percentiles": """
            WITH j AS (
                SELECT CAST(epoch_us(date_trunc('month',
                                                o_orderdate))
                            // 86400000000 AS BIGINT) AS month,
                       (epoch_us(date_trunc('day', l_shipdate))
                            // 86400000000
                        - epoch_us(date_trunc('day', o_orderdate))
                            // 86400000000) AS lag
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                WHERE o_orderdate IS NOT NULL
                  AND l_shipdate IS NOT NULL
                  AND o_orderkey IS NOT NULL)
            SELECT month, count(*)::BIGINT AS n,
                   quantile_disc(lag, 0.5)::BIGINT AS p50,
                   quantile_disc(lag, 0.9)::BIGINT AS p90
            FROM j GROUP BY month ORDER BY month
        """,
        "q305_late_rate_wilson": """
            WITH j AS (
                SELECT CAST(epoch_us(date_trunc('month',
                                                o_orderdate))
                            // 86400000000 AS BIGINT) AS month,
                       (epoch_us(date_trunc('day', l_shipdate))
                            // 86400000000
                        - epoch_us(date_trunc('day', o_orderdate))
                            // 86400000000) AS lag
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                WHERE o_orderdate IS NOT NULL
                  AND l_shipdate IS NOT NULL
                  AND o_orderkey IS NOT NULL),
            t AS (SELECT month, count(*)::BIGINT AS n,
                         (count(*) FILTER (WHERE lag > 1095))::BIGINT
                             AS k
                  FROM j GROUP BY month)
            SELECT month, n, k AS n_late,
                   round(k::DOUBLE / n, 6) AS late_rate,
                   round((k::DOUBLE / n + 1.96 * 1.96 / (2.0 * n)
                          - 1.96 * sqrt(((k::DOUBLE / n)
                                         * (1.0 - (k::DOUBLE / n))
                                         + 1.96 * 1.96 / (4.0 * n))
                                        / n))
                         / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
                   round((k::DOUBLE / n + 1.96 * 1.96 / (2.0 * n)
                          + 1.96 * sqrt(((k::DOUBLE / n)
                                         * (1.0 - (k::DOUBLE / n))
                                         + 1.96 * 1.96 / (4.0 * n))
                                        / n))
                         / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
            FROM t ORDER BY month
        """,
        "q307_shuffle_quality": """
            WITH d AS (
                SELECT doc_id, source,
                       md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents WHERE doc_id IS NOT NULL),
            a AS (SELECT source,
                         lag(source) OVER (ORDER BY doc_id) AS prev,
                         row_number() OVER (ORDER BY doc_id) AS rn
                  FROM d),
            b AS (SELECT source,
                         lag(source) OVER (ORDER BY h, doc_id)
                             AS prev,
                         row_number() OVER (ORDER BY h, doc_id)
                             AS rn
                  FROM d),
            t AS (SELECT
                (SELECT count(*) FROM d)::BIGINT AS n,
                (SELECT count(*) FILTER (WHERE rn > 1
                     AND source IS NOT DISTINCT FROM prev)
                 FROM a)::BIGINT AS same_adj_seq,
                (SELECT count(*) FILTER (WHERE rn > 1
                     AND source IS NOT DISTINCT FROM prev)
                 FROM b)::BIGINT AS same_adj_shuf)
            SELECT n, same_adj_seq, same_adj_shuf,
                   round(same_adj_seq::DOUBLE
                         / greatest(n - 1, 1), 6) AS rate_seq,
                   round(same_adj_shuf::DOUBLE
                         / greatest(n - 1, 1), 6) AS rate_shuf
            FROM t
        """,
        "q309_pk_dup_audit": """
            WITH a AS (
                SELECT 'customer' AS tbl, count(*)::BIGINT AS n_rows,
                       count(c_custkey)::BIGINT AS nn,
                       count(DISTINCT c_custkey)::BIGINT AS n_keys
                FROM customer
                UNION ALL
                SELECT 'events', count(*), count(event_id),
                       count(DISTINCT event_id) FROM events
                UNION ALL
                SELECT 'nation', count(*), count(n_nationkey),
                       count(DISTINCT n_nationkey) FROM nation
                UNION ALL
                SELECT 'orders', count(*), count(o_orderkey),
                       count(DISTINCT o_orderkey) FROM orders
                UNION ALL
                SELECT 'part', count(*), count(p_partkey),
                       count(DISTINCT p_partkey) FROM part
                UNION ALL
                SELECT 'region', count(*), count(r_regionkey),
                       count(DISTINCT r_regionkey) FROM region
                UNION ALL
                SELECT 'supplier', count(*), count(s_suppkey),
                       count(DISTINCT s_suppkey) FROM supplier)
            SELECT tbl, n_rows, n_keys,
                   (n_rows - nn)::BIGINT AS n_null_keys,
                   (nn - n_keys)::BIGINT AS n_dup_rows
            FROM a ORDER BY tbl
        """,
        "q310_brand_homophily": """
            WITH op AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL),
            e AS (
                SELECT DISTINCT a.p AS u, b.p AS v
                FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
            pd AS (SELECT p_partkey AS k, min(p_brand) AS brand
                   FROM part WHERE p_partkey IS NOT NULL
                   GROUP BY p_partkey),
            eb AS (SELECT pu.brand AS bu, pv.brand AS bv
                   FROM e LEFT JOIN pd pu ON e.u = pu.k
                          LEFT JOIN pd pv ON e.v = pv.k),
            m AS (SELECT count(*)::BIGINT AS m,
                         (count(*) FILTER (
                             WHERE bu IS NOT DISTINCT FROM bv))
                             ::BIGINT AS same
                  FROM eb),
            bc AS (SELECT brand, count(*)::BIGINT AS c FROM (
                       SELECT bu AS brand FROM eb
                       UNION ALL SELECT bv FROM eb)
                   GROUP BY brand),
            sq AS (SELECT sum(c::HUGEINT * c) AS s2 FROM bc)
            SELECT m.m AS m_edges, m.same AS same_brand,
                   round(m.same::DOUBLE / m.m, 6) AS obs,
                   round(CAST(sq.s2 AS DOUBLE)
                         / CAST(4 * m.m * m.m AS DOUBLE), 6) AS exp,
                   round((m.same::DOUBLE / m.m
                          - CAST(sq.s2 AS DOUBLE)
                            / CAST(4 * m.m * m.m AS DOUBLE))
                         / (1.0 - CAST(sq.s2 AS DOUBLE)
                                  / CAST(4 * m.m * m.m AS DOUBLE)),
                         6) AS homophily
            FROM m, sq WHERE m.m > 0
        """,
        "q311_exp_arrival_ks": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS us, event_id
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            gp AS (SELECT (lead(us) OVER (
                       PARTITION BY user_id
                       ORDER BY us, event_id) - us) AS gap
                   FROM e),
            g2 AS (SELECT gap FROM gp WHERE gap IS NOT NULL),
            c AS (SELECT gap, count(*)::BIGINT AS c FROM g2
                  GROUP BY gap),
            t AS (SELECT sum(gap)::HUGEINT AS s,
                         count(*)::BIGINT AS n FROM g2),
            w AS (SELECT gap, c,
                         (sum(c) OVER (ORDER BY gap))::BIGINT AS cum
                  FROM c),
            k AS (SELECT
                max(greatest(
                    abs(cum::DOUBLE / t.n
                        - (1.0 - exp(-(gap::DOUBLE
                                       / (CAST(t.s AS DOUBLE)
                                          / t.n))))),
                    abs((cum - c)::DOUBLE / t.n
                        - (1.0 - exp(-(gap::DOUBLE
                                       / (CAST(t.s AS DOUBLE)
                                          / t.n))))))) AS d,
                max(t.n) AS n,
                max(CAST(t.s AS DOUBLE) / t.n) AS mean
                FROM w, t)
            SELECT n AS n_gaps, round(mean, 6) AS mean_gap_us,
                   round(d, 6) AS ks_d
            FROM k WHERE n IS NOT NULL
        """,
        "q312_token_budget_mix": """
            WITH g AS (
                SELECT source,
                       sum(coalesce(n_chars, 0))::BIGINT AS chars,
                       count(*)::BIGINT AS docs,
                       (count(*) FILTER (
                            WHERE coalesce(lang = 'en', FALSE)))
                           ::BIGINT AS en
                FROM documents GROUP BY source),
            r AS (SELECT source, chars,
                         en::DOUBLE / docs AS en_share,
                         row_number() OVER (
                             ORDER BY en::DOUBLE / docs DESC,
                                      source) AS rank,
                         coalesce(sum(chars) OVER (
                             ORDER BY en::DOUBLE / docs DESC,
                                      source
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0)::BIGINT
                             AS cum_before
                  FROM g),
            b AS (SELECT (sum(chars) // 2)::BIGINT AS budget FROM g)
            SELECT source, rank, round(en_share, 6) AS en_share,
                   chars,
                   least(chars, budget - cum_before)::BIGINT
                       AS chars_taken
            FROM r, b WHERE cum_before < budget
            ORDER BY rank
        """,
        "q313_fd_histogram": """
            WITH x AS (
                SELECT value AS v FROM events
                WHERE event_type = 'purchase' AND isfinite(value)),
            s AS (SELECT count(*)::BIGINT AS n, min(v) AS mn,
                         max(v) AS mx,
                         quantile_disc(v, 0.25) AS q1,
                         quantile_disc(v, 0.75) AS q3
                  FROM x),
            p AS (SELECT n, mn, mx,
                         2.0 * (q3 - q1) / pow(n, 1.0 / 3.0) AS w
                  FROM s WHERE (q3 - q1) > 0),
            b AS (SELECT least(
                       CAST(floor((x.v - p.mn) / p.w) AS BIGINT),
                       CAST(ceil((p.mx - p.mn) / p.w) AS BIGINT)
                           - 1) AS bin,
                         p.mn AS mn, p.w AS w
                  FROM x, p)
            SELECT bin, round(mn + bin * w, 6) AS lo,
                   count(*)::BIGINT AS n
            FROM b GROUP BY bin, mn, w ORDER BY bin
        """,
        "q314_blocking_quality": """
            WITH s AS (
                SELECT doc_id, text, substr(text, 1, 32) AS key
                FROM documents WHERE text IS NOT NULL),
            r AS (SELECT doc_id, text, key,
                         row_number() OVER (ORDER BY key, doc_id)
                             AS rk
                  FROM s),
            nn AS (SELECT count(*)::BIGINT AS n FROM s),
            cand AS (
                SELECT count(*)::BIGINT AS c,
                       (count(*) FILTER (WHERE a.text = b.text))
                           ::BIGINT AS f
                FROM r a JOIN r b
                     ON b.rk > a.rk AND b.rk <= a.rk + 4),
            tr AS (SELECT coalesce(sum(g * (g - 1) // 2), 0)::BIGINT
                       AS t
                   FROM (SELECT count(*)::BIGINT AS g FROM s
                         GROUP BY text))
            SELECT nn.n AS n_docs,
                   (nn.n * (nn.n - 1) // 2)::BIGINT AS total_pairs,
                   cand.c AS cand_pairs, tr.t AS true_pairs,
                   cand.f AS found_true,
                   CASE WHEN nn.n > 1 THEN
                       round(1.0 - cand.c::DOUBLE
                             / (nn.n * (nn.n - 1) // 2), 6)
                   END AS reduction_ratio,
                   CASE WHEN tr.t > 0 THEN
                       round(cand.f::DOUBLE / tr.t, 6)
                   END AS pair_completeness
            FROM nn, cand, tr WHERE nn.n > 0
        """,
        "q315_dup_cluster_sizes": """
            SELECT g AS size, count(*)::BIGINT AS n_groups
            FROM (SELECT count(*)::BIGINT AS g FROM documents
                  WHERE text IS NOT NULL GROUP BY text)
            GROUP BY g ORDER BY g
        """,
        "q320_numeric_profile": """
            WITH p AS (
                SELECT 'events' AS tbl, 'value' AS col,
                       count(*)::BIGINT AS n,
                       (count(*) - count(value))::BIGINT AS n_null,
                       (count(value) - count(*) FILTER (
                            WHERE isfinite(value)))::BIGINT
                           AS n_nonfinite,
                       min(value) FILTER (WHERE isfinite(value))
                           AS mn,
                       max(value) FILTER (WHERE isfinite(value))
                           AS mx
                FROM events
                UNION ALL
                SELECT 'lineitem', 'l_quantity', count(*),
                       count(*) - count(l_quantity),
                       count(l_quantity) - count(*) FILTER (
                           WHERE isfinite(l_quantity)),
                       min(l_quantity) FILTER (
                           WHERE isfinite(l_quantity)),
                       max(l_quantity) FILTER (
                           WHERE isfinite(l_quantity))
                FROM lineitem
                UNION ALL
                SELECT 'lineitem', 'l_extendedprice', count(*),
                       count(*) - count(l_extendedprice),
                       count(l_extendedprice) - count(*) FILTER (
                           WHERE isfinite(l_extendedprice)),
                       min(l_extendedprice) FILTER (
                           WHERE isfinite(l_extendedprice)),
                       max(l_extendedprice) FILTER (
                           WHERE isfinite(l_extendedprice))
                FROM lineitem
                UNION ALL
                SELECT 'lineitem', 'l_discount', count(*),
                       count(*) - count(l_discount),
                       count(l_discount) - count(*) FILTER (
                           WHERE isfinite(l_discount)),
                       min(l_discount) FILTER (
                           WHERE isfinite(l_discount)),
                       max(l_discount) FILTER (
                           WHERE isfinite(l_discount))
                FROM lineitem
                UNION ALL
                SELECT 'lineitem', 'l_tax', count(*),
                       count(*) - count(l_tax),
                       count(l_tax) - count(*) FILTER (
                           WHERE isfinite(l_tax)),
                       min(l_tax) FILTER (WHERE isfinite(l_tax)),
                       max(l_tax) FILTER (WHERE isfinite(l_tax))
                FROM lineitem
                UNION ALL
                SELECT 'orders', 'o_totalprice', count(*),
                       count(*) - count(o_totalprice),
                       count(o_totalprice) - count(*) FILTER (
                           WHERE isfinite(o_totalprice)),
                       min(o_totalprice) FILTER (
                           WHERE isfinite(o_totalprice)),
                       max(o_totalprice) FILTER (
                           WHERE isfinite(o_totalprice))
                FROM orders)
            SELECT * FROM p ORDER BY tbl, col
        """,
        "q321_dup_row_census": """
            WITH g AS (
                SELECT count(*)::BIGINT AS c FROM events
                GROUP BY event_id, ts, user_id, event_type, value,
                         props)
            SELECT (SELECT count(*) FROM events)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_distinct,
                   ((SELECT count(*) FROM events) - count(*))
                       ::BIGINT AS n_dup_rows,
                   max(c)::BIGINT AS max_multiplicity
            FROM g
        """,
        "q322_hubness": """
            WITH e2 AS MATERIALIZED (
                SELECT vec_id, embedding FROM embeddings
                WHERE embedding IS NOT NULL),
            s AS (SELECT a.vec_id AS q, b.vec_id AS nbr,
                         list_cosine_similarity(b.embedding,
                                                a.embedding) AS sim
                  FROM e2 a, e2 b WHERE a.vec_id <> b.vec_id),
            r AS (SELECT q, nbr,
                         row_number() OVER (PARTITION BY q
                                            ORDER BY sim DESC, nbr)
                             AS rk
                  FROM s),
            occ AS (SELECT nbr, count(*)::BIGINT AS k FROM r
                    WHERE rk <= 10 GROUP BY nbr),
            allp AS (SELECT e2.vec_id,
                            coalesce(occ.k, 0)::BIGINT AS k
                     FROM e2 LEFT JOIN occ
                          ON e2.vec_id = occ.nbr)
            SELECT k AS k_occurrence, count(*)::BIGINT AS n_points
            FROM allp GROUP BY k ORDER BY k
        """,
        "q323_top_share": """
            WITH c AS (
                SELECT o_custkey,
                       sum(CAST(round(o_totalprice * 100)
                                AS BIGINT))::BIGINT AS rev
                FROM orders
                WHERE o_custkey IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY o_custkey),
            r AS (SELECT rev,
                         row_number() OVER (ORDER BY rev DESC,
                                            o_custkey) AS rk
                  FROM c),
            t AS (SELECT count(*)::BIGINT AS n,
                         sum(rev)::BIGINT AS tot FROM c)
            SELECT t.n AS n_customers,
                   CAST(ceil(0.01 * t.n) AS BIGINT) AS k_top,
                   (SELECT sum(rev) FROM r
                    WHERE rk <= ceil(0.01 * t.n))::BIGINT
                       AS top_rev_cents,
                   t.tot AS total_rev_cents,
                   round((SELECT sum(rev) FROM r
                          WHERE rk <= ceil(0.01 * t.n))::DOUBLE
                         / t.tot, 6) AS top_share
            FROM t WHERE t.n > 0
        """,
        "q324_length_quantile_report": """
            WITH x AS (
                SELECT source, n_chars FROM documents
                WHERE n_chars IS NOT NULL),
            t AS (SELECT count(*)::BIGINT AS ntot FROM x),
            g AS (SELECT source, count(*)::BIGINT AS n,
                         quantile_disc(n_chars, 0.25)::BIGINT AS p25,
                         quantile_disc(n_chars, 0.5)::BIGINT AS p50,
                         quantile_disc(n_chars, 0.75)::BIGINT AS p75
                  FROM x GROUP BY source),
            r AS (SELECT g.*,
                         (SELECT count(*) FROM x
                          WHERE x.n_chars < g.p50)::BIGINT AS below
                  FROM g)
            SELECT source, n, p25, p50, p75,
                   round(below::DOUBLE / t.ntot, 6)
                       AS pooled_rank_p50
            FROM r, t ORDER BY source
        """,
        "q325_double_fire_rate": """
            WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) AS us,
                       event_id
                FROM events
                WHERE user_id IS NOT NULL
                  AND event_type IS NOT NULL AND ts IS NOT NULL),
            w AS (SELECT event_type AS ty, us,
                         lag(event_type) OVER (
                             PARTITION BY user_id
                             ORDER BY us, event_id) AS pty,
                         lag(us) OVER (
                             PARTITION BY user_id
                             ORDER BY us, event_id) AS pus
                  FROM e),
            p AS (SELECT ty, (us - pus <= 1000000) AS fast FROM w
                  WHERE pty IS NOT NULL AND ty = pty)
            SELECT ty AS event_type, count(*)::BIGINT AS n_pairs,
                   (count(*) FILTER (WHERE fast))::BIGINT AS n_fast,
                   round((count(*) FILTER (WHERE fast))::DOUBLE
                         / count(*), 6) AS fast_rate
            FROM p GROUP BY ty ORDER BY ty
        """,
        "q326_range_partitioner": """
            -- TeraSort partitioner manifest: md5-deterministic
            -- sample -> quantile splitters -> interval counts
            WITH x AS (
                SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                           AS cents,
                       md5(CAST(o_orderkey AS VARCHAR)) AS h
                FROM orders
                WHERE o_orderkey IS NOT NULL
                  AND isfinite(o_totalprice)),
            s AS (SELECT cents FROM x ORDER BY h, cents LIMIT 256),
            cuts AS (SELECT DISTINCT cut FROM (
                SELECT quantile_disc(cents, 0.125) AS cut FROM s
                UNION ALL SELECT quantile_disc(cents, 0.25) FROM s
                UNION ALL SELECT quantile_disc(cents, 0.375) FROM s
                UNION ALL SELECT quantile_disc(cents, 0.5) FROM s
                UNION ALL SELECT quantile_disc(cents, 0.625) FROM s
                UNION ALL SELECT quantile_disc(cents, 0.75) FROM s
                UNION ALL SELECT quantile_disc(cents, 0.875)
                    FROM s)),
            b AS (SELECT (SELECT count(*) FROM cuts
                          WHERE cut <= x.cents)::BIGINT AS part,
                         cents
                  FROM x)
            SELECT part, count(*)::BIGINT AS n,
                   min(cents) AS mn_cents, max(cents) AS mx_cents
            FROM b GROUP BY part ORDER BY part
        """,
        "q327_skew_advisor": """
            WITH x AS (
                SELECT user_id,
                       ('0x' || substr(md5(CAST(user_id
                                                AS VARCHAR)),
                                       1, 13))::BIGINT % 32
                           AS bucket
                FROM events WHERE user_id IS NOT NULL),
            g AS (SELECT bucket, count(*)::BIGINT AS n_rows,
                         count(DISTINCT user_id)::BIGINT AS n_keys
                  FROM x GROUP BY bucket),
            t AS (SELECT sum(n_rows)::BIGINT AS tot FROM g)
            SELECT bucket, n_rows, n_keys,
                   round(n_rows::DOUBLE / t.tot, 6) AS load_share
            FROM g, t ORDER BY bucket
        """,
        "q328_daily_ohlc": """
            WITH e AS (
                SELECT CAST(epoch_us(date_trunc('day', ts))
                            // 86400000000 AS BIGINT) AS day,
                       epoch_us(ts) AS us, event_id, value
                FROM events
                WHERE ts IS NOT NULL AND event_id IS NOT NULL
                  AND isfinite(value)),
            r AS (SELECT day, value,
                         row_number() OVER (
                             PARTITION BY day
                             ORDER BY us, event_id) AS rn_a,
                         row_number() OVER (
                             PARTITION BY day
                             ORDER BY us DESC, event_id DESC)
                             AS rn_d
                  FROM e),
            a AS (SELECT day, count(*)::BIGINT AS n,
                         min(value) AS lo, max(value) AS hi
                  FROM e GROUP BY day)
            SELECT a.day, round(o.value, 6) AS open,
                   round(a.hi, 6) AS high, round(a.lo, 6) AS low,
                   round(c.value, 6) AS close, a.n
            FROM a JOIN r o ON a.day = o.day AND o.rn_a = 1
                   JOIN r c ON a.day = c.day AND c.rn_d = 1
            ORDER BY a.day
        """,
        "q329_dau_mau": """
            WITH e AS (
                SELECT user_id,
                       CAST(epoch_us(date_trunc('day', ts))
                            // 86400000000 AS BIGINT) AS day,
                       CAST(epoch_us(date_trunc('month', ts))
                            // 86400000000 AS BIGINT) AS month
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            ud AS (SELECT DISTINCT user_id, day, month FROM e),
            dau AS (SELECT month, count(*)::BIGINT AS dau_sum
                    FROM ud GROUP BY month),
            mau AS (SELECT month,
                           count(DISTINCT user_id)::BIGINT AS mau
                    FROM ud GROUP BY month),
            nd AS (SELECT month,
                          count(DISTINCT day)::BIGINT AS n_days
                   FROM ud GROUP BY month)
            SELECT dau.month, nd.n_days, mau.mau,
                   round(dau.dau_sum::DOUBLE / nd.n_days, 6)
                       AS dau_avg,
                   round(dau.dau_sum::DOUBLE / nd.n_days / mau.mau,
                         6) AS stickiness
            FROM dau JOIN mau USING (month) JOIN nd USING (month)
            ORDER BY month
        """,
        "q330_pii_rate": """
            WITH x AS (
                SELECT source,
                       coalesce(regexp_matches(lower(text),
                           '[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}'
                       ), FALSE) AS em,
                       coalesce(regexp_matches(text,
                           '\d{3}[-.]\d{3}[-.]\d{4}'), FALSE)
                           AS ph
                FROM documents),
            g AS (SELECT source, count(*)::BIGINT AS n_docs,
                         (count(*) FILTER (WHERE em))::BIGINT
                             AS n_email,
                         (count(*) FILTER (WHERE ph))::BIGINT
                             AS n_phone
                  FROM x GROUP BY source)
            SELECT source, n_docs, n_email, n_phone,
                   round(1000.0 * n_email / n_docs, 6)
                       AS email_per_1k,
                   round(1000.0 * n_phone / n_docs, 6)
                       AS phone_per_1k
            FROM g ORDER BY source
        """,
        "q331_sentence_stats": """
            WITH x AS (
                SELECT lang,
                       coalesce(length(regexp_extract_all(
                           text, '[.!?]+')), 0)::BIGINT AS s,
                       coalesce(length(regexp_extract_all(
                           lower(text), '\w+')), 0)::BIGINT AS w
                FROM documents),
            g AS (SELECT lang, count(*)::BIGINT AS n_docs,
                         sum(s)::BIGINT AS n_sentences,
                         sum(w)::BIGINT AS n_words
                  FROM x GROUP BY lang)
            SELECT lang, n_docs, n_sentences, n_words,
                   CASE WHEN n_sentences > 0 THEN
                       round(n_words::DOUBLE / n_sentences, 6)
                   END AS words_per_sentence
            FROM g ORDER BY lang
        """,
        "q332_nonascii_share": """
            WITH x AS (
                SELECT source,
                       coalesce(length(text), 0)::BIGINT AS ch,
                       coalesce(length(text)
                                - length(regexp_replace(text,
                                    '[^\\x00-\\x7F]', '', 'g')),
                                0)::BIGINT AS na
                FROM documents),
            g AS (SELECT source, sum(ch)::BIGINT AS n_chars,
                         sum(na)::BIGINT AS n_nonascii
                  FROM x GROUP BY source)
            SELECT source, n_chars, n_nonascii,
                   CASE WHEN n_chars > 0 THEN
                       round(n_nonascii::DOUBLE / n_chars, 6)
                   END AS nonascii_share
            FROM g ORDER BY source
        """,
        "q333_term_burstiness": """
            -- df counts physical document ROWS (row_number), not
            -- doc_id values — duplicate rows are separate documents
            WITH dd AS (SELECT row_number() OVER () AS rid, text
                        FROM documents),
            d AS (SELECT rid, unnest(regexp_extract_all(
                      lower(text), '\w+')) AS word
                  FROM dd),
            g AS (SELECT word, count(*)::BIGINT AS cf,
                         count(DISTINCT rid)::BIGINT AS df
                  FROM d GROUP BY word)
            SELECT word, cf, df,
                   round(cf::DOUBLE / df, 6) AS burstiness
            FROM g ORDER BY cf DESC, word LIMIT 30
        """,
        "q334_rank_overlap_rbo": """
            WITH li AS (
                SELECT l_suppkey AS s,
                       CAST(epoch_us(date_trunc('month',
                                                l_shipdate))
                            // 86400000000 AS BIGINT) AS m,
                       CAST(round(l_extendedprice
                                  * (1 - l_discount) * 100)
                            AS BIGINT) AS c
                FROM lineitem
                WHERE l_suppkey IS NOT NULL
                  AND l_shipdate IS NOT NULL
                  AND isfinite(l_extendedprice)
                  AND isfinite(l_discount)),
            g AS (SELECT m, s, sum(c)::BIGINT AS rev FROM li
                  GROUP BY m, s),
            mm AS (SELECT max(m) AS mb,
                          max(m) FILTER (WHERE m < (SELECT max(m)
                                                    FROM g)) AS ma
                   FROM g),
            ra AS (SELECT s, row_number() OVER (
                       ORDER BY rev DESC, s) AS d
                   FROM g, mm WHERE g.m = mm.ma),
            rb AS (SELECT s, row_number() OVER (
                       ORDER BY rev DESC, s) AS d
                   FROM g, mm WHERE g.m = mm.mb),
            dep AS (SELECT unnest(range(1, 21)) AS d),
            ov AS (SELECT dep.d,
                          (SELECT count(*) FROM ra, rb
                           WHERE ra.s = rb.s AND ra.d <= dep.d
                             AND rb.d <= dep.d)::BIGINT AS ov
                   FROM dep),
            w AS (SELECT d, ov,
                         pow(0.9, d - 1) * (ov::DOUBLE / d) AS term
                  FROM ov),
            acc AS (SELECT d, ov,
                           sum(term) OVER (ORDER BY d) AS num,
                           sum(pow(0.9, d - 1)) OVER (ORDER BY d)
                               AS den
                    FROM w)
            SELECT mm.ma AS month_a, mm.mb AS month_b,
                   acc.ov AS overlap_at_k,
                   round(acc.num / acc.den, 6) AS rbo
            FROM acc, mm WHERE acc.d = 20 AND mm.ma IS NOT NULL
        """,
        "q335_conversion_path_length": """
            WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) AS us,
                       event_id
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            r AS (SELECT user_id, event_type,
                         row_number() OVER (
                             PARTITION BY user_id
                             ORDER BY us, event_id) AS rn
                  FROM e),
            c AS (SELECT user_id, min(rn) - 1 AS path_len
                  FROM r
                  WHERE coalesce(event_type = 'purchase', FALSE)
                  GROUP BY user_id)
            SELECT path_len::BIGINT AS path_len,
                   count(*)::BIGINT AS n_users
            FROM c GROUP BY path_len ORDER BY path_len
        """,
        "q336_hour_anomalies": """
            WITH e AS (
                SELECT CAST(epoch_us(date_trunc('hour', ts))
                            // 3600000000 AS BIGINT) AS h
                FROM events WHERE ts IS NOT NULL),
            g AS (SELECT h, count(*)::BIGINT AS c FROM e
                  GROUP BY h),
            t AS (SELECT sum(c)::BIGINT AS s,
                         count(*)::BIGINT AS n FROM g),
            z AS (SELECT h, c,
                         round((c - (CAST(s AS DOUBLE) / n))
                               / sqrt(CAST(s AS DOUBLE) / n), 6)
                             AS z
                  FROM g, t)
            SELECT h AS hour, c AS n, z FROM z
            ORDER BY abs(z) DESC, hour LIMIT 10
        """,
        "q337_item_novelty_rate": """
            WITH x AS (
                SELECT DISTINCT l_partkey AS p,
                       CAST(epoch_us(date_trunc('month',
                                                l_shipdate))
                            // 86400000000 AS BIGINT) AS m
                FROM lineitem
                WHERE l_partkey IS NOT NULL
                  AND l_shipdate IS NOT NULL),
            act AS (SELECT m, count(*)::BIGINT AS n_active FROM x
                    GROUP BY m),
            fst AS (SELECT p, min(m) AS fm FROM x GROUP BY p),
            nw AS (SELECT fm AS m, count(*)::BIGINT AS n_new
                   FROM fst GROUP BY fm)
            SELECT act.m AS month, act.n_active,
                   coalesce(nw.n_new, 0)::BIGINT AS n_new,
                   round(coalesce(nw.n_new, 0)::DOUBLE
                         / act.n_active, 6) AS novelty_share
            FROM act LEFT JOIN nw ON act.m = nw.m ORDER BY month
        """,
        "q338_near_purchase_rate": """
            WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) AS us
                FROM events
                WHERE user_id IS NOT NULL
                  AND event_type IS NOT NULL AND ts IS NOT NULL),
            np_ AS (SELECT user_id, event_type, us FROM e
                    WHERE event_type <> 'purchase'),
            pu AS (SELECT user_id, us FROM e
                   WHERE event_type = 'purchase'),
            f AS (SELECT np_.event_type,
                         (EXISTS (SELECT 1 FROM pu
                                  WHERE pu.user_id = np_.user_id
                                    AND pu.us BETWEEN
                                        np_.us - 300000000
                                        AND np_.us + 300000000))
                             AS near
                  FROM np_)
            SELECT event_type, count(*)::BIGINT AS n,
                   (count(*) FILTER (WHERE near))::BIGINT
                       AS n_near_purchase,
                   round((count(*) FILTER (WHERE near))::DOUBLE
                         / count(*), 6) AS near_rate
            FROM f GROUP BY event_type ORDER BY event_type
        """,
        "q340_eccentricity_sample": """
            WITH RECURSIVE ps AS (
                SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                FROM lineitem
                WHERE l_partkey IS NOT NULL
                  AND l_suppkey IS NOT NULL),
            dp AS (SELECT DISTINCT p FROM ps),
            seeds AS (SELECT p FROM dp
                      ORDER BY md5(CAST(p AS VARCHAR)), p LIMIT 4),
            edges AS (SELECT 2 * p AS a, 2 * s + 1 AS b FROM ps
                      UNION ALL SELECT 2 * s + 1, 2 * p FROM ps),
            bfs(seed, node, d) AS (
                SELECT 2 * p, 2 * p, 0 FROM seeds
                UNION
                SELECT bfs.seed, e.b, bfs.d + 1
                FROM bfs JOIN edges e ON e.a = bfs.node
                WHERE bfs.d < 8),
            m AS (SELECT seed, node, min(d) AS dist FROM bfs
                  GROUP BY seed, node)
            SELECT (seed / 2)::BIGINT AS seed_part,
                   max(dist)::BIGINT AS ecc,
                   count(*)::BIGINT AS n_reached
            FROM m GROUP BY seed ORDER BY seed_part
        """,
        "q341_srm_check": """
            WITH u AS (SELECT DISTINCT user_id FROM events
                       WHERE user_id IS NOT NULL),
            s AS (SELECT (('0x' || substr(md5(CAST(user_id
                                                   AS VARCHAR)),
                                          1, 13))::BIGINT
                          < 2251799813685248) AS a
                  FROM u),
            t AS (SELECT (count(*) FILTER (WHERE a))::BIGINT AS na,
                         (count(*) FILTER (WHERE NOT a))::BIGINT
                             AS nb
                  FROM s)
            SELECT na AS n_a, nb AS n_b,
                   round((na - nb)::DOUBLE * (na - nb) / (na + nb),
                         6) AS chi2,
                   (((na - nb)::DOUBLE * (na - nb) / (na + nb))
                    > 9.0)::BIGINT AS srm_flag
            FROM t WHERE na + nb > 0
        """,
        "q342_cohort_ltv": """
            WITH p AS (
                SELECT user_id, date_trunc('month', ts) AS mon,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND coalesce(event_type = 'purchase', FALSE)
                  AND isfinite(value)),
            c AS (SELECT user_id, min(mon) AS coh FROM p
                  GROUP BY user_id)
            SELECT CAST(epoch_us(c.coh) // 86400000000 AS BIGINT)
                       AS cohort_month,
                   datediff('month', c.coh, p.mon)::BIGINT
                       AS month_offset,
                   sum(p.cents)::BIGINT AS revenue_cents,
                   count(*)::BIGINT AS n_purchases
            FROM p JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q343_type_conversion_lift": """
            WITH ut AS (
                SELECT DISTINCT user_id, event_type FROM events
                WHERE user_id IS NOT NULL
                  AND event_type IS NOT NULL),
            pu AS (SELECT DISTINCT user_id FROM ut
                   WHERE event_type = 'purchase'),
            t AS (SELECT count(DISTINCT user_id)::BIGINT AS nu,
                         (SELECT count(*) FROM pu)::BIGINT AS np
                  FROM ut),
            g AS (SELECT ut.event_type, count(*)::BIGINT AS nx,
                         (count(*) FILTER (
                              WHERE ut.user_id IN
                                  (SELECT user_id FROM pu)))
                             ::BIGINT AS nxp
                  FROM ut GROUP BY ut.event_type)
            SELECT event_type, nx AS n_users, nxp AS n_converted,
                   round((nxp::DOUBLE / nx)
                         / (t.np::DOUBLE / t.nu), 6) AS lift
            FROM g, t ORDER BY event_type
        """,
        "q344_split_balance_ks": """
            WITH x AS (
                SELECT lang, n_chars,
                       (('0x' || substr(md5(CAST(doc_id
                                                 AS VARCHAR)),
                                        1, 13))::BIGINT
                        < 3602879701896396) AS tr
                FROM documents
                WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
            c AS (SELECT lang, n_chars AS v,
                         (count(*) FILTER (WHERE tr))::BIGINT AS c1,
                         (count(*) FILTER (WHERE NOT tr))::BIGINT
                             AS c2
                  FROM x GROUP BY lang, n_chars),
            t AS (SELECT lang, sum(c1)::BIGINT AS n1,
                         sum(c2)::BIGINT AS n2
                  FROM c GROUP BY lang),
            w AS (SELECT c.lang, c.v,
                         (sum(c.c1) OVER (PARTITION BY c.lang
                                          ORDER BY c.v))::BIGINT
                             AS f1,
                         (sum(c.c2) OVER (PARTITION BY c.lang
                                          ORDER BY c.v))::BIGINT
                             AS f2
                  FROM c),
            d AS (SELECT w.lang,
                         max(abs(w.f1::DOUBLE / t.n1
                                 - w.f2::DOUBLE / t.n2)) AS ks_d
                  FROM w JOIN t ON w.lang IS NOT DISTINCT
                                   FROM t.lang
                  WHERE t.n1 > 0 AND t.n2 > 0
                  GROUP BY w.lang)
            SELECT t.lang, t.n1 AS n_train, t.n2 AS n_test,
                   round(d.ks_d, 6) AS ks_d
            FROM t LEFT JOIN d ON t.lang IS NOT DISTINCT
                                  FROM d.lang
            ORDER BY t.lang
        """,
        "q345_churn_curve": """
            WITH um AS (
                SELECT DISTINCT user_id,
                       CAST(epoch_us(date_trunc('month', ts))
                            // 86400000000 AS BIGINT) AS mlab,
                       datediff('month', DATE '1970-01-01',
                                date_trunc('month', ts))::BIGINT
                           AS midx
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            a AS (SELECT midx, mlab, count(*)::BIGINT AS n_active,
                         (count(*) FILTER (WHERE NOT EXISTS (
                              SELECT 1 FROM um n
                              WHERE n.user_id = um.user_id
                                AND n.midx = um.midx + 1)))
                             ::BIGINT AS n_churned
                  FROM um GROUP BY midx, mlab),
            mx AS (SELECT max(midx) AS mm FROM um)
            SELECT mlab AS month, n_active, n_churned,
                   round(n_churned::DOUBLE / n_active, 6)
                       AS churn_rate
            FROM a, mx WHERE midx < mx.mm ORDER BY month
        """,
        "q346_whale_curve": """
            WITH c AS (
                SELECT o_custkey,
                       sum(CAST(round(o_totalprice * 100)
                                AS BIGINT))::BIGINT AS rev
                FROM orders
                WHERE o_custkey IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY o_custkey),
            r AS (SELECT rev, ntile(10) OVER (
                      ORDER BY rev DESC, o_custkey) AS tile
                  FROM c),
            t AS (SELECT sum(rev)::BIGINT AS tot FROM c)
            SELECT tile::BIGINT AS decile,
                   count(*)::BIGINT AS n_customers,
                   sum(rev)::BIGINT AS revenue_cents,
                   round(sum(rev)::DOUBLE / t.tot, 6) AS rev_share
            FROM r, t GROUP BY tile, t.tot ORDER BY tile
        """,
        "q347_nation_hhi": """
            WITH li AS (
                SELECT l_suppkey AS s,
                       CAST(round(l_extendedprice
                                  * (1 - l_discount) * 100)
                            AS BIGINT) AS c
                FROM lineitem
                WHERE l_suppkey IS NOT NULL
                  AND isfinite(l_extendedprice)
                  AND isfinite(l_discount)),
            g AS (SELECT s, sum(c)::BIGINT AS rev FROM li
                  GROUP BY s),
            sd AS (SELECT s_suppkey AS k,
                          min(s_nationkey) AS nk
                   FROM supplier WHERE s_suppkey IS NOT NULL
                   GROUP BY s_suppkey),
            j AS (SELECT g.rev, sd.nk FROM g
                  LEFT JOIN sd ON g.s = sd.k),
            h AS (SELECT nk, count(*)::BIGINT AS n_suppliers,
                         sum(rev)::BIGINT AS t,
                         sum(rev::HUGEINT * rev) AS s2
                  FROM j GROUP BY nk)
            SELECT CAST(nk AS DOUBLE) AS nationkey, n_suppliers,
                   t AS total_cents,
                   round(CAST(s2 AS DOUBLE)
                         / (CAST(t AS DOUBLE) * t), 6) AS hhi
            FROM h ORDER BY nationkey
        """,
        "q348_dedup_savings": """
            WITH x AS (SELECT text FROM documents
                       WHERE text IS NOT NULL),
            g AS (SELECT count(*)::BIGINT AS c,
                         length(text)::BIGINT AS ch
                  FROM x GROUP BY text),
            t AS (SELECT sum(c)::BIGINT AS nd,
                         count(*)::BIGINT AS ng,
                         sum(c * ch)::BIGINT AS cb,
                         sum(ch)::BIGINT AS ca
                  FROM g)
            SELECT nd AS n_docs, ng AS n_kept,
                   cb AS chars_before, ca AS chars_after,
                   round((nd - ng)::DOUBLE / nd, 6) AS doc_savings,
                   CASE WHEN cb > 0 THEN
                       round((cb - ca)::DOUBLE / cb, 6)
                   END AS char_savings
            FROM t WHERE nd > 0
        """,
        "q349_join_cardinality_est": """
            WITH ok AS (SELECT o_orderkey AS k FROM orders
                        WHERE o_orderkey IS NOT NULL),
            lk AS (SELECT l_orderkey AS k FROM lineitem
                   WHERE l_orderkey IS NOT NULL),
            a AS (SELECT k, count(*)::BIGINT AS a FROM ok
                  GROUP BY k),
            b AS (SELECT k, count(*)::BIGINT AS b FROM lk
                  GROUP BY k),
            j AS (SELECT coalesce(a.k, b.k) AS k,
                         coalesce(a.a, 0) AS a,
                         coalesce(b.b, 0) AS b
                  FROM a FULL JOIN b ON a.k = b.k),
            e AS (SELECT sum(a * b)::BIGINT AS exact,
                         sum(CASE WHEN ('0x' || substr(
                                 md5(CAST(k AS VARCHAR)), 1, 13))
                                 ::BIGINT % 8 = 0
                                  THEN a * b ELSE 0 END)::BIGINT
                             AS samp
                  FROM j)
            SELECT exact AS exact_rows, samp AS sampled_rows,
                   (samp * 8)::BIGINT AS estimate,
                   round(abs(samp * 8 - exact)::DOUBLE / exact, 6)
                       AS rel_err
            FROM e WHERE exact > 0
        """,
        "q350_prefix_suggest": """
            WITH w AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '\w+')) AS word
                FROM documents),
            g AS (SELECT word, count(*)::BIGINT AS c FROM w
                  GROUP BY word),
            p AS (SELECT substr(word, 1, 3) AS prefix, word, c,
                         row_number() OVER (
                             PARTITION BY substr(word, 1, 3)
                             ORDER BY c DESC, word) AS rn
                  FROM g)
            SELECT prefix, word AS suggestion, c AS n
            FROM p WHERE rn = 1 AND c >= 5 ORDER BY prefix
        """,
        "q351_weekday_hour_heatmap": """
            SELECT dayofweek(ts)::BIGINT AS weekday,
                   hour(ts)::BIGINT AS hour,
                   count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q352_brand_diversity_trend": """
            WITH pd AS (SELECT p_partkey AS k,
                               min(p_brand) AS brand
                        FROM part WHERE p_partkey IS NOT NULL
                        GROUP BY p_partkey),
            li AS (
                SELECT CAST(epoch_us(date_trunc('month',
                                                l_shipdate))
                            // 86400000000 AS BIGINT) AS m,
                       pd.brand,
                       CAST(round(l_extendedprice
                                  * (1 - l_discount) * 100)
                            AS BIGINT) AS c
                FROM lineitem LEFT JOIN pd ON l_partkey = pd.k
                WHERE l_partkey IS NOT NULL
                  AND l_shipdate IS NOT NULL
                  AND isfinite(l_extendedprice)
                  AND isfinite(l_discount)),
            g AS (SELECT m, brand, sum(c)::BIGINT AS rev FROM li
                  GROUP BY m, brand),
            h AS (SELECT m, count(*)::BIGINT AS n_brands,
                         sum(rev)::BIGINT AS t,
                         sum(rev::HUGEINT * rev) AS s2
                  FROM g GROUP BY m)
            SELECT m AS month, n_brands, t AS total_cents,
                   round(1.0 - CAST(s2 AS DOUBLE)
                         / (CAST(t AS DOUBLE) * t), 6) AS diversity
            FROM h WHERE t <> 0 ORDER BY month
        """,
        "q354_behavior_coverage": """
            WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) AS us,
                       event_id
                FROM events
                WHERE user_id IS NOT NULL
                  AND event_type IS NOT NULL AND ts IS NOT NULL),
            w AS (SELECT user_id, event_type AS dst,
                         lag(event_type) OVER (
                             PARTITION BY user_id
                             ORDER BY us, event_id) AS src
                  FROM e),
            b AS (SELECT src, dst,
                         (('0x' || substr(md5(CAST(user_id
                                                   AS VARCHAR)),
                                          1, 13))::BIGINT
                          < 3602879701896396) AS tr
                  FROM w WHERE src IS NOT NULL),
            g AS (SELECT src, dst,
                         (count(*) FILTER (WHERE tr))::BIGINT AS tr,
                         (count(*) FILTER (WHERE NOT tr))::BIGINT
                             AS te
                  FROM b GROUP BY src, dst),
            tv AS (SELECT * FROM g WHERE te > 0),
            t AS (SELECT count(*)::BIGINT AS n_te,
                         (count(*) FILTER (WHERE tr > 0))::BIGINT
                             AS n_cov,
                         sum(te)::BIGINT AS mt,
                         coalesce(sum(te) FILTER (WHERE tr > 0),
                                  0)::BIGINT AS mc
                  FROM tv)
            SELECT n_te AS n_test_bigrams, n_cov AS n_covered,
                   round(n_cov::DOUBLE / n_te, 6)
                       AS vocab_coverage,
                   round(mc::DOUBLE / mt, 6) AS mass_coverage
            FROM t WHERE n_te > 0
        """,
        "q355_revenue_jumps": """
            WITH d AS (
                SELECT CAST(epoch_us(date_trunc('day',
                                                o_orderdate))
                            // 86400000000 AS BIGINT) AS day,
                       sum(CAST(round(o_totalprice * 100)
                                AS BIGINT))::BIGINT AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            w AS (SELECT day, revc,
                         (revc - lag(revc) OVER (ORDER BY day))
                             ::BIGINT AS change_cents,
                         (day - lag(day) OVER (ORDER BY day))
                             ::BIGINT AS gap_days
                  FROM d)
            SELECT day, revc, change_cents, gap_days
            FROM w WHERE change_cents IS NOT NULL
            ORDER BY abs(change_cents) DESC, day LIMIT 10
        """,
        "q356_cross_source_dups": """
            WITH d AS (
                SELECT DISTINCT md5(text) AS h, source,
                       coalesce('S' || source,
                                chr(1) || 'NULLSRC') AS k
                FROM documents WHERE text IS NOT NULL),
            p AS (SELECT a.source AS source_a,
                         b.source AS source_b
                  FROM d a JOIN d b ON a.h = b.h AND a.k < b.k),
            g AS (SELECT source_a, source_b,
                         count(*)::BIGINT AS n_shared_docs
                  FROM p GROUP BY source_a, source_b)
            SELECT source_a, source_b, n_shared_docs FROM g
            ORDER BY n_shared_docs DESC,
                     coalesce('S' || source_a, chr(1) || 'NULLSRC'),
                     coalesce('S' || source_b, chr(1) || 'NULLSRC')
            LIMIT 20
        """,
        "q281_negative_sampling_dist": """
            WITH w AS (
                SELECT word, count(*)::BIGINT AS c FROM (
                    SELECT unnest(regexp_extract_all(lower(text),
                                                     '\\w+')) AS word
                    FROM documents) GROUP BY word),
            tot AS (SELECT sum(pow(c, 0.75)) AS z FROM w)
            SELECT word, c AS n, round(pow(c, 0.75) / tot.z, 6)
                       AS prob
            FROM w, tot ORDER BY c DESC, word LIMIT 50
        """,
        "q279_props_key_profile": """
            SELECT key, count(*)::BIGINT AS n FROM (
                SELECT unnest(json_keys(props)) AS key
                FROM events
                WHERE props IS NOT NULL AND json_valid(props))
            GROUP BY key ORDER BY key
        """,
        "q275_decayed_type_scores": """
            WITH t AS (
                SELECT event_type, epoch_us(ts) AS us FROM events
                WHERE ts IS NOT NULL),
            mx AS (SELECT max(us) AS m FROM t)
            SELECT event_type, count(*)::BIGINT AS n,
                   round(sum(pow(2.0, (us - mx.m)
                                      / 604800000000.0)), 6) AS score
            FROM t, mx GROUP BY event_type ORDER BY event_type
        """,
        "q273_user_erasure_audit": """
            WITH u AS (
                SELECT user_id, count(*)::BIGINT AS n FROM events
                WHERE user_id IS NOT NULL
                GROUP BY user_id ORDER BY n DESC, user_id LIMIT 1),
            o AS (SELECT o_orderkey FROM orders
                  WHERE o_custkey = (SELECT user_id FROM u))
            SELECT (SELECT user_id FROM u)::BIGINT AS user_id,
                   (SELECT n FROM u)::BIGINT AS n_events,
                   (SELECT count(*) FROM o)::BIGINT AS n_orders,
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IN (SELECT o_orderkey FROM o)
                   )::BIGINT AS n_lineitems
            WHERE EXISTS (SELECT 1 FROM u)
        """,
        "q274_psi_value_drift": """
            WITH f AS (
                SELECT ((CAST(floor(epoch_us(ts) / 86400000000.0)
                              AS BIGINT) % 7) + 7) % 7 IN (2, 3)
                           AS wk,
                       value AS v
                FROM events
                WHERE ts IS NOT NULL AND isfinite(value)),
            e AS (SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5,
                                           0.6, 0.7, 0.8, 0.9]) AS ed
                  FROM f WHERE NOT wk),
            b AS (SELECT wk,
                         CASE WHEN v >= ed[9] THEN 9
                              WHEN v >= ed[8] THEN 8
                              WHEN v >= ed[7] THEN 7
                              WHEN v >= ed[6] THEN 6
                              WHEN v >= ed[5] THEN 5
                              WHEN v >= ed[4] THEN 4
                              WHEN v >= ed[3] THEN 3
                              WHEN v >= ed[2] THEN 2
                              WHEN v >= ed[1] THEN 1
                              ELSE 0 END AS bin
                  FROM f, e),
            g AS (SELECT unnest(generate_series(0, 9)) AS bin),
            c AS (SELECT bin,
                         (count(*) FILTER (WHERE NOT wk))::BIGINT
                             AS n_ref,
                         (count(*) FILTER (WHERE wk))::BIGINT AS n_cur
                  FROM b GROUP BY bin),
            cc AS (SELECT g.bin, coalesce(n_ref, 0)::BIGINT AS n_ref,
                          coalesce(n_cur, 0)::BIGINT AS n_cur
                   FROM g LEFT JOIN c USING (bin)),
            tot AS (SELECT sum(n_ref)::BIGINT AS nr,
                           sum(n_cur)::BIGINT AS nc FROM cc)
            SELECT bin::BIGINT AS bin, n_ref, n_cur,
                   CASE WHEN n_ref > 0 AND n_cur > 0 THEN
                       round((n_ref / CAST(nr AS DOUBLE)
                              - n_cur / CAST(nc AS DOUBLE))
                             * ln((n_ref / CAST(nr AS DOUBLE))
                                  / (n_cur / CAST(nc AS DOUBLE))), 6)
                   END AS term
            FROM cc, tot WHERE nr > 0 ORDER BY bin
        """,
        "q278_label_mrr": """
            WITH e2 AS MATERIALIZED (
                SELECT vec_id, embedding, label FROM embeddings
                WHERE embedding IS NOT NULL AND label IS NOT NULL),
            q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
                  FROM e2 WHERE vec_id IN (0, 1, 2, 3, 4, 5, 6, 7)),
            s AS (SELECT q.qid AS query_id, (e.label = q.ql) AS same,
                         row_number() OVER (
                             PARTITION BY q.qid
                             ORDER BY list_cosine_similarity(
                                          e.embedding, q.qe) DESC,
                                      e.vec_id) AS rnk
                  FROM e2 e, q WHERE e.vec_id <> q.qid)
            SELECT query_id, min(rnk)::BIGINT AS first_rank,
                   round(1.0 / min(rnk), 6) AS rr
            FROM s WHERE same GROUP BY query_id ORDER BY query_id
        """,
        "q272_hard_negatives": """
            -- NULL embeddings/labels drop on both sides; MATERIALIZED
            -- for the q24/q230 optimizer-reorder rule
            WITH e2 AS MATERIALIZED (
                SELECT vec_id, embedding, label FROM embeddings
                WHERE embedding IS NOT NULL AND label IS NOT NULL),
            q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
                  FROM e2 WHERE vec_id IN (0, 1, 2, 3)),
            s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                         e.label AS neighbor_label,
                         list_cosine_similarity(e.embedding, q.qe)
                             AS sim
                  FROM e2 e, q
                  WHERE e.vec_id <> q.qid AND e.label <> q.ql)
            SELECT query_id, rank, neighbor_id, neighbor_label FROM (
                SELECT query_id, neighbor_id, neighbor_label,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC,
                                                   neighbor_id) AS rank
                FROM s)
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "q288_did_estimate": """
            WITH d AS (
                SELECT epoch_us(date_trunc('day', o_orderdate))
                           // 86400000000 AS dayi,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            w AS (SELECT dayi, revc,
                         row_number() OVER (ORDER BY dayi) AS rn
                  FROM d),
            nn AS (SELECT count(*)::BIGINT AS n,
                          sum(revc) AS tot FROM w),
            g AS (SELECT dayi, rn,
                         abs(sum(revc) OVER (ORDER BY rn)
                             - rn * nn.tot / CAST(nn.n AS DOUBLE))
                             AS stat
                  FROM w, nn WHERE nn.n >= 2),
            cp1 AS (SELECT dayi, rn FROM g
                    ORDER BY stat DESC, dayi LIMIT 1),
            lab AS (SELECT revc,
                           (rn > (SELECT rn FROM cp1)) AS post,
                           (((dayi % 7) + 7) % 7) IN (2, 3) AS we
                    FROM w),
            m AS (SELECT
                sum(revc) FILTER (WHERE we AND post)
                    / CAST(count(*) FILTER (WHERE we AND post)
                           AS DOUBLE) AS we_post,
                sum(revc) FILTER (WHERE we AND NOT post)
                    / CAST(count(*) FILTER (WHERE we AND NOT post)
                           AS DOUBLE) AS we_pre,
                sum(revc) FILTER (WHERE NOT we AND post)
                    / CAST(count(*) FILTER (WHERE NOT we AND post)
                           AS DOUBLE) AS wd_post,
                sum(revc) FILTER (WHERE NOT we AND NOT post)
                    / CAST(count(*) FILTER (WHERE NOT we
                                            AND NOT post)
                           AS DOUBLE) AS wd_pre
                FROM lab)
            SELECT (SELECT dayi FROM cp1)::BIGINT AS cp_day,
                   round((we_post - we_pre) - (wd_post - wd_pre), 6)
                       AS did
            FROM m WHERE EXISTS (SELECT 1 FROM cp1)
        """,
        "q286_binary_segmentation": """
            WITH d AS (
                SELECT epoch_us(date_trunc('day', o_orderdate))
                           // 86400000000 AS dayi,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            w AS (SELECT dayi, revc,
                         row_number() OVER (ORDER BY dayi) AS rn
                  FROM d),
            nn AS (SELECT count(*)::BIGINT AS n,
                          sum(revc) AS tot FROM w),
            g AS (SELECT dayi, rn,
                         abs(sum(revc) OVER (ORDER BY rn)
                             - rn * nn.tot / CAST(nn.n AS DOUBLE))
                             AS stat
                  FROM w, nn WHERE nn.n >= 2),
            cp1 AS (SELECT dayi, rn, stat FROM g
                    ORDER BY stat DESC, dayi LIMIT 1),
            seg AS (SELECT w.dayi, w.revc,
                           (w.rn <= (SELECT rn FROM cp1)) AS ls,
                           row_number() OVER (
                               PARTITION BY w.rn <= (SELECT rn
                                                     FROM cp1)
                               ORDER BY w.rn) AS k
                    FROM w WHERE (SELECT count(*) FROM w) >= 2),
            st AS (SELECT ls, count(*)::BIGINT AS m,
                          sum(revc) AS tot FROM seg GROUP BY ls),
            s1 AS (SELECT seg.dayi, seg.ls,
                          abs(sum(seg.revc) OVER (PARTITION BY seg.ls
                                                  ORDER BY seg.k)
                              - seg.k * st.tot
                                / CAST(st.m AS DOUBLE)) AS stat
                   FROM seg JOIN st USING (ls)),
            s2 AS (SELECT dayi, ls, stat,
                          row_number() OVER (
                              PARTITION BY ls
                              ORDER BY stat DESC, dayi) AS rk
                   FROM s1)
            SELECT 1::BIGINT AS rank, dayi::BIGINT AS day,
                   round(stat, 6) AS stat FROM cp1
            UNION ALL
            SELECT CASE WHEN ls THEN 2 ELSE 3 END::BIGINT,
                   dayi::BIGINT, round(stat, 6)
            FROM s2 WHERE rk = 1
            ORDER BY rank
        """,
        "q284_wasserstein_drift": """
            WITH s AS (
                SELECT value AS v,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END AS g1
                FROM events
                WHERE event_type IN ('click', 'purchase')
                  AND isfinite(value)),
            c AS (
                SELECT v, count(*) FILTER (WHERE g1 = 1) AS c1,
                       count(*) FILTER (WHERE g1 = 0) AS c2
                FROM s GROUP BY v),
            tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM c),
            k AS (
                SELECT sum(c.c1) OVER (ORDER BY c.v) / tot.n1 AS f1,
                       sum(c.c2) OVER (ORDER BY c.v) / tot.n2 AS f2,
                       lead(c.v) OVER (ORDER BY c.v) - c.v AS dv
                FROM c, tot)
            SELECT coalesce((SELECT n1 FROM tot), 0)::BIGINT AS n1,
                   coalesce((SELECT n2 FROM tot), 0)::BIGINT AS n2,
                   (SELECT round(sum(abs(f1 - f2) * dv), 6) FROM k
                    WHERE dv IS NOT NULL) AS w1
        """,
        "q282_holt_backtest": """
            WITH RECURSIVE d AS (
                SELECT row_number() OVER (ORDER BY day) AS rn,
                       revc::DOUBLE AS y FROM (
                    SELECT date_trunc('day', o_orderdate) AS day,
                           sum(CAST(round(o_totalprice * 100)
                                    AS BIGINT)) AS revc
                    FROM orders
                    WHERE o_orderdate IS NOT NULL
                      AND isfinite(o_totalprice)
                    GROUP BY 1)),
            org AS (
                SELECT unnest(generate_series(
                    greatest(2, (SELECT count(*) FROM d) - 8),
                    (SELECT count(*) FROM d) - 1)) AS o),
            it(o, i, s, b) AS (
                SELECT o, 1::BIGINT,
                       (SELECT y FROM d WHERE rn = 1),
                       (SELECT y FROM d WHERE rn = 2)
                           - (SELECT y FROM d WHERE rn = 1)
                FROM org
                UNION ALL
                SELECT it.o, i + 1,
                       0.5 * d.y + 0.5 * (s + b),
                       0.3 * (0.5 * d.y + 0.5 * (s + b) - s)
                           + 0.7 * b
                FROM it JOIN d ON d.rn = i + 1 WHERE i < it.o),
            fc AS (SELECT it.o, s + b AS f FROM it WHERE i = it.o),
            er AS (SELECT abs(f - d.y) AS e
                   FROM fc JOIN d ON d.rn = fc.o + 1)
            SELECT count(*)::BIGINT AS n_origins,
                   round(avg(e), 6) AS mae
            FROM er HAVING count(*) > 0
        """,
        "q271_page_hinkley": """
            WITH d AS (
                SELECT epoch_us(date_trunc('day', o_orderdate))
                           // 86400000000 AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            w AS (SELECT day,
                         sum(revc) OVER (ORDER BY day) AS cum,
                         row_number() OVER (ORDER BY day) AS k
                  FROM d),
            tot AS (SELECT sum(revc) AS tot, count(*)::BIGINT AS n
                    FROM d),
            m AS (SELECT day,
                         cum - k * tot.tot / CAST(tot.n AS DOUBLE)
                             AS mt
                  FROM w, tot),
            p AS (SELECT day,
                         mt - min(mt) OVER (ORDER BY day) AS ph
                  FROM m)
            SELECT (SELECT count(*) FROM p)::BIGINT AS n,
                   round(ph, 6) AS ph_max, day::BIGINT AS day
            FROM p ORDER BY ph DESC, day LIMIT 1
        """,
        "q267_holt_linear": """
            WITH RECURSIVE d AS (
                SELECT row_number() OVER (ORDER BY day) AS rn,
                       revc::DOUBLE AS y FROM (
                    SELECT date_trunc('day', o_orderdate) AS day,
                           sum(CAST(round(o_totalprice * 100)
                                    AS BIGINT)) AS revc
                    FROM orders
                    WHERE o_orderdate IS NOT NULL
                      AND isfinite(o_totalprice)
                    GROUP BY 1)),
            it(i, s, b) AS (
                SELECT 1::BIGINT,
                       (SELECT y FROM d WHERE rn = 1),
                       (SELECT y FROM d WHERE rn = 2)
                           - (SELECT y FROM d WHERE rn = 1)
                WHERE (SELECT count(*) FROM d) >= 2
                UNION ALL
                SELECT i + 1,
                       0.5 * d.y + 0.5 * (s + b),
                       0.3 * (0.5 * d.y + 0.5 * (s + b) - s)
                           + 0.7 * b
                FROM it JOIN d ON d.rn = i + 1
                WHERE i < (SELECT count(*) FROM d))
            SELECT i AS n, round(s, 6) AS level, round(b, 6) AS trend,
                   round(s + 7.0 * b, 6) AS forecast7
            FROM it WHERE i = (SELECT count(*) FROM d)
        """,
        "q264_weighted_jaccard": """
            WITH c AS (
                SELECT source, word, count(*)::BIGINT AS c FROM (
                    SELECT source,
                           unnest(regexp_extract_all(lower(text),
                                                     '\\w+')) AS word
                    FROM documents WHERE source IS NOT NULL)
                GROUP BY source, word),
            tot AS (SELECT source, sum(c)::BIGINT AS t
                    FROM c GROUP BY source),
            mins AS (
                SELECT a.source AS sa, b.source AS sb,
                       sum(least(a.c, b.c))::BIGINT AS m
                FROM c a JOIN c b
                     ON a.word = b.word AND a.source < b.source
                GROUP BY 1, 2)
            SELECT sa AS source_a, sb AS source_b,
                   round(m / CAST(ta.t + tb.t - m AS DOUBLE), 6)
                       AS wjaccard
            FROM mins JOIN tot ta ON ta.source = sa
                      JOIN tot tb ON tb.source = sb
            ORDER BY 1, 2
        """,
        "q265_loo_source_impact": """
            WITH d AS (
                SELECT source, n_chars FROM documents
                WHERE source IS NOT NULL AND n_chars IS NOT NULL),
            s AS (SELECT source, count(*)::BIGINT AS ns,
                         sum(n_chars)::DOUBLE AS ts
                  FROM d GROUP BY source),
            g AS (SELECT count(*)::BIGINT AS n,
                         sum(n_chars)::DOUBLE AS t FROM d)
            SELECT source, ns AS n_docs,
                   CASE WHEN g.n - ns > 0
                        THEN round((g.t - ts) / (g.n - ns)
                                   - g.t / g.n, 6) END AS loo_delta
            FROM s, g ORDER BY source
        """,
        "q263_greedy_source_cover": """
            WITH w AS (
                SELECT DISTINCT source, word FROM (
                    SELECT source,
                           unnest(regexp_extract_all(lower(text),
                                                     '\\w+')) AS word
                    FROM documents WHERE source IS NOT NULL)),
            r1 AS (SELECT source, count(*)::BIGINT AS gain FROM w
                   GROUP BY source ORDER BY gain DESC, source LIMIT 1),
            w2 AS (SELECT * FROM w WHERE word NOT IN
                       (SELECT word FROM w
                        WHERE source = (SELECT source FROM r1))),
            r2 AS (SELECT source, count(*)::BIGINT AS gain FROM w2
                   GROUP BY source ORDER BY gain DESC, source LIMIT 1),
            w3 AS (SELECT * FROM w2 WHERE word NOT IN
                       (SELECT word FROM w2
                        WHERE source = (SELECT source FROM r2))),
            r3 AS (SELECT source, count(*)::BIGINT AS gain FROM w3
                   GROUP BY source ORDER BY gain DESC, source LIMIT 1)
            SELECT 1::BIGINT AS round, * FROM r1
            UNION ALL SELECT 2::BIGINT, * FROM r2
            UNION ALL SELECT 3::BIGINT, * FROM r3
            ORDER BY round
        """,
        "q262_hits_hubs": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                FROM lineitem
                WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
            ed AS (
                SELECT p AS src, s AS dst, 0 AS phase FROM e
                UNION ALL
                SELECT s AS src, p AS dst, 1 AS phase FROM e),
            it(i, node, val) AS (
                SELECT 0, p, 1.0::DOUBLE
                FROM (SELECT DISTINCT p FROM e)
                UNION ALL
                SELECT i + 1, ed.dst, sum(val)
                FROM it JOIN ed
                     ON ed.src = it.node AND ed.phase = i % 2
                WHERE i < 12
                GROUP BY i + 1, ed.dst)
            SELECT node::BIGINT AS partkey,
                   round(val / (SELECT sum(val) FROM it WHERE i = 12),
                         6) AS hub
            FROM it WHERE i = 12 ORDER BY 1
        """,
        "q261_sax_symbols": """
            WITH d AS (
                SELECT epoch_us(date_trunc('day', o_orderdate))
                           // 86400000000 AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            s AS (
                SELECT day, revc,
                       avg(revc) OVER () AS mu,
                       stddev_pop(revc) OVER () AS sd
                FROM d)
            SELECT day::BIGINT AS day,
                   CASE WHEN sd = 0 THEN NULL
                        WHEN (revc - mu) / sd < -0.6744897501960817
                            THEN 0
                        WHEN (revc - mu) / sd < 0 THEN 1
                        WHEN (revc - mu) / sd < 0.6744897501960817
                            THEN 2
                        ELSE 3 END::BIGINT AS sym
            FROM s ORDER BY day
        """,
        "q260_degree_assortativity": """
            WITH e AS (
                SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                FROM lineitem
                WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
            dp AS (SELECT p, count(*)::DOUBLE AS degp
                   FROM e GROUP BY p),
            dsup AS (SELECT s, count(*)::DOUBLE AS degs
                     FROM e GROUP BY s)
            SELECT count(*)::BIGINT AS n_edges,
                   round(corr(dp.degp, dsup.degs), 6) AS assort
            FROM e JOIN dp USING (p) JOIN dsup USING (s)
        """,
        "q259_markov_stationary": """
            WITH RECURSIVE tr AS (
                SELECT src, dst, count(*)::DOUBLE AS n FROM (
                    SELECT event_type AS src,
                           lead(event_type) OVER (
                               PARTITION BY user_id
                               ORDER BY ts, event_id) AS dst
                    FROM events
                    WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND event_type IS NOT NULL) s
                WHERE dst IS NOT NULL GROUP BY src, dst),
            mat AS (
                SELECT src, dst,
                       n / sum(n) OVER (PARTITION BY src) AS w
                FROM tr),
            it(i, t, p) AS (
                SELECT 0, src,
                       1.0::DOUBLE /
                           (SELECT count(DISTINCT src) FROM tr)
                FROM (SELECT DISTINCT src FROM tr)
                UNION ALL
                SELECT i + 1, m.dst, sum(it.p * m.w)
                FROM it JOIN mat m ON m.src = it.t
                WHERE i < 12 GROUP BY i + 1, m.dst)
            SELECT t AS event_type,
                   round(p / (SELECT sum(p) FROM it WHERE i = 12), 6)
                       AS prob
            FROM it WHERE i = 12 ORDER BY 1
        """,
        "q258_quadratic_fit": """
            WITH t AS (
                SELECT l_returnflag AS flag,
                       CASE WHEN ok THEN l_quantity END AS x1,
                       CASE WHEN ok THEN l_quantity * l_quantity END
                           AS x2,
                       CASE WHEN ok THEN l_extendedprice END AS y
                FROM (SELECT *,
                             (l_quantity IS NOT NULL
                              AND l_extendedprice IS NOT NULL
                              AND isfinite(l_quantity)
                              AND isfinite(l_extendedprice)) AS ok
                      FROM lineitem)),
            a AS (
                SELECT flag, count(x1)::BIGINT AS n,
                       count(DISTINCT x1) AS ndist,
                       var_pop(x1) AS v11, covar_pop(x1, x2) AS v12,
                       var_pop(x2) AS v22,
                       covar_pop(x1, y) AS g1, covar_pop(x2, y) AS g2,
                       avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my
                FROM t GROUP BY flag),
            b AS (
                SELECT flag, n, ndist,
                       (v11 * v22 - v12 * v12) AS det,
                       (v22 * g1 - v12 * g2) AS nb1,
                       (v11 * g2 - v12 * g1) AS nb2,
                       m1, m2, my
                FROM a)
            SELECT flag, n,
                   CASE WHEN ndist >= 3
                        THEN round(nb1 / det, 6) END AS b1,
                   CASE WHEN ndist >= 3
                        THEN round(nb2 / det, 6) END AS b2,
                   CASE WHEN ndist >= 3
                        THEN round(my - (nb1 / det) * m1
                                      - (nb2 / det) * m2, 6)
                        END AS icept
            FROM b ORDER BY flag
        """,
        "q251_hill_tail_index": """
            WITH s AS (
                SELECT o_totalprice AS x, o_orderkey AS k
                FROM orders
                WHERE isfinite(o_totalprice) AND o_totalprice > 0
                  AND o_orderkey IS NOT NULL),
            t AS (SELECT x FROM s ORDER BY x DESC, k LIMIT 500),
            m AS (SELECT min(x) AS xk, count(*) AS n FROM t),
            a AS (SELECT sum(ln(x / xk)) AS ls FROM t, m)
            SELECT (SELECT n FROM m)::BIGINT AS k,
                   CASE WHEN (SELECT ls FROM a) > 0
                        THEN round(1.0 + (SELECT n FROM m)
                                   / (SELECT ls FROM a), 6)
                   END AS alpha
        """,
        "q252_eventually_follows": """
            WITH s AS (
                SELECT user_id AS u, event_type AS ty, ts
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND event_type IS NOT NULL),
            g AS (SELECT u, ty, min(ts) AS mn, max(ts) AS mx
                  FROM s GROUP BY 1, 2)
            SELECT a.ty AS type_a, b.ty AS type_b,
                   count(*)::BIGINT AS n_users
            FROM g a JOIN g b
                 ON a.u = b.u AND a.ty <> b.ty AND a.mn < b.mx
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q250_kendall_tau": """
            -- O(n²) sign-pair twin of the engine's Fenwick sweep;
            -- row_number() OVER () only de-duplicates pairs (i<j) —
            -- S is permutation-invariant
            WITH s AS (
                SELECT o_totalprice AS x, epoch_us(o_orderdate) AS y
                FROM orders
                WHERE isfinite(o_totalprice)
                  AND o_orderdate IS NOT NULL),
            r AS (SELECT x, y, row_number() OVER () AS rid FROM s),
            cd AS (SELECT coalesce(sum(
                       CASE WHEN (a.x < b.x AND a.y < b.y)
                              OR (a.x > b.x AND a.y > b.y) THEN 1
                            WHEN (a.x < b.x AND a.y > b.y)
                              OR (a.x > b.x AND a.y < b.y) THEN -1
                            ELSE 0 END), 0) AS sgn
                   FROM r a JOIN r b ON b.rid > a.rid),
            nn AS (SELECT count(*) AS n FROM s),
            t1 AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS n1
                   FROM (SELECT count(*) AS c FROM s GROUP BY x)),
            t2 AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS n2
                   FROM (SELECT count(*) AS c FROM s GROUP BY y))
            SELECT n::BIGINT AS n,
                   CASE WHEN n * (n - 1) // 2 > n1
                         AND n * (n - 1) // 2 > n2
                        THEN round(sgn / sqrt(
                            CAST(n * (n - 1) // 2 - n1 AS DOUBLE)
                            * CAST(n * (n - 1) // 2 - n2 AS DOUBLE)),
                            6)
                   END AS tau_b
            FROM cd, nn, t1, t2
        """,
        "q247_auc": """
            WITH s AS (
                SELECT value AS v,
                       CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END AS y
                FROM events WHERE isfinite(value)),
            r AS (SELECT y,
                         rank() OVER (ORDER BY v)
                         + (count(*) OVER (PARTITION BY v) - 1) / 2.0
                             AS mr
                  FROM s),
            agg AS (SELECT coalesce(sum(y), 0)::BIGINT AS n1,
                           (count(*) - coalesce(sum(y), 0))::BIGINT
                               AS n0,
                           sum(CASE WHEN y = 1 THEN mr END) AS r1
                    FROM r)
            SELECT n1 AS n_pos, n0 AS n_neg,
                   CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
                        ELSE round((r1 - n1 * (n1 + 1) / 2.0)
                                   / (n1 * CAST(n0 AS DOUBLE)), 6)
                   END AS auc
            FROM agg
        """,
        "q244_source_cap_sample": """
            -- md5 of the doc_id string is the cross-language
            -- deterministic selection order (mix64 has no SQL twin)
            WITH s AS (
                SELECT source, doc_id,
                       md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents WHERE doc_id IS NOT NULL),
            r AS (SELECT source, doc_id,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY h, doc_id) AS rn
                  FROM s)
            SELECT source, doc_id FROM r WHERE rn <= 5
            ORDER BY source NULLS LAST, doc_id
        """,
        "q242_late_events": """
            WITH s AS (
                SELECT event_id, event_type, epoch_us(ts) AS us
                FROM events
                WHERE event_id IS NOT NULL AND ts IS NOT NULL),
            w AS (SELECT event_type, us,
                         max(us) OVER (ORDER BY event_id, us,
                                       event_type
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS wm
                  FROM s)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   count(*) FILTER (us + 3600000000 < wm)::BIGINT
                       AS n_late
            FROM w GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q241_lexical_diversity": """
            WITH w AS (
                SELECT source,
                       unnest(regexp_extract_all(lower(text), '\\w+'))
                           AS word
                FROM documents),
            f AS (SELECT source, word, count(*) AS c
                  FROM w GROUP BY 1, 2)
            SELECT source, sum(c)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_types,
                   round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS ttr,
                   round(count(*) FILTER (c = 1)
                         / CAST(count(*) AS DOUBLE), 6)
                       AS hapax_share
            FROM f GROUP BY source ORDER BY source NULLS LAST
        """,
        "q239_fk_orphans": """
            WITH r1 AS (
              SELECT count(*) AS n,
                     count(*) FILTER (WHERE d.k IS NULL) AS o
              FROM (SELECT o_custkey AS fk FROM orders
                    WHERE o_custkey IS NOT NULL) f
              LEFT JOIN (SELECT DISTINCT c_custkey AS k
                         FROM customer) d ON d.k = f.fk),
            r2 AS (
              SELECT count(*) AS n,
                     count(*) FILTER (WHERE d.k IS NULL) AS o
              FROM (SELECT l_orderkey AS fk FROM lineitem
                    WHERE l_orderkey IS NOT NULL) f
              LEFT JOIN (SELECT DISTINCT o_orderkey AS k
                         FROM orders) d ON d.k = f.fk),
            r3 AS (
              SELECT count(*) AS n,
                     count(*) FILTER (WHERE d.k IS NULL) AS o
              FROM (SELECT l_partkey AS fk FROM lineitem
                    WHERE l_partkey IS NOT NULL) f
              LEFT JOIN (SELECT DISTINCT p_partkey AS k
                         FROM part) d ON d.k = f.fk),
            r4 AS (
              SELECT count(*) AS n,
                     count(*) FILTER (WHERE d.k IS NULL) AS o
              FROM (SELECT l_suppkey AS fk FROM lineitem
                    WHERE l_suppkey IS NOT NULL) f
              LEFT JOIN (SELECT DISTINCT s_suppkey AS k
                         FROM supplier) d ON d.k = f.fk)
            SELECT 'orders.o_custkey->customer' AS fk,
                   n::BIGINT AS n_rows, o::BIGINT AS n_orphans FROM r1
            UNION ALL SELECT 'lineitem.l_orderkey->orders', n::BIGINT,
                   o::BIGINT FROM r2
            UNION ALL SELECT 'lineitem.l_partkey->part', n::BIGINT,
                   o::BIGINT FROM r3
            UNION ALL SELECT 'lineitem.l_suppkey->supplier',
                   n::BIGINT, o::BIGINT FROM r4
            ORDER BY 1
        """,
        "q236_snapshot_diff": """
            WITH b AS (
                SELECT CAST(floor((min(epoch_us(ts))
                                   + max(epoch_us(ts))) / 2.0)
                            AS BIGINT) AS cut
                FROM events WHERE ts IS NOT NULL),
            s AS (SELECT user_id, epoch_us(ts) AS us FROM events
                  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            o AS (SELECT user_id, count(*) AS n FROM s, b
                  WHERE us < cut GROUP BY 1),
            nn AS (SELECT user_id, count(*) AS n FROM s, b
                   WHERE us >= cut GROUP BY 1)
            SELECT coalesce(o.user_id, nn.user_id) AS user_id,
                   coalesce(o.n, 0)::BIGINT AS n_old,
                   coalesce(nn.n, 0)::BIGINT AS n_new,
                   CASE WHEN o.user_id IS NULL THEN 'added'
                        WHEN nn.user_id IS NULL THEN 'removed'
                        WHEN o.n <> nn.n THEN 'changed'
                        ELSE 'same' END AS status
            FROM o FULL JOIN nn ON o.user_id = nn.user_id
            ORDER BY 1
        """,
        "q227_winsorized_mean": """
            -- contract (q124): NULL/NaN values out on both sides;
            -- ±inf stay orderable; a NaN quantile bound (inf-inf
            -- interpolation) fails both CASE comparisons -> no clamp
            WITH v AS (SELECT event_type, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            q AS (SELECT event_type,
                         quantile_cont(value, 0.05) AS lo,
                         quantile_cont(value, 0.95) AS hi
                  FROM v GROUP BY event_type)
            SELECT v.event_type, count(*)::BIGINT AS n,
                   round(avg(CASE WHEN v.value < q.lo THEN q.lo
                                  WHEN v.value > q.hi THEN q.hi
                                  ELSE v.value END), 4) AS w_mean
            FROM v JOIN q
                 ON v.event_type IS NOT DISTINCT FROM q.event_type
            GROUP BY v.event_type ORDER BY v.event_type
        """,
        "q228_clustering_coefficient": """
            WITH pairs AS (
              SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                              greatest(a.l_suppkey, b.l_suppkey) AS v
              FROM lineitem a JOIN lineitem b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey <> b.l_suppkey
              WHERE a.l_orderkey IS NOT NULL
                AND a.l_suppkey IS NOT NULL
                AND b.l_suppkey IS NOT NULL),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM pairs e1
              JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
              JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v),
            tn AS (SELECT a AS node FROM tri
                   UNION ALL SELECT b FROM tri
                   UNION ALL SELECT c FROM tri),
            tc AS (SELECT node, count(*) AS t FROM tn GROUP BY 1),
            deg AS (SELECT node, count(*) AS d FROM
                    (SELECT u AS node FROM pairs
                     UNION ALL SELECT v FROM pairs)
                    GROUP BY 1)
            SELECT deg.node AS l_suppkey, d::BIGINT AS degree,
                   coalesce(t, 0)::BIGINT AS n_tri,
                   round(2.0 * coalesce(t, 0) / (d * (d - 1.0)), 6)
                       AS cc
            FROM deg LEFT JOIN tc ON tc.node = deg.node
            WHERE d >= 2 ORDER BY 1
        """,
        "q229_theilsen_slope": """
            WITH d AS (
                SELECT CAST(floor(epoch_us(o_orderdate)
                                  / 86400000000.0) AS BIGINT) AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            p AS (SELECT (b.revc - a.revc)
                         / CAST(b.day - a.day AS DOUBLE) AS s
                  FROM d a JOIN d b ON b.day > a.day)
            SELECT count(*)::BIGINT AS n_pairs,
                   round(quantile_cont(s, 0.5), 9) AS slope
            FROM p
        """,
        "q232_seasonal_mase": """
            WITH d AS (
                SELECT CAST(floor(epoch_us(o_orderdate)
                                  / 86400000000.0) AS BIGINT) AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            e1 AS (SELECT abs(a.revc - b.revc) AS ae
                   FROM d a JOIN d b ON b.day = a.day - 1),
            e7 AS (SELECT abs(a.revc - b.revc) AS ae
                   FROM d a JOIN d b ON b.day = a.day - 7)
            SELECT (SELECT count(*) FROM e7)::BIGINT AS n_seasonal,
                   (SELECT count(*) FROM e1)::BIGINT AS n_naive,
                   round((SELECT avg(ae) FROM e7)
                         / (SELECT avg(ae) FROM e1), 6) AS mase
        """,
        "q224_type_burstiness": """
            WITH s AS (SELECT event_type,
                              date_trunc('hour', ts) AS hour
                       FROM events WHERE ts IS NOT NULL),
            c AS (SELECT event_type, hour, count(*)::BIGINT AS n
                  FROM s GROUP BY 1, 2)
            SELECT event_type, count(*)::BIGINT AS n_hours,
                   round(var_samp(n) / avg(n), 6) AS fano
            FROM c GROUP BY 1 ORDER BY 1 NULLS LAST
        """,
        "q219_rrf_fusion": """
            WITH s AS (
                SELECT event_id, value, ts FROM events
                WHERE isfinite(value) AND ts IS NOT NULL
                  AND event_id IS NOT NULL),
            r AS (
                SELECT event_id,
                       row_number() OVER (ORDER BY value DESC,
                                          event_id) AS r1,
                       row_number() OVER (ORDER BY ts DESC,
                                          event_id) AS r2
                FROM s)
            SELECT event_id, r1::BIGINT AS r1, r2::BIGINT AS r2,
                   round(1.0 / (60 + r1) + 1.0 / (60 + r2), 9) AS rrf
            FROM r
            ORDER BY 1.0 / (60 + r1) + 1.0 / (60 + r2) DESC, event_id
            LIMIT 20
        """,
        "q216_systematic_sample": """
            WITH s AS (SELECT event_id, value FROM events
                       WHERE isfinite(value)),
            r AS (SELECT event_id, value,
                         row_number() OVER (ORDER BY value, event_id)
                             AS rn
                  FROM s)
            SELECT event_id, value FROM r
            WHERE (rn - 1) % 50 = 0 ORDER BY value, event_id
        """,
        "q217_sequence_pattern": """
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id, event_type)
                       AS seq,
                   regexp_matches(
                       string_agg(substr(event_type, 1, 1), ''
                                  ORDER BY ts, event_id, event_type),
                       '^s.*p$') AS matched
            FROM events
            WHERE event_type IS NOT NULL
            GROUP BY user_id
            ORDER BY user_id NULLS LAST
        """,
        "q218_best_split": """
            WITH s AS (
                SELECT value AS v,
                       CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END AS y
                FROM events WHERE isfinite(value)),
            c AS (SELECT v, count(*) AS n, sum(y) AS p
                  FROM s GROUP BY v),
            w AS (SELECT v,
                         sum(n) OVER (ORDER BY v) AS nl,
                         sum(p) OVER (ORDER BY v) AS pl,
                         (SELECT sum(n) FROM c) AS nt,
                         (SELECT sum(p) FROM c) AS pt
                  FROM c),
            g AS (
                SELECT v, nl, nt - nl AS nr,
                       (nl - (pl * pl + (nl - pl) * (nl - pl))
                             / CAST(nl AS DOUBLE)
                        + (nt - nl)
                        - ((pt - pl) * (pt - pl)
                           + ((nt - nl) - (pt - pl))
                             * ((nt - nl) - (pt - pl)))
                          / CAST(nt - nl AS DOUBLE)) / nt AS gini
                FROM w WHERE nl < nt)
            SELECT v AS threshold, nl::BIGINT AS n_left,
                   nr::BIGINT AS n_right, round(gini, 6) AS gini
            FROM g ORDER BY gini, v LIMIT 1
        """,
        "q214_weekly_detrended": """
            WITH d AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            w AS (
                SELECT day, revc,
                       avg(revc) OVER (ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                           AS trend,
                       count(*) OVER (ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                           AS wn
                FROM d)
            SELECT dayofweek(day)::BIGINT AS dow,
                   count(*)::BIGINT AS n,
                   round(avg(revc - trend), 6) AS detrended
            FROM w WHERE wn = 7 GROUP BY 1 ORDER BY 1
        """,
        "q215_recency_scores": """
            WITH s AS (
                SELECT user_id, value AS v, epoch_us(ts) AS tu
                FROM events
                WHERE ts IS NOT NULL AND isfinite(value)),
            t AS (SELECT max(tu) AS tmax FROM s)
            SELECT user_id, count(*)::BIGINT AS n,
                   round(sum(v * pow(2.0, -(tmax - tu)
                                     / 604800000000.0)), 6) AS score
            FROM s, t GROUP BY user_id ORDER BY user_id NULLS LAST
        """,
        "q211_rolling_window_max": """
            SELECT user_id, event_id, value,
                   max(value) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id, value
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS wmax
            FROM events WHERE isfinite(value)
            ORDER BY user_id NULLS LAST, event_id NULLS LAST, value
        """,
        "q212_asof_forward": """
            SELECT o.o_orderkey, o.o_custkey, e.ts AS next_ts
            FROM (SELECT o_orderkey, o_custkey, o_orderdate
                  FROM orders
                  WHERE o_orderkey IS NOT NULL
                    AND o_custkey IS NOT NULL
                    AND o_orderdate IS NOT NULL) o
            ASOF JOIN (SELECT user_id, ts FROM events
                       WHERE user_id IS NOT NULL
                         AND ts IS NOT NULL) e
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ORDER BY 1
        """,
        "q213_cusum_changepoint": """
            WITH d AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS revc
                FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND isfinite(o_totalprice)
                GROUP BY 1),
            w AS (
                SELECT CAST(epoch_us(day) / 86400000000 AS BIGINT)
                           AS dayi,
                       sum(revc) OVER (ORDER BY day) AS cum,
                       row_number() OVER (ORDER BY day) AS k
                FROM d),
            tot AS (SELECT sum(revc) AS tot, count(*)::BIGINT AS n
                    FROM d)
            SELECT n AS n_days, dayi AS cp_day,
                   round(abs(cum - k * tot / CAST(n AS DOUBLE)), 4)
                       AS stat
            FROM w, tot
            ORDER BY abs(cum - k * tot / CAST(n AS DOUBLE)) DESC, dayi
            LIMIT 1
        """,
        "q206_duplicate_invoices": """
            -- +0.0 projection: a.o_totalprice may be -0.0 while the
            -- engine's bit-keyed runs emit the normalized +0.0; IEEE
            -- (-0.0)+0.0 = +0.0 on both sides
            SELECT a.o_orderkey AS k1, b.o_orderkey AS k2,
                   a.o_custkey, a.o_totalprice + 0.0 AS o_totalprice
            FROM orders a JOIN orders b
              ON a.o_custkey = b.o_custkey
             AND b.o_orderkey > a.o_orderkey
             AND a.o_totalprice = b.o_totalprice
             AND abs(epoch_us(a.o_orderdate)
                     - epoch_us(b.o_orderdate)) <= 604800000000
            WHERE isfinite(a.o_totalprice) AND isfinite(b.o_totalprice)
              AND a.o_custkey IS NOT NULL
              AND a.o_orderdate IS NOT NULL
              AND b.o_orderdate IS NOT NULL
            ORDER BY 1, 2
        """,
        "q208_sorted_neighborhood": """
            -- sorted-neighborhood blocking: rank by (32-codepoint
            -- prefix, doc_id), compare each row with its next w=4
            -- neighbors; levenshtein counts BYTES (engine compares
            -- UTF-8 bytes of the same substr prefix)
            WITH s AS (
                SELECT doc_id, substr(text, 1, 32) AS key
                FROM documents WHERE text IS NOT NULL),
            r AS (
                SELECT doc_id, key,
                       row_number() OVER (ORDER BY key, doc_id) AS rk
                FROM s)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.key, b.key)::BIGINT AS dist
            FROM r a JOIN r b
                 ON b.rk > a.rk AND b.rk <= a.rk + 4
            WHERE levenshtein(a.key, b.key) <= 2
            ORDER BY 1, 2
        """,
        "q207_basket_rules": """
            WITH op AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL),
            pairs AS (
                SELECT a.p AS pa_key, b.p AS pb_key, count(*) AS sup
                FROM op a JOIN op b ON a.o = b.o AND b.p > a.p
                GROUP BY 1, 2),
            item AS (SELECT p, count(*) AS s FROM op GROUP BY p),
            tot AS (SELECT count(DISTINCT o) AS n FROM op)
            SELECT pa_key, pb_key, sup::BIGINT AS sup,
                   round(sup * n / (ia.s * CAST(ib.s AS DOUBLE)), 6)
                       AS lift
            FROM pairs JOIN item ia ON ia.p = pairs.pa_key
                       JOIN item ib ON ib.p = pairs.pb_key, tot
            ORDER BY sup * n / (ia.s * CAST(ib.s AS DOUBLE)) DESC,
                     pa_key, pb_key
            LIMIT 20
        """,
        "q203_anova_f": """
            WITH s AS (
                SELECT event_type AS g, value AS v FROM events
                WHERE isfinite(value)),
            pg AS (
                SELECT g, count(*) AS n, avg(v) AS m,
                       CASE WHEN min(v) = max(v) THEN 0
                            ELSE var_samp(v) * (count(*) - 1) END
                           AS ssw
                FROM s GROUP BY g),
            tot AS (SELECT sum(n) AS nn, count(*) AS k,
                           sum(n * m) / sum(n) AS gm
                    FROM pg),
            agg AS (
                SELECT max(k) AS k, max(nn) AS nn,
                       sum(n * (m - gm) * (m - gm)) AS ssb,
                       sum(coalesce(ssw, 0)) AS ssw
                FROM pg, tot)
            SELECT k::BIGINT AS k, nn::BIGINT AS n,
                   round(CASE WHEN nn > k AND k > 1 AND ssw > 0
                              THEN (ssb / (k - 1)) / (ssw / (nn - k))
                         END, 6) AS f
            FROM agg WHERE nn IS NOT NULL
        """,
        "q204_kruskal_wallis": """
            WITH s AS (
                SELECT event_type AS g, value AS v FROM events
                WHERE isfinite(value)),
            r AS (
                SELECT g,
                       rank() OVER (ORDER BY v)
                           + (count(*) OVER (PARTITION BY v) - 1) / 2.0
                           AS mr
                FROM s),
            pg AS (SELECT g, count(*) AS n, sum(mr) AS rg
                   FROM r GROUP BY g),
            tot AS (SELECT sum(n) AS nn, count(*) AS k FROM pg),
            ties AS (
                SELECT coalesce(sum(c * c * c - c), 0) AS tsum
                FROM (SELECT count(*)::DOUBLE AS c FROM s GROUP BY v)
                     t),
            agg AS (SELECT sum(rg * rg / n) AS srg FROM pg)
            SELECT k::BIGINT AS k, nn::BIGINT AS n,
                   round(CASE WHEN nn > 1
                              AND (1 - tsum / (nn::DOUBLE * nn * nn
                                               - nn)) <> 0
                              THEN ((12.0 / (nn * (nn + 1.0)))
                                    * srg - 3 * (nn + 1.0))
                                   / (1 - tsum / (nn::DOUBLE * nn * nn
                                                  - nn))
                         END, 6) AS h
            FROM agg, tot, ties WHERE nn IS NOT NULL
        """,
        "q205_repeat_purchase": """
            WITH s AS (
                SELECT o_custkey, o_orderdate,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders
                WHERE o_custkey IS NOT NULL
                  AND o_orderdate IS NOT NULL),
            f AS (SELECT o_custkey, o_orderdate AS d1 FROM s
                  WHERE rn = 1),
            r AS (SELECT o_custkey, o_orderdate AS d2 FROM s
                  WHERE rn = 2)
            SELECT (year(d1) * 100 + month(d1))::BIGINT AS month,
                   count(*)::BIGINT AS n_customers,
                   count(*) FILTER (WHERE d2 IS NOT NULL AND
                                    d2 <= d1 + INTERVAL 30 DAY)::BIGINT
                       AS n_repeat,
                   round(count(*) FILTER (WHERE d2 IS NOT NULL AND
                                          d2 <= d1 + INTERVAL 30 DAY)
                         ::DOUBLE / count(*), 6) AS rate
            FROM f LEFT JOIN r USING (o_custkey)
            GROUP BY 1 ORDER BY 1
        """,
        "q201_long_words": """
            SELECT doc_id, generate_subscripts(xs, 1)::BIGINT AS ord,
                   unnest(xs) AS num
            FROM (SELECT doc_id,
                         regexp_extract_all(text, '[a-z]{6,}') AS xs
                  FROM documents) d
            ORDER BY 1, 2
        """,
        "q202_moving_range": """
            WITH s AS (
                SELECT user_id, value AS v, ts, event_id
                FROM events WHERE isfinite(value)),
            d AS (
                SELECT user_id, v,
                       abs(v - lag(v) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id, v)) AS mr
                FROM s)
            SELECT user_id, count(*)::BIGINT AS n,
                   round(avg(v), 6) AS xbar,
                   round(avg(mr), 6) AS mrbar
            FROM d GROUP BY user_id ORDER BY user_id NULLS LAST
        """,
        "q82_rollup_docs": """
            SELECT lang, source, grouping(lang, source)::BIGINT AS lvl,
                   count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY ROLLUP(lang, source)
            ORDER BY lvl, lang, source
        """,
        "q81_pca_power": """
            WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                               CAST(unnest(embedding) AS DOUBLE) AS v
                        FROM embeddings),
            cov AS (SELECT ei.pos AS i, ej.pos AS j, covar_pop(ei.v, ej.v) AS c
                    FROM ex ei JOIN ex ej USING (vec_id) GROUP BY 1, 2),
            v0 AS (SELECT DISTINCT i AS pos,
                          CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS v FROM cov),
            w1 AS (SELECT cov.i AS pos, sum(cov.c * v0.v) AS w
                   FROM cov JOIN v0 ON v0.pos = cov.j GROUP BY 1),
            v1 AS (SELECT pos, w / (SELECT sqrt(sum(w * w)) FROM w1) AS v FROM w1),
            w2 AS (SELECT cov.i AS pos, sum(cov.c * v1.v) AS w
                   FROM cov JOIN v1 ON v1.pos = cov.j GROUP BY 1),
            v2 AS (SELECT pos, w / (SELECT sqrt(sum(w * w)) FROM w2) AS v FROM w2),
            w3 AS (SELECT cov.i AS pos, sum(cov.c * v2.v) AS w
                   FROM cov JOIN v2 ON v2.pos = cov.j GROUP BY 1),
            v3 AS (SELECT pos, w / (SELECT sqrt(sum(w * w)) FROM w3) AS v FROM w3)
            SELECT pos, round(v, 6) AS v FROM v3 ORDER BY pos
        """,
        "q80_semdedup": """
            -- MATERIALIZED kmeans chain (round CTEs are referenced
            -- twice: inlining doubles the plan per round at sf>=1)
            -- and list_inner_product pair dots (the unnest pair join
            -- was 3e9 intermediate rows / 40 GB spill at sf1)
            WITH ex AS MATERIALIZED (
                SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings),
            c0 AS MATERIALIZED (
                SELECT vec_id AS cluster, pos, v AS c FROM ex WHERE vec_id < 8),
            d1 AS MATERIALIZED (
                SELECT e.vec_id, c.cluster, sum((e.v - c.c) * (e.v - c.c)) AS d2
                FROM ex e JOIN c0 c USING (pos) GROUP BY 1, 2),
            a1 AS MATERIALIZED (SELECT vec_id, cluster FROM (
                       SELECT vec_id, cluster,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY d2, cluster) AS rn
                       FROM d1) WHERE rn = 1),
            m1 AS MATERIALIZED (
                SELECT a.cluster, e.pos, avg(e.v) AS c
                FROM a1 a JOIN ex e USING (vec_id) GROUP BY 1, 2),
            c1 AS MATERIALIZED (
                SELECT c0.cluster, c0.pos, coalesce(m1.c, c0.c) AS c
                FROM c0 LEFT JOIN m1 ON c0.cluster = m1.cluster
                                    AND c0.pos = m1.pos),
            d2_ AS MATERIALIZED (
                SELECT e.vec_id, c.cluster, sum((e.v - c.c) * (e.v - c.c)) AS d2
                FROM ex e JOIN c1 c USING (pos) GROUP BY 1, 2),
            a2 AS MATERIALIZED (SELECT vec_id, cluster FROM (
                       SELECT vec_id, cluster,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY d2, cluster) AS rn
                       FROM d2_) WHERE rn = 1),
            m2 AS MATERIALIZED (
                SELECT a.cluster, e.pos, avg(e.v) AS c
                FROM a2 a JOIN ex e USING (vec_id) GROUP BY 1, 2),
            c2 AS MATERIALIZED (
                SELECT c1.cluster, c1.pos, coalesce(m2.c, c1.c) AS c
                FROM c1 LEFT JOIN m2 ON c1.cluster = m2.cluster
                                    AND c1.pos = m2.pos),
            d3 AS MATERIALIZED (
                SELECT e.vec_id, c.cluster, sum((e.v - c.c) * (e.v - c.c)) AS d2
                FROM ex e JOIN c2 c USING (pos) GROUP BY 1, 2),
            a3 AS MATERIALIZED (SELECT vec_id, cluster FROM (
                       SELECT vec_id, cluster,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY d2, cluster) AS rn
                       FROM d3) WHERE rn = 1),
            nrm AS MATERIALIZED (
                SELECT vec_id, sqrt(sum(v * v)) AS nm FROM ex GROUP BY 1),
            emb2 AS MATERIALIZED (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS lv
                FROM embeddings),
            dots AS (SELECT ai.vec_id AS vi, aj.vec_id AS vj,
                            list_inner_product(ei.lv, ej.lv) AS dot
                     FROM a3 ai JOIN a3 aj ON ai.cluster = aj.cluster
                                          AND aj.vec_id < ai.vec_id
                     JOIN emb2 ei ON ei.vec_id = ai.vec_id
                     JOIN emb2 ej ON ej.vec_id = aj.vec_id),
            dup AS (SELECT DISTINCT d.vi AS vec_id
                    FROM dots d
                    JOIN nrm ni ON ni.vec_id = d.vi
                    JOIN nrm nj ON nj.vec_id = d.vj
                    WHERE d.dot / (ni.nm * nj.nm) >= 0.9)
            SELECT a3.vec_id, a3.cluster,
                   (dup.vec_id IS NULL) AS keep
            FROM a3 LEFT JOIN dup USING (vec_id) ORDER BY a3.vec_id
        """,
        "q79_bigram_topk": r"""
            WITH toks AS (
              SELECT regexp_extract_all(lower(text), '\w+') AS ws FROM documents
            ),
            idx AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                    FROM toks),
            bg AS (SELECT ws[i] || ' ' || ws[i + 1] AS bigram FROM idx)
            SELECT bigram, count(*)::BIGINT AS n FROM bg GROUP BY bigram
            ORDER BY n DESC, bigram LIMIT 20
        """,
        "q20_exact_dedup": """
            SELECT md5(text) AS content_hash, min(doc_id)::BIGINT AS keep_doc_id,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY md5(text) ORDER BY content_hash
        """,
        "q48_dedup_corpus": """
            SELECT doc_id, text FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
            ORDER BY doc_id
        """,
        "q221_knn_classify": """
            WITH pool AS MATERIALIZED (
                SELECT vec_id, embedding, label FROM embeddings
                WHERE embedding IS NOT NULL AND label IS NOT NULL
                  AND vec_id >= 50),
            q AS MATERIALIZED (
                SELECT vec_id AS qid, embedding AS qe FROM embeddings
                WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
                  AND vec_id < 50),
            s AS (SELECT q.qid, p.label,
                         row_number() OVER (PARTITION BY q.qid
                             ORDER BY list_cosine_similarity(
                                 p.embedding, q.qe) DESC, p.vec_id)
                             AS rn
                  FROM pool p, q),
            v AS (SELECT qid, label, count(*) AS c FROM s
                  WHERE rn <= 3 GROUP BY 1, 2)
            SELECT qid AS vec_id, label AS pred_label FROM (
                SELECT qid, label,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY c DESC, label) AS r
                FROM v) WHERE r = 1 ORDER BY 1
        """,
        "q24_knn_bruteforce": """
            -- NULL vectors drop on both sides; the filter lives in a
            -- MATERIALIZED CTE — inlined, the optimizer reorders and
            -- evaluates list_cosine_similarity on the NULL row first
            WITH e2 AS MATERIALIZED (SELECT vec_id, embedding
                        FROM embeddings
                        WHERE embedding IS NOT NULL),
            q AS (SELECT vec_id AS qid, embedding AS qe FROM e2
                       WHERE vec_id IN (0, 1, 2, 3)),
            s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(e.embedding, q.qe) AS sim
                  FROM e2 e, q WHERE e.vec_id <> q.qid)
            SELECT query_id, rank, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rank
                FROM s)
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "q27_neardup_cosine": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95
            ORDER BY vec_a, vec_b
        """,
    }
