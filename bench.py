#!/usr/bin/env python
"""Benchmark harness (driver-run per round; also `--scaling`).

Plain mode: runs the headline extraction pipeline plus a representative
query set over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON
line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the plain benchmark twice in fresh processes at
num_cpus=8 and 32 on the same input (the sandbox stand-in for the
N-vs-4N-node criterion, see BASELINE.md) and prints both times plus
scaling efficiency ``eff = t8 / (4 * t32)``.

Corpus synthesis (deterministic, from documents.parquet) happens before
timing and doubles as the page-cache warmup; timing covers read ->
explode -> recognize (actor pool) -> strip -> two-phase reassembly ->
resumable partitioned write.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_REPS = int(os.environ.get("OCR_RAY_BENCH_REPS", "8"))
OUT_DIR = os.environ.get("OCR_RAY_BENCH_OUT", "/tmp/ocr_ray_bench_out")
STATS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")

QUERY_SET = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "user_sessions",
    "token_stats",
    "exact_dedup_docs",
    "minhash_dedup_pairs",
    "simhash_docs",
    "embedding_topk",
    "ann_ivf_topk",
    "media_features",
    # round-2 additions (absent from BENCH_r01's query dict)
    "ngram_jaccard_pairs",
    "order_price_quartile",
    "funnel_view_click_purchase",
    "doc_token_windows",
    "pii_redact_docs",
    "repetition_quality_docs",
    "curate_corpus",
    # round-2e additions
    "substring_dedup_docs",
    "customer_rolling_stats",
    "mixture_sample_docs",
    # round-2f additions
    "purchase_graph_pagerank",
    "classify_docs",
    "merge_changeset_orders",
    "incremental_agg_orders",
    "unigram_lm_score",
    "analyze_orders_stats",
    # round-2g additions
    "q10_returned_revenue",
    "q18_large_orders",
    "q14_promo_revenue",
    "q7_nation_volume",
    "q4_priority_count",
    "pca_embeddings",
    # round-2h additions (TPC-H shape completion)
    "extract_training_set",
    "q8_nation_market_share",
    "q12_priority_by_linestatus",
    "q13_customer_distribution",
    "q16_supplier_count_by_part_attrs",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    # round-2i additions
    "skyline_parts",
    "regr_price_by_qty",
    "cohort_retention",
    "event_pattern_users",
    "copurchase_part_pairs",
    "span_kind_stats",
    "decile_bucket_orders",
    "zscore_outliers_events",
    "purchase_graph_bfs",
    "rfm_segments",
    "corr_matrix_lineitem",
    # round-3 additions
    "media_jpeg_features",
    "media_ppm_features",
    "bpe_train_merges",
    "media_png_features",
    "media_adpcm_features",
    "extract_html_main",
    "extract_pdf_text",
    "extract_warc_main",
    "extract_html_spans",
    "extract_pdf_spans",
    "extract_warc_spans",
    "extract_mixed_spans",
    "media_gif_features",
    "orc_roundtrip_events",
    "ipc_roundtrip_documents",
    "jsonl_gz_roundtrip_events",
    "weighted_sample_docs",
    "scd2_customer_priority",
    "avro_roundtrip_events",
    "events_hopping_window",
    "skew_profile_custkey",
    "ann_pq_topk",
    # round-3 session-2 additions
    "tfrecord_roundtrip_events",
    "webdataset_roundtrip_documents",
    "media_flac_features",
    "copurchase_triangles",
    "bigram_lm_score",
    "orders_zonemap_pruned_scan",
    "mad_robust_stats_events",
    "orders_bloom_point_lookup",
    "copartitioned_customer_orders_join",
    "phrase_search_docs",
    "orders_metadata_only_stats",
    "orders_zorder_pruned_scan",
    "segment_cc_docs",
    "evolved_schema_docs",
    "media_wav_decimated_features",
    # round-3 session-3 additions
    "csv_roundtrip_events",
    "ewma_customer_orders",
    "locf_last_purchase",
    "purchase_graph_kcore",
    "extract_html_tables",
    "extract_pdf_columns",
    "wordpiece_encode_docs",
    "countmin_user_events",
    "approx_common_users",
    "media_bmp_features",
    "item_similarity_topk",
    "purchase_graph_sssp",
    "winsorize_order_prices",
    "extract_pdf_dehyphenated",
    "extract_html_links",
    "proximity_search_docs",
    "cumulative_unique_users",
    "interval_coalesce_users",
    "extract_media_captions",
    "media_phash_dedup",
    "cusum_daily_value",
    "classifier_confusion",
    "build_web_corpus",
    "media_audio_fingerprint_dedup",
    "extract_delete_mor_spans",
    "capped_sessions",
    # round-4 additions
    "inverted_index_lookup",
    "incremental_minhash_dedup",
    "ann_ivf_store_topk",
    "bm25_index_search",
    # round-5 additions
    "incremental_index_lookup",
    "incremental_bm25_search",
    "incremental_ivf_topk",
]


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.pipelines.extract import extract_and_write, extract_shard_aligned
    from ocr_ray.pipelines.queries import QUERY_FNS
    from ocr_ray.sources import read_documents

    # untimed: corpus synthesis (cached across runs) + cache warm
    corpus = ensure_corpus(SF_DIR, glyphs=True, reps=BENCH_REPS)
    n_docs = read_documents(corpus).count()

    # Headline: the shard-aligned ZERO-SHUFFLE pipeline (input rows are
    # whole documents, so reassembly is batch-local and fragment id ==
    # input shard id — see pipelines/extract.py). OCR_RAY_HEADLINE=shuffle
    # benches the hash-bucketed reassembly path instead (the plan for
    # pre-exploded / multi-source inputs). Best-of-N because this
    # sandbox's CPU timing is noisy.
    headline_mode = os.environ.get("OCR_RAY_HEADLINE", "shard")
    doc_batch = int(os.environ.get("OCR_RAY_DOC_BATCH", "4096"))
    reps_n = int(os.environ.get("OCR_RAY_BENCH_TRIALS", "3"))
    t_headline = None
    for _ in range(max(reps_n, 1)):
        shutil.rmtree(OUT_DIR, ignore_errors=True)
        t0 = time.perf_counter()
        if headline_mode == "shard":
            manifest, _ = extract_shard_aligned(
                corpus,
                OUT_DIR,
                doc_batch_size=doc_batch,
                # Task granularity: more waves pack the tail better at high
                # CPU counts; per-task driver dispatch bounds it above.
                tasks_per_cpu=int(os.environ.get("OCR_RAY_TASKS_PER_CPU", "8")),
            )
        else:
            manifest, _ = extract_and_write(
                read_documents(corpus),
                OUT_DIR,
                num_parts=max(NUM_CPUS * 2, 16),
                # 4096 docs/task: fewer, larger tasks cut the data-proportional
                # driver dispatch + per-task fixed costs (A/B'd at 5.12M docs:
                # faster at BOTH 8 and 32 CPUs); per-task heap stays ~12 MB.
                doc_batch_size=doc_batch,
                recognizer_concurrency=None,  # task pool + per-worker template cache
                num_buckets=max(NUM_CPUS * 2, 16),
                two_phase=False,
            )
        trial = time.perf_counter() - t0
        assert int(manifest["row_count"].sum()) == n_docs, (
            f"bench output rows {manifest['row_count'].sum()} != corpus docs {n_docs}"
        )
        t_headline = trial if t_headline is None else min(t_headline, trial)

    q_times: dict[str, float] = {}
    if os.environ.get("OCR_RAY_SKIP_QUERIES"):
        ray.shutdown()
        return {
            "metric": "extraction_wall_sec",
            "value": round(t_headline, 3),
            "unit": "sec",
            "queries": {},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "docs": int(n_docs),
            "docs_per_sec": round(n_docs / t_headline, 1),
            "bench_reps": BENCH_REPS,
            "headline": headline_mode,
        }
    # Persisted-store entries are "build once, query forever": their
    # metric is WARM serve latency against the committed store, so the
    # one-time build runs untimed first (otherwise the recorded number
    # flips between build+serve and serve depending on what earlier
    # sessions left under the per-user store root — the r4->r5 bench
    # diff hit exactly that).
    STORE_BACKED = [
        "inverted_index_lookup",
        "incremental_index_lookup",
        "bm25_index_search",
        "incremental_bm25_search",
        "incremental_minhash_dedup",
        "ann_ivf_store_topk",
        "incremental_ivf_topk",
    ]
    for name in STORE_BACKED:
        if name in QUERY_SET:
            QUERY_FNS[name](SF_DIR)

    for name in QUERY_SET:
        fn = QUERY_FNS[name]
        tq = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        q_times[name] = round(time.perf_counter() - tq, 3)

    result = {
        "metric": "extraction_wall_sec",
        "value": round(t_headline, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": int(n_docs),
        "docs_per_sec": round(n_docs / t_headline, 1),
        "bench_reps": BENCH_REPS,
        "headline": headline_mode,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """The two-parallelism-level protocol (BASELINE.md): the headline
    pipeline only (queries skipped), on a corpus sized so compute dominates
    fixed overhead (job startup + shuffle planning) — the sandbox stand-in
    for the N-vs-4N-node criterion, where a real run is hours long and
    per-job overhead is noise.

    This shared sandbox's wall-clock is ±30-40% (co-tenant load), so the
    two levels run INTERLEAVED (32, 8, 32, 8, ...) across the same time
    window and the efficiency is computed from each level's best — the
    standard noise-floor estimate; a sequential A-then-B measurement
    conflates load drift with scaling."""

    # 16384 reps = 81.92M docs at sf0.1: the job length where compute
    # dominates the per-job serial floor (eff is floor-bound below ~20M
    # docs; see BENCH/BASELINE.md round-2g). Corpus synthesis (~2.4 GB,
    # cached under /tmp) happens once, untimed.
    reps = int(os.environ.get("OCR_RAY_SCALING_REPS", "16384"))
    rounds = int(os.environ.get("OCR_RAY_SCALING_ROUNDS", "2"))
    # N-and-4N CPU levels ("lo,hi", hi = 4*lo). 8,32 is the headline pair;
    # 2,8 / 4,16 evidence the same 4x ratio at operating points where the
    # shared box can actually SUPPLY 4x the resources (see the engine-free
    # host probe in BENCH/BASELINE.md: at 8->32 the host's own
    # trivially-parallel ceiling is ~0.78).
    lo_n, hi_n = (
        int(x) for x in os.environ.get("OCR_RAY_SCALING_LEVELS", "8,32").split(",")
    )
    assert hi_n == 4 * lo_n, (lo_n, hi_n)

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            OCR_RAY_SKIP_QUERIES="1",
            OCR_RAY_BENCH_REPS=str(reps),
            OCR_RAY_BENCH_TRIALS=os.environ.get("OCR_RAY_BENCH_TRIALS", "2"),
            # Sink on tmpfs: on the real N-vs-4N cluster every node brings
            # its own disks, so the write path scales with nodes; on this
            # one box the single vda device is a shared non-scaling
            # resource that would masquerade as poor CPU scaling.
            OCR_RAY_BENCH_OUT=os.environ.get(
                "OCR_RAY_BENCH_OUT", "/dev/shm/ocr_ray_bench_out"
            ),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    runs: dict[int, list[dict]] = {lo_n: [], hi_n: []}
    for _ in range(rounds):
        for ncpu in (hi_n, lo_n):
            runs[ncpu].append(one(ncpu))
    lo = min(runs[lo_n], key=lambda r: r["value"])
    hi = min(runs[hi_n], key=lambda r: r["value"])
    eff = lo["value"] / (4 * hi["value"])
    return {
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}",
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"docs_per_sec_{lo_n}": lo["docs_per_sec"],
        f"docs_per_sec_{hi_n}": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        f"all_sec_{lo_n}": [r["value"] for r in runs[lo_n]],
        f"all_sec_{hi_n}": [r["value"] for r in runs[hi_n]],
        "docs": lo["docs"],
        "sf": SF_DIR,
    }


def run_compact() -> dict:
    """End-to-end small-file story at bench scale: extract -> committed
    fine-grained fragments -> ``compact_partitions`` to a coarse layout ->
    re-read the compacted output and verify rows + layout-invariant span
    checksum (compaction itself asserts the manifest-level invariants; the
    re-read proves the compacted directory is readable end to end)."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.pipelines.extract import extract_shard_aligned
    from ocr_ray.state.manifest import compact_partitions, load_manifest, read_fragments

    reps = int(os.environ.get("OCR_RAY_BENCH_REPS", "4096"))
    corpus = ensure_corpus(SF_DIR, glyphs=True, reps=reps)
    out = os.environ.get("OCR_RAY_BENCH_OUT", "/dev/shm/ocr_ray_compact_src")
    compacted = out + "-compacted"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(compacted, ignore_errors=True)

    t0 = time.perf_counter()
    manifest, _ = extract_shard_aligned(corpus, out)
    t_extract = time.perf_counter() - t0
    n_frag_src = len(manifest)
    n_docs = int(manifest["row_count"].sum())

    coarse = max(8, n_frag_src // 8)
    t0 = time.perf_counter()
    compact_partitions(out, compacted, num_parts=coarse)  # raises on mismatch
    t_compact = time.perf_counter() - t0

    new = load_manifest(compacted)
    t0 = time.perf_counter()
    rows_back = read_fragments([r["file"] for r in new.values()]).count()
    t_read = time.perf_counter() - t0
    assert rows_back == n_docs, (rows_back, n_docs)
    ray.shutdown()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(compacted, ignore_errors=True)
    return {
        "metric": "compact_roundtrip",
        "docs": n_docs,
        "fragments_src": n_frag_src,
        "fragments_compacted": len(new),
        "extract_sec": round(t_extract, 3),
        "compact_sec": round(t_compact, 3),
        "readback_sec": round(t_read, 3),
        "checksum_verified": True,  # compact_partitions raised otherwise
        "num_cpus": NUM_CPUS,
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--compact" in sys.argv:
        print(json.dumps(run_compact()))
    else:
        print(json.dumps(run_bench()))
