#!/usr/bin/env python3
"""Dev-only DuckDB baseline timer: runs the headline queries' oracle SQL
at a given scale factor and prints per-query wall seconds (markdown
table row format). This supplies the numeric referent for "within 2x of
baseline" in BASELINE.md — the reference engine itself publishes no
numbers.

Usage: python3 tools/bench_oracle.py <verifyOutDir> <sfDir> [runs]
  <verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
  GRAFT_BENCH_ONLY=a,b,c restricts to a subset of the headline list
  (same contract as graft.Bench's SPARK_GRAFT_BENCH_ONLY).
Timing: best of `runs` (default 3) fully-materialized executions per
query, single DuckDB connection, all cores.
"""
import json
import os
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# keep in sync with graft.Bench.headline
HEADLINE = [
    "ts_range", "ts_range_min", "ts_sample_by", "ts_where",
    "q1_pricing", "q3_top_revenue", "q5_region_volume",
    "win_top3_per_user", "win_sessionize", "agg_hourly_rollup",
    "text_stats", "dedup_exact", "dedup_minhash", "dedup_simhash",
    "sim_topk_brute", "sim_topk_lsh", "sim_topk_ivf",
    "asof_join", "range_join", "session_window_agg", "dedup_clusters",
    "join_bucketed_revenue",
    "text_quality_gopher", "decontam_overlap", "zorder_layout",
    "dedup_incremental", "pack_sequences", "mix_plan", "mm_frame_sample",
    "sim_topk_mrl",
    "dedup_semantic", "text_pii_redact", "text_dup_blocks",
    "dedup_blocklist", "text_similar_rare", "pack_length_buckets",
    "events_json_extract", "agg_rollup_sets", "agg_incremental_rollup",
    "pipeline_curate_corpus", "text_lm_surprisal", "sim_topk_ivf_pq",
    "text_lm_bigram",
    # round-7 additions (keep in sync with graft.Bench.headline)
    "text_rep_ngram", "text_classifier", "win_ewma", "ts_counter_increase",
    "win_top3_agg",
    # round-8 additions (keep in sync with graft.Bench.headline)
    "win_anomaly", "win_rolling_median", "agg_corr", "asof_join_nearest",
    "stream_top3", "dedup_containment", "pack_chunk_overlap",
    "agg_sketch_merge", "agg_funnel", "emb_pca", "pipeline_pretrain_shards",
    "text_strip_html", "text_fix_mojibake", "ts_sample_lttb",
    "sim_hard_negatives", "profile_events", "text_ttr",
    "text_quality_calibrated", "pipeline_web_ingest",
    # round-9 additions (keep in sync with graft.Bench.headline)
    "dedup_minhash_skew", "graph_pagerank", "graph_triangles",
    "text_bm25", "search_fuzzy", "mix_hosts", "mm_jpeg_pixels",
    "probe_train_quality",
]


def main(out_dir: str, sf_dir: str, runs: int = 3) -> int:
    only = os.environ.get("GRAFT_BENCH_ONLY")
    # GRAFT_BENCH_ONLY may also name non-headline gate keys (scale-proof
    # sweeps); they resolve from oracle_sql.json like any other
    if only:
        wanted = only.split(",")
        head = set(HEADLINE)
        names = [n for n in HEADLINE if n in set(wanted)] + \
            [n for n in wanted if n not in head]
    else:
        names = HEADLINE
    # per-query wall ceiling (seconds): a quadratic re-derivation in the
    # embedded engine (minhash at 150k docs) must report '>cap', not
    # stall the whole sweep
    cap = float(os.environ.get("GRAFT_BENCH_TIMEOUT", "0") or 0)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    total = 0.0
    any_timeout = False
    print(f"| query | duckdb sec (best of {runs}) |")
    print("|---|---|")
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            print(f"| {name} | (no oracle) |")
            continue
        best = None
        timed_out = False
        for _ in range(runs):
            t0 = time.monotonic()
            if cap > 0:
                import threading
                timer = threading.Timer(cap, con.interrupt)
                timer.start()
                try:
                    con.execute(sql).fetchall()
                except duckdb.InterruptException:
                    timed_out = True
                finally:
                    timer.cancel()
            else:
                con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
            if timed_out:
                break
        if timed_out:
            # the interrupted rep's wall time is ~cap, not the query's
            # cost — keep it OUT of the completed total (the bench_pair
            # duck_completed convention) and flag the total as partial
            any_timeout = True
            print(f"| {name} | >{cap:.0f} (timed out) |")
        else:
            total += best
            print(f"| {name} | {best:.3f} |")
    suffix = " (completed queries only; some timed out)" if any_timeout else ""
    print(f"| **total** | **{total:.3f}**{suffix} |")
    return 0


if __name__ == "__main__":
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sys.exit(main(sys.argv[1], sys.argv[2], runs))
