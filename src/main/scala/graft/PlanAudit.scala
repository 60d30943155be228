package graft

import org.apache.spark.sql.SparkSession

/** Prints physical plans for representative queries — the evidence that
  * layout/pushdown/broadcast decisions hold (run: sbt "runMain
  * graft.PlanAudit [sfDir]"; output reviewed into docs/PLANS.md). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "ts_range",          // parquet filter pushdown on the Long column
      "tsql_range",        // bucket partition pruning in the catalog
      "q5_region_volume",  // broadcast dims, single fact shuffle
      "dedup_minhash",     // band equality join, no cross product
      "sim_topk_brute",    // broadcast query set + windowed top-k
      "asof_join",         // union + window carry-forward, one key shuffle
      "range_join",        // binned equality-join candidates
      "dedup_simhash_pairs", // 15-bit chunk equality blocking
      "agg_salted_rollup", // two-phase salted merge
      "agg_percentiles",   // sort-rank windows, no buffering aggregate
      "sim_topk_ivf_q8",   // integer candidate scoring, broadcast probes
      "text_bpe",          // single native expression over the scan
      "ts_sample_by_pruned", // label bounds → raw-ts scan pruning (rule)
      "dedup_semantic",    // k-means cells, intra-cell equality join
      "text_pii_redact",   // pure regexp projection over the scan
      "text_dup_blocks",   // word_blocks explode, one hash shuffle
      "dedup_blocklist",   // constant bloom prefilter, candidate-only verify
      "text_similar_rare", // rare-feature posting-list equality join
      "pack_length_buckets", // broadcast quantile boundaries, scan-speed assign
      "events_json_extract", // codegen'd JSON path over the scan
      "agg_rollup_sets",   // fine-state levels, no Expand (r11 rework)
      // round-8 additions
      "agg_corr",          // fixed-point long moments, no decimal buffers
      "win_anomaly",       // 1e-4 fixed-point window sums, one keyed sort
      "asof_join_nearest", // two running frames (base + reversed sort), ONE exchange
      "dedup_containment", // posting-list-local pairs, no shingle self-join
      "pack_chunk_overlap", // sequence/posexplode generate, zero exchanges
      "agg_funnel",        // user-keyed min-agg joins, ReusedExchange prefixes
      "agg_sketch_merge",  // per-day HLL partials + union, verdict side-by-side
      // round-8 late wave
      "ts_sample_lttb",    // partial-agg window stats, broadcast anchor grid
      "text_strip_html",   // literal+regex strip chain over the scan
      "sim_hard_negatives", // triplet join suffix on the IVF search
      "text_fix_mojibake", // stepwise literal replaces, zero regex
      // round-9 additions
      "dedup_minhash_skew", // hot-band star cap: gs agg + split candidates
      "mix_hosts",         // single-pass budget: strata-sized window min
      "text_bm25",         // posting aggregation + broadcast df join
      "search_fuzzy",      // deletion-variant index, broadcast query side
      "mm_jpeg_pixels",    // row-local full baseline decode, zero exchange
      // round-10 additions
      "probe_holdout_quality", // train-slice filter + full-corpus scoring projection
      "sim_recall_pq",     // composed brute vs PQ recall, equality joins only
      // round-11 close
      "profile_events",    // bitmap + two-phase fine-group branches, no Expand
      "warc_extract",      // row-local record explode, zero exchange before agg
      "warc_links")        // regexp href explode + canonical chain, scan-speed
    interesting.foreach { name =>
      println(s"\n######## $name ########")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
