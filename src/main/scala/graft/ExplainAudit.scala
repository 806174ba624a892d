package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q_filter_project", "q1_agg", "q3_topk", "q5_multijoin", "cdc_compact", "cdc_merge",
        "dedup_minhash_lsh", "dedup_embedding_lsh", "ann_lsh", "ann_ivf", "ann_cosine_topk",
        "q_interval_join", "q_range_join", "q_grouping_sets", "q_sliding_windows",
        "text_repetition", "text_decontaminate", "text_decontaminate_bloom",
        "cdc_incr_agg", "ann_pq", "ann_ivf_pq", "text_decontaminate_filtered",
        "cdc_scd2", "q_quantile_incremental", "corpus_filtered",
        "dedup_minhash_incremental", "q_lag_lead", "q_unpivot",
        "cdc_incr_agg_minmax", "cdc_incr_agg_hll", "q_scalar_subquery",
        "sample_token_budget", "sample_mixture", "dedup_semantic_keep",
        "text_lm_score", "decontaminate_semantic", "q_string_agg",
        "cdc_expectations", "pack_chunks_sliding",
        "q_recursive_cte", "q_lateral_topn", "q_percentile_cont", "q_histogram",
        "text_bpe_pairs", "text_normalize", "corpus_outliers", "split_leakage_safe",
        "text_tfidf_topk", "q_moving_avg", "q_not_in_nulls",
        "q_higher_order", "q_regexp_funcs", "q_union_by_name", "text_bm25_topk",
        "text_rrf_fusion", "text_line_dedup", "q_map_funcs", "q_gaps_islands",
        "q_corr_moments", "q_session_window", "q_time_weighted",
        "text_domain_filter", "q_rel_division", "q_bitwise_agg",
        "corpus_drift", "sft_format", "q_profile", "pack_epoch_manifest",
        "corpus_pipeline_e2e", "q_try_funcs")) {
      println(s"========== $name ==========")
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      // keep it grep-able
      println(plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Exchange") || l.contains("Broadcast") || l.contains("WholeStageCodegen") ||
        l.contains("HashAggregate") || l.contains("Join") || l.contains("Sort") ||
        l.contains("Sessions")
      ).mkString("\n"))
    }
    spark.stop()
  }
}
