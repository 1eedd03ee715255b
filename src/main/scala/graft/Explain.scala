package graft

/** Plan-inspection tool: dump formatted physical plans for the headline
  * queries so pushdown/broadcast/codegen can be reviewed (not part of
  * the driver contract). Usage: runMain graft.Explain [sfDir] [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_prune", "q1_agg", "q_join_agg", "q_semi_prefetch",
        "q_diff_missing", "q_window_topn", "q_minhash_lsh",
        "q_asof_native", "q_bucket_join", "q_zorder_key",
        "q_dedup_clusters", "q_hash_refine", "q_sim_ivf",
        "q_seq_gaps", "q_running_sum", "q_cube",
        "q_cell_merge", "q_source_cap", "q_seq_pack",
        "q_embed_quant", "q_bloom_decontaminate", "q_heavy_hitters",
        "q_containment", "q_span_dedup", "q_bm25", "q_sem_dedup",
        "q_rand_proj", "q_unigram_lm", "q_pq_codes", "q_pq_adc",
        "q_kll_quantiles", "q_theta_overlap", "q_stats_prune", "q_blocklist")
    val spark = Tables.session("graft-explain", cores = 8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
