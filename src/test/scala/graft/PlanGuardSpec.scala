package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression net over EVERY gate query: an unbounded
  * nested-loop join sneaking into a previously-hash-joined plan is the
  * classic silent 100×-at-scale regression — correctness gates never
  * see it. Queries on the allowlist are the documented bounded cases
  * (scalar-row cross joins, or verify tiers whose quadratic side is a
  * broadcast query set / explicitly capped candidate set).
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reviewed bounded nested-loop joins (verdict-audited):
    *  - q_validate_summary, q_heavy_hitters: scalar-row cross joins
    *    (summary counts / sketch row / total count)
    *  - q_sim_topk, q_cos_neardup: brute-force similarity tiers — the
    *    quadratic side is the broadcast query set, by design
    *  - q_ngram_jaccard: the documented O(n²) exact-verify tier,
    *    explicitly bounded upstream
    *  - q_sim_ivf: recall contract computes the in-plan exact top-k
    *    against the (bounded, broadcast) query rows
    */
  private val boundedNestedLoop = Set(
    "q_validate_summary", "q_heavy_hitters", "q_sim_topk",
    "q_cos_neardup", "q_ngram_jaccard", "q_sim_ivf",
    "q_containment", // same bounded verify tier as q_ngram_jaccard
    "q_bm25",        // scalar-row cross join: the single (N, avgdl, df_t) stats row
    "q_pq_adc",      // ADC scan: quadratic side is the broadcast query set (like q_sim_topk)
    "q_jsonl_roundtrip", // scalar-row cross join: the 1-row quarantine count
                         // (global agg, no grouping) broadcast onto every row —
                         // the lazy replacement for the old eager count()
    "q_csv_roundtrip",   // identical shape: the CSV quarantine count rides as
                         // the same 1-row broadcast cross join
    "q_mix_weights",     // scalar-row cross join: the 1-row T_max min-reduction
                         // broadcast onto the |groups|-row quota frame
    "q_term_drift",      // scalar-row cross joins: the two 1-row corpus totals
                         // (N_a, N_b) broadcast onto the vocab-keyed join
    "q_int8_topk",       // scalar-row scale cross join + broadcast query code
                         // set (every 50th id) — same bounded shape as q_sim_topk
    "q_hamming_topk",    // broadcast query signature set (every 25th id) —
                         // corpus streams once, quadratic side is the bounded queries
    "q_contrastive",     // same bounded shape as q_int8_topk: scalar scale rows +
                         // broadcast anchor code set (every 100th id)
    "q_knn_eval",        // same bounded shape as q_int8_topk (the ranking inside
                         // knnEval): scalar scale row + broadcast query code set
    "q_vocab_coverage",  // 1-row corpus-total aggregate broadcast onto the
                         // (checkpoint-count)-row coverage frame
    "q_sem_decon",       // broadcast anti join against the bounded reference
                         // (eval-set) code rows + the 1-row scale scalar —
                         // same bounded shape as q_int8_topk
    "q_theta_overlap",   // scalar-row cross joins only: the click and purchase
                         // sketch frames are ONE row each (post-aggregation),
                         // as is the exact flag-aggregate row — 1×1 joins
    "q_hybrid_rrf",      // the embedded q_sim_topk dense tier: quadratic side
                         // is the 3-row broadcast query set, by design; the
                         // fusion join itself is keyed (queries × k rows).
                         // q_cfg_rrf reads the SAME fusion from a written
                         // parquet, so its returned plan carries no loop join
    "q_eval_ranking",    // the L2 ground-truth tier: quadratic side is the
                         // 5-row broadcast query set (same bounded shape as
                         // q_sim_topk); the eval itself joins rankings —
                         // queries × k rows — on keys. q_cfg_evalrank reads
                         // results/truth from written parquet, no loop join
    "q_eval_graded",     // identical shape to q_eval_ranking (graded truth)
    "q_mmr_rerank")      // the embedded bruteForceTopK CANDIDATE tier:
                         // quadratic side is the 3-row broadcast query set
                         // (q_sim_topk's shape). It became plan-visible when
                         // mmrRerank stopped materializing its input — the
                         // greedy selection itself is now one per-query
                         // higher-order expression over the collected
                         // (queries × kCand, bounded) ranking, no loop join
    // q_lex_bm25 left the list in round 13: its (N, Σdl) stats are now
    // PINNED in the index's _corpus/ artifacts and injected as
    // literals, so the plan has no scalar-row cross join at all

  test("no gate query plans an unlisted cartesian/nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, TestSpark.sf)
          .queryExecution.executedPlan.toString
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (hits.nonEmpty && !boundedNestedLoop(name)) Some(name -> hits)
        else None
    }
    assert(offenders.isEmpty,
      s"unreviewed nested-loop joins: $offenders — either fix the plan or " +
        "review + allowlist with a boundedness argument")
  }

  test("allowlisted queries still contain what they were reviewed for") {
    // if a listed query LOSES its nested-loop (e.g. rewritten to a hash
    // join), the allowlist entry is stale — prune it so the net stays tight
    val stale = boundedNestedLoop.toSeq.sorted.filterNot { name =>
      val plan = SparkEntry.queries(name)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty, s"stale allowlist entries (no nested-loop left): $stale")
  }
}
