package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition ops — fusing a lexical ranking
  * (BM25 / posting-list retrieval) with a dense ranking (ANN /
  * brute-force cosine) into one hit list, the standard recipe for
  * RAG-corpus retrieval and for dedup-candidate generation that
  * neither tier catches alone.
  *
  * Scale shape: fusion inputs are RANKINGS — bounded at queries × k
  * rows by construction — so the full-outer join and per-query top-k
  * here are trivially cheap at any corpus size; all the 100-TB weight
  * lives in the tiers that PRODUCE the rankings ([[LexIndex]]'s
  * term-pruned postings, [[AnnIndex]]'s bucket-pruned codes), which
  * carry their own scale contracts.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack & Clarke's RRF): each ranking
    * contributes `1/(kRrf + rank)` for every (query, id) it ranked,
    * missing entries contribute 0, and ids re-rank per query by the
    * fused score (ties broken by id). The arithmetic is two IEEE
    * double divisions summed in fixed (a, b) order, so an oracle
    * replays the score bit-for-bit — the gate pins the SCORE, not
    * just the order.
    *
    * Inputs need columns (`queryIdCol`, `idCol`, `rankCol`); ranks
    * are 1-based as every ranking op here emits them. Output:
    * `(queryIdCol, rank, idCol, rank_a, rank_b, rrf_score)` with
    * `rank_a`/`rank_b` null where a tier missed the id.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, queryIdCol: String, idCol: String,
              rankCol: String = "rank", k: Int = 10, kRrf: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(kRrf >= 0, s"kRrf must be non-negative, got $kRrf")
    val la = a.select(col(queryIdCol), col(idCol),
      col(rankCol).cast("long").as("rank_a"))
    val lb = b.select(col(queryIdCol), col(idCol),
      col(rankCol).cast("long").as("rank_b"))
    val fused = la.join(lb, Seq(queryIdCol, idCol), "full_outer")
      .select(col(queryIdCol), col(idCol), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(kRrf.toLong) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toLong) + col("rank_b")), lit(0.0)))
          .as("rrf_score"))
    graft.operators.Sampling.capPerGroup(fused,
        groupCols = Seq(queryIdCol),
        rankBy = Seq(-col("rrf_score"), col(idCol)),
        k = k, rankName = "rank")
      .select(col(queryIdCol), col("rank"), col(idCol),
        col("rank_a"), col("rank_b"), col("rrf_score"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein): pick
    * `k` results per query greedily, each step taking the candidate
    * maximizing `λ·relevance − (1−λ)·max cosine to the already-picked`
    * — the standard diversity repair for retrieval feeding RAG context
    * windows or for diverse exemplar selection from a near-dup-heavy
    * corpus (top-k without it returns k paraphrases of one document).
    *
    * Determinism/oracle discipline: λ rides as an integer percent, so
    * the score is `(λpct·rel)/100 − ((100−λpct)·maxsim)/100` — a fixed
    * sequence of IEEE double ops an oracle replays bit-for-bit; ties
    * break by id. Candidates with zero-norm vectors are the caller's
    * problem (cosine is NaN there, as in every cosine op here).
    *
    * Scale shape: `candidates` is already a RANKING — queries × kCand
    * rows, bounded by construction — so the k greedy rounds are joins
    * between bounded frames (remaining × selected ≤ kCand·k rows per
    * query), driver-paced like every finite-recurrence loop here, with
    * per-round lineage truncation. Nothing grows with the corpus.
    *
    * Input needs (`queryIdCol`, `idCol`, `scoreCol`, `vecCol`); output
    * `(queryIdCol, rank, idCol, mmr_score)`, rank 1..k (fewer where a
    * query ran out of candidates).
    */
  def mmrRerank(candidates: DataFrame, queryIdCol: String, idCol: String,
                scoreCol: String, vecCol: String, k: Int,
                lambdaPct: Int = 70): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambdaPct >= 0 && lambdaPct <= 100,
      s"lambdaPct must be in [0, 100], got $lambdaPct")
    val cand = candidates.select(col(queryIdCol), col(idCol),
        col(scoreCol).cast("double").as("__rel"), col(vecCol).as("__v"))
      .transform(graft.Checkpoints.materialize)
    def mmr(ms: org.apache.spark.sql.Column) =
      (lit(lambdaPct) * col("__rel") / lit(100)) -
        (lit(100 - lambdaPct) * ms / lit(100))
    def pick(scored: DataFrame, rank: Int): DataFrame =
      graft.operators.Sampling.capPerGroup(scored,
          groupCols = Seq(queryIdCol),
          rankBy = Seq(-col("__mmr"), col(idCol)),
          k = 1, rankName = "__pick")
        .select(col(queryIdCol), col(idCol), col("__v"),
          col("__mmr"), lit(rank).as("rank"))
    var selected = pick(cand.withColumn("__mmr", mmr(lit(0.0))), 1)
      .transform(graft.Checkpoints.materialize)
    for (j <- 2 to k) {
      val remaining = cand.join(
        selected.select(col(queryIdCol), col(idCol)),
        Seq(queryIdCol, idCol), "left_anti")
      val sims = remaining
        .join(selected.select(col(queryIdCol), col("__v").as("__sv")),
          Seq(queryIdCol))
        .groupBy(col(queryIdCol), col(idCol))
        .agg(max(Similarity.cosine(col("__v"), col("__sv"))).as("__ms"))
      val scored = remaining.join(sims, Seq(queryIdCol, idCol))
        .withColumn("__mmr", mmr(col("__ms")))
      selected = selected.unionByName(pick(scored, j))
        .transform(graft.Checkpoints.materialize)
    }
    selected.select(col(queryIdCol), col("rank"), col(idCol),
      col("__mmr").as("mmr_score"))
  }
}
