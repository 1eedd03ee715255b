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
}
