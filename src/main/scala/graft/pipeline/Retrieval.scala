package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
    // ONE shuffle, zero driver-paced rounds: candidates are a RANKING
    // (bounded per query by construction — the scale-shape note above),
    // so the whole k-round greedy selection folds into a per-query
    // higher-order expression over the collected candidate list instead
    // of k materialized join+window rounds (which cost 4-5 driver jobs
    // a round — guide §1: the loop's cost was its job chain, not data).
    // Every comparison below runs under Spark's OWN expression
    // semantics (struct-lexicographic `<`, array_max, IEEE double ops
    // in the identical literal/cast shape), so scores and pick order
    // are bit-identical to the former join+window rounds — RetrievalSpec
    // pins the arithmetic and the gates pin it against the oracle.
    val grouped = cand.groupBy(col(queryIdCol))
      .agg(collect_list(struct(col(idCol).as("__id"), col("__rel"),
        col("__v"))).as("__cs"))
    def mmr(rel: Column, ms: Column): Column =
      (lit(lambdaPct) * rel / lit(100)) - (lit(100 - lambdaPct) * ms / lit(100))
    // capPerGroup(rankBy = (-mmr, id), k = 1) picked the row MINIMIZING
    // (-mmr, id) under Spark's sort order — replicated as an argmin fold
    // with a struct-lexicographic compare (same NaN-largest / -0.0==0.0
    // / nulls-first semantics by construction)
    def keyOf(x: Column): Column =
      struct((-x("__mmr")).as("__o"), x("__id").as("__i"))
    val emptySel: Column = slice(
      transform(col("__cs"), c => struct(lit(1).as("__rank"),
        c("__id").as("__id"), lit(0.0).as("__mmr"), c("__v").as("__v"))),
      1, 0)
    val sel = aggregate(sequence(lit(1), lit(k)), emptySel, (s, j) => {
      val remaining = filter(col("__cs"),
        c => !exists(s, x => x("__id") === c("__id")))
      val scored = transform(remaining, c =>
        struct(j.cast("int").as("__rank"), c("__id").as("__id"),
          mmr(c("__rel"),
            when(size(s) === 0, lit(0.0)).otherwise(
              array_max(transform(s,
                x => Similarity.cosine(c("__v"), x("__v"))))))
            .as("__mmr"),
          c("__v").as("__v")))
      val pick = aggregate(
        slice(scored, lit(2), greatest(size(scored) - 1, lit(0))),
        get(scored, lit(0)),
        (b, c) => when(keyOf(c) < keyOf(b), c).otherwise(b))
      when(size(scored) === 0, s).otherwise(concat(s, array(pick)))
    })
    grouped.select(col(queryIdCol), explode(sel).as("__p"))
      .select(col(queryIdCol), col("__p")("__rank").as("rank"),
        col("__p")("__id").as(idCol), col("__p")("__mmr").as("mmr_score"))
  }

  /** Ranking-quality evaluation against a relevance ground truth — the
    * IR metrics a retrieval stack is tuned by: per query,
    * `(n_rel, n_hits, recall, mrr, ap, ndcg)` at cutoff `k`. Binary
    * relevance: a result row is a hit iff its (query, id) appears in
    * `truth`.
    *
    * Every metric is DETERMINISTIC double arithmetic an oracle replays
    * bit-for-bit — the knnEval discipline extended to ranking:
    *  - recall = n_hits / n_rel, mrr = 1/first-hit-rank — single IEEE
    *    divisions;
    *  - ap (average precision) = Σ_i (i+1)/ranks[i] / n_rel over the
    *    SORTED hit ranks — each term one division, summed left-to-right
    *    by an `aggregate` fold over the sorted list (no FP-aggregation
    *    order to drift);
    *  - ndcg uses NO in-plan logarithm (log/ln differ by ulps across
    *    engines and would break hash oracles): the k discount values
    *    1/log2(r+1) and their prefix sums are computed ONCE driver-side
    *    and inlined as literals, so DCG is a fold of literal lookups
    *    and IDCG a single literal lookup at min(n_rel, k).
    *
    * Scale shape: `results` is a ranking (queries × k, bounded) and
    * `truth` a relevance set (queries × judged, bounded) — one
    * semi-join, two bounded aggregations, no corpus anywhere.
    */
  def evalRanking(results: DataFrame, truth: DataFrame, queryIdCol: String,
                  idCol: String, rankCol: String = "rank",
                  k: Int = 10, relCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val discounts: Seq[Double] =
      (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
    val res = results
      .select(col(queryIdCol).as("__q"), col(idCol).as("__id"),
        col(rankCol).cast("long").as("__rank"))
      .filter(col("__rank") <= k)
    // every truth row IS relevant; the optional grade only weights the
    // gain ladder. Graded gain: (1 << rel) - 1 — the standard
    // exponential gain, computed in integers then widened exactly.
    // The cap is ENFORCED, not assumed: rel must sit in [1, 31] (2³¹−1
    // is far inside a double's exact-integer range; rel ≥ 63 would
    // shift into the sign bit and rel ≳ 53 would round, both producing
    // silently-garbage NDCG) — a grade outside the envelope fails the
    // job loudly instead.
    val tr = relCol match {
      case Some(rc) =>
        val rel = col(rc).cast("long")
        truth.select(col(queryIdCol).as("__q"), col(idCol).as("__id"),
          when(rel.isNull || rel < 1L || rel > 31L,
            raise_error(concat(lit(s"evalRanking: relevance grade '$rc' must " +
              "be in [1, 31], got "), coalesce(rel.cast("string"), lit("null")))))
            .otherwise(rel).as("__rel")).distinct()
      case None => truth.select(col(queryIdCol).as("__q"),
        col(idCol).as("__id"), lit(1L).as("__rel")).distinct()
    }
    def gain(rel: org.apache.spark.sql.Column) =
      (call_function("shiftleft", lit(1L), rel.cast("int")) - lit(1L))
        .cast("double")
    // per-query truth: count + grades sorted DESC for the ideal DCG
    val nRel = tr.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"),
      reverse(sort_array(collect_list(col("__rel")))).as("__trels"))
    val hitRanks = res.join(tr, Seq("__q", "__id"))
      .groupBy(col("__q"))
      .agg(sort_array(collect_list(struct(col("__rank"), col("__rel"))))
        .as("__hits"))
    val joined = nRel.join(hitRanks, Seq("__q"), "left")
      .select(col("__q"), col("n_rel"), col("__trels"),
        coalesce(transform(col("__hits"), h => h.getField("__rank")),
          typedLit(Seq.empty[Long])).as("__ranks"),
        coalesce(col("__hits"),
          array().cast("array<struct<__rank:bigint,__rel:bigint>>"))
          .as("__hits"))
    val nHits = size(col("__ranks")).cast("long")
    // Σ (i+1)/ranks[i] over sorted hit ranks, left-to-right: transform
    // carries the 0-based position, aggregate folds in list order
    val apSum = aggregate(
      transform(col("__ranks"),
        (r, i) => (i.cast("double") + lit(1.0)) / r.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val dcg = aggregate(
      transform(col("__hits"), h =>
        gain(h.getField("__rel")) *
          element_at(typedLit(discounts), h.getField("__rank").cast("int"))),
      lit(0.0), (acc, v) => acc + v)
    // ideal DCG: the grades sorted best-first laid onto ranks 1..k
    val idcg = aggregate(
      transform(slice(col("__trels"), 1, k),
        (rel, i) => gain(rel) * element_at(typedLit(discounts), i + 1)),
      lit(0.0), (acc, v) => acc + v)
    joined.select(col("__q").as(queryIdCol), col("n_rel"), nHits.as("n_hits"),
      (nHits.cast("double") / col("n_rel").cast("double")).as("recall"),
      when(nHits === 0L, lit(0.0))
        .otherwise(lit(1.0) / element_at(col("__ranks"), 1).cast("double"))
        .as("mrr"),
      (apSum / col("n_rel").cast("double")).as("ap"),
      when(nHits === 0L, lit(0.0)).otherwise(dcg / idcg).as("ndcg"))
  }
}
