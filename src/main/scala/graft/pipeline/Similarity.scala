package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two tiers:
  *  - brute-force cosine top-k: the exact baseline. The query set is
  *    broadcast (small side), the corpus streams through once, and
  *    ranking happens in a window partitioned by query id. At scale the
  *    cost is one corpus scan per query batch — the right shape when
  *    queries ≪ corpus.
  *  - random-hyperplane LSH: per-row bit signatures (expression-only, no
  *    shuffle), bucket join for candidates, exact cosine re-ranking on
  *    candidates. This is the 100 TB path: candidate generation touches
  *    only (bucket, id) pairs.
  *
  * All vector math uses `zip_with`/`aggregate` higher-order functions in
  * double precision — codegen'd, left-to-right summation, deterministic.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass native expression (graft.functions.CosineSimilarity,
    * whole-stage-codegen'd); bitwise-equal to the zip_with/aggregate
    * composition but with no intermediate array per row.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  /** Higher-order-function composition kept as the portable reference
    * form (used by tests to cross-check the native kernel).
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-vector linear int8 quantization: (min, max, codes in 0..255).
    * The storage/bandwidth tier of the ANN stack — a float32 corpus
    * shrinks 4× before it ever hits a shuffle or a broadcast, and the
    * codes dequantize to within half a step (
    * (max−min)/255/2 ) of the original. All arithmetic is double
    * precision with a fixed operation order, so codes are engine-
    * portable (round-half-up on non-negative operands everywhere).
    * Constant vectors (max == min) code to all zeros and dequantize to
    * the constant.
    */
  def quantizeInt8(v: Column): Column = {
    val mn = array_min(v).cast("double")
    val mx = array_max(v).cast("double")
    struct(mn.as("mn"), mx.as("mx"),
      transform(v, x =>
        when(mx === mn, lit(0))
          .otherwise(round((x.cast("double") - mn) * 255.0 / (mx - mn))
            .cast("int"))).as("q"))
  }

  /** Inverse of [[quantizeInt8]]: codes back to doubles. */
  def dequantizeInt8(qv: Column): Column = {
    val mn = qv.getField("mn")
    val mx = qv.getField("mx")
    transform(qv.getField("q"),
      q => mn + q.cast("double") * (mx - mn) / 255.0)
  }

  /** Exact top-k neighbors for each query row. `queries` should be small
    * (it is broadcast); `corpus` can be arbitrarily large.
    * Output: (query_id, rank, neighbor_id, cos) — ties broken by
    * neighbor id for determinism.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      // zero-norm vectors score NaN, and Spark orders NaN LARGEST — an
      // all-zero embedding would become everyone's rank-1 neighbor
      .filter(!isnan(col("cos")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic random hyperplanes: planes(p)(d) ∈ {-1.0, +1.0} from a
    * fixed-seed PRNG (sign-only planes keep the projection exact in
    * double arithmetic).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Per-band LSH codes: band b covers planes [b·bandBits, (b+1)·bandBits);
    * its code packs the projection signs into an integer. Any number of
    * planes (bands × bandBits ≤ planes.length); expression-only.
    *
    * Tuning (random hyperplane LSH, Charikar'02): a pair at angle θ
    * matches one band with p = (1 − θ/π)^bandBits, any of B bands with
    * 1 − (1 − p)^B. Fewer bits per band = more candidates + higher
    * recall; more bands = higher recall at linear candidate cost.
    */
  def bandCodes(vecCol: Column, planes: Array[Array[Double]], bandBits: Int): Column =
    graft.functions.VectorExpressions.bandCodes(vecCol, planes, bandBits)

  /** Composed-builtin form of `bandCodes` (one dot-product column per
    * plane); kept for cross-checking the fused native kernel.
    */
  def bandCodesHof(vecCol: Column, planes: Array[Array[Double]], bandBits: Int): Seq[Column] = {
    val nBands = planes.length / bandBits
    (0 until nBands).map { b =>
      val bits = (0 until bandBits).map { i =>
        val plane = typedLit(planes(b * bandBits + i).toSeq)
        when(dot(vecCol, plane) > 0, lit(1L << i)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
  }

  /** Approximate top-k: candidates sharing any band code with the query,
    * exact cosine re-rank on candidates only. The candidate shuffle
    * carries only (band, code, id).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Array[Array[Double]], bandBits: Int = 6): DataFrame = {
    // banded frames and the candidate distinct carry IDs ONLY: exploding
    // the embedding per band and deduplicating (vec, vec) pairs would
    // put vector payloads through the shuffle once per matching band —
    // at corpus scale the payload dominates. Vectors re-join after the
    // dedup: neighbor side from the corpus, query side broadcast.
    def banded(df: DataFrame, role: String): DataFrame =
      df.select(col(idCol).as(s"${role}_id"),
        posexplode(bandCodes(col(vecCol), planes, bandBits)).as(Seq("band", "chunk")))
    val qb = banded(queries, "query")
    val cb = banded(corpus, "neighbor")
    val candidateIds = cb.join(broadcast(qb), Seq("band", "chunk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = candidateIds
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .filter(!isnan(col("cos"))) // zero-norm guard (see bruteForceTopK)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Integer top-k over symmetric int8 codes — the engine-exact ANN
    * kernel. A single global scale s = max |xᵢ| over the corpus maps
    * every coordinate to round(x·127/s) ∈ [-127, 127]; similarity is
    * the INTEGER dot product of code vectors (|Σ| ≤ 127²·dim — far from
    * Long range, ANSI-safe). Because codes and dots are integers, the
    * ranking is bit-identical in any engine — unlike float cosine,
    * where summation order perturbs ties — so this tier is
    * hash-oracle-checkable end to end, and it is how int8-quantized
    * retrieval actually runs (FAISS/ScaNN-style SQ8 with symmetric
    * distance computation).
    *
    * Scale shape: the scalar scale row and the query code set are
    * broadcast; the corpus streams through once computing codes
    * scan-side; the ranking window shuffles (query_id, neighbor_id,
    * idot) — ids and one Long, never vectors. Quantization error vs
    * float ranking is the spec'd recall contract, not a gate concern.
    */
  def int8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
               vecCol: String, k: Int,
               excludeSelf: Boolean = true): DataFrame = {
    val scale = corpus.agg(
      max(array_max(transform(col(vecCol), x => abs(x.cast("double")))))
        .as("__s"))
    def codes(df: DataFrame, idAs: String, vAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(vecCol).as("__v"))
        .crossJoin(broadcast(scale))
        .select(col(idAs), transform(col("__v"),
          // all-zero corpus → s = 0: code to zeros instead of 0/0 = NaN
          x => when(col("__s") === 0.0, lit(0L))
            .otherwise(round(x.cast("double") * 127.0 / col("__s"))
              .cast("long")))
          .as(vAs))
    val q = codes(queries, "query_id", "qv")
    val c = codes(corpus, "neighbor_id", "cv")
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("qv"), col("cv"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("idot"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("idot").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "idot")
  }

  /** Contrastive training pairs from the integer-exact ranking — the
    * data-prep pass for embedding-model training (DPR/E5-style): per
    * anchor, `kPos` positives = nearest neighbors by int8 integer dot,
    * `kNeg` hard negatives = ranks [hardFrom, hardFrom+kNeg) of the
    * same ranking (near misses — the pairs that actually teach), and
    * `kNeg` random negatives picked by md5(anchor#other) order over the
    * remaining rows (deterministic across retries/engines; no RNG).
    * Roles are exclusive with precedence pos > hard_neg > rand_neg.
    * Output: (anchor_id, other_id, role, rank) — rank is the similarity
    * rank for pos/hard_neg, the md5 rank for rand_neg. All-integer +
    * md5 ordering, so the whole pair set is oracle-checkable.
    *
    * Scale shape: same as [[int8TopK]] — one corpus stream against the
    * broadcast anchor code set; both ranking windows shuffle
    * (anchor_id, other_id, idot, hash) only.
    */
  def contrastivePairs(anchors: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String,
                       kPos: Int = 2, kNeg: Int = 2,
                       hardFrom: Int = 20): DataFrame = {
    require(kPos >= 1 && kNeg >= 0, s"bad kPos=$kPos / kNeg=$kNeg")
    require(hardFrom > kPos,
      s"hardFrom=$hardFrom must exceed kPos=$kPos or roles overlap")
    val scale = corpus.agg(
      max(array_max(transform(col(vecCol), x => abs(x.cast("double")))))
        .as("__s"))
    def codes(df: DataFrame, idAs: String, vAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(vecCol).as("__v"))
        .crossJoin(broadcast(scale))
        .select(col(idAs), transform(col("__v"),
          x => when(col("__s") === 0.0, lit(0L))
            .otherwise(round(x.cast("double") * 127.0 / col("__s"))
              .cast("long")))
          .as(vAs))
    val a = codes(anchors, "anchor_id", "av")
    val c = codes(corpus, "other_id", "cv")
    val wSim = Window.partitionBy("anchor_id")
      .orderBy(col("idot").desc, col("other_id").asc)
    val marked = c.crossJoin(broadcast(a))
      .filter(col("anchor_id") =!= col("other_id"))
      .select(col("anchor_id"), col("other_id"),
        aggregate(zip_with(col("av"), col("cv"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("idot"),
        md5(concat_ws("#", col("anchor_id"), col("other_id"))).as("__rh"))
      .withColumn("sim_rank", row_number().over(wSim))
      .withColumn("role",
        when(col("sim_rank") <= kPos, lit("pos"))
          .when(col("sim_rank") >= hardFrom &&
            col("sim_rank") < hardFrom + kNeg, lit("hard_neg")))
    val wRnd = Window.partitionBy("anchor_id")
      .orderBy(col("__rh").asc, col("other_id").asc)
    val rand = marked.filter(col("role").isNull)
      .withColumn("rnd_rank", row_number().over(wRnd))
      .filter(col("rnd_rank") <= kNeg)
      .select(col("anchor_id"), col("other_id"), lit("rand_neg").as("role"),
        col("rnd_rank").cast("long").as("rank"))
    marked.filter(col("role").isNotNull)
      .select(col("anchor_id"), col("other_id"), col("role"),
        col("sim_rank").cast("long").as("rank"))
      .unionByName(rand)
  }

  /** kNN label-classification eval over the integer-exact [[int8TopK]]
    * ranking — the embedding-space health check a curation stack runs
    * before trusting semantic dedup / clustering on a new embedding
    * model: if k-nearest-neighbor majority vote can't recover held-out
    * labels, bucketed semantic operators built on the same geometry
    * won't group meaningfully either. Per query: the k nearest corpus
    * rows vote by label; majority wins with deterministic tie-breaks
    * (more votes, then best — smallest — similarity rank within the
    * label, then smaller label value). Output per query:
    * (query_id, true_label, pred_label, n_votes, correct 0/1) —
    * all-integer given integer labels, so the whole eval (not just the
    * accuracy scalar) is oracle-checkable; `correct` sums/avgs to
    * accuracy.
    *
    * Scale shape: inherits [[int8TopK]]'s (broadcast query codes,
    * corpus streamed once, ids-only ranking shuffle); the label join
    * carries (id, label), votes are <= k rows per query, and the query
    * label re-attach broadcasts the bounded query set.
    */
  def knnEval(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, labelCol: String, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val nbrs = int8TopK(queries, corpus, idCol, vecCol, k)
    val votes = nbrs
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).cast("long").as("__nl")), "neighbor_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("n_votes"), min(col("rank")).as("__best"))
    val wv = Window.partitionBy("query_id")
      .orderBy(col("n_votes").desc, col("__best").asc, col("__nl").asc)
    votes.withColumn("__r", row_number().over(wv)).filter(col("__r") === 1)
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("true_label"))), "query_id")
      .select(col("query_id"), col("true_label"),
        col("__nl").as("pred_label"), col("n_votes"),
        (col("__nl") === col("true_label")).cast("long").as("correct"))
  }

  /** Embedding-space decontamination — the semantic twin of the
    * n-gram [[Dedup.decontaminate]]: drop corpus rows whose int8-code
    * INTEGER dot product with ANY reference (eval-benchmark) embedding
    * reaches `minDot`. Paraphrased benchmark leakage survives n-gram
    * screens; this arm catches it in embedding space, and because the
    * scoring is the [[int8TopK]] integer recipe — one global max-abs
    * scale from the corpus, codes round(x·127/s), integer dot — the
    * kept set is bit-identical in any engine, unlike a float-cosine
    * cut. Reference vectors beyond the corpus range simply quantize
    * past ±127 (no clamp; still exact). Returns the corpus schema
    * unchanged.
    *
    * Scale shape: the scale is a 1-row broadcast; the reference set
    * (eval suites — thousands of rows, bounded by design) broadcasts
    * as code arrays; the corpus streams once through a broadcast anti
    * join with the dot-product predicate. Corpus rows never shuffle.
    */
  def semanticDecontaminate(corpus: DataFrame, reference: DataFrame,
                            vecCol: String, minDot: Long): DataFrame = {
    val scale = corpus.agg(
      max(array_max(transform(col(vecCol), x => abs(x.cast("double")))))
        .as("__s"))
    def toCodes(v: Column): Column =
      transform(v, x => when(col("__s") === 0.0, lit(0L))
        .otherwise(round(x.cast("double") * 127.0 / col("__s")).cast("long")))
    val refCodes = reference.select(col(vecCol).as("__rv"))
      .crossJoin(broadcast(scale))
      .select(toCodes(col("__rv")).as("__rc"))
    corpus.crossJoin(broadcast(scale))
      .withColumn("__cc", toCodes(col(vecCol)))
      .join(broadcast(refCodes),
        aggregate(zip_with(col("__cc"), col("__rc"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x) >= minDot,
        "left_anti")
      .drop("__s", "__cc")
  }

  /** All pairs with cosine >= threshold (near-duplicate detection on
    * embeddings). Exact O(n²) form — for large corpora route through
    * `lshTopK` instead; kept for oracle-checkable correctness.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      // NaN compares as LARGEST in Spark, so a zero-norm vector would
      // pass any threshold without this guard
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
  }

  /** Johnson–Lindenstrauss random projection with Rademacher (±1)
    * planes: dim-D float vectors down to `planes.length` doubles. Sign
    * planes keep every projection EXACT in double arithmetic (each term
    * is ±(float widened to double); the left-to-right sum is the same
    * in any IEEE engine), so projected vectors compare bit-identically
    * across engines — unlike Gaussian planes, where the plane constants
    * themselves would round. Scan-side expressions; no shuffle.
    */
  def randomProject(vecCol: Column, planes: Array[Array[Double]]): Column =
    array(planes.toIndexedSeq.map(p => dot(vecCol, typedLit(p.toSeq))): _*)

  /** SemDeDup-style semantic deduplication, LSH-bucketed: drop a vector
    * when an EARLIER vector (smaller id — deterministic, retry-stable)
    * in a shared hyperplane-LSH bucket has cosine >= `threshold`.
    *
    * Output: one row per input id — (idCol, is_kept, dup_of) where
    * dup_of = the smallest qualifying earlier neighbor (null when kept).
    *
    * Semantics note: "drop if ANY earlier near-duplicate exists" (the
    * SemDeDup within-cluster rule) over-drops chains relative to a
    * greedy keep-set (a→b→c with cos(a,c) < τ drops both b and c); it
    * is order-independent and embarrassingly parallel, which is why the
    * published pipelines use it.
    *
    * Scale: the bucket join shuffles (band, code, id) triples — never
    * vectors; vectors re-join by id afterwards. Buckets larger than
    * `maxBucketSize` are excluded from candidate generation (the
    * standard LSH skew clamp — a degenerate bucket of size m costs
    * m²/2 candidate rows; at corpus scale one hot bucket would dominate
    * the stage). Recall per pair at angle θ: 1−(1−(1−θ/π)^bandBits)^B.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    planes: Array[Array[Double]], bandBits: Int,
                    threshold: Double,
                    maxBucketSize: Int = 10000): DataFrame = {
    require(maxBucketSize > 0, "maxBucketSize must be positive")
    val reserved = Set("__id", "__bn", "__vid", "__v", "band", "chunk",
      "id_a", "id_b", "is_kept", "dup_of")
    for (c <- df.columns if reserved(c) && c != idCol)
      throw new IllegalArgumentException(
        s"semanticDedup: column $c collides with a reserved internal/output name")
    val banded = df.select(col(idCol).as("__id"),
        posexplode(bandCodes(col(vecCol), planes, bandBits)).as(Seq("band", "chunk")))
    // materialized once (eager, fixed-width id+band+code rows) because
    // both sides of the candidate self-join read it — same rationale,
    // and the same block lifecycle, as Dedup.keptFrame: the checkpoint
    // blocks stay pinned until session end unless the caller releases
    // them via GraftColumnBridge.unpersistLocalCheckpoint AFTER fully
    // consuming the result (they are the only copy of the banded frame)
    val capped = banded
      .withColumn("__bn", count(lit(1)).over(
        Window.partitionBy(col("band"), col("chunk"))))
      .filter(col("__bn") <= maxBucketSize)
      .drop("__bn")
      .transform(graft.Checkpoints.materialize)
    val candidates = capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val dropped = candidates
      .join(vecs.withColumnRenamed("__vid", "id_a").withColumnRenamed("__v", "va"), "id_a")
      .join(vecs.withColumnRenamed("__vid", "id_b").withColumnRenamed("__v", "vb"), "id_b")
      .filter(!isnan(cosine(col("va"), col("vb"))) &&
        cosine(col("va"), col("vb")) >= threshold)
      .groupBy(col("id_b"))
      .agg(min(col("id_a")).as("dup_of"))
    df.select(col(idCol))
      .join(dropped.withColumnRenamed("id_b", idCol), Seq(idCol), "left")
      .select(col(idCol), col("dup_of").isNull.as("is_kept"), col("dup_of"))
  }
}
