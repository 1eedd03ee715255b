package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the third storage tier of the ANN stack
  * (float32 → int8 [Similarity.quantizeInt8] → PQ codes), and the
  * standard memory-bound ANN scan format: a dim-D float vector becomes
  * `m` small codes (one per D/m-dim subspace, each the index of the
  * nearest codebook centroid), a 32× compression at m=8, ksub=16 over
  * 64 float32 dims.
  *
  * Scale design mirrors Ivf: codebooks are m × ksub × (D/m) doubles —
  * driver-sized by construction — trained with the same deterministic
  * Lloyd recipe (hash-seeded, exact-decimal centroid sums so partial-
  * aggregation merge order can't drift a centroid by an ulp and flip a
  * near-tie assignment). Training cost is one corpus pass per subspace
  * per iteration; PQ codebooks are conventionally trained on a SAMPLE
  * (callers pass `corpus.sample(...)` / a limit — the codebook quality
  * saturates far below corpus size). Encoding is a scan-side
  * projection; ADC scoring is a scan over fixed-width code rows with a
  * per-query lookup table built in-plan — the corpus is never joined
  * on anything wider than the (small, broadcast) query set.
  */
object Pq {

  /** codebooks(j)(c) = centroid c of subspace j (length D/m each). */
  final case class Model(codebooks: Array[Array[Array[Double]]]) extends Serializable {
    def m: Int = codebooks.length
    def ksub: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length
  }

  private def subvector(vecCol: Column, j: Int, dsub: Int): Column =
    slice(vecCol, j * dsub + 1, dsub)

  /** Squared L2 distance between a (float or double) array column and a
    * literal centroid, in double precision, left-to-right.
    */
  private def distSq(sub: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(sub, typedLit(centroid.toSeq),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Code for one subspace: index of the nearest centroid (first on
    * ties — array_position returns the first match of the min).
    */
  private def subCode(sub: Column, codebook: Array[Array[Double]]): Column = {
    val scores = array(codebook.map(c => distSq(sub, c)): _*)
    (array_position(scores, array_min(scores)) - 1).cast("int")
  }

  /** Train m codebooks of ksub centroids each. `dim` must divide by m.
    *
    * All m subspaces train TOGETHER: each Lloyd iteration is ONE
    * distributed pass that assigns every subspace's code and aggregates
    * per (subspace, centroid, dimension) means — 1 + iters jobs total
    * instead of m × (1 + iters) (the per-subspace loop was 32 sequential
    * jobs at m=16, iters=2, and job latency dominated training end to
    * end). The collected update is m·ksub·(D/m) = ksub·D rows — driver-
    * sized by construction, like Ivf's centroid collect.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, ksub: Int = 16, iters: Int = 3): Model = {
    // deterministic seeds: the ksub corpus vectors with the smallest
    // (hash(id), id) — the id itself breaks hash ties (duplicate ids,
    // 64-bit collisions) so the seed set cannot drift across retries or
    // repartitionings; sliced per subspace (one collect of ksub vectors)
    // numeric read, NOT toString.toDouble: the string round-trip yields
    // shortest-decimal doubles that differ from the exact float->double
    // widening every distance kernel applies — seeds must BE the corpus
    // vectors the kernels see, or iteration-1 assignments drift
    val seedVecs = corpus
      .select(col(vecCol).cast("array<double>"), xxhash64(col(idCol)).as("__h"),
        col(idCol).cast("string").as("__id"))
      .orderBy(col("__h"), col("__id")).limit(ksub)
      .collect().map(_.getSeq[Double](0).toArray)
    require(seedVecs.nonEmpty, "PQ training corpus is empty; cannot train codebooks")
    require(seedVecs.length == ksub,
      s"PQ training corpus has only ${seedVecs.length} rows but ksub=$ksub centroids " +
        "were requested; supply a larger corpus or lower ksub")
    // vector width read off the collected seeds — the former standalone
    // dimension-probe job bought nothing the seed collect doesn't know
    val dim = seedVecs.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    var codebooks = Array.tabulate(m)(j =>
      seedVecs.map(v => v.slice(j * dsub, (j + 1) * dsub)))
    (1 to iters).foreach { _ =>
      val codes = graft.functions.PqExpressions.encode(col(vecCol), codebooks)
      // rows (subspace j, code c, dim d, component x); exact decimal
      // sums: see Ivf.train for the merge-order rationale
      val sums = corpus
        .select(col(vecCol).as("__v"), posexplode(codes).as(Seq("j", "c")))
        .select(col("j"), col("c"), explode(expr(
          s"transform(sequence(0, ${dsub - 1}), d -> " +
            s"struct(d AS d, element_at(__v, j * $dsub + d + 1) AS x))")).as("e"))
        .select(col("j"), col("c"), col("e.d").as("d"),
          col("e.x").cast("double").as("x"))
        .groupBy("j", "c", "d")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1))).as("mean"))
        .collect()
      val next = Array.tabulate(m)(j => codebooks(j).map(_.clone()))
      sums.foreach(r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
      codebooks = next
    }
    Model(codebooks)
  }

  /** Persist the trained codebooks as parquet rows
    * (subspace, centroid_id, centroid) — bit-exact like Ivf.save, so a
    * loaded model encodes/decodes/ADC-ranks identically across
    * sessions (AnnIndexSpec pins this).
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    (for {
      (cb, j) <- model.codebooks.zipWithIndex
      (c, i) <- cb.zipWithIndex
    } yield (j, i, c.toSeq)).toSeq
      .toDF("subspace", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load codebooks written by [[save]]; (subspace, centroid_id) must
    * tile the full m × ksub grid — anything else is a torn or foreign
    * directory, rejected loudly.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    // signature-cached schema: a serve path reloads the same model dir
    // per call, and schema-less parquet reads pay an inference JOB each
    val rows = spark.read
      .schema(graft.sources.KeyedReads.schemaFor(spark, path)).parquet(path)
      .select(col("subspace"), col("centroid_id"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
    require(rows.nonEmpty, s"no PQ codebooks at $path")
    val byKey = rows.toMap
    val m = rows.map(_._1._1).max + 1
    val ksub = rows.map(_._1._2).max + 1
    require(byKey.size == rows.length && rows.length == m * ksub,
      s"PQ codebooks at $path do not tile the $m x $ksub grid (${rows.length} rows)")
    Model(Array.tabulate(m, ksub)((j, c) => byKey((j, c))))
  }

  /** PQ codes as an m-length int array — scan-side projection through
    * the fused native kernel (graft.functions.PqEncode); the composed
    * form below is the cross-check twin.
    */
  def encode(vecCol: Column, model: Model): Column =
    graft.functions.PqExpressions.encode(vecCol, model.codebooks)

  /** Composed-builtin twin of [[encode]] (m·ksub zip_with/aggregate
    * subtrees — the expression tree itself is the cost at m=16; kept
    * for the bit-identity cross-check in PqSpec).
    */
  def encodeHof(vecCol: Column, model: Model): Column =
    array((0 until model.m).map(j =>
      subCode(subvector(vecCol, j, model.dsub), model.codebooks(j))): _*)

  /** Reconstruction (codebook centroid per subspace, concatenated). */
  def decode(codesCol: Column, model: Model): Column =
    graft.functions.PqExpressions.decode(codesCol, model.codebooks)

  /** Asymmetric-distance top-k: exact query vector against PQ codes.
    * The per-query lookup table (m × ksub squared distances) is built
    * in-plan on the broadcast query side, so the corpus scan reads only
    * (id, codes) rows and sums m table lookups per row — the
    * memory-bandwidth-bound scan PQ exists for. Output:
    * (query_id, rank, neighbor_id, adc_dist); ranks ties by neighbor.
    */
  def adcTopK(queries: DataFrame, corpusCodes: DataFrame, idCol: String,
              vecCol: String, codesCol: String, model: Model, k: Int): DataFrame = {
    val lut = graft.functions.PqExpressions.lut(col(vecCol), model.codebooks)
    val q = queries.select(col(idCol).as("query_id"), lut.as("__lut"))
    val scored = corpusCodes
      .select(col(idCol).as("neighbor_id"), col(codesCol).as("__codes"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(
          zip_with(col("__codes"), col("__lut"),
            (c, l) => element_at(l, c + 1)),
          lit(0.0), (acc, v) => acc + v).as("adc_dist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
  }

  /** Exact re-rank of an ANN candidate set — the second stage of the
    * standard two-stage search: a cheap code scan (ADC) over-fetches
    * `kCand` candidates per query, then the TRUE vectors of just those
    * candidates are read and ranked by exact squared L2, repairing the
    * recall the quantized first stage gave up. `candidates` carries
    * (query_id, neighbor_id) — anything [[adcTopK]]/[[ivfAdcTopK]]
    * shaped; `corpusVecs` carries (idCol, vecCol).
    *
    * Scale shape: the candidate set is |queries| × kCand — bounded by
    * construction — and BROADCASTS into the vector fetch, so the
    * corpus-side read is one column-pruned scan of (id, vec) with a
    * broadcast hash join and no shuffle of corpus rows; the exact
    * distance runs only on candidate rows (|Q|·kCand of them), and the
    * final top-k is a per-query window over that bounded set. Nothing
    * here grows with the corpus except the fetch scan itself, which an
    * id-clustered vector table turns into pruned point reads.
    */
  def rerankExact(candidates: DataFrame, queries: DataFrame, corpusVecs: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  maxBroadcastRows: Long = 4000000L): DataFrame = {
    // |queries| × kCand is bounded by construction but NOT small by
    // contract: the config surface caps neither, and an unconditional
    // broadcast hint of a huge candidate frame (plus the query vectors
    // it implies) would blow the 8 GB broadcast limit or the driver
    // heap before the join even plans. Materialize the candidates
    // (they feed two joins anyway — without a barrier the ADC search
    // that produced them would re-run per consumer) and size them:
    // under the cap, broadcast as before; past it, fall back to plain
    // shuffle joins — same rows, corpus-side exchange accepted as the
    // price of an oversized batch.
    val cand = graft.Checkpoints.materialize(
      candidates.select(col("query_id"), col("neighbor_id")))
    // both broadcast verdicts from ONE aggregation job over the
    // materialized pairs (the former limit-count + distinct-count pair
    // of driver jobs): total row count gates the cand broadcast,
    // distinct query count gates the qv broadcast
    val sized = cand.agg(count(lit(1)).as("n"),
      count_distinct(col("query_id")).as("nq")).head()
    rerankExactSized(cand, sized.getLong(0), sized.getLong(1),
      queries, corpusVecs, idCol, vecCol, k, maxBroadcastRows)
  }

  /** [[rerankExact]] core with the candidate frame already materialized
    * and sized (`n` total pairs, `nq` distinct query ids) — callers
    * that counted the candidates for their own purposes (e.g.
    * [[graft.pipeline.AnnIndex.searchRerank]]'s no-op-window check)
    * reuse the numbers instead of paying a second counting job.
    */
  private[pipeline] def rerankExactSized(cand: DataFrame, n: Long, nq: Long,
                                         queries: DataFrame, corpusVecs: DataFrame,
                                         idCol: String, vecCol: String, k: Int,
                                         maxBroadcastRows: Long,
                                         knownVecWidth: Option[Long] = None): DataFrame = {
    val qvAll = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val small = n <= maxBroadcastRows
    def hint(df: DataFrame) = if (small) broadcast(df) else df
    // The qv side earns its OWN broadcast verdict: `small` bounds the
    // candidate PAIR frame (two scalar ids), but the queries frame
    // carries full vectors — a tiny candidate batch against a huge or
    // very wide queries frame must not inherit cand's verdict and
    // broadcast every query vector anyway. Semi-join qv down to the
    // query ids that actually appear in candidates (prunes the fetch
    // under any join strategy), then broadcast only when the surviving
    // id count fits a width-scaled element budget: maxBroadcastRows is
    // a row cap for the 2-column cand frame, so the vector frame's cap
    // divides it by the per-row element width. Callers that know the
    // vector width from a model (dim = m·dsub) pass it and skip the
    // probe job; otherwise it runs only while the verdict is live
    // (`small`).
    val qids = cand.select("query_id").distinct()
    val qv = qvAll.join(hint(qids), Seq("query_id"), "left_semi")
    val vecWidth =
      if (!small) 1L
      else knownVecWidth.getOrElse(
        math.max(1L, queries.filter(col(vecCol).isNotNull)
          .select(size(col(vecCol)).cast("long"))
          .limit(1).collect().headOption.map(_.getLong(0)).getOrElse(1L)))
    val qvSmall = small && nq <= math.max(1L, maxBroadcastRows / vecWidth)
    def qhint(df: DataFrame) = if (qvSmall) broadcast(df) else df
    val fetched = corpusVecs
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(hint(cand), Seq("neighbor_id"))
      .join(qhint(qv), Seq("query_id"))
    val dist = aggregate(
      zip_with(col("__qv"), col("__cv"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val w = Window.partitionBy("query_id")
      .orderBy(col("exact_dist").asc, col("neighbor_id").asc)
    fetched.select(col("query_id"), col("neighbor_id"), dist.as("exact_dist"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "exact_dist")
  }

  /** Two-stage ADC search: [[adcTopK]] over-fetches `kCand` candidates
    * per query from the code frame, [[rerankExact]] ranks their true
    * vectors — output (query_id, rank, neighbor_id, exact_dist), top
    * `k` by exact squared L2 among the candidates. With kCand ≥ corpus
    * size this IS brute-force exact search (the gate's oracle anchor);
    * at production kCand (a few × k) it reads kCand true vectors per
    * query instead of the corpus.
    */
  def adcRerankTopK(queries: DataFrame, corpusCodes: DataFrame, corpusVecs: DataFrame,
                    idCol: String, vecCol: String, codesCol: String,
                    model: Model, k: Int, kCand: Int): DataFrame =
    rerankExact(
      adcTopK(queries, corpusCodes, idCol, vecCol, codesCol, model, kCand),
      queries, corpusVecs, idCol, vecCol, k)

  /** IVF-PQ: the production ANN layout at corpus scale — IVF buckets
    * prune WHICH rows are scanned (~nProbe/k_ivf of the corpus), PQ
    * codes shrink WHAT each scanned row costs (m bytes + m lookups, no
    * vector read). `indexedCodes` is the persisted index frame:
    * (idCol, bucket, codesCol) — built once via
    * `Ivf.index(...)` + `Pq.encode(...)`, vectors not required at
    * query time. The probe fan-out and the code scan join on the
    * bucket key only; nothing wider than (id, m codes) moves.
    */
  def ivfAdcTopK(queries: DataFrame, indexedCodes: DataFrame, idCol: String,
                 vecCol: String, codesCol: String, bucketCol: String,
                 ivfModel: Ivf.Model, pqModel: Model, k: Int, nProbe: Int): DataFrame = {
    val scored = ivfAdcScored(queries, indexedCodes, idCol, vecCol, codesCol,
      bucketCol, ivfModel, pqModel, nProbe)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
  }

  /** [[ivfAdcTopK]]'s scored candidate frame BEFORE the per-query
    * ranking window: every probed-bucket row with its ADC distance,
    * `(query_id, neighbor_id, adc_dist)`. The admission set of a
    * two-stage rerank is exactly this frame capped at kCand per query
    * — [[graft.pipeline.AnnIndex.searchRerank]] reads it directly and
    * skips the ranking window entirely when no query's admitted count
    * exceeds kCand (the window is a no-op there by construction).
    */
  private[pipeline] def ivfAdcScored(queries: DataFrame, indexedCodes: DataFrame,
                                     idCol: String, vecCol: String,
                                     codesCol: String, bucketCol: String,
                                     ivfModel: Ivf.Model, pqModel: Model,
                                     nProbe: Int): DataFrame = {
    // one LUT per query (not per probe row); both the probe pairs and
    // the LUTs broadcast EXPLICITLY — probeBuckets ends in a window +
    // filter whose size Catalyst can't always estimate under the
    // broadcast threshold, and a fallback shuffle join here would
    // exchange the corpus-scale code index on the bucket key
    val luts = queries.select(col(idCol).as("query_id"),
      graft.functions.PqExpressions.lut(col(vecCol), pqModel.codebooks).as("__lut"))
    val probes = Ivf.probeBuckets(queries, idCol, vecCol, ivfModel, nProbe)
      .select(col("query_id"), col("bucket").as(bucketCol))
    indexedCodes
      .select(col(idCol).as("neighbor_id"), col(bucketCol), col(codesCol).as("__codes"))
      .join(broadcast(probes), bucketCol)
      .join(broadcast(luts), "query_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(
          zip_with(col("__codes"), col("__lut"),
            (c, l) => element_at(l, c + 1)),
          lit(0.0), (acc, v) => acc + v).as("adc_dist"))
  }
}
