package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to hyperplane LSH (Similarity.lshTopK):
  *
  *  1. train k coarse centroids with a few Lloyd iterations (k-means on
  *     cosine similarity). Centroids are small by design (k ≤ a few
  *     thousand), so they live on the driver between iterations and ship
  *     to executors as plan literals — the corpus is only ever scanned,
  *     never collected.
  *  2. assign every corpus vector to its nearest centroid (one shuffle-
  *     free projection; the bucket column can be persisted alongside the
  *     embedding, making the index incremental).
  *  3. at query time, probe the nProbe nearest centroids and re-rank
  *     exactly (native CosineSimilarity kernel) within those buckets
  *     only — the fraction of the corpus touched is ~nProbe/k.
  *
  * Determinism: seeds are the k corpus vectors with the smallest
  * xxhash64(id); ties in assignment break toward the lower bucket id.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) extends Serializable

  private def scoreArray(vecCol: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map(c =>
      graft.functions.VectorExpressions.cosine(vecCol, typedLit(c.toSeq))): _*)

  /** Bucket = index of the best-scoring centroid (first on ties). */
  def assignment(vecCol: Column, model: Model): Column =
    array_position(scoreArray(vecCol, model.centroids),
      array_max(scoreArray(vecCol, model.centroids))).cast("int") - 1

  /** Train k centroids with `iters` Lloyd rounds. Each round is one
    * distributed pass: assign, then average per (bucket, dimension) via
    * posexplode — no vector ever concatenates into driver memory except
    * the k centroids themselves.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 3): Model = {
    // deterministic seeds: smallest hash(id)
    // numeric read, NOT toString.toDouble: the string round-trip yields
    // shortest-decimal doubles that differ from the exact float->double
    // widening the scoring kernel applies (see Pq.train)
    val seeds = corpus
      .select(col(vecCol).cast("array<double>"), xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h")).limit(k)
      .collect().map(_.getSeq[Double](0).toArray)
    var model = Model(seeds)
    (1 to iters).foreach { _ =>
      val assigned = corpus.select(col(vecCol).as("v"),
        assignment(col(vecCol), model).as("bucket"))
      // exact decimal sums make the centroid update deterministic under
      // any partial-aggregation merge order (double sums would drift by
      // ulps across runs and flip near-tie assignments); one correctly-
      // rounded cast + one double division keeps the result stable
      // scale 18 leaves 20 integer digits of sum headroom (38,30 kept
      // only 8 — a bucket of 1e8 unit-scale components overflowed and,
      // under ANSI mode, crashed training); 18 fractional digits still
      // fix the rounding deterministically under any merge order
      val sums = assigned
        .select(col("bucket"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("bucket", "d")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1))).as("m"))
        .collect()
      val next = Array.tabulate(model.centroids.length)(i => model.centroids(i).clone())
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      model = Model(next)
    }
    model
  }

  /** Bucketed corpus: (id, vec, bucket). Persist this next to the
    * embeddings to make the index reusable.
    */
  def index(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      assignment(col(vecCol), model).as("bucket"))

  /** Persist the trained centroids as parquet rows
    * (centroid_id, centroid) — parquet doubles are bit-exact, so a
    * loaded model reproduces every assignment and probe ranking of the
    * session that trained it (AnnIndexSpec pins this).
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load centroids written by [[save]]; centroid ids must form a
    * contiguous 0..k-1 range (anything else means a torn or foreign
    * directory, rejected loudly).
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    // signature-cached schema (see Pq.load)
    val rows = spark.read
      .schema(graft.sources.KeyedReads.schemaFor(spark, path)).parquet(path)
      .select(col("centroid_id"), col("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    require(rows.nonEmpty, s"no IVF centroids at $path")
    val byId = rows.toMap
    require(byId.size == rows.length && (0 until rows.length).forall(byId.contains),
      s"IVF centroid ids at $path are not the contiguous range 0..${rows.length - 1}")
    Model(Array.tabulate(rows.length)(byId))
  }

  /** (query_id, qv, bucket) rows for each query's nProbe best-scoring
    * centroids — the probe fan-out shared by exact re-rank ([[topK]])
    * and ADC re-rank (Pq.ivfAdcTopK).
    */
  def probeBuckets(queries: DataFrame, idCol: String, vecCol: String,
                   model: Model, nProbe: Int): DataFrame = {
    val probeRank = Window.partitionBy("query_id").orderBy(col("score").desc, col("bucket").asc)
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(scoreArray(col("qv"), model.centroids)).as(Seq("bucket", "score")))
      .withColumn("__pr", row_number().over(probeRank))
      .filter(col("__pr") <= nProbe)
      .select("query_id", "qv", "bucket")
  }

  /** Top-k with nProbe probes: queries fan out to their nProbe best
    * buckets, join the index on bucket, exact re-rank inside.
    */
  def topK(queries: DataFrame, indexed: DataFrame, idCol: String, vecCol: String,
           model: Model, k: Int, nProbe: Int): DataFrame = {
    val probes = probeBuckets(queries, idCol, vecCol, model, nProbe)
    val scored = probes.join(indexed, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExpressions.cosine(col("qv"), col("cv")).as("cos"))
      .filter(!isnan(col("cos"))) // zero-norm guard (NaN orders largest)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
