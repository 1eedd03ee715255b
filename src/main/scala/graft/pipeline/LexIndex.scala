package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted lexical retrieval index — the posting-list twin of
  * [[AnnIndex]]: build once over a corpus, append crawl epochs
  * exactly-once, answer bounded query batches, forget on demand.
  *
  * Layout: `root/postings` holds `(term, id, dl, tf)` — one row per
  * (document, term), term-range-clustered so a query batch's IN-list
  * filter prunes file/row-group reads to the terms actually queried;
  * `root/_lex.json` pins the analyzer (whitespace tokens, the
  * [[Text.tokens]] contract) so search tokenization can never drift
  * from what was indexed.
  *
  * Ranking is the library's integer-exact retrieval contract
  * ([[Text.retrievalTopK]]: n_matched desc, sum_tf desc, id asc) — a
  * persisted-index search returns EXACTLY what the in-plan postings
  * join returns over the same corpus (q_lex_search and LexIndexSpec
  * pin it), and no float ever decides an ordering, so any engine
  * reproduces the hit list bit-for-bit. BM25 scoring stays a
  * downstream concern ([[Text.bm25]]) where float tolerance is the
  * caller's choice.
  *
  * Scale shape: search reads the postings of the QUERY'S terms only
  * (pushed In-filter under the inline cap; a broadcast semi-join
  * beyond it), joins against the bounded query set, and ranks with
  * per-partition `WindowGroupLimit` pushdown — cost ∝ the queried
  * terms' posting lists, never the corpus. Append cost ∝ the batch
  * (plus one column-pruned id scan for the delta anti-join, the
  * [[AnnIndex.appendEpoch]] discipline).
  */
object LexIndex {

  private def postingsDir(root: String) = root + "/postings"
  private def metaPath(root: String) = root + "/_lex.json"

  /** (term, id, dl, tf) posting rows of a document frame. Null-id
    * docs are ignored; duplicate ids merge (ids are expected unique).
    */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        size(Text.tokens(col(textCol))).cast("long").as("dl"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .select(col("term"), col("id"), col("dl"), col("tf"))

  private def clustered(p: DataFrame): DataFrame =
    p.repartitionByRange(col("term")).sortWithinPartitions(col("term"), col("id"))

  def create(docs: DataFrame, idCol: String, textCol: String, root: String): Unit = {
    val spark = docs.sparkSession
    clustered(postingsOf(docs, idCol, textCol))
      .write.mode("errorifexists").parquet(postingsDir(root))
    val p = new org.apache.hadoop.fs.Path(metaPath(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write("""{"analyzer":"ws"}""".getBytes("UTF-8"))
    out.close()
  }

  private def requireIndex(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(metaPath(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no lex index at $root (missing ${metaPath(root)})")
  }

  /** Exactly-once epoch append: NEW documents' postings land under the
    * tag's deterministic file names ([[graft.sources.EpochFiles]]);
    * already-indexed ids are dropped by a column-pruned anti-join, so
    * a replayed epoch (same tag, overlapping batch) retires its own
    * files and republishes the SAME delta. A (doc, term) row never
    * spans epochs, so reads need no fold.
    */
  def appendEpoch(batch: DataFrame, idCol: String, textCol: String,
                  root: String, tag: String): Unit = {
    val spark = batch.sparkSession
    requireIndex(spark, root)
    graft.sources.EpochFiles.retire(spark, postingsDir(root), tag)
    val existing = spark.read.parquet(postingsDir(root))
      .select(col("id")).distinct()
    val delta = postingsOf(
      batch.join(existing.withColumnRenamed("id", idCol), Seq(idCol), "left_anti"),
      idCol, textCol)
    val stage = root + s"/_stage/$tag"
    clustered(delta).write.mode("overwrite").parquet(stage)
    graft.sources.EpochFiles.publish(spark, stage, postingsDir(root), tag)
  }

  /** Remove a tag's published postings and staging leftovers. */
  def rollbackEpoch(spark: SparkSession, root: String, tag: String): Unit = {
    graft.sources.EpochFiles.retire(spark, postingsDir(root), tag)
    val st = new org.apache.hadoop.fs.Path(root + s"/_stage/$tag")
    val fs = st.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(st, true)
    ()
  }

  /** Fold accumulated epoch files back into one term-clustered table
    * (crash-safe swap; search-invariant — LexIndexSpec pins it). Same
    * between-epochs caveat as every compact: the swap renames files,
    * destroying per-tag names an in-flight replay would retire.
    */
  def compact(spark: SparkSession, root: String): Unit = {
    requireIndex(spark, root)
    val cur = graft.streaming.SwapStore.readCurrent(spark, postingsDir(root),
      new org.apache.spark.sql.types.StructType())
    graft.streaming.SwapStore.swapWrite(clustered(cur), postingsDir(root))
  }

  /** Right-to-be-forgotten: a forgotten document's postings go through
    * the crash-safe targeted rewrite; it stops being retrievable and —
    * via the append anti-join — can be re-admitted later.
    */
  def forget(spark: SparkSession, root: String,
             ids: Seq[Any]): graft.sources.TargetedDelete.Result = {
    requireIndex(spark, root)
    val r = graft.sources.TargetedDelete.deleteAuto(spark, postingsDir(root), "id", ids)
    spark.catalog.refreshByPath(postingsDir(root))
    r
  }

  /** BM25-scored top-k per query from the persisted index (the scored
    * read; [[search]] is the integer-exact one). Corpus stats come
    * from the index itself — N and avgdl from one column-pruned
    * distinct over (id, dl) (a summary-table scan per query batch, the
    * AnnIndex-ingest trade), df per term from the PRUNED postings —
    * so the scores equal [[Text.bm25]] over the indexed corpus, with
    * N = documents that produced at least one token. Output is
    * rank-gated like q_bm25: `(queryIdCol, rank, id, n_matched, dl)`
    * — the float score orders (desc, id asc) but is never emitted, so
    * engines can replay the ranking without float-hash hazards.
    */
  def bm25Search(spark: SparkSession, root: String, queries: DataFrame,
                 queryIdCol: String, termCol: String, k: Int,
                 k1: Double = 1.2, b: Double = 0.75,
                 maxInlineTerms: Int = 10000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireIndex(spark, root)
    val q = queries.select(col(queryIdCol), col(termCol).as("term")).distinct()
    val post = spark.read.parquet(postingsDir(root))
    // exact stats: integer sum + count, ONE division — not avg(), whose
    // internal accumulation an oracle can't replay operand-for-operand
    val stats = post.select(col("id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("dl")).cast("double").as("__sumdl"))
    val terms = q.select(col("term")).distinct()
    val inline = terms.limit(maxInlineTerms + 1).collect().map(_.getString(0))
    val pruned =
      if (inline.length <= maxInlineTerms) post.filter(col("term").isin(inline.toIndexedSeq: _*))
      else post.join(broadcast(terms), Seq("term"), "left_semi")
    // postings are unique per (id, term), so count(*) IS the df
    val df = pruned.groupBy(col("term")).agg(count(lit(1)).cast("double").as("__df"))
    val idf = log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tf = col("tf").cast("double")
    val avgdl = col("__sumdl") / col("__n")
    val termScore = idf * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    // deterministic score: per-term contributions fold in SORTED-term
    // order (a bare sum() would accumulate in partition order, and two
    // engines would disagree on near-ties; this way the oracle can
    // replay the addition operand-for-operand)
    pruned.join(q, Seq("term"))
      .join(df, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(queryIdCol), col("id"), col("dl"), col("term"), termScore.as("__s"))
      .groupBy(col(queryIdCol), col("id"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("n_matched"),
        aggregate(
          transform(array_sort(collect_list(struct(col("term"), col("__s")))),
            x => x("__s")),
          lit(0.0), (acc, s) => acc + s).as("__score"))
      .transform(j => graft.operators.Sampling.capPerGroup(j,
        groupCols = Seq(queryIdCol),
        rankBy = Seq(-col("__score"), col("id")),
        k = k, rankName = "rank"))
      .select(col(queryIdCol), col("rank"), col("id"), col("n_matched"), col("dl"))
  }

  /** Top-k documents per query from the persisted index, identical to
    * [[Text.retrievalTopK]] over the indexed corpus: output
    * `(queryIdCol, rank, id, n_matched, sum_tf, dl)`. `queries` is a
    * BOUNDED batch (the retrieval cost model); its distinct terms are
    * collected and pushed as an In-filter into the postings scan while
    * they fit `maxInlineTerms`, else the filter becomes a broadcast
    * semi-join (same rows, no scan pruning).
    */
  def search(spark: SparkSession, root: String, queries: DataFrame,
             queryIdCol: String, termCol: String, k: Int,
             maxInlineTerms: Int = 10000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireIndex(spark, root)
    val q = queries.select(col(queryIdCol), col(termCol).as("term")).distinct()
    val post = spark.read.parquet(postingsDir(root))
    val terms = q.select(col("term")).distinct()
    val inline = terms.limit(maxInlineTerms + 1).collect().map(_.getString(0))
    val pruned =
      if (inline.length <= maxInlineTerms) post.filter(col("term").isin(inline.toIndexedSeq: _*))
      else post.join(broadcast(terms), Seq("term"), "left_semi")
    pruned.join(q, Seq("term"))
      .groupBy(col(queryIdCol), col("id"))
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_matched"),
        sum(col("tf")).as("sum_tf"))
      .transform(j => graft.operators.Sampling.capPerGroup(j,
        groupCols = Seq(queryIdCol),
        rankBy = Seq(-col("n_matched"), -col("sum_tf"), col("id")),
        k = k, rankName = "rank"))
      .select(col(queryIdCol), col("rank"), col("id"),
        col("n_matched"), col("sum_tf"), col("dl"))
  }
}
