package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import com.fasterxml.jackson.core.JsonFactory
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** DynamoDB S3-export table format, offline (reference:
  * readers/DynamoDBS3Export.scala:54-221 read,
  * writers/DynamoDBS3Export.scala:32-219 write).
  *
  * Layout (mirrors the AWS export contract):
  *   <root>/manifest-summary.json      {"manifestFilesPath": "...", "itemCount": N}
  *   <root>/manifest-files.json        one JSON line per data file:
  *                                     {"itemCount": n, "dataFileKey": "data/00001.json.gz"}
  *   <root>/data/NNNNN.json.gz         one DynamoDB-JSON item per line
  *
  * Read path: the manifest indirection cannot be expressed as a
  * `spark.read.json` glob, so data files are distributed as a Dataset of
  * paths and decoded with `mapPartitions` — one filesystem client per
  * partition, the reference's small-files pattern. Items stay as raw
  * DynamoDB-JSON lines in the DataFrame (`item_json`); joins/compares
  * use the canonical key projection below, so the shuffle carries
  * (key, line) strings — no codec objects cross the wire.
  */
object DdbTables {

  private val factory = new JsonFactory()

  // ------------------------------------------------------------- read

  /** Manifest listing — (dataFileKey, itemCount) in manifest order —
    * shared by this reader and the DSv2 connector so the format has ONE
    * parser (jackson-based; handles escaped quotes etc.).
    */
  def listDataFiles(root: String,
                    conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val summary = readJsonMap(fs, new Path(rootPath, "manifest-summary.json"))
    val manifestFiles = new Path(rootPath,
      summary.getOrElse("manifestFilesPath", "manifest-files.json"))
    val in = new BufferedReader(new InputStreamReader(fs.open(manifestFiles), StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty)
      .map { line => val (count, key) = parseManifestLine(line); (key, count) }
      .toList
    finally in.close()
  }

  def readS3Export(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dataFiles: Seq[String] = listDataFiles(root, conf).map(_._1)

    val serializableConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val rootStr = root
    spark.createDataset(dataFiles)
      .repartition(math.min(dataFiles.size, 32).max(1))
      .mapPartitions { paths =>
        // per-partition client (reference: per-partition S3 client with
        // task-completion cleanup); Hadoop FS caches per-scheme instances
        val fs = new Path(rootStr).getFileSystem(serializableConf.value)
        paths.flatMap { rel =>
          val in = new BufferedReader(new InputStreamReader(
            new GZIPInputStream(fs.open(new Path(rootStr, rel))), StandardCharsets.UTF_8))
          Iterator.continually(in.readLine())
            .takeWhile(l => if (l == null) { in.close(); false } else true)
            .filter(_.nonEmpty)
        }
      }
      .toDF("item_json")
  }

  // ------------------------------------------------------------ write

  /** Write a DataFrame with a single string column of DynamoDB-JSON item
    * lines in export layout: one `data/NNNNN.json.gz` per non-empty
    * partition, then the two manifests. Items are re-encoded through the
    * codec so output lines are canonical (sorted keys/sets).
    */
  /** Returns the exported item count (from the per-file manifest — the
    * write runs as an RDD job outside any SQL execution scope, so the
    * caller cannot count it with an `observe`).
    */
  def writeS3Export(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val serializableConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val col0 = df.columns.head
    val rootStr = root

    val perFile: Array[(Int, String, Long)] = df.select(col(col0)).rdd
      .mapPartitionsWithIndex { (idx, rows) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val fs = new Path(rootStr).getFileSystem(serializableConf.value)
          val rel = f"data/$idx%05d.json.gz"
          val out = new OutputStreamWriter(
            new GZIPOutputStream(fs.create(new Path(rootStr, rel), true)),
            StandardCharsets.UTF_8)
          var n = 0L
          try rows.foreach { r =>
            val canonical = DdbJson.encodeItemLine(DdbJson.decodeItemLine(r.getString(0)))
            out.write(canonical); out.write("\n"); n += 1
          } finally out.close()
          Iterator.single((idx, rel, n))
        }
      }.collect()

    val fs = new Path(root).getFileSystem(conf)
    val manifestLines = perFile.sortBy(_._1).map { case (_, rel, n) =>
      s"""{"itemCount":$n,"dataFileKey":"$rel"}"""
    }
    writeText(fs, new Path(root, "manifest-files.json"), manifestLines.mkString("\n"))
    val itemCount = perFile.map(_._3).sum
    writeText(fs, new Path(root, "manifest-summary.json"),
      s"""{"manifestFilesPath":"manifest-files.json","itemCount":$itemCount}""")
    itemCount
  }

  /** Attribute renames on DynamoDB-JSON items (reference:
    * writers/DynamoDB.scala:121-129 / DynamoStreamReplication.scala:74-89
    * — `renamesMap.getOrElse(key, key)` over item maps). Re-encodes
    * canonically, so a rename is also a canonicalization pass.
    */
  def renameKeys(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val col0 = df.columns.head
    df.select(col(col0).as("item_json")).as[String].map { line =>
      val item = DdbJson.decodeItemLine(line)
      DdbJson.encodeItemLine(item.map { case (k, v) => renames.getOrElse(k, k) -> v })
    }.toDF("item_json")
  }

  // ------------------------------------------------------- validation

  /** Canonical key projection: (key_json, item_json) where key_json is
    * the canonical encoding of the key attributes only. String keys
    * shuffle/join cleanly (reference key-by:
    * alternator/AlternatorValidator.scala:41-49).
    */
  def keyed(df: DataFrame, keyAttrs: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val attrs = keyAttrs
    val col0 = df.columns.head
    df.select(col(col0).as("item_json")).as[String].map { line =>
      val item = DdbJson.decodeItemLine(line)
      val key = attrs.map(a => a -> item.getOrElse(a, DdbValue.Null)).toMap
      (DdbJson.encodeItemLine(key), line)
    }.toDF("key_json", "item_json")
  }

  /** Item-level diff join with deep tolerant compare (reference:
    * alternator/AlternatorValidator.scala:41-106 +
    * RowComparisonFailure.scala:309-344). Output: (key_json, kind) with
    * kind in {missing_target, extra_target, mismatch}; matches dropped.
    */
  def validateItems(source: DataFrame, target: DataFrame, keyAttrs: Seq[String],
                    tolerance: java.math.BigDecimal = java.math.BigDecimal.ZERO): DataFrame = {
    val spark = source.sparkSession
    import spark.implicits._
    val tol = tolerance.toPlainString
    val joined = keyed(source, keyAttrs).as("s")
      .join(keyed(target, keyAttrs).as("t"),
        col("s.key_json") === col("t.key_json"), "full_outer")
      .select(
        coalesce(col("s.key_json"), col("t.key_json")).as("key_json"),
        col("s.item_json").as("src_item"), col("t.item_json").as("tgt_item"))
    joined.as[(String, String, String)].flatMap { case (key, src, tgt) =>
      val kind =
        if (tgt == null) Some("missing_target")
        else if (src == null) Some("extra_target")
        else {
          val a = DdbJson.decodeItemLine(src)
          val b = DdbJson.decodeItemLine(tgt)
          val t = new java.math.BigDecimal(tol)
          val same = a.keySet == b.keySet &&
            a.forall { case (k, v) => DdbValue.deepEquals(v, b(k), t) }
          if (same) None else Some("mismatch")
        }
      kind.map(k => (key, k))
    }.toDF("key_json", "kind")
  }

  // ---------------------------------------------------------- helpers

  private def parseManifestLine(line: String): (Long, String) = {
    val p = factory.createParser(line)
    try {
      var count = 0L
      var key = ""
      p.nextToken()
      while (p.nextToken() == com.fasterxml.jackson.core.JsonToken.FIELD_NAME) {
        val name = p.currentName(); p.nextToken()
        name match {
          case "itemCount"   => count = p.getLongValue
          case "dataFileKey" => key = p.getText
          case _             => p.skipChildren()
        }
      }
      (count, key)
    } finally p.close()
  }

  private def readJsonMap(fs: FileSystem, path: Path): Map[String, String] = {
    val in = new BufferedReader(new InputStreamReader(fs.open(path), StandardCharsets.UTF_8))
    val text = try Iterator.continually(in.readLine()).takeWhile(_ != null).mkString("\n")
    finally in.close()
    val p = factory.createParser(text)
    try {
      val b = Map.newBuilder[String, String]
      p.nextToken()
      while (p.nextToken() == com.fasterxml.jackson.core.JsonToken.FIELD_NAME) {
        val name = p.currentName(); p.nextToken()
        b += name -> p.getText
      }
      b.result()
    } finally p.close()
  }

  private def writeText(fs: FileSystem, path: Path, text: String): Unit = {
    val out = new OutputStreamWriter(fs.create(path, true), StandardCharsets.UTF_8)
    try out.write(text) finally out.close()
  }
}
