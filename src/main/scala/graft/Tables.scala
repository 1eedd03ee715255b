package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every operator in this library takes its inputs as DataFrames loaded
  * here, so Catalyst sees a declarative parquet scan and can push filters
  * / prune columns into the file source (check `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fixture schema per (path, file signature): a schema-less
    * `spark.read.parquet` runs a footer-inference Spark JOB per call
    * (~one scheduling quantum), and a bench sweep loads each fixture
    * table hundreds of times — the schema is a pure function of the
    * immutable file, so infer once per signature and pass it
    * explicitly thereafter.
    */
  private val schemaCache = scala.collection.concurrent.TrieMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Spark has no nanosecond TimestampType; read TIMESTAMP(NANOS) parquet
    // columns as Long and truncate to microseconds (integer `div`, not
    // floating division — epoch nanos exceed double's 2^53 exact range).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$name.parquet"
    val st = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(new org.apache.hadoop.fs.Path(path))
    val sig = s"${st.getLen}:${st.getModificationTime}"
    val schema = schemaCache.get(path) match {
      case Some((s, sc)) if s == sig => sc
      case _ =>
        val sc = spark.read.parquet(path).schema
        schemaCache(path) = (sig, sc)
        sc
    }
    val df = spark.read.schema(schema).parquet(path)
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts",
        // NTZ to match how Spark infers the other parquet timestamp
        // columns (naive), keeping written output engine-neutral
        org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case None => df
    }
  }

  /** Splittable scan units (parquet row groups) a table's files offer —
    * the ceiling on scan-side parallelism: Spark assigns a parquet row
    * group to exactly one task, so a table with fewer row groups than
    * the session has cores can never parallelize scan-side compute no
    * matter how `maxPartitionBytes` splits the byte ranges. Driver-side
    * footer reads, cached per (path, file signature).
    */
  private val unitsCache = scala.collection.concurrent.TrieMap[String, (String, Int)]()

  def scanUnits(spark: SparkSession, path: String): Int =
    scanLayout(spark, path)._1

  /** (splittable units, total bytes) of a parquet file/dir — the pair
    * the fan-out decisions read (units bound parallelism; bytes gate
    * out query-batch-sized inputs where an exchange buys nothing).
    */
  def scanLayout(spark: SparkSession, path: String): (Int, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files = (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
                 else Seq(fs.getFileStatus(p)))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val sig = files.map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
    val bytes = files.map(_.getLen).sum
    unitsCache.get(path) match {
      case Some((s, n)) if s == sig => (n, bytes)
      case _ =>
        val n = files.map { st =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size finally r.close()
        }.sum
        unitsCache(path) = (sig, n)
        (n, bytes)
    }
  }

  /** [[load]] with compute fan-out for scan-bound operators (guide §2:
    * derive partitioning from the INPUT, never a constant): when the
    * file layout offers fewer splittable units than the session's
    * cores, hash-repartition to full width so per-row compute above the
    * scan (tokenize + hash signatures, distance arithmetic) runs at
    * core width instead of row-group width. At warehouse scale inputs
    * carry thousands of row groups and this is a no-op — the shuffle
    * only ever pays off (and only ever happens) when the layout would
    * otherwise idle the machine. Hash keys keep the exchange
    * deterministic (no round-robin local sort) and AQE never coalesces
    * an explicit-width repartition back down.
    */
  def loadFanOut(spark: SparkSession, sfDir: String, name: String,
                 by: Seq[String]): DataFrame = {
    val df = load(spark, sfDir, name)
    val p = spark.sparkContext.defaultParallelism
    if (scanUnits(spark, s"$sfDir/$name.parquet") >= p) df
    else df.repartition(p, by.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Convenience: standard local session shaped for this container
    * (local[32], 128 GiB, 32 shuffle partitions — see the builder notes).
    * On a real cluster only the master/shuffle settings change.
    */
  def session(appName: String, cores: Int = 32): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // keyed point reads push sorted 512-key IN chunks into parquet;
      // exact OR-of-eq row-group pruning (vs the min/max collapse past
      // the default threshold of 10) is what keeps probe bytes batch-
      // proportional — see KeyedReads. Session-wide so LAZY pruned
      // frames (planned after the read call returns) keep it too.
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.sources.KeyedReads.PruneChunk.toString)
      // pruned point reads pass explicit leaf-file lists; stat-ing a
      // batch-bounded list serially on the driver beats launching a
      // listing JOB per read (Spark's default threshold is 32 paths)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        graft.sources.KeyedReads.ListSerialThreshold.toString)
      // first take/limit attempt covers one full wave of the session's
      // cores instead of Spark's 1-partition default: a bounded
      // key-collect (`distinct.limit(cap).collect`) otherwise pays an
      // executeTake ramp of up to 4 Spark JOBS (1 → 4 → 16 → all
      // partitions) per collect — pure scheduling cost, since the
      // distinct's exchange already materialized the full input. Scales
      // with the session width, not a local constant.
      .config("spark.sql.limit.initialNumPartitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
