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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Spark has no nanosecond TimestampType; read TIMESTAMP(NANOS) parquet
    // columns as Long and truncate to microseconds (integer `div`, not
    // floating division — epoch nanos exceed double's 2^53 exact range).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts",
        // NTZ to match how Spark infers the other parquet timestamp
        // columns (naive), keeping written output engine-neutral
        org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case None => df
    }
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
