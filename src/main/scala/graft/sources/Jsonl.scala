package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion with a corrupt-record QUARANTINE — the batch
  * front door for web-crawl-shaped data, where some fraction of lines
  * is always broken and neither built-in JSON mode is acceptable at
  * scale: PERMISSIVE silently nulls broken records into the corpus,
  * FAILFAST lets one bad line among billions kill a day-long job.
  *
  * This reader routes every input line to exactly one of two frames:
  *
  *   good        — parsed rows matching `schema`, required fields present
  *   quarantine  — (line, reason) for malformed JSON ("malformed_json")
  *                 or rows missing a required field ("missing_required:f")
  *
  * so a bad line costs one quarantine row, never a dropped record or a
  * failed job, and the quarantine frame can be written next to the
  * corpus for audit/replay.
  *
  * Scale notes: the input is read once as a text scan (line-splittable,
  * so gzipped shards parallelize per file and plain text per block);
  * parsing is a scan-side `from_json` projection — no shuffle in either
  * output. Blank lines are dropped (the JSONL convention), counted via
  * `observe` on the raw frame if callers need them.
  */
object Jsonl {

  /** Read `path` as JSONL against an explicit schema. Returns
    * (good, quarantine); neither frame is materialized here — callers
    * fan them to separate sinks in one pass each.
    *
    * `requiredFields` must exist in `schema` (checked eagerly); a parsed
    * row with any of them null is quarantined, because a null key (a
    * doc with no id, a record with no timestamp) poisons every
    * downstream join/groupBy silently.
    */
  def readWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         requiredFields: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val missing = requiredFields.filterNot(f =>
      schema.fieldNames.exists(_.equalsIgnoreCase(f)))
    require(missing.isEmpty,
      s"requiredFields not in schema: ${missing.mkString(", ")}")
    val reserved = Seq("__line", "__r", "_corrupt_record")
    require(schema.fieldNames.intersect(reserved).isEmpty,
      s"schema must not use reserved column names ${reserved.mkString("/")}")

    // Malformed lines surface through the corrupt-record channel:
    // PERMISSIVE from_json puts the raw line into `_corrupt_record`
    // when the JSON doesn't parse (it does NOT return a null struct
    // for those — the fields are nulled, indistinguishable from `{}`
    // without this column). A *well-formed* non-object (`42`, `null`)
    // is the one shape that parses to a null struct instead; both are
    // malformed here. A parse that succeeds but misses fields yields
    // null fields — the required-field signal.
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val parsed = spark.read.textFile(path).toDF("__line")
      .filter(trim(col("__line")) =!= "") // JSONL convention: blank lines are not records
      .select(col("__line"),
        from_json(col("__line"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__r"))

    val malformed = col("__r").isNull || col("__r._corrupt_record").isNotNull
    val requiredOk: org.apache.spark.sql.Column =
      requiredFields.map(f => col(s"__r.$f").isNotNull)
        .foldLeft(lit(true))(_ && _)

    val good = parsed
      .filter(!malformed && requiredOk)
      .select(col("__r.*")).drop("_corrupt_record")

    val reason = when(malformed, lit("malformed_json"))
      .otherwise(concat(lit("missing_required:"),
        concat_ws(",", array_compact(array(requiredFields.map(f =>
          when(col(s"__r.$f").isNull, lit(f))): _*)))))
    val quarantine = parsed
      .filter(malformed || !requiredOk)
      .select(col("__line").as("line"), reason.as("reason"))

    (good, quarantine)
  }
}
