package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV shard ingestion with the same corrupt-record QUARANTINE
  * contract as [[Jsonl.readWithQuarantine]] — the other line-oriented
  * interchange format a migration front door meets (DB dumps, export
  * jobs). Same rationale: PERMISSIVE silently nulls broken records
  * into the corpus, FAILFAST lets one bad row kill the job; here every
  * line routes to exactly one of
  *
  *   good        — parsed rows matching `schema`, required fields present
  *   quarantine  — (line, reason): "malformed_csv" for unparseable
  *                 lines (unclosed quote, type mismatch, and token
  *                 count ≠ schema width — unlike the DataFrameReader,
  *                 `from_csv` treats short/long rows as corrupt, which
  *                 is the right default for a quarantine: a short row
  *                 is a broken row, not a row of trailing NULLs);
  *                 "missing_required:f" for rows that parse but carry
  *                 an EMPTY token in a required field (`,eve,` —
  *                 empty tokens parse to NULL)
  *
  * Contract: shards are HEADERLESS (the at-scale convention — a
  * billion-row export is thousands of shard files; per-file header
  * rows are a merge hazard, and a line-oriented text scan cannot know
  * line 1 of each file cheaply). `dropHeaderLines = true` additionally
  * drops lines byte-equal to the canonical `delimiter`-joined header
  * for tools that emit one; a data line that happens to equal the
  * header is indistinguishable by construction — documented caveat.
  * Values must not contain literal newlines (quoted newlines need a
  * non-splittable multiLine parse — use the built-in reader for those
  * files and give up per-block parallelism).
  *
  * Scale notes: one text scan, line-splittable (gzip shards
  * parallelize per file, plain text per block); `from_csv` is a
  * scan-side projection; no shuffle in either output.
  */
object Csv {

  def readWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         requiredFields: Seq[String] = Nil,
                         delimiter: String = ",",
                         dropHeaderLines: Boolean = false): (DataFrame, DataFrame) = {
    val missing = requiredFields.filterNot(f =>
      schema.fieldNames.exists(_.equalsIgnoreCase(f)))
    require(missing.isEmpty,
      s"requiredFields not in schema: ${missing.mkString(", ")}")
    val reserved = Seq("__line", "__r", "_corrupt_record")
    require(schema.fieldNames.intersect(reserved).isEmpty,
      s"schema must not use reserved column names ${reserved.mkString("/")}")
    require(delimiter.length == 1, "delimiter must be a single character")

    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val header = schema.fieldNames.mkString(delimiter)
    val lines0 = spark.read.textFile(path).toDF("__line")
      .filter(trim(col("__line")) =!= "")
    val lines = if (dropHeaderLines) lines0.filter(col("__line") =!= header) else lines0
    val parsed = lines.select(col("__line"),
      from_csv(col("__line"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record",
          "sep" -> delimiter)).as("__r"))

    val malformed = col("__r").isNull || col("__r._corrupt_record").isNotNull
    val requiredOk: Column =
      requiredFields.map(f => col(s"__r.$f").isNotNull)
        .foldLeft(lit(true))(_ && _)

    val good = parsed
      .filter(!malformed && requiredOk)
      .select(col("__r.*")).drop("_corrupt_record")

    val reason = when(malformed, lit("malformed_csv"))
      .otherwise(concat(lit("missing_required:"),
        concat_ws(",", array_compact(array(requiredFields.map(f =>
          when(col(s"__r.$f").isNull, lit(f))): _*)))))
    val quarantine = parsed
      .filter(malformed || !requiredOk)
      .select(col("__line").as("line"), reason.as("reason"))

    (good, quarantine)
  }
}
