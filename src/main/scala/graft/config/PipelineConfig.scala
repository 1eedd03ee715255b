package graft.config

import graft.operators.Relational.Rename

/** Pipeline description, mirroring the reference's YAML config model
  * (config/MigratorConfig.scala:14-38: source, target, renames,
  * savepoints, skip-sets, validation) minus the service-backed arms that
  * cannot run in this environment (CQL/DynamoDB endpoints become the
  * Parquet/JDBC/S3-export arms; the dispatch shape is identical).
  *
  * Decoding: a dependency-free line-based `key: value` format (the
  * environment has no YAML library; the *validation* semantics —
  * eager cross-checks at load time, reference MigratorConfig.scala:59-107
  * — are what matters and are preserved).
  */
final case class PipelineConfig(
    source: SourceConfig,
    target: TargetConfig,
    renames: List[Rename],
    savepointsDir: Option[String],
    skipFiles: Set[String],
    validation: Option[ValidationConfig],
    stream: Option[StreamConfig] = None,
    transforms: List[TransformConfig] = Nil) {

  /** Loggable rendering with sensitive material redacted (reference:
    * config/MigratorConfig.scala:134-153 + SparkSecretRedaction — the
    * `where` clause may embed literals from user data, JDBC URLs may
    * embed credentials; neither belongs in logs).
    */
  def renderRedacted: String = {
    def src = source match {
      case SourceConfig.Parquet(path, where, cols, versioned, versionAt, _) =>
        s"parquet(path=$path, where=${where.map(_ => "<redacted>")}, columns=$cols" +
          (if (versioned) ", versioned" else "") +
          versionAt.map(n => s", versionAt=$n").getOrElse("") + ")"
      case j: SourceConfig.Jdbc =>
        val url = j.url.replaceAll("(?i)(password|user)=[^&;]*", "$1=<redacted>")
        s"jdbc(url=$url, table=${j.table}, where=${j.where.map(_ => "<redacted>")}, " +
          s"partitions=${j.numPartitions})"
      case SourceConfig.DynamoS3Export(p) => s"dynamo-s3-export(path=$p)"
      case c: SourceConfig.Csv =>
        s"csv(path=${c.path}, header=${c.header}, delimiter=${c.delimiter}, " +
          s"schema=${c.schema.isDefined}, where=${c.where.map(_ => "<redacted>")}, " +
          s"columns=${c.columns})"
      case j: SourceConfig.Json =>
        s"json(path=${j.path}, schema=${j.schema.isDefined}, " +
          s"where=${j.where.map(_ => "<redacted>")}, columns=${j.columns})"
      case o: SourceConfig.Orc =>
        s"orc(path=${o.path}, where=${o.where.map(_ => "<redacted>")}, " +
          s"columns=${o.columns})"
    }
    def tgt = target match {
      case t: TargetConfig.Parquet =>
        s"parquet(path=${t.path}, mode=${t.mode}, compression=${t.compression}, " +
          s"partitionBy=${t.partitionBy}, sortBy=${t.sortBy}" +
          (if (t.maxRecordsPerFile > 0) s", maxRecordsPerFile=${t.maxRecordsPerFile}" else "") +
          (if (t.globalSortBy.nonEmpty) s", globalSortBy=${t.globalSortBy}" else "") +
          (if (t.statsIndexColumns.nonEmpty) s", statsIndex=${t.statsIndexColumns}" else "") +
          (if (t.versioned) ", versioned" else "") +
          (if (t.zorderBy.nonEmpty) s", zorderBy=${t.zorderBy}" else "") + ")"
      case TargetConfig.DynamoS3Export(p) => s"dynamo-s3-export(path=$p)"
      case t: TargetConfig.TarShards =>
        s"tar-shards(path=${t.path}, key=${t.keyColumn}, payload=${t.payloadColumn}, " +
          s"maxShardBytes=${t.maxShardBytes}, numShards=${t.numShards})"
      case c: TargetConfig.Csv =>
        s"csv(path=${c.path}, mode=${c.mode}, header=${c.header}, delimiter=${c.delimiter})"
      case j: TargetConfig.Json => s"json(path=${j.path}, mode=${j.mode})"
      case o: TargetConfig.Orc =>
        s"orc(path=${o.path}, mode=${o.mode}, compression=${o.compression})"
    }
    s"PipelineConfig(source=$src, target=$tgt, renames=${renames.size}, " +
      s"skipFiles=${skipFiles.size}, validation=${validation.isDefined}, " +
      s"stream=${stream.isDefined}, transforms=${transforms.map(_.name).mkString("[", ",", "]")})"
  }

  /** Eager cross-validation (fail at load, not mid-run). */
  def validate: Either[String, PipelineConfig] = {
    val renameTargets = renames.map(_.to.toLowerCase)
    if (renameTargets.distinct.size != renameTargets.size)
      Left("rename target collision")
    else if (validation.exists(_.primaryKey.isEmpty))
      Left("validation.primaryKey must be non-empty")
    else if (validation.exists(_.tolerance < 0))
      Left("validation.tolerance must be >= 0")
    else if (stream.isDefined && !target.isInstanceOf[TargetConfig.Parquet])
      Left("stream replication requires a parquet target")
    else if (target match {
      case p: TargetConfig.Parquet => p.versioned &&
        (savepointsDir.isDefined || stream.isDefined)
      case _ => false
    })
      Left("target.versioned publishes whole immutable snapshots — " +
        "incompatible with per-batch resume (savepoints) and continuous " +
        "replication (stream); run those against a plain path and publish " +
        "the finished result")
    else if (savepointsDir.isDefined && (source match {
      case s: SourceConfig.Parquet => !s.versioned
      case _ => false
    }) && (target match {
      case p: TargetConfig.Parquet => p.mode.toLowerCase != "append"
      case _ => false
    }))
      Left("savepoints.dir runs per-file-batch APPENDS — set target.mode: " +
        "append (any other mode pretends to clear a target that a resumed " +
        "run must never clear; wipe the directory explicitly for a fresh run)")
    else if (stream.exists(_.primaryKey.isEmpty))
      Left("stream.primaryKey must be non-empty")
    else if (stream.exists(_.orderBy.isEmpty))
      Left("stream.orderBy must be non-empty (last-writer-wins needs an order)")
    else if (stream.isDefined && transforms.nonEmpty)
      Left("transforms apply to batch copies; the stream path replays " +
        "changes verbatim (curate the snapshot, then stream into it)")
    else
      transforms.flatMap(_.check).headOption.toLeft(this)
  }
}

/** Config-driven curation stages, applied in listed order between the
  * source read (+renames) and the target write — the training-data
  * operators (pipeline/Dedup, operators/Sampling) exposed through the
  * same declarative surface as the rest of the pipeline. Each stage is
  * a pure DataFrame -> DataFrame transform; resume and validation wrap
  * the transformed frame exactly as they do a plain copy.
  */
sealed trait TransformConfig {
  def name: String
  /** Eager validation error, if any (fail at load, not mid-run). */
  def check: Option[String]
}
object TransformConfig {
  /** Keep one row per distinct value of `textColumn` (min `idColumn`
    * wins) — Dedup.exactGroups + a self-join to re-attach the row.
    */
  final case class DedupExact(idColumn: String, textColumn: String)
      extends TransformConfig {
    val name = "dedupExact"
    def check: Option[String] = None
  }
  /** Keep at most `k` rows per group, ranked by (md5(textColumn),
    * idColumn) — Sampling.capPerGroup (two-stage salted ranking).
    */
  final case class SourceCap(groupColumns: List[String], idColumn: String,
                             textColumn: String, k: Int)
      extends TransformConfig {
    val name = "sourceCap"
    def check: Option[String] =
      if (k <= 0) Some("transform.sourceCap.k must be positive")
      else if (groupColumns.isEmpty) Some("transform.sourceCap.groupColumns required")
      else None
  }
  /** Canonical text normalization in place — Text.normalize over
    * `textColumn` (control chars, whitespace, case); step 0 before any
    * content-keyed stage.
    */
  final case class Normalize(textColumn: String) extends TransformConfig {
    val name = "normalize"
    def check: Option[String] = None
  }
  /** Cross-document span boilerplate removal — Dedup.spanDedup; the
    * document's text column is REPLACED by the cleaned text (n_spans /
    * n_removed are dropped: config stages compose on the input schema).
    */
  final case class SpanDedup(idColumn: String, textColumn: String,
                             spanTokens: Int, minDocs: Int,
                             keepFirst: Boolean) extends TransformConfig {
    val name = "spanDedup"
    def check: Option[String] =
      if (spanTokens <= 0) Some("transform.spanDedup.spanTokens must be positive")
      else if (minDocs <= 1) Some("transform.spanDedup.minDocs must be > 1")
      else None
  }
  /** Token-gram substring dedup — Dedup.cutDupSpans (the suffix-array-
    * dedup analog): tokens covered by a k-token gram occurring at least
    * `minCount` times corpus-wide are cut out; only documents that
    * actually contain a duplicated span are rewritten, the rest keep
    * their original text byte-for-byte. Schema-preserving.
    */
  final case class DupSpanCut(idColumn: String, textColumn: String,
                              gramTokens: Int, minCount: Long)
      extends TransformConfig {
    val name = "dupSpanCut"
    def check: Option[String] =
      if (gramTokens <= 0) Some("transform.dupSpanCut.gramTokens must be positive")
      else if (minCount <= 1) Some("transform.dupSpanCut.minCount must be > 1")
      else None
  }
  /** Label rows with a named split — Sampling.split (md5-bucket
    * membership; deterministic on any engine/partitioning/retry).
    */
  final case class Split(keyColumn: String, fractions: List[(String, Int)],
                         denom: Int)
      extends TransformConfig {
    val name = "split"
    def check: Option[String] =
      if (denom <= 0) Some("transform.split.denom must be positive")
      else if (fractions.isEmpty) Some("transform.split.fractions required")
      else if (fractions.exists(_._2 < 0) || fractions.map(_._2).sum > denom)
        Some("transform.split.fractions must be non-negative and fit in denom")
      else None
  }
  /** MinHash near-dup removal: shingle -> signature -> LSH candidates
    * -> exact Jaccard verify at `thresholdNum/thresholdDenom` ->
    * cluster -> keep only each cluster's representative (min id). The
    * full Dedup tier-2 path behind one stage.
    */
  final case class MinhashDedup(idColumn: String, textColumn: String,
                                shingleSize: Int, numHashes: Int,
                                bands: Int, rowsPerBand: Int,
                                thresholdNum: Int, thresholdDenom: Int,
                                keepLongest: Boolean = false)
      extends TransformConfig {
    val name = "minhashDedup"
    def check: Option[String] =
      if (shingleSize <= 0) Some("transform.minhashDedup.shingleSize must be positive")
      else if (numHashes != bands * rowsPerBand)
        Some(s"transform.minhashDedup.numHashes ($numHashes) must equal " +
          s"bands*rowsPerBand (${bands * rowsPerBand})")
      else if (thresholdNum <= 0 || thresholdDenom <= 0 || thresholdNum > thresholdDenom)
        Some("transform.minhashDedup threshold must be a fraction in (0, 1]")
      else None
  }
  /** Embedding near-dup removal — Similarity.semanticDedup over
    * `vecColumn` with seed-fixed hyperplanes; rows whose vector
    * cosine-matches an earlier (smaller-id) row at >= threshold drop.
    */
  final case class SemanticDedup(idColumn: String, vecColumn: String,
                                 numPlanes: Int, bandBits: Int,
                                 threshold: Double, seed: Long)
      extends TransformConfig {
    val name = "semanticDedup"
    def check: Option[String] =
      if (numPlanes <= 0) Some("transform.semanticDedup.numPlanes must be positive")
      else if (bandBits <= 0 || numPlanes % bandBits != 0)
        Some("transform.semanticDedup.bandBits must divide numPlanes")
      else if (threshold < -1.0 || threshold > 1.0)
        Some("transform.semanticDedup.threshold must be a cosine in [-1, 1]")
      else None
  }
  /** Eval-set decontamination — Dedup.decontaminate: DROP corpus rows
    * sharing >= `minShared` distinct word `ngram`-grams with the
    * reference corpus at `referencePath` (parquet, same text column
    * semantics).
    */
  final case class Decontaminate(idColumn: String, textColumn: String,
                                 referencePath: String, ngram: Int,
                                 minShared: Long)
      extends TransformConfig {
    val name = "decontaminate"
    def check: Option[String] =
      if (ngram <= 0) Some("transform.decontaminate.ngram must be positive")
      else if (minShared <= 0) Some("transform.decontaminate.minShared must be positive")
      else None
  }
  /** Embedding-space decontamination — Similarity.semanticDecontaminate:
    * drop rows whose int8-code integer dot with any reference embedding
    * (parquet at `referencePath`, same vector column name) reaches
    * `minDot`; schema-preserving, corpus rows never shuffle.
    */
  final case class SemanticDecontaminate(vecColumn: String,
                                         referencePath: String, minDot: Long)
      extends TransformConfig {
    val name = "semanticDecontaminate"
    def check: Option[String] =
      if (minDot <= 0L)
        Some("transform.semanticDecontaminate.minDot must be positive")
      else None
  }
  /** DSIR data selection — Text.dsirFeatures/dsirWeights: score every
    * row's hashed-ngram counts by the ln-ratio of a TARGET corpus
    * (parquet at `targetPath`) over the input corpus, keep the
    * highest-weight keepNum/keepDenom fraction (approx-percentile
    * cutoff — no global sort; boundary ties keep). Schema-preserving;
    * rows with no tokens can't score and drop.
    */
  final case class DsirFilter(idColumn: String, textColumn: String,
                              targetPath: String, targetTextColumn: String,
                              buckets: Int, keepNum: Int, keepDenom: Int)
      extends TransformConfig {
    val name = "dsirFilter"
    def check: Option[String] =
      if (targetPath.isEmpty) Some("transform.dsirFilter.targetPath required")
      else if (buckets <= 0) Some("transform.dsirFilter.buckets must be positive")
      else if (keepDenom <= 0 || keepNum <= 0 || keepNum > keepDenom)
        Some("transform.dsirFilter.keep fraction must satisfy 0 < num <= denom")
      else None
  }
  /** CCNet-style perplexity-bucket filter — Text.pplBuckets(+Approx):
    * score each document against the corpus's own unigram model, split
    * each language into `buckets` commonness bands (1 = head = most
    * typical), keep rows whose bucket is in `keep`. Schema-preserving;
    * zero-token documents drop (they have no LM score). `approx = true`
    * (default) is the 100-TB path — percentile cutoffs instead of a
    * per-language sort.
    */
  final case class PplFilter(idColumn: String, textColumn: String,
                             langColumn: String, buckets: Int,
                             keep: List[Long], approx: Boolean)
      extends TransformConfig {
    val name = "pplFilter"
    def check: Option[String] =
      if (buckets <= 0) Some("transform.pplFilter.buckets must be positive")
      else if (keep.isEmpty) Some("transform.pplFilter.keep required")
      else if (keep.exists(b => b < 1 || b > buckets))
        Some(s"transform.pplFilter.keep values must be in 1..$buckets")
      else None
  }
  /** PII scrub — Text.redactPii: emails and long digit runs replaced
    * with typed placeholder tokens in `textColumn`; stateless and
    * schema-preserving (runs on streams unchanged).
    */
  final case class PiiScrub(textColumn: String) extends TransformConfig {
    val name = "piiScrub"
    def check: Option[String] = None
  }
  /** Per-group token-budget sampler — Sampling.tokenBudget: keep rows
    * in md5(key) priority order while each group's cumulative token
    * count stays within budget; range-sharded cumsum plan, nested
    * samples across budgets, schema-preserving.
    */
  final case class TokenBudget(groupColumn: String, keyColumn: String,
                               tokenColumn: String, budget: Long, shards: Int)
      extends TransformConfig {
    val name = "tokenBudget"
    def check: Option[String] =
      if (budget <= 0) Some("transform.tokenBudget.budget must be positive")
      else if (shards <= 0 || (shards & (shards - 1)) != 0)
        Some("transform.tokenBudget.shards must be a power of two")
      else None
  }
  /** Incremental cross-snapshot dedup — Dedup.newAgainst: drop rows
    * whose content digest already appears in the reference corpus (the
    * prior shard), then exact-dedup the survivors in-batch (min-id
    * keeper). `referenceTextColumn` defaults to `textColumn`.
    */
  final case class IncrDedup(idColumn: String, textColumn: String,
                             referencePath: String, referenceTextColumn: String)
      extends TransformConfig {
    val name = "incrDedup"
    def check: Option[String] = None
  }
  /** Target-mixture rebalance — Sampling.mixToTarget: keep the largest
    * corpus whose `groupColumn` proportions match `weights`/`wDenom`
    * (integer quota math, md5-mod membership); groups without a listed
    * weight are dropped from the mix.
    */
  final case class MixToTarget(keyColumn: String, groupColumn: String,
                               weights: List[(String, Int)], wDenom: Int)
      extends TransformConfig {
    val name = "mixToTarget"
    def check: Option[String] =
      if (wDenom <= 0) Some("transform.mixToTarget.wDenom must be positive")
      else if (weights.isEmpty) Some("transform.mixToTarget.weights required")
      else if (weights.map(_._1).distinct.size != weights.size)
        Some("transform.mixToTarget.weights has a duplicate group")
      else if (weights.exists(_._2 < 0) || weights.map(_._2).sum > wDenom)
        Some("transform.mixToTarget.weights must be non-negative and sum to <= wDenom")
      else if (!weights.exists(_._2 > 0))
        Some("transform.mixToTarget.weights need at least one positive entry")
      else None
  }
  /** Group-relative outlier drop — Moments.flagOutliers: remove rows
    * whose integer `valueColumn` deviates more than `z` population
    * standard deviations from its group mean (exact integer moments,
    * retry/engine-invariant flag).
    */
  final case class OutlierFilter(valueColumn: String, groupColumn: String,
                                 z: Double)
      extends TransformConfig {
    val name = "outlierFilter"
    def check: Option[String] =
      if (z <= 0) Some("transform.outlierFilter.z must be positive")
      else None
  }
  /** Linear quality-classifier row filter — Text.qualityFilter: keep
    * rows whose integer per-mille quality score (stopword/punct/digit
    * density, avg token length under integer weights) clears
    * `minScore`; schema-preserving, scan-side, engine-exact.
    */
  final case class QualityFilter(textColumn: String, minScore: Long,
                                 bias: Long, wStop: Long, wPunct: Long,
                                 wDigit: Long, wTokLen: Long)
      extends TransformConfig {
    val name = "qualityFilter"
    def check: Option[String] = None // any integer weights are a valid model
  }
  /** Gopher rule-set row filter — Text.gopherFilter: keep rows passing
    * every Gopher document-quality rule (word count, mean word length,
    * alphabetic-word %, symbol %, stopword hits, top-token %);
    * schema-preserving, scan-side, integer-exact.
    */
  final case class GopherFilter(textColumn: String, minWords: Long,
                                maxWords: Long, minMeanLen: Long,
                                maxMeanLen: Long, minAlphaPct: Long,
                                maxSymbolPct: Long, minStopHits: Long,
                                maxTopTokenPct: Long)
      extends TransformConfig {
    val name = "gopherFilter"
    def check: Option[String] =
      if (minWords < 0 || maxWords < minWords)
        Some("transform.gopherFilter: need 0 <= minWords <= maxWords")
      else if (minMeanLen < 0 || maxMeanLen < minMeanLen)
        Some("transform.gopherFilter: need 0 <= minMeanLen <= maxMeanLen")
      else None
  }
  /** Gopher repetition-ceiling row filter — Text.repetitionFilter:
    * keep rows whose top-n-gram / duplicated-n-gram character coverage
    * stays under the per-n percentage ceilings. `topPcts` are the
    * ceilings for n = 2, 3, … (most-frequent-gram chars); `dupPcts`
    * for n = 5, 6, … (chars covered by any gram occurring twice);
    * schema-preserving, scan-side, integer-exact.
    */
  final case class RepetitionFilter(textColumn: String, topPcts: List[Long],
                                    dupPcts: List[Long])
      extends TransformConfig {
    val name = "repetitionFilter"
    def check: Option[String] =
      if (topPcts.isEmpty && dupPcts.isEmpty)
        Some("transform.repetitionFilter: need at least one ceiling")
      else if ((topPcts ++ dupPcts).exists(_ < 0L))
        Some("transform.repetitionFilter: ceilings must be >= 0")
      else None
  }
  /** Wordlist row filter — Text.blocklistFilter: drop rows containing
    * more than `maxTerms` distinct blocklist terms (C4-style bad-words
    * stage; token-boundary, case-folded, phrases supported).
    * `termsPath` is a text file, one term per line — wordlists are
    * bounded, so the stage reads it once and filters scan-side.
    */
  final case class BlocklistFilter(textColumn: String, termsPath: String,
                                   maxTerms: Long)
      extends TransformConfig {
    val name = "blocklist"
    def check: Option[String] =
      if (termsPath.isEmpty) Some("transform.blocklist.termsPath required")
      else if (maxTerms < 0) Some("transform.blocklist.maxTerms must be >= 0")
      else None
  }
  /** Gap-based sessionization — Sessionize.sessionize: adds a
    * `session_seq` column (1-based session index per key); schema-
    * EXTENDING. `gap` is a SQL interval body ("30 minutes"); `tieBreak`
    * columns disambiguate equal timestamps.
    */
  final case class SessionizeStage(keys: List[String], tsColumn: String,
                                   gap: String, tieBreak: List[String])
      extends TransformConfig {
    val name = "sessionize"
    def check: Option[String] =
      if (keys.isEmpty) Some("transform.sessionize.keys required")
      else if (gap.isEmpty) Some("transform.sessionize.gap required")
      else None
  }
  /** Funnel conversion curve — Funnel.stepCounts: TERMINAL reshape;
    * output is one row per step `(step, step_type, n_reached)`, not the
    * input schema — place last (it is a whole-corpus summary).
    */
  final case class FunnelStage(keyColumn: String, tsColumn: String,
                               typeColumn: String, steps: List[String])
      extends TransformConfig {
    val name = "funnel"
    def check: Option[String] =
      if (steps.isEmpty) Some("transform.funnel.steps required")
      else if (steps.distinct.size != steps.size)
        Some("transform.funnel.steps has a duplicate step")
      else None
  }
  /** Cohort retention — Retention.cohortRetention: TERMINAL reshape to
    * `(cohort_bucket, bucket_offset, n_active, cohort_size)` rows.
    */
  final case class RetentionStage(keyColumn: String, tsColumn: String,
                                  bucketDays: Int)
      extends TransformConfig {
    val name = "retention"
    def check: Option[String] =
      if (bucketDays < 1) Some("transform.retention.bucketDays must be >= 1")
      else None
  }
  /** SCD2 history build — Scd2.buildHistory over an upsert/delete log:
    * TERMINAL reshape to versioned rows `(key, values..., valid_from,
    * valid_to, is_current)` — the stage that turns a CDC log into a
    * queryable dimension history (write it, then `pitEnrich` against it).
    */
  final case class Scd2HistoryStage(keyColumn: String, tsColumn: String,
                                    opColumn: String, upsertOp: String,
                                    deleteOp: String, valueColumns: List[String],
                                    tieBreak: List[String])
      extends TransformConfig {
    val name = "scd2History"
    def check: Option[String] =
      if (valueColumns.isEmpty) Some("transform.scd2History.valueColumns required")
      else if (upsertOp == deleteOp)
        Some("transform.scd2History upsertOp and deleteOp must differ")
      else None
  }
  /** Point-in-time enrichment — Scd2.pointInTime: the piped frame is the
    * FACT table; `historyPath` holds a persisted `scd2History` output
    * (parquet). Schema-EXTENDING: adds `pit_<value>` columns, NULL when
    * the key's version had expired (deleted) before the fact — the
    * leakage-safe feature-store join.
    */
  final case class PitEnrichStage(historyPath: String, keyColumn: String,
                                  tsColumn: String, valueColumns: List[String])
      extends TransformConfig {
    val name = "pitEnrich"
    def check: Option[String] =
      if (historyPath.isEmpty) Some("transform.pitEnrich.historyPath required")
      else if (valueColumns.isEmpty) Some("transform.pitEnrich.valueColumns required")
      else None
  }
  /** Snapshot merge — Merge.merge with the piped frame as SOURCE and the
    * parquet at `snapshotPath` as TARGET: matched keys take the source
    * row (update), unmatched source keys insert, and target-only keys
    * are deleted when `deleteStale` (full snapshot sync) or kept (pure
    * upsert). Output is the NEW snapshot frame (target schema) — write
    * it to the next snapshot path, never in place over `snapshotPath`
    * (the plan reads it lazily). Source must be unique per key.
    */
  final case class MergeSnapshotStage(snapshotPath: String, keys: List[String],
                                      deleteStale: Boolean)
      extends TransformConfig {
    val name = "mergeSnapshot"
    def check: Option[String] =
      if (snapshotPath.isEmpty) Some("transform.mergeSnapshot.snapshotPath required")
      else if (keys.isEmpty) Some("transform.mergeSnapshot.keys required")
      else None
  }
  /** Perceptual media dedup — Multimodal.perceptualHashes (decoder
    * resolved from the MediaDecoders registry at RUN time, driver-side)
    * + phashNearDup banded join + min-id representative per near-dup
    * cluster: rows whose payload hashes within `maxDist` of an
    * earlier-id row drop. Schema-preserving (survivors keep all
    * columns).
    */
  final case class PhashDedupStage(idColumn: String, payloadColumn: String,
                                   decoder: String, maxDist: Int,
                                   lenient: Boolean = false)
      extends TransformConfig {
    val name = "phashDedup"
    def check: Option[String] =
      if (decoder.isEmpty) Some("transform.phashDedup.decoder required")
      else if (maxDist < 0 || maxDist > 15)
        Some("transform.phashDedup.maxDist must be in [0, 15]")
      else None
  }
  /** Incremental SCD2 absorption — Scd2.appendToHistory with the piped
    * frame as the NEW ops and the parquet at `historyPath` as the
    * existing history: TERMINAL reshape to the history layout. Write
    * the output to the NEXT history path (never in place over
    * `historyPath` — the plan reads it lazily), exactly like
    * `mergeSnapshot`.
    */
  final case class Scd2AppendStage(historyPath: String, keyColumn: String,
                                   tsColumn: String, opColumn: String,
                                   upsertOp: String, deleteOp: String,
                                   valueColumns: List[String], tieBreak: List[String])
      extends TransformConfig {
    val name = "scd2Append"
    def check: Option[String] =
      if (historyPath.isEmpty) Some("transform.scd2Append.historyPath required")
      else if (valueColumns.isEmpty) Some("transform.scd2Append.valueColumns required")
      else if (upsertOp == deleteOp)
        Some("transform.scd2Append upsertOp and deleteOp must differ")
      else None
  }
  /** Data-quality gate — validation.Constraints over the piped frame:
    * the ONE EAGER stage (it runs the constraint aggregates when the
    * pipeline reaches it — a gate that doesn't look is not a gate) and
    * schema-PRESERVING: on success the frame passes through untouched,
    * on any violation the pipeline fails listing every failing
    * constraint with its violation count. Scalar constraints cost one
    * aggregation pass; uniqueKey one hash aggregate; the optional FK
    * one anti-join against `fkRefPath` parquet. Place it before the
    * target write (gate, then publish).
    */
  final case class ConstraintGateStage(notNull: List[String], uniqueKey: List[String],
                                       minRows: Long, maxRows: Long,
                                       fkColumn: String, fkRefPath: String,
                                       fkRefColumn: String)
      extends TransformConfig {
    val name = "constraintGate"
    def check: Option[String] = {
      val fk = Seq(fkColumn, fkRefPath, fkRefColumn)
      if (notNull.isEmpty && uniqueKey.isEmpty && minRows <= 0 &&
          maxRows == Long.MaxValue && fk.forall(_.isEmpty))
        Some("transform.constraintGate declares no constraint")
      else if (fk.exists(_.nonEmpty) && fk.exists(_.isEmpty))
        Some("transform.constraintGate fkColumn/fkRefPath/fkRefColumn are all-or-none")
      else if (minRows < 0 || maxRows < minRows)
        Some("transform.constraintGate needs 0 <= minRows <= maxRows")
      else None
    }
  }
  /** Greedy sequence packing — Packing.packGreedy over token counts
    * derived from `textColumn`. TERMINAL reshape: unlike the other
    * stages the OUTPUT schema is the packed-sequence layout
    * (idColumn, seq_id, seq_pos, tok_used), not the input schema —
    * place it last (or before a `split` keyed on seq_id).
    */
  final case class SeqPack(idColumn: String, textColumn: String,
                           budget: Long, shardWidth: Long)
      extends TransformConfig {
    val name = "seqPack"
    def check: Option[String] =
      if (budget <= 0) Some("transform.seqPack.budget must be positive")
      else if (shardWidth <= 0) Some("transform.seqPack.shardWidth must be positive")
      else None
  }
  /** Outlier winsorization — operators.Winsorize over the piped frame:
    * clip `valueColumn` to its group's [pct, 100−pct] bounds into
    * `outColumn`. Schema-EXTENDING. `tier: exact` is the one-window
    * exact-rank clip (per-group sort — honest but heavy on huge
    * groups); `tier: approx` takes KLL-sketch bounds (map-side sketch
    * merge, no sort — the 100-TB route for heavy groups).
    */
  final case class WinsorizeStage(groupColumns: List[String], valueColumn: String,
                                  pct: Int, outColumn: String, tier: String)
      extends TransformConfig {
    val name = "winsorize"
    def check: Option[String] =
      if (groupColumns.isEmpty) Some("transform.winsorize.groupColumns required")
      else if (pct < 1 || pct > 49) Some("transform.winsorize.pct must be in [1, 49]")
      else if (outColumn.isEmpty) Some("transform.winsorize.outColumn required")
      else if (tier != "exact" && tier != "approx")
        Some("transform.winsorize.tier must be exact or approx")
      else None
  }
  /** Incremental near-dup curation against a persisted NearDupStore —
    * Dedup.NearDupStore.dropNearDups: drop batch rows whose exact
    * unigram Jaccard against the stored corpus reaches
    * thresholdNum/thresholdDenom; `advance: true` appends survivors so
    * the next batch dedups against this one. Schema-preserving.
    */
  final case class LshDedupStage(indexPath: String, idColumn: String,
                                 textColumn: String, thresholdNum: Int,
                                 thresholdDenom: Int, minBands: Int,
                                 minMatchingHashes: Int, advance: Boolean,
                                 maxPruneKeys: Int = 2000000,
                                 minPruneBytes: Long = 0L)
      extends TransformConfig {
    val name = "lshDedup"
    def check: Option[String] =
      if (indexPath.isEmpty) Some("transform.lshDedup.indexPath required")
      else if (idColumn.isEmpty) Some("transform.lshDedup.idColumn required")
      else if (textColumn.isEmpty) Some("transform.lshDedup.textColumn required")
      else if (thresholdNum < 1 || thresholdDenom < 1 || thresholdNum > thresholdDenom)
        Some("transform.lshDedup threshold must satisfy 1 <= num <= denom")
      else if (minBands < 1) Some("transform.lshDedup.minBands must be >= 1")
      else if (maxPruneKeys < 1) Some("transform.lshDedup.maxPruneKeys must be >= 1")
      else if (minPruneBytes < 0) Some("transform.lshDedup.minPruneBytes must be >= 0")
      else None
  }
  /** ANN top-k search against a PERSISTED vector index
    * (pipeline.AnnIndex): the piped rows are the queries; the output
    * is (query id, rank, neighbor_id, adc_dist) — k rows per query.
    * Terminal reshape. The index is the durable artifact an ingest
    * (StreamingAnn / AnnIndex.appendEpoch) maintains; this stage is
    * its read face on the declarative surface. Search scans codes in
    * probed buckets only (bucket-clustered row-group skipping) —
    * never the vectors.
    */
  final case class AnnSearchStage(indexRoot: String, idColumn: String,
                                  vecColumn: String, k: Int, nProbe: Int,
                                  versioned: Boolean = false,
                                  filterPath: Option[String] = None,
                                  filterColumn: Option[String] = None,
                                  rerankPath: Option[String] = None,
                                  rerankKCand: Option[Int] = None)
      extends TransformConfig {
    val name = "annSearch"
    def check: Option[String] =
      if (indexRoot.isEmpty) Some("transform.annSearch.indexRoot required")
      else if (idColumn.isEmpty) Some("transform.annSearch.idColumn required")
      else if (vecColumn.isEmpty) Some("transform.annSearch.vecColumn required")
      else if (k < 1) Some("transform.annSearch.k must be >= 1")
      else if (nProbe < 1) Some("transform.annSearch.nProbe must be >= 1")
      else if (filterPath.isDefined != filterColumn.isDefined)
        Some("transform.annSearch.filterPath and filterColumn go together")
      else if (rerankPath.isDefined != rerankKCand.isDefined)
        Some("transform.annSearch.rerankPath and rerankKCand go together")
      else if (rerankKCand.exists(_ < k))
        Some("transform.annSearch.rerankKCand must be >= k")
      else if (rerankPath.isDefined && filterPath.isDefined)
        Some("transform.annSearch rerank and filter cannot combine (yet): " +
          "restrict the corpus at rerankPath instead")
      else None
  }
  /** Exactly-once vector ingest into a persisted AnnIndex as a
    * pipeline side effect: the piped rows (typically curated
    * survivors carrying an embedding column) appendEpoch into the
    * index under `tag` and flow on UNCHANGED — the curate-then-index
    * loop as one config. Re-running the same config (same tag) is
    * retire-and-redo: end-state idempotent, never double-inserted.
    */
  final case class AnnIngestStage(indexRoot: String, idColumn: String,
                                  vecColumn: String, tag: String)
      extends TransformConfig {
    val name = "annIngest"
    def check: Option[String] =
      if (indexRoot.isEmpty) Some("transform.annIngest.indexRoot required")
      else if (idColumn.isEmpty) Some("transform.annIngest.idColumn required")
      else if (vecColumn.isEmpty) Some("transform.annIngest.vecColumn required")
      else if (tag.isEmpty) Some("transform.annIngest.tag required")
      else None
  }
  /** Right-to-be-forgotten as a pipeline event: the piped rows ARE the
    * RTBF batch — their `idColumn` values are purged from the named
    * persisted store (annIndex / lexIndex / nearDupStore crash-safe
    * targeted rewrite, the CLI `forget` arms' exact semantics) and the
    * rows flow on UNCHANGED, so the same config can write the batch to
    * an audit target. Passthrough side effect, eager at stage
    * application; same between-epochs caveat as every store rewrite.
    */
  final case class ForgetStage(store: String, root: String, idColumn: String)
      extends TransformConfig {
    val name = "forget"
    def check: Option[String] =
      if (!ForgetStage.Stores(store))
        Some(s"transform.forget.store must be one of ${ForgetStage.Stores.mkString("|")}")
      else if (root.isEmpty) Some("transform.forget.root required")
      else if (idColumn.isEmpty) Some("transform.forget.idColumn required")
      else None
  }
  object ForgetStage {
    val Stores: Set[String] = Set("annIndex", "lexIndex", "nearDupStore", "linkGraph")
    /** RTBF batches are bounded by nature (requests, not corpora); the
      * cap bounds the stage's driver-side key collect explicitly.
      */
    val MaxIds = 1000000
  }
  /** RFM customer scoring — operators.Rfm.scores: reduce the piped
    * event log to one row per key with recency/frequency/monetary and
    * their ntile scores as of `asOf` (an ISO date). Terminal reshape
    * (output is the |keys|-row scoring table).
    */
  final case class RfmStage(keyColumn: String, tsColumn: String,
                            valueColumn: String, asOf: String, buckets: Int)
      extends TransformConfig {
    val name = "rfm"
    def check: Option[String] =
      if (keyColumn.isEmpty) Some("transform.rfm.keyColumn required")
      else if (tsColumn.isEmpty) Some("transform.rfm.tsColumn required")
      else if (valueColumn.isEmpty) Some("transform.rfm.valueColumn required")
      else if (!asOf.matches("\\d{4}-\\d{2}-\\d{2}"))
        Some("transform.rfm.asOf must be an ISO date (yyyy-MM-dd)")
      else if (buckets < 2) Some("transform.rfm.buckets must be >= 2")
      else None
  }
  /** Journey transition matrix — operators.Journeys.transitionMatrix:
    * (from_type, to_type, n_transitions) counts over each key's
    * timeline; NULL from_type rows are the entry distribution.
    * Terminal reshape (|types|²-row matrix).
    */
  final case class TransitionMatrixStage(keyColumn: String, tsColumn: String,
                                         typeColumn: String,
                                         tieBreak: List[String])
      extends TransformConfig {
    val name = "transitionMatrix"
    def check: Option[String] =
      if (keyColumn.isEmpty) Some("transform.transitionMatrix.keyColumn required")
      else if (tsColumn.isEmpty) Some("transform.transitionMatrix.tsColumn required")
      else if (typeColumn.isEmpty) Some("transform.transitionMatrix.typeColumn required")
      else None
  }
  /** Multi-touch attribution — operators.Journeys.attribution:
    * first/last/linear credit per touch type over journeys that reach
    * `conversionType`. Terminal reshape (one row per touch type).
    */
  final case class AttributionStage(keyColumn: String, tsColumn: String,
                                    typeColumn: String, conversionType: String,
                                    touchTypes: List[String],
                                    tieBreak: List[String])
      extends TransformConfig {
    val name = "attribution"
    def check: Option[String] =
      if (keyColumn.isEmpty) Some("transform.attribution.keyColumn required")
      else if (tsColumn.isEmpty) Some("transform.attribution.tsColumn required")
      else if (typeColumn.isEmpty) Some("transform.attribution.typeColumn required")
      else if (conversionType.isEmpty) Some("transform.attribution.conversionType required")
      else if (touchTypes.isEmpty) Some("transform.attribution.touchTypes required")
      else if (touchTypes.contains(conversionType))
        Some("transform.attribution.conversionType cannot also be a touch type")
      else None
  }
  /** Rolling z-score anomaly screen — operators.Anomaly.rollingZFlags:
    * flag rows whose `valueColumn` sits more than `z` trailing standard
    * deviations from the previous `window` points of their key group
    * (ordered by `orderColumns`), decided in exact integer
    * cross-multiplication so any engine reproduces the flags bit-for-
    * bit. Schema-EXTENDING (`n_base`, `flagged`). `maxAbsValue` bounds
    * |value| and is part of the 64-bit overflow contract — the stage
    * refuses combinations that could wrap.
    */
  final case class AnomalyStage(keyColumns: List[String], orderColumns: List[String],
                                valueColumn: String, window: Int, minPoints: Int,
                                z: Int, maxAbsValue: Long)
      extends TransformConfig {
    val name = "anomaly"
    def check: Option[String] =
      if (keyColumns.isEmpty) Some("transform.anomaly.keyColumns required")
      else if (orderColumns.isEmpty) Some("transform.anomaly.orderColumns required")
      else if (valueColumn.isEmpty) Some("transform.anomaly.valueColumn required")
      else if (window < 2 || minPoints < 2 || minPoints > window)
        Some("transform.anomaly needs 2 <= minPoints <= window")
      else if (z < 1) Some("transform.anomaly.z must be >= 1")
      else if (maxAbsValue <= 0) Some("transform.anomaly.maxAbsValue must be positive")
      else None
  }
  /** Deterministic importance resampling — Sampling.resampleByWeight:
    * keep each row at its OWN integer rate (`rateColumn`, parts per
    * `denom`) over the shared md5 bucket space — the post-scoring
    * thinning step of a DSIR pipeline, reproducible and composable
    * with `split`. Schema-preserving (surviving rows keep all columns).
    */
  final case class ResampleStage(keyColumn: String, rateColumn: String,
                                 denom: Int)
      extends TransformConfig {
    val name = "resampleByWeight"
    def check: Option[String] =
      if (keyColumn.isEmpty) Some("transform.resampleByWeight.keyColumn required")
      else if (rateColumn.isEmpty) Some("transform.resampleByWeight.rateColumn required")
      else if (denom <= 0) Some("transform.resampleByWeight.denom must be positive")
      else None
  }
  /** Banded interval-overlap join — operators.IntervalJoin with the
    * piped frame as LEFT and the parquet at `rightPath` as RIGHT.
    * Schema-EXTENDING join output (both sides' columns +
    * overlap_lo/overlap_hi); column names must not collide — alias
    * via renames first. `bandWidth: 0` (the default) probes the span
    * distribution and picks the width automatically (median × slack),
    * aborting with clamp advice if an open-ended interval would
    * explode the banding; a positive value pins it.
    */
  final case class IntervalJoinStage(rightPath: String,
                                     leftLo: String, leftHi: String,
                                     rightLo: String, rightHi: String,
                                     keys: List[(String, String)],
                                     bandWidth: Double)
      extends TransformConfig {
    val name = "intervalJoin"
    def check: Option[String] =
      if (rightPath.isEmpty) Some("transform.intervalJoin.rightPath required")
      else if (Seq(leftLo, leftHi, rightLo, rightHi).exists(_.isEmpty))
        Some("transform.intervalJoin left/right lo/hi columns required")
      else if (bandWidth < 0) Some("transform.intervalJoin.bandWidth must be >= 0 (0 = auto)")
      else None
  }
  /** Connected components — operators.Graphs.connectedComponents over
    * the piped EDGE frame (`srcColumn`, `dstColumn`); the node set is
    * the distinct endpoints. TERMINAL reshape: output is `(id, rep)`
    * with rep = each component's minimum id.
    */
  final case class ComponentsStage(srcColumn: String, dstColumn: String,
                                   maxIters: Int)
      extends TransformConfig {
    val name = "components"
    def check: Option[String] =
      if (srcColumn.isEmpty || dstColumn.isEmpty)
        Some("transform.components.srcColumn/dstColumn required")
      else if (maxIters < 1 || maxIters > 30)
        Some("transform.components.maxIters must be in [1, 30]")
      else None
  }
  /** Per-vertex triangle counts — operators.Graphs.triangleCounts over
    * the piped edge frame. TERMINAL reshape: `(vertex, n_triangles)`,
    * degree-oriented so hub vertices cannot explode the wedge join.
    */
  final case class TrianglesStage(srcColumn: String, dstColumn: String)
      extends TransformConfig {
    val name = "triangles"
    def check: Option[String] =
      if (srcColumn.isEmpty || dstColumn.isEmpty)
        Some("transform.triangles.srcColumn/dstColumn required")
      else None
  }
  /** Bounded multi-source BFS — operators.Graphs.reachable over the
    * piped edge frame, roots read from `rootsPath` parquet
    * (`rootColumn`). TERMINAL reshape: `(root, vertex, depth)` with
    * depth = minimum hop count ≤ `maxDepth`.
    */
  final case class ReachableStage(srcColumn: String, dstColumn: String,
                                  rootsPath: String, rootColumn: String,
                                  maxDepth: Int)
      extends TransformConfig {
    val name = "reachable"
    def check: Option[String] =
      if (srcColumn.isEmpty || dstColumn.isEmpty)
        Some("transform.reachable.srcColumn/dstColumn required")
      else if (rootsPath.isEmpty) Some("transform.reachable.rootsPath required")
      else if (rootColumn.isEmpty) Some("transform.reachable.rootColumn required")
      else if (maxDepth < 0 || maxDepth > 30)
        Some("transform.reachable.maxDepth must be in [0, 30]")
      else None
  }
  /** Bitemporal snapshot — operators.Scd2.bitemporalSnapshot over the
    * piped bitemporal log: state as it was VALID at `validAt`, as
    * ASSERTED by `txAt` (late corrections included up to txAt only).
    * TERMINAL reshape to `(key, valid_ts, asserted_ts, values…)`.
    * `validAt`/`txAt` are literals cast to the respective ts columns'
    * types at run time.
    */
  final case class BitemporalStage(keyColumn: String, validTsColumn: String,
                                   txTsColumn: String, opColumn: String,
                                   upsertOp: String, deleteOp: String,
                                   valueColumns: List[String],
                                   validAt: String, txAt: String,
                                   tieBreak: List[String])
      extends TransformConfig {
    val name = "bitemporal"
    def check: Option[String] =
      if (valueColumns.isEmpty) Some("transform.bitemporal.valueColumns required")
      else if (upsertOp == deleteOp)
        Some("transform.bitemporal upsertOp and deleteOp must differ")
      else if (validAt.isEmpty || txAt.isEmpty)
        Some("transform.bitemporal.validAt/txAt required")
      else None
  }
  /** Link extraction — Web.extractLinks: one row per quoted href of
    * the page's anchor elements, appended as `hrefColumn` (row
    * multiplying: a page with n links becomes n rows; pages with none
    * drop). Chain urlCanon on the href column for canon/host/domain,
    * then pageRank/sourceCap — the crawl→graph path as config.
    */
  final case class LinkExtract(htmlColumn: String, hrefColumn: String)
      extends TransformConfig {
    val name = "linkExtract"
    def check: Option[String] =
      if (htmlColumn.isEmpty) Some("transform.linkExtract.htmlColumn required")
      else if (hrefColumn.isEmpty) Some("transform.linkExtract.hrefColumn required")
      else if (htmlColumn == hrefColumn)
        Some("transform.linkExtract.hrefColumn must differ from htmlColumn")
      else None
  }
  /** Persisted lexical-index top-k — LexIndex.search with the piped
    * rows as the bounded query batch; terminal reshape to the hit
    * list, the annSearch pattern on the lexical side.
    */
  final case class LexSearchStage(indexRoot: String, queryIdColumn: String,
                                  termColumn: String, k: Int)
      extends TransformConfig {
    val name = "lexSearch"
    def check: Option[String] =
      if (indexRoot.isEmpty) Some("transform.lexSearch.indexRoot required")
      else if (queryIdColumn.isEmpty) Some("transform.lexSearch.queryIdColumn required")
      else if (termColumn.isEmpty) Some("transform.lexSearch.termColumn required")
      else if (k < 1) Some("transform.lexSearch.k must be >= 1")
      else None
  }
  /** Hybrid-retrieval fusion — Retrieval.rrfFuse of the piped ranking
    * (tier A: e.g. a lexSearch stage's hit list) with the ranking
    * parquet at `otherPath` (tier B: e.g. a persisted annSearch dump);
    * terminal reshape to the fused per-query top-k.
    */
  final case class RrfFuseStage(otherPath: String, queryIdColumn: String,
                                idColumn: String, rankColumn: String,
                                k: Int, kRrf: Int)
      extends TransformConfig {
    val name = "rrfFuse"
    def check: Option[String] =
      if (otherPath.isEmpty) Some("transform.rrfFuse.otherPath required")
      else if (queryIdColumn.isEmpty) Some("transform.rrfFuse.queryIdColumn required")
      else if (idColumn.isEmpty) Some("transform.rrfFuse.idColumn required")
      else if (rankColumn.isEmpty) Some("transform.rrfFuse.rankColumn required")
      else if (k < 1) Some("transform.rrfFuse.k must be >= 1")
      else if (kRrf < 0) Some("transform.rrfFuse.kRrf must be >= 0")
      else None
  }
  /** Crawl-epoch absorption into a persisted LinkGraph store — the
    * piped rows are the epoch's edges, absorbed under `tag` through
    * the store's frontier-bounded exact rank maintenance
    * (retire-and-redo on replay, the forget-stage idempotence
    * discipline); terminal reshape to the store's served final ranks.
    */
  final case class GraphEpochStage(root: String, srcColumn: String,
                                   dstColumn: String, tag: String)
      extends TransformConfig {
    val name = "graphEpoch"
    def check: Option[String] =
      if (root.isEmpty) Some("transform.graphEpoch.root required")
      else if (srcColumn.isEmpty || dstColumn.isEmpty)
        Some("transform.graphEpoch.srcColumn/dstColumn required")
      else if (tag.isEmpty) Some("transform.graphEpoch.tag required")
      else None
  }
  /** Integer-exact PageRank — Graphs.pageRank over the piped edge
    * frame; terminal reshape to (id, rank_units) like components.
    */
  final case class PageRankStage(srcColumn: String, dstColumn: String,
                                 iters: Int, dampingPct: Int,
                                 dangling: Boolean = false,
                                 seedsPath: String = "",
                                 seedColumn: String = "id")
      extends TransformConfig {
    val name = "pageRank"
    def check: Option[String] =
      if (srcColumn.isEmpty || dstColumn.isEmpty)
        Some("transform.pageRank.srcColumn/dstColumn required")
      else if (iters < 1 || iters > 30)
        Some("transform.pageRank.iters must be in [1, 30]")
      else if (dampingPct < 1 || dampingPct > 99)
        Some("transform.pageRank.dampingPct must be in [1, 99]")
      else if (seedsPath.nonEmpty && dangling)
        Some("transform.pageRank.seedsPath (TrustRank) and dangling " +
          "cannot combine: the dangling term redistributes uniformly, " +
          "the personalized teleport by definition does not")
      else None
  }
  /** Integer-exact HITS — Graphs.hits over the piped edge frame;
    * terminal reshape to (id, auth_units, hub_units).
    */
  final case class HitsStage(srcColumn: String, dstColumn: String,
                             iters: Int)
      extends TransformConfig {
    val name = "hits"
    def check: Option[String] =
      if (srcColumn.isEmpty || dstColumn.isEmpty)
        Some("transform.hits.srcColumn/dstColumn required")
      else if (iters < 1 || iters > 30)
        Some("transform.hits.iters must be in [1, 30]")
      else None
  }
  /** MMR diversity re-rank — Retrieval.mmrRerank over the piped
    * candidate ranking (which must carry relevance + vector columns);
    * terminal reshape to (queryId, rank, id, mmr_score).
    */
  final case class MmrStage(queryIdColumn: String, idColumn: String,
                            scoreColumn: String, vecColumn: String,
                            k: Int, lambdaPct: Int)
      extends TransformConfig {
    val name = "mmrRerank"
    def check: Option[String] =
      if (queryIdColumn.isEmpty) Some("transform.mmrRerank.queryIdColumn required")
      else if (idColumn.isEmpty) Some("transform.mmrRerank.idColumn required")
      else if (scoreColumn.isEmpty) Some("transform.mmrRerank.scoreColumn required")
      else if (vecColumn.isEmpty) Some("transform.mmrRerank.vecColumn required")
      else if (k < 1) Some("transform.mmrRerank.k must be >= 1")
      else if (lambdaPct < 0 || lambdaPct > 100)
        Some("transform.mmrRerank.lambdaPct must be in [0, 100]")
      else None
  }
  /** Ranking-quality evaluation — Retrieval.evalRanking of the piped
    * ranking against the judgment parquet at `truthPath`; terminal
    * reshape to per-query (n_rel, n_hits, recall, mrr, ap, ndcg).
    */
  final case class EvalRankingStage(truthPath: String, queryIdColumn: String,
                                    idColumn: String, rankColumn: String,
                                    k: Int, relColumn: Option[String])
      extends TransformConfig {
    val name = "evalRanking"
    def check: Option[String] =
      if (truthPath.isEmpty) Some("transform.evalRanking.truthPath required")
      else if (queryIdColumn.isEmpty)
        Some("transform.evalRanking.queryIdColumn required")
      else if (idColumn.isEmpty) Some("transform.evalRanking.idColumn required")
      else if (rankColumn.isEmpty) Some("transform.evalRanking.rankColumn required")
      else if (k < 1) Some("transform.evalRanking.k must be >= 1")
      else None
  }
  /** In-place markup extraction — Web.stripMarkup replaces
    * `textColumn` with the extracted plain text (boilerplate stays;
    * chain a lineDedup stage to remove it).
    */
  final case class HtmlExtract(textColumn: String) extends TransformConfig {
    val name = "htmlExtract"
    def check: Option[String] = None
  }
  /** In-place URL canonicalization — Web.canonicalizeUrl replaces
    * `urlColumn`; optional `hostColumn`/`domainColumn` ADD the derived
    * host / registered-domain columns (group keys for host caps).
    * `trackedParams` (comma-separated regex fragments) overrides the
    * default tracking-parameter set — e.g. add `ref` back for corpora
    * where it is known to be tracking, not content.
    */
  final case class UrlCanon(urlColumn: String, hostColumn: Option[String],
                            domainColumn: Option[String],
                            trackedParams: Option[List[String]] = None)
      extends TransformConfig {
    val name = "urlCanon"
    def check: Option[String] =
      if (trackedParams.exists(_.isEmpty))
        Some("transform.urlCanon.trackedParams must be non-empty when set")
      else None
  }
  /** Corpus-wide line dedup (RefinedWeb recipe) — Web.lineDedup; the
    * text column is REPLACED by the surviving lines (SpanDedup's
    * re-attach contract: row multiplicity and null-id rows preserved,
    * counter columns dropped). `segmentWords > 0` pre-splits
    * single-line word streams into that many words per line — the
    * segmented (newline-carrying) text is what downstream stages see.
    */
  /** Census-advance semantics: plain `advance: true` is AT-LEAST-ONCE
    * — the read-merge-swap advance runs when the stage applies (before
    * the pipeline's target write commits), so a run that fails after
    * the advance leaves the batch's counts folded in. Supplying
    * `advanceTag` upgrades it to replay-idempotent end state: the
    * stage first retires the tag's previous delta (so the probe sees
    * the pre-epoch census), then publishes the batch's delta under the
    * tag's deterministic file names — re-running the same config
    * (same tag) after any failure retires-and-redoes identically, the
    * annIngest discipline.
    */
  final case class LineDedup(idColumn: String, textColumn: String,
                             minDupCount: Int, minLineChars: Int,
                             segmentWords: Int,
                             censusDir: Option[String] = None,
                             advance: Boolean = false,
                             advanceTag: Option[String] = None)
      extends TransformConfig {
    val name = "lineDedup"
    def check: Option[String] =
      if (minDupCount < 2) Some("transform.lineDedup.minDupCount must be >= 2")
      else if (minLineChars < 0) Some("transform.lineDedup.minLineChars must be >= 0")
      else if (segmentWords < 0) Some("transform.lineDedup.segmentWords must be >= 0")
      else if (advance && censusDir.isEmpty)
        Some("transform.lineDedup.advance requires censusDir")
      else if (advanceTag.isDefined && !advance)
        Some("transform.lineDedup.advanceTag requires advance: true")
      else None
  }
  /** Line-quality row+line filter — Web.lineQualityFilter; lines
    * failing the (minTokens, anchorWords) rule are cut from the text,
    * documents keeping fewer than `minKeptLines` lines are DROPPED.
    */
  final case class LineFilter(idColumn: String, textColumn: String,
                              minTokens: Int, anchorWords: List[String],
                              minKeptLines: Int, segmentWords: Int)
      extends TransformConfig {
    val name = "lineFilter"
    def check: Option[String] =
      if (minTokens < 1) Some("transform.lineFilter.minTokens must be >= 1")
      else if (anchorWords.isEmpty) Some("transform.lineFilter.anchorWords required")
      else if (minKeptLines < 1) Some("transform.lineFilter.minKeptLines must be >= 1")
      else if (segmentWords < 0) Some("transform.lineFilter.segmentWords must be >= 0")
      else None
  }
}

sealed trait SourceConfig
object SourceConfig {
  /** `versioned: true` resolves `path` through the `_LATEST` pointer
    * (sources/Versioned) before reading — the copy consumes one
    * immutable snapshot even if a publish lands mid-run.
    */
  /** `versionAt: Some(n)` is the TIME-TRAVEL read: pin the scan to
    * published version `v_n` of a versioned table root instead of
    * resolving `_LATEST` — the audit/repro read ("re-run the job
    * against exactly what we shipped last Tuesday"). Requires
    * `versioned: true`; fails eagerly if the version was vacuumed.
    */
  final case class Parquet(path: String, where: Option[String],
                           columns: Option[List[String]],
                           versioned: Boolean = false,
                           versionAt: Option[Long] = None,
                           mergeSchema: Boolean = false) extends SourceConfig
  final case class Jdbc(url: String, table: String, where: Option[String],
                        partitionColumn: Option[String], numPartitions: Int,
                        lowerBound: Option[String], upperBound: Option[String]) extends SourceConfig
  final case class DynamoS3Export(manifestPath: String) extends SourceConfig
  /** Text sources. `schema` is a DDL string; REQUIRED at scale — schema
    * inference reads the data once before the real scan (two passes over
    * 100 TB), so inference is only allowed as an explicit opt-in.
    */
  final case class Csv(path: String, schema: Option[String], header: Boolean,
                       delimiter: String, inferSchema: Boolean,
                       where: Option[String], columns: Option[List[String]]) extends SourceConfig
  final case class Json(path: String, schema: Option[String], inferSchema: Boolean,
                        where: Option[String], columns: Option[List[String]]) extends SourceConfig
  /** ORC scan — the other columnar lake format; same pushdown/pruning
    * path as parquet (filters and projections reach the ORC reader).
    */
  final case class Orc(path: String, where: Option[String],
                       columns: Option[List[String]]) extends SourceConfig
}

sealed trait TargetConfig
object TargetConfig {
  /** `maxRecordsPerFile` bounds output file size WITHOUT a shuffle
    * (the writer rolls to a new file mid-task) — the knob that keeps a
    * 100 TB write from producing multi-GB files no scan can split
    * effectively, or a coalesced task from emitting one giant file.
    * 0 = engine default (unbounded per task).
    */
  /** `sortBy` clusters rows WITHIN each output file (no shuffle;
    * row-group stats enable data skipping). `globalSortBy` produces a
    * TOTAL order across files (one range-partitioning shuffle: file N's
    * max key <= file N+1's min), the layout for binary-searchable
    * corpora and maximal min/max pruning — mutually exclusive with
    * sortBy, which it subsumes.
    */
  /** `statsIndexColumns`: after the copy, build a file-level min/max
    * stats index over these columns (`<path>/_stats`, see
    * FileStatsIndex) — the write-time-stats discipline that makes
    * later predicate reads skip files without opening them. Pair with
    * sortBy/globalSortBy so the ranges are tight.
    */
  /** `versioned: true` publishes each run as an immutable version
    * directory behind the atomic `_LATEST` pointer (see
    * sources/Versioned) instead of writing `path` in place — readers
    * never see a torn table, and previous versions stay time-travel
    * readable until vacuumed. `mode` is ignored (every publish is a
    * fresh directory).
    */
  /** `compactTargetBytes > 0` runs the crash-safe small-file
    * compaction (sources/Compaction) over the target directory after
    * the copy completes — the maintenance executable's operation as a
    * declarative option, so resumable batch-append pipelines (whose
    * per-batch appends naturally fragment the table) end with sane
    * file sizes in the same run. Non-versioned, non-partitioned
    * targets only (a versioned publish is immutable; partitioned
    * layouts compact per partition dir — use the Maintain executable).
    */
  final case class Parquet(path: String, mode: String, compression: String,
                           partitionBy: List[String] = Nil,
                           sortBy: List[String] = Nil,
                           maxRecordsPerFile: Long = 0L,
                           globalSortBy: List[String] = Nil,
                           statsIndexColumns: List[String] = Nil,
                           versioned: Boolean = false,
                           zorderBy: List[String] = Nil,
                           zorderFiles: Int = 0,
                           compactTargetBytes: Long = 0L) extends TargetConfig {
    def validate: Either[String, Parquet] = {
      val modes = Set("overwrite", "append", "errorifexists", "ignore")
      val codecs = Set("snappy", "gzip", "zstd", "lz4", "none", "uncompressed")
      if (!modes.contains(mode.toLowerCase)) Left(s"invalid parquet write mode: $mode")
      else if (!codecs.contains(compression.toLowerCase)) Left(s"invalid compression: $compression")
      else if (compactTargetBytes < 0)
        Left(s"target.compactTargetBytes must be >= 0, got $compactTargetBytes")
      else if (compactTargetBytes > 0 && versioned)
        Left("target.compactTargetBytes rewrites files in place — incompatible " +
          "with versioned immutable publishes")
      else if (compactTargetBytes > 0 && partitionBy.nonEmpty)
        Left("target.compactTargetBytes compacts a flat directory — run the " +
          "Maintain executable per partition for partitioned layouts")
      else if (maxRecordsPerFile < 0) Left(s"maxRecordsPerFile must be >= 0, got $maxRecordsPerFile")
      else if (sortBy.nonEmpty && globalSortBy.nonEmpty)
        Left("target.sortBy and target.globalSortBy are mutually exclusive " +
          "(globalSortBy already sorts within files)")
      else if (zorderBy.nonEmpty && (sortBy.nonEmpty || globalSortBy.nonEmpty))
        Left("target.zorderBy is its own layout — exclusive with sortBy/globalSortBy")
      else if (zorderBy.nonEmpty && zorderBy.size < 2)
        Left("target.zorderBy needs at least two columns (one column is just a sort " +
          "— use target.globalSortBy)")
      else if (zorderFiles < 0)
        Left(s"target.zorderFiles must be >= 0, got $zorderFiles")
      else Right(this)
    }
  }
  final case class DynamoS3Export(path: String) extends TargetConfig
  /** WebDataset-style tar shard sink — sources/TarShards: byte-bounded
    * POSIX ustar sample shards + a `_manifest` parquet index. The
    * payload column is cast to binary (a text corpus exports directly).
    */
  final case class TarShards(path: String, keyColumn: String,
                             payloadColumn: String, maxShardBytes: Long,
                             numShards: Int, suffix: String) extends TargetConfig {
    def validate: Either[String, TarShards] =
      if (maxShardBytes < 1536)
        Left(s"target.maxShardBytes must be >= 1536 (3 tar blocks), got $maxShardBytes")
      else if (numShards <= 0) Left(s"target.numShards must be positive, got $numShards")
      else Right(this)
  }
  final case class Csv(path: String, mode: String, header: Boolean,
                       delimiter: String, compression: String) extends TargetConfig
  final case class Json(path: String, mode: String, compression: String) extends TargetConfig
  final case class Orc(path: String, mode: String, compression: String) extends TargetConfig {
    def validate: Either[String, Orc] = {
      val modes = Set("overwrite", "append", "errorifexists", "ignore")
      val codecs = Set("snappy", "zlib", "zstd", "lz4", "lzo", "none", "uncompressed")
      if (!modes.contains(mode.toLowerCase)) Left(s"invalid orc write mode: $mode")
      else if (!codecs.contains(compression.toLowerCase)) Left(s"invalid orc compression: $compression")
      else Right(this)
    }
  }
}

final case class ValidationConfig(
    primaryKey: List[String],
    compareColumns: List[String],
    tolerance: Double,
    failuresToFetch: Int)

/** Continuous-replication arm (reference: `streamChanges: true` in the
  * YAML config triggers snapshot-then-stream,
  * alternator/AlternatorMigrator.scala:134-192). The change feed is a
  * parquet directory of `(payload..., opColumn, orderBy...)` rows; the
  * apply is idempotent last-writer-wins ordered by `orderBy` descending.
  */
final case class StreamConfig(
    changesDir: String,
    checkpointDir: String,
    primaryKey: List[String],
    opColumn: String,
    orderBy: List[String],
    triggerMs: Long,
    changesSchema: Option[String] = None) // DDL string, e.g. "id LONG, v STRING, op STRING, seq LONG"

object PipelineConfig {

  /** Load from any Hadoop-visible path (local, s3a://, gs:// — whatever
    * filesystems the runtime has configured; reference:
    * config/MigratorConfig.loadFrom, MigratorConfig.scala:155-172).
    */
  def loadFrom(path: String,
               conf: org.apache.hadoop.conf.Configuration): Either[String, PipelineConfig] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    parse(text)
  }

  /** Parse the flat `section.key: value` line format. Unknown keys are
    * errors (config typos must not silently change behavior).
    */
  def parse(text: String): Either[String, PipelineConfig] = {
    val entries = text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf(':')
        if (i < 0) return Left(s"malformed line: $line")
        line.take(i).trim -> line.drop(i + 1).trim
      }
      .toList
    val map = entries.toMap
    if (map.size != entries.size) return Left("duplicate config key")

    val known = Set(
      "source.type", "source.path", "source.where", "source.columns",
      "source.versioned", "source.versionAt", "source.mergeSchema",
      "source.url", "source.table", "source.partitionColumn",
      "source.numPartitions", "source.lowerBound", "source.upperBound",
      "source.schema", "source.header", "source.delimiter", "source.inferSchema",
      "target.type", "target.path", "target.mode", "target.compression",
      "target.partitionBy", "target.sortBy", "target.header", "target.delimiter",
      "target.maxRecordsPerFile", "target.globalSortBy", "target.statsIndex",
      "target.versioned", "target.zorderBy", "target.zorderFiles",
      "target.compactTargetBytes",
      "target.keyColumn", "target.payloadColumn", "target.maxShardBytes",
      "target.numShards", "target.suffix",
      "renames", "savepoints.dir", "skipFiles",
      "transforms",
      "transform.dedupExact.idColumn", "transform.dedupExact.textColumn",
      "transform.sourceCap.groupColumns", "transform.sourceCap.idColumn",
      "transform.sourceCap.textColumn", "transform.sourceCap.k",
      "transform.split.keyColumn", "transform.split.fractions",
      "transform.split.denom",
      "transform.normalize.textColumn",
      "transform.spanDedup.idColumn", "transform.spanDedup.textColumn",
      "transform.spanDedup.spanTokens", "transform.spanDedup.minDocs",
      "transform.spanDedup.keepFirst",
      "transform.dupSpanCut.idColumn", "transform.dupSpanCut.textColumn",
      "transform.dupSpanCut.gramTokens", "transform.dupSpanCut.minCount",
      "transform.minhashDedup.idColumn", "transform.minhashDedup.textColumn",
      "transform.minhashDedup.shingleSize", "transform.minhashDedup.numHashes",
      "transform.minhashDedup.bands", "transform.minhashDedup.rowsPerBand",
      "transform.minhashDedup.thresholdNum", "transform.minhashDedup.thresholdDenom",
      "transform.semanticDedup.idColumn", "transform.semanticDedup.vecColumn",
      "transform.semanticDedup.numPlanes", "transform.semanticDedup.bandBits",
      "transform.semanticDedup.threshold", "transform.semanticDedup.seed",
      "transform.decontaminate.idColumn", "transform.decontaminate.textColumn",
      "transform.decontaminate.referencePath", "transform.decontaminate.ngram",
      "transform.decontaminate.minShared",
      "transform.semanticDecontaminate.vecColumn",
      "transform.semanticDecontaminate.referencePath",
      "transform.semanticDecontaminate.minDot",
      "transform.seqPack.idColumn", "transform.seqPack.textColumn",
      "transform.seqPack.budget", "transform.seqPack.shardWidth",
      "transform.piiScrub.textColumn",
      "transform.dsirFilter.idColumn", "transform.dsirFilter.textColumn",
      "transform.dsirFilter.targetPath", "transform.dsirFilter.targetTextColumn",
      "transform.dsirFilter.buckets", "transform.dsirFilter.keepNum",
      "transform.dsirFilter.keepDenom",
      "transform.pplFilter.idColumn", "transform.pplFilter.textColumn",
      "transform.pplFilter.langColumn", "transform.pplFilter.buckets",
      "transform.pplFilter.keep", "transform.pplFilter.approx",
      "transform.tokenBudget.groupColumn", "transform.tokenBudget.keyColumn",
      "transform.tokenBudget.tokenColumn", "transform.tokenBudget.budget",
      "transform.tokenBudget.shards",
      "transform.incrDedup.idColumn", "transform.incrDedup.textColumn",
      "transform.incrDedup.referencePath", "transform.incrDedup.referenceTextColumn",
      "transform.mixToTarget.keyColumn", "transform.mixToTarget.groupColumn",
      "transform.mixToTarget.weights", "transform.mixToTarget.wDenom",
      "transform.outlierFilter.valueColumn", "transform.outlierFilter.groupColumn",
      "transform.outlierFilter.z",
      "transform.qualityFilter.textColumn", "transform.qualityFilter.minScore",
      "transform.qualityFilter.bias", "transform.qualityFilter.wStop",
      "transform.qualityFilter.wPunct", "transform.qualityFilter.wDigit",
      "transform.qualityFilter.wTokLen",
      "transform.gopherFilter.textColumn", "transform.gopherFilter.minWords",
      "transform.gopherFilter.maxWords", "transform.gopherFilter.minMeanLen",
      "transform.gopherFilter.maxMeanLen", "transform.gopherFilter.minAlphaPct",
      "transform.gopherFilter.maxSymbolPct", "transform.gopherFilter.minStopHits",
      "transform.gopherFilter.maxTopTokenPct",
      "transform.repetitionFilter.textColumn",
      "transform.repetitionFilter.topPcts", "transform.repetitionFilter.dupPcts",
      "transform.blocklist.textColumn", "transform.blocklist.termsPath",
      "transform.blocklist.maxTerms",
      "transform.sessionize.keys", "transform.sessionize.tsColumn",
      "transform.sessionize.gap", "transform.sessionize.tieBreak",
      "transform.funnel.keyColumn", "transform.funnel.tsColumn",
      "transform.funnel.typeColumn", "transform.funnel.steps",
      "transform.retention.keyColumn", "transform.retention.tsColumn",
      "transform.retention.bucketDays",
      "transform.scd2History.keyColumn", "transform.scd2History.tsColumn",
      "transform.scd2History.opColumn", "transform.scd2History.upsertOp",
      "transform.scd2History.deleteOp", "transform.scd2History.valueColumns",
      "transform.scd2History.tieBreak",
      "transform.pitEnrich.historyPath", "transform.pitEnrich.keyColumn",
      "transform.pitEnrich.tsColumn", "transform.pitEnrich.valueColumns",
      "transform.mergeSnapshot.snapshotPath", "transform.mergeSnapshot.keys",
      "transform.mergeSnapshot.deleteStale",
      "transform.minhashDedup.keepLongest",
      "transform.phashDedup.idColumn", "transform.phashDedup.payloadColumn",
      "transform.phashDedup.decoder", "transform.phashDedup.maxDist",
      "transform.phashDedup.lenient",
      "transform.resampleByWeight.keyColumn",
      "transform.resampleByWeight.rateColumn", "transform.resampleByWeight.denom",
      "transform.scd2Append.historyPath", "transform.scd2Append.keyColumn",
      "transform.scd2Append.tsColumn", "transform.scd2Append.opColumn",
      "transform.scd2Append.upsertOp", "transform.scd2Append.deleteOp",
      "transform.scd2Append.valueColumns", "transform.scd2Append.tieBreak",
      "transform.constraintGate.notNull", "transform.constraintGate.uniqueKey",
      "transform.constraintGate.minRows", "transform.constraintGate.maxRows",
      "transform.constraintGate.fkColumn", "transform.constraintGate.fkRefPath",
      "transform.constraintGate.fkRefColumn",
      "transform.winsorize.groupColumns", "transform.winsorize.valueColumn",
      "transform.winsorize.pct", "transform.winsorize.outColumn",
      "transform.winsorize.tier",
      "transform.anomaly.keyColumns", "transform.anomaly.orderColumns",
      "transform.anomaly.valueColumn", "transform.anomaly.window",
      "transform.anomaly.minPoints", "transform.anomaly.z",
      "transform.anomaly.maxAbsValue",
      "transform.lshDedup.indexPath", "transform.lshDedup.idColumn",
      "transform.lshDedup.textColumn", "transform.lshDedup.thresholdNum",
      "transform.lshDedup.thresholdDenom", "transform.lshDedup.minBands",
      "transform.lshDedup.minMatchingHashes", "transform.lshDedup.advance",
      "transform.lshDedup.maxPruneKeys", "transform.lshDedup.minPruneBytes",
      "transform.annSearch.indexRoot", "transform.annSearch.idColumn",
      "transform.annSearch.vecColumn", "transform.annSearch.k",
      "transform.annSearch.nProbe", "transform.annSearch.versioned",
      "transform.annSearch.filterPath", "transform.annSearch.filterColumn",
      "transform.annSearch.rerankPath", "transform.annSearch.rerankKCand",
      "transform.annIngest.indexRoot", "transform.annIngest.idColumn",
      "transform.annIngest.vecColumn", "transform.annIngest.tag",
      "transform.forget.store", "transform.forget.root",
      "transform.forget.idColumn",
      "transform.rfm.keyColumn", "transform.rfm.tsColumn",
      "transform.rfm.valueColumn", "transform.rfm.asOf", "transform.rfm.buckets",
      "transform.transitionMatrix.keyColumn", "transform.transitionMatrix.tsColumn",
      "transform.transitionMatrix.typeColumn", "transform.transitionMatrix.tieBreak",
      "transform.attribution.keyColumn", "transform.attribution.tsColumn",
      "transform.attribution.typeColumn", "transform.attribution.conversionType",
      "transform.attribution.touchTypes", "transform.attribution.tieBreak",
      "transform.intervalJoin.rightPath", "transform.intervalJoin.leftLo",
      "transform.intervalJoin.leftHi", "transform.intervalJoin.rightLo",
      "transform.intervalJoin.rightHi", "transform.intervalJoin.keys",
      "transform.intervalJoin.bandWidth",
      "transform.components.srcColumn", "transform.components.dstColumn",
      "transform.components.maxIters",
      "transform.triangles.srcColumn", "transform.triangles.dstColumn",
      "transform.reachable.srcColumn", "transform.reachable.dstColumn",
      "transform.reachable.rootsPath", "transform.reachable.rootColumn",
      "transform.reachable.maxDepth",
      "transform.bitemporal.keyColumn", "transform.bitemporal.validTsColumn",
      "transform.bitemporal.txTsColumn", "transform.bitemporal.opColumn",
      "transform.bitemporal.upsertOp", "transform.bitemporal.deleteOp",
      "transform.bitemporal.valueColumns", "transform.bitemporal.validAt",
      "transform.bitemporal.txAt", "transform.bitemporal.tieBreak",
      "transform.linkExtract.htmlColumn", "transform.linkExtract.hrefColumn",
      "transform.lexSearch.indexRoot", "transform.lexSearch.queryIdColumn",
      "transform.lexSearch.termColumn", "transform.lexSearch.k",
      "transform.rrfFuse.otherPath", "transform.rrfFuse.queryIdColumn",
      "transform.rrfFuse.idColumn", "transform.rrfFuse.rankColumn",
      "transform.rrfFuse.k", "transform.rrfFuse.kRrf",
      "transform.graphEpoch.root", "transform.graphEpoch.srcColumn",
      "transform.graphEpoch.dstColumn", "transform.graphEpoch.tag",
      "transform.pageRank.srcColumn", "transform.pageRank.dstColumn",
      "transform.pageRank.iters", "transform.pageRank.dampingPct",
      "transform.pageRank.dangling",
      "transform.pageRank.seedsPath", "transform.pageRank.seedColumn",
      "transform.hits.srcColumn", "transform.hits.dstColumn",
      "transform.hits.iters",
      "transform.mmrRerank.queryIdColumn", "transform.mmrRerank.idColumn",
      "transform.mmrRerank.scoreColumn", "transform.mmrRerank.vecColumn",
      "transform.mmrRerank.k", "transform.mmrRerank.lambdaPct",
      "transform.evalRanking.truthPath", "transform.evalRanking.queryIdColumn",
      "transform.evalRanking.idColumn", "transform.evalRanking.rankColumn",
      "transform.evalRanking.k", "transform.evalRanking.relColumn",
      "transform.htmlExtract.textColumn",
      "transform.urlCanon.urlColumn", "transform.urlCanon.hostColumn",
      "transform.urlCanon.domainColumn", "transform.urlCanon.trackedParams",
      "transform.lineDedup.idColumn", "transform.lineDedup.textColumn",
      "transform.lineDedup.minDupCount", "transform.lineDedup.minLineChars",
      "transform.lineDedup.segmentWords", "transform.lineDedup.censusDir",
      "transform.lineDedup.advance", "transform.lineDedup.advanceTag",
      "transform.lineFilter.idColumn", "transform.lineFilter.textColumn",
      "transform.lineFilter.minTokens", "transform.lineFilter.anchorWords",
      "transform.lineFilter.minKeptLines", "transform.lineFilter.segmentWords",
      "validation.primaryKey", "validation.compareColumns",
      "validation.tolerance", "validation.failuresToFetch",
      "stream.changesDir", "stream.checkpointDir", "stream.primaryKey",
      "stream.opColumn", "stream.orderBy", "stream.triggerMs",
      "stream.changesSchema")
    map.keys.find(!known.contains(_)) match {
      case Some(k) => return Left(s"unknown config key: $k")
      case None    => ()
    }

    def list(key: String): List[String] =
      map.get(key).map(_.split(",").map(_.trim).filter(_.nonEmpty).toList).getOrElse(Nil)

    val source: Either[String, SourceConfig] = map.get("source.type") match {
      case Some("parquet") =>
        for {
          p <- map.get("source.path").toRight("source.path required")
          versioned = map.getOrElse("source.versioned", "false").toBoolean
          vAt <- map.get("source.versionAt") match {
            case None => Right(None)
            case Some(v) => v.toLongOption match {
              case Some(n) if n > 0 && versioned => Right(Some(n))
              case Some(n) if n > 0 =>
                Left("source.versionAt requires source.versioned: true")
              case _ => Left("source.versionAt must be a positive long")
            }
          }
        } yield SourceConfig.Parquet(p, map.get("source.where"),
          map.get("source.columns").map(_ => list("source.columns")),
          versioned, vAt,
          map.getOrElse("source.mergeSchema", "false").toBoolean)
      case Some("jdbc") =>
        for {
          url <- map.get("source.url").toRight("source.url required")
          table <- map.get("source.table").toRight("source.table required")
        } yield SourceConfig.Jdbc(url, table, map.get("source.where"),
          map.get("source.partitionColumn"),
          map.getOrElse("source.numPartitions", "1").toInt,
          map.get("source.lowerBound"), map.get("source.upperBound"))
      case Some("dynamo-s3-export") =>
        map.get("source.path").toRight("source.path required")
          .map(SourceConfig.DynamoS3Export(_))
      case Some("csv") =>
        for {
          p <- map.get("source.path").toRight("source.path required")
          schema = map.get("source.schema")
          infer = map.getOrElse("source.inferSchema", "false").toBoolean
          _ <- if (schema.isEmpty && !infer)
            Left("csv source requires source.schema (or source.inferSchema: true " +
              "— inference scans the data twice, opt in explicitly)")
          else Right(())
        } yield SourceConfig.Csv(p, schema,
          map.getOrElse("source.header", "true").toBoolean,
          map.getOrElse("source.delimiter", ","), infer,
          map.get("source.where"),
          map.get("source.columns").map(_ => list("source.columns")))
      case Some("json") =>
        for {
          p <- map.get("source.path").toRight("source.path required")
          schema = map.get("source.schema")
          infer = map.getOrElse("source.inferSchema", "false").toBoolean
          _ <- if (schema.isEmpty && !infer)
            Left("json source requires source.schema (or source.inferSchema: true " +
              "— inference scans the data twice, opt in explicitly)")
          else Right(())
        } yield SourceConfig.Json(p, schema, infer,
          map.get("source.where"),
          map.get("source.columns").map(_ => list("source.columns")))
      case Some("orc") =>
        map.get("source.path").toRight("source.path required")
          .map(p => SourceConfig.Orc(p, map.get("source.where"),
            map.get("source.columns").map(_ => list("source.columns"))))
      case other => Left(s"unsupported source.type: ${other.getOrElse("<missing>")}")
    }

    val target: Either[String, TargetConfig] = map.get("target.type") match {
      case Some("parquet") =>
        map.get("target.path").toRight("target.path required")
          .flatMap(p => TargetConfig.Parquet(p,
            map.getOrElse("target.mode", "errorifexists"),
            map.getOrElse("target.compression", "snappy"),
            list("target.partitionBy"),
            list("target.sortBy"),
            map.getOrElse("target.maxRecordsPerFile", "0").toLong,
            list("target.globalSortBy"),
            list("target.statsIndex"),
            map.getOrElse("target.versioned", "false").toBoolean,
            list("target.zorderBy"),
            map.getOrElse("target.zorderFiles", "0").toInt,
            map.getOrElse("target.compactTargetBytes", "0").toLong).validate)
      case Some("dynamo-s3-export") =>
        map.get("target.path").toRight("target.path required")
          .map(TargetConfig.DynamoS3Export(_))
      case Some("tar-shards") =>
        for {
          p <- map.get("target.path").toRight("target.path required")
          key <- map.get("target.keyColumn").toRight("target.keyColumn required")
          pay <- map.get("target.payloadColumn").toRight("target.payloadColumn required")
          msb <- map.getOrElse("target.maxShardBytes", (128L * 1024 * 1024).toString)
            .toLongOption.toRight("target.maxShardBytes not a long")
          ns <- map.getOrElse("target.numShards", "32")
            .toIntOption.toRight("target.numShards not an int")
          t <- TargetConfig.TarShards(p, key, pay, msb, ns,
            map.getOrElse("target.suffix", ".bin")).validate
        } yield t
      case Some("csv") =>
        map.get("target.path").toRight("target.path required")
          .map(p => TargetConfig.Csv(p,
            map.getOrElse("target.mode", "errorifexists"),
            map.getOrElse("target.header", "true").toBoolean,
            map.getOrElse("target.delimiter", ","),
            map.getOrElse("target.compression", "none")))
      case Some("json") =>
        map.get("target.path").toRight("target.path required")
          .map(p => TargetConfig.Json(p,
            map.getOrElse("target.mode", "errorifexists"),
            map.getOrElse("target.compression", "none")))
      case Some("orc") =>
        map.get("target.path").toRight("target.path required")
          .flatMap(p => TargetConfig.Orc(p,
            map.getOrElse("target.mode", "errorifexists"),
            map.getOrElse("target.compression", "snappy")).validate)
      case other => Left(s"unsupported target.type: ${other.getOrElse("<missing>")}")
    }

    val renames = list("renames").map { r =>
      r.split("->") match {
        case Array(from, to) => Rename(from.trim, to.trim)
        case _ => return Left(s"malformed rename (want from->to): $r")
      }
    }

    val validation =
      if (map.contains("validation.primaryKey"))
        Some(ValidationConfig(
          list("validation.primaryKey"), list("validation.compareColumns"),
          map.getOrElse("validation.tolerance", "0").toDouble,
          map.getOrElse("validation.failuresToFetch", "100").toInt))
      else None

    val stream: Either[String, Option[StreamConfig]] =
      if (!map.contains("stream.changesDir")) Right(None)
      else map.get("stream.checkpointDir")
        .toRight("stream.checkpointDir required when stream.changesDir is set")
        .map(ckpt => Some(StreamConfig(
          map("stream.changesDir"), ckpt,
          list("stream.primaryKey"),
          map.getOrElse("stream.opColumn", "op"),
          list("stream.orderBy"),
          map.getOrElse("stream.triggerMs", "5000").toLong,
          map.get("stream.changesSchema"))))

    val transforms: Either[String, List[TransformConfig]] = {
      def stage(n: String): Either[String, TransformConfig] = n match {
        case "dedupExact" =>
          for {
            id <- map.get("transform.dedupExact.idColumn")
              .toRight("transform.dedupExact.idColumn required")
            text <- map.get("transform.dedupExact.textColumn")
              .toRight("transform.dedupExact.textColumn required")
          } yield TransformConfig.DedupExact(id, text)
        case "sourceCap" =>
          for {
            id <- map.get("transform.sourceCap.idColumn")
              .toRight("transform.sourceCap.idColumn required")
            text <- map.get("transform.sourceCap.textColumn")
              .toRight("transform.sourceCap.textColumn required")
            k <- map.get("transform.sourceCap.k")
              .toRight("transform.sourceCap.k required")
              .flatMap(v => v.toIntOption.toRight(s"transform.sourceCap.k not an int: $v"))
          } yield TransformConfig.SourceCap(
            list("transform.sourceCap.groupColumns"), id, text, k)
        case "split" =>
          for {
            key <- map.get("transform.split.keyColumn")
              .toRight("transform.split.keyColumn required")
            fracs <- list("transform.split.fractions").foldRight(
              Right(Nil): Either[String, List[(String, Int)]]) { (f, acc) =>
              acc.flatMap(rest => f.split("=") match {
                case Array(nm, num) if num.trim.toIntOption.isDefined =>
                  Right((nm.trim, num.trim.toInt) :: rest)
                case _ => Left(s"malformed split fraction (want name=int): $f")
              })
            }
            denom <- map.getOrElse("transform.split.denom", "100")
              .toIntOption.toRight(
                s"transform.split.denom not an int: ${map("transform.split.denom")}")
          } yield TransformConfig.Split(key, fracs, denom)
        case "normalize" =>
          map.get("transform.normalize.textColumn")
            .toRight("transform.normalize.textColumn required")
            .map(TransformConfig.Normalize(_))
        case "spanDedup" =>
          for {
            id <- map.get("transform.spanDedup.idColumn")
              .toRight("transform.spanDedup.idColumn required")
            text <- map.get("transform.spanDedup.textColumn")
              .toRight("transform.spanDedup.textColumn required")
            st <- map.getOrElse("transform.spanDedup.spanTokens", "3")
              .toIntOption.toRight("transform.spanDedup.spanTokens not an int")
            md <- map.getOrElse("transform.spanDedup.minDocs", "2")
              .toIntOption.toRight("transform.spanDedup.minDocs not an int")
          } yield TransformConfig.SpanDedup(id, text, st, md,
            map.getOrElse("transform.spanDedup.keepFirst", "false").toBoolean)
        case "dupSpanCut" =>
          for {
            id <- map.get("transform.dupSpanCut.idColumn")
              .toRight("transform.dupSpanCut.idColumn required")
            text <- map.get("transform.dupSpanCut.textColumn")
              .toRight("transform.dupSpanCut.textColumn required")
            k <- map.getOrElse("transform.dupSpanCut.gramTokens", "8")
              .toIntOption.toRight("transform.dupSpanCut.gramTokens not an int")
            mc <- map.getOrElse("transform.dupSpanCut.minCount", "2")
              .toLongOption.toRight("transform.dupSpanCut.minCount not an int")
          } yield TransformConfig.DupSpanCut(id, text, k, mc)
        case "minhashDedup" =>
          def num(key: String, default: String): Either[String, Int] =
            map.getOrElse(s"transform.minhashDedup.$key", default)
              .toIntOption.toRight(s"transform.minhashDedup.$key not an int")
          for {
            id <- map.get("transform.minhashDedup.idColumn")
              .toRight("transform.minhashDedup.idColumn required")
            text <- map.get("transform.minhashDedup.textColumn")
              .toRight("transform.minhashDedup.textColumn required")
            sh <- num("shingleSize", "3")
            nh <- num("numHashes", "64")
            b <- num("bands", "16")
            r <- num("rowsPerBand", "4")
            tn <- num("thresholdNum", "9")
            td <- num("thresholdDenom", "10")
            kl <- map.getOrElse("transform.minhashDedup.keepLongest", "false")
              .toBooleanOption.toRight("transform.minhashDedup.keepLongest not a boolean")
          } yield TransformConfig.MinhashDedup(id, text, sh, nh, b, r, tn, td, kl)
        case "semanticDedup" =>
          for {
            id <- map.get("transform.semanticDedup.idColumn")
              .toRight("transform.semanticDedup.idColumn required")
            vec <- map.get("transform.semanticDedup.vecColumn")
              .toRight("transform.semanticDedup.vecColumn required")
            np <- map.getOrElse("transform.semanticDedup.numPlanes", "80")
              .toIntOption.toRight("transform.semanticDedup.numPlanes not an int")
            bb <- map.getOrElse("transform.semanticDedup.bandBits", "4")
              .toIntOption.toRight("transform.semanticDedup.bandBits not an int")
            th <- map.getOrElse("transform.semanticDedup.threshold", "0.9")
              .toDoubleOption.toRight("transform.semanticDedup.threshold not a double")
            sd <- map.getOrElse("transform.semanticDedup.seed", "42")
              .toLongOption.toRight("transform.semanticDedup.seed not a long")
          } yield TransformConfig.SemanticDedup(id, vec, np, bb, th, sd)
        case "decontaminate" =>
          for {
            id <- map.get("transform.decontaminate.idColumn")
              .toRight("transform.decontaminate.idColumn required")
            text <- map.get("transform.decontaminate.textColumn")
              .toRight("transform.decontaminate.textColumn required")
            ref <- map.get("transform.decontaminate.referencePath")
              .toRight("transform.decontaminate.referencePath required")
            n <- map.getOrElse("transform.decontaminate.ngram", "8")
              .toIntOption.toRight("transform.decontaminate.ngram not an int")
            ms <- map.getOrElse("transform.decontaminate.minShared", "1")
              .toLongOption.toRight("transform.decontaminate.minShared not a long")
          } yield TransformConfig.Decontaminate(id, text, ref, n, ms)
        case "semanticDecontaminate" =>
          for {
            vec <- map.get("transform.semanticDecontaminate.vecColumn")
              .toRight("transform.semanticDecontaminate.vecColumn required")
            ref <- map.get("transform.semanticDecontaminate.referencePath")
              .toRight("transform.semanticDecontaminate.referencePath required")
            md <- map.get("transform.semanticDecontaminate.minDot")
              .toRight("transform.semanticDecontaminate.minDot required")
              .flatMap(_.toLongOption
                .toRight("transform.semanticDecontaminate.minDot not a long"))
          } yield TransformConfig.SemanticDecontaminate(vec, ref, md)
        case "piiScrub" =>
          map.get("transform.piiScrub.textColumn")
            .toRight("transform.piiScrub.textColumn required")
            .map(TransformConfig.PiiScrub(_))
        case "dsirFilter" =>
          for {
            id <- map.get("transform.dsirFilter.idColumn")
              .toRight("transform.dsirFilter.idColumn required")
            text <- map.get("transform.dsirFilter.textColumn")
              .toRight("transform.dsirFilter.textColumn required")
            tp <- map.get("transform.dsirFilter.targetPath")
              .toRight("transform.dsirFilter.targetPath required")
            b <- map.getOrElse("transform.dsirFilter.buckets", "64")
              .toIntOption.toRight("transform.dsirFilter.buckets not an int")
            kn <- map.getOrElse("transform.dsirFilter.keepNum", "1")
              .toIntOption.toRight("transform.dsirFilter.keepNum not an int")
            kd <- map.getOrElse("transform.dsirFilter.keepDenom", "2")
              .toIntOption.toRight("transform.dsirFilter.keepDenom not an int")
          } yield TransformConfig.DsirFilter(id, text, tp,
            map.getOrElse("transform.dsirFilter.targetTextColumn", text), b, kn, kd)
        case "pplFilter" =>
          for {
            id <- map.get("transform.pplFilter.idColumn")
              .toRight("transform.pplFilter.idColumn required")
            text <- map.get("transform.pplFilter.textColumn")
              .toRight("transform.pplFilter.textColumn required")
            lang <- map.get("transform.pplFilter.langColumn")
              .toRight("transform.pplFilter.langColumn required")
            buckets <- map.getOrElse("transform.pplFilter.buckets", "3")
              .toIntOption.toRight("transform.pplFilter.buckets not an int")
            keep <- list("transform.pplFilter.keep").foldRight(
              Right(Nil): Either[String, List[Long]]) { (k, acc) =>
              acc.flatMap(rest => k.toLongOption
                .toRight(s"malformed pplFilter.keep bucket: $k").map(_ :: rest))
            }
            approx <- map.getOrElse("transform.pplFilter.approx", "true")
              .toBooleanOption.toRight("transform.pplFilter.approx not a boolean")
          } yield TransformConfig.PplFilter(id, text, lang, buckets, keep, approx)
        case "tokenBudget" =>
          for {
            group <- map.get("transform.tokenBudget.groupColumn")
              .toRight("transform.tokenBudget.groupColumn required")
            key <- map.get("transform.tokenBudget.keyColumn")
              .toRight("transform.tokenBudget.keyColumn required")
            tok <- map.get("transform.tokenBudget.tokenColumn")
              .toRight("transform.tokenBudget.tokenColumn required")
            b <- map.get("transform.tokenBudget.budget")
              .toRight("transform.tokenBudget.budget required")
              .flatMap(_.toLongOption.toRight("transform.tokenBudget.budget not a long"))
            sh <- map.getOrElse("transform.tokenBudget.shards", "256")
              .toIntOption.toRight("transform.tokenBudget.shards not an int")
          } yield TransformConfig.TokenBudget(group, key, tok, b, sh)
        case "incrDedup" =>
          for {
            id <- map.get("transform.incrDedup.idColumn")
              .toRight("transform.incrDedup.idColumn required")
            text <- map.get("transform.incrDedup.textColumn")
              .toRight("transform.incrDedup.textColumn required")
            ref <- map.get("transform.incrDedup.referencePath")
              .toRight("transform.incrDedup.referencePath required")
          } yield TransformConfig.IncrDedup(id, text, ref,
            map.getOrElse("transform.incrDedup.referenceTextColumn", text))
        case "mixToTarget" =>
          for {
            key <- map.get("transform.mixToTarget.keyColumn")
              .toRight("transform.mixToTarget.keyColumn required")
            group <- map.get("transform.mixToTarget.groupColumn")
              .toRight("transform.mixToTarget.groupColumn required")
            weights <- list("transform.mixToTarget.weights").foldRight(
              Right(Nil): Either[String, List[(String, Int)]]) { (w, acc) =>
              acc.flatMap(rest => w.split("=") match {
                case Array(nm, num) if num.trim.toIntOption.isDefined =>
                  Right((nm.trim, num.trim.toInt) :: rest)
                case _ => Left(s"malformed mixToTarget weight (want group=int): $w")
              })
            }
            wd <- map.getOrElse("transform.mixToTarget.wDenom", "100")
              .toIntOption.toRight("transform.mixToTarget.wDenom not an int")
          } yield TransformConfig.MixToTarget(key, group, weights, wd)
        case "outlierFilter" =>
          for {
            value <- map.get("transform.outlierFilter.valueColumn")
              .toRight("transform.outlierFilter.valueColumn required")
            group <- map.get("transform.outlierFilter.groupColumn")
              .toRight("transform.outlierFilter.groupColumn required")
            z <- map.getOrElse("transform.outlierFilter.z", "3.0")
              .toDoubleOption.toRight("transform.outlierFilter.z not a double")
          } yield TransformConfig.OutlierFilter(value, group, z)
        case "qualityFilter" =>
          def weight(key: String, default: Long): Either[String, Long] =
            map.getOrElse(s"transform.qualityFilter.$key", default.toString)
              .toLongOption.toRight(s"transform.qualityFilter.$key not a long")
          for {
            text <- map.get("transform.qualityFilter.textColumn")
              .toRight("transform.qualityFilter.textColumn required")
            ms <- map.get("transform.qualityFilter.minScore")
              .toRight("transform.qualityFilter.minScore required")
              .flatMap(_.toLongOption.toRight("transform.qualityFilter.minScore not a long"))
            b <- weight("bias", 0L)
            ws <- weight("wStop", 4L)
            wp <- weight("wPunct", -2L)
            wd <- weight("wDigit", -3L)
            wt <- weight("wTokLen", 1L)
          } yield TransformConfig.QualityFilter(text, ms, b, ws, wp, wd, wt)
        case "gopherFilter" =>
          def bound(key: String, default: Long): Either[String, Long] =
            map.getOrElse(s"transform.gopherFilter.$key", default.toString)
              .toLongOption.toRight(s"transform.gopherFilter.$key not a long")
          for {
            text <- map.get("transform.gopherFilter.textColumn")
              .toRight("transform.gopherFilter.textColumn required")
            minW <- bound("minWords", 50L)
            maxW <- bound("maxWords", 100000L)
            minL <- bound("minMeanLen", 3L)
            maxL <- bound("maxMeanLen", 10L)
            alpha <- bound("minAlphaPct", 80L)
            sym <- bound("maxSymbolPct", 10L)
            stop <- bound("minStopHits", 2L)
            top <- bound("maxTopTokenPct", 20L)
          } yield TransformConfig.GopherFilter(text, minW, maxW, minL, maxL,
            alpha, sym, stop, top)
        case "repetitionFilter" =>
          def pcts(key: String, default: List[Long]): Either[String, List[Long]] =
            map.get(s"transform.repetitionFilter.$key") match {
              case None => Right(default)
              case Some(raw) =>
                val parts = raw.split(",").map(_.trim).filter(_.nonEmpty)
                val longs = parts.flatMap(_.toLongOption)
                if (longs.length != parts.length)
                  Left(s"transform.repetitionFilter.$key: not a comma list of longs")
                else Right(longs.toList)
            }
          for {
            text <- map.get("transform.repetitionFilter.textColumn")
              .toRight("transform.repetitionFilter.textColumn required")
            top <- pcts("topPcts", List(20L, 18L, 16L))
            dup <- pcts("dupPcts", List(15L, 14L, 13L, 12L, 11L, 10L))
          } yield TransformConfig.RepetitionFilter(text, top, dup)
        case "blocklist" =>
          for {
            text <- map.get("transform.blocklist.textColumn")
              .toRight("transform.blocklist.textColumn required")
            tp <- map.get("transform.blocklist.termsPath")
              .toRight("transform.blocklist.termsPath required")
            mt <- map.getOrElse("transform.blocklist.maxTerms", "0")
              .toLongOption.toRight("transform.blocklist.maxTerms not a long")
          } yield TransformConfig.BlocklistFilter(text, tp, mt)
        case "sessionize" =>
          for {
            ts <- map.get("transform.sessionize.tsColumn")
              .toRight("transform.sessionize.tsColumn required")
            gap <- map.get("transform.sessionize.gap")
              .toRight("transform.sessionize.gap required")
          } yield TransformConfig.SessionizeStage(
            list("transform.sessionize.keys"), ts, gap,
            list("transform.sessionize.tieBreak"))
        case "funnel" =>
          for {
            key <- map.get("transform.funnel.keyColumn")
              .toRight("transform.funnel.keyColumn required")
            ts <- map.get("transform.funnel.tsColumn")
              .toRight("transform.funnel.tsColumn required")
            typ <- map.get("transform.funnel.typeColumn")
              .toRight("transform.funnel.typeColumn required")
          } yield TransformConfig.FunnelStage(key, ts, typ,
            list("transform.funnel.steps"))
        case "retention" =>
          for {
            key <- map.get("transform.retention.keyColumn")
              .toRight("transform.retention.keyColumn required")
            ts <- map.get("transform.retention.tsColumn")
              .toRight("transform.retention.tsColumn required")
            bd <- map.getOrElse("transform.retention.bucketDays", "7")
              .toIntOption.toRight("transform.retention.bucketDays not an int")
          } yield TransformConfig.RetentionStage(key, ts, bd)
        case "scd2History" =>
          for {
            key <- map.get("transform.scd2History.keyColumn")
              .toRight("transform.scd2History.keyColumn required")
            ts <- map.get("transform.scd2History.tsColumn")
              .toRight("transform.scd2History.tsColumn required")
            op <- map.get("transform.scd2History.opColumn")
              .toRight("transform.scd2History.opColumn required")
          } yield TransformConfig.Scd2HistoryStage(key, ts, op,
            map.getOrElse("transform.scd2History.upsertOp", "upsert"),
            map.getOrElse("transform.scd2History.deleteOp", "delete"),
            list("transform.scd2History.valueColumns"),
            list("transform.scd2History.tieBreak"))
        case "pitEnrich" =>
          for {
            hp <- map.get("transform.pitEnrich.historyPath")
              .toRight("transform.pitEnrich.historyPath required")
            key <- map.get("transform.pitEnrich.keyColumn")
              .toRight("transform.pitEnrich.keyColumn required")
            ts <- map.get("transform.pitEnrich.tsColumn")
              .toRight("transform.pitEnrich.tsColumn required")
          } yield TransformConfig.PitEnrichStage(hp, key, ts,
            list("transform.pitEnrich.valueColumns"))
        case "mergeSnapshot" =>
          for {
            sp <- map.get("transform.mergeSnapshot.snapshotPath")
              .toRight("transform.mergeSnapshot.snapshotPath required")
            ds <- map.getOrElse("transform.mergeSnapshot.deleteStale", "false")
              .toBooleanOption.toRight("transform.mergeSnapshot.deleteStale not a boolean")
          } yield TransformConfig.MergeSnapshotStage(sp,
            list("transform.mergeSnapshot.keys"), ds)
        case "phashDedup" =>
          for {
            id <- map.get("transform.phashDedup.idColumn")
              .toRight("transform.phashDedup.idColumn required")
            pay <- map.get("transform.phashDedup.payloadColumn")
              .toRight("transform.phashDedup.payloadColumn required")
            md <- map.getOrElse("transform.phashDedup.maxDist", "8")
              .toIntOption.toRight("transform.phashDedup.maxDist not an int")
            ln <- map.getOrElse("transform.phashDedup.lenient", "false")
              .toBooleanOption.toRight("transform.phashDedup.lenient not a boolean")
          } yield TransformConfig.PhashDedupStage(id, pay,
            map.getOrElse("transform.phashDedup.decoder", "stub"), md, ln)
        case "scd2Append" =>
          for {
            hp <- map.get("transform.scd2Append.historyPath")
              .toRight("transform.scd2Append.historyPath required")
            key <- map.get("transform.scd2Append.keyColumn")
              .toRight("transform.scd2Append.keyColumn required")
            ts <- map.get("transform.scd2Append.tsColumn")
              .toRight("transform.scd2Append.tsColumn required")
            op <- map.get("transform.scd2Append.opColumn")
              .toRight("transform.scd2Append.opColumn required")
          } yield TransformConfig.Scd2AppendStage(hp, key, ts, op,
            map.getOrElse("transform.scd2Append.upsertOp", "upsert"),
            map.getOrElse("transform.scd2Append.deleteOp", "delete"),
            list("transform.scd2Append.valueColumns"),
            list("transform.scd2Append.tieBreak"))
        case "constraintGate" =>
          for {
            minR <- map.getOrElse("transform.constraintGate.minRows", "0")
              .toLongOption.toRight("transform.constraintGate.minRows not a long")
            maxR <- map.getOrElse("transform.constraintGate.maxRows",
              Long.MaxValue.toString)
              .toLongOption.toRight("transform.constraintGate.maxRows not a long")
          } yield TransformConfig.ConstraintGateStage(
            list("transform.constraintGate.notNull"),
            list("transform.constraintGate.uniqueKey"), minR, maxR,
            map.getOrElse("transform.constraintGate.fkColumn", ""),
            map.getOrElse("transform.constraintGate.fkRefPath", ""),
            map.getOrElse("transform.constraintGate.fkRefColumn", ""))
        case "seqPack" =>
          for {
            id <- map.get("transform.seqPack.idColumn")
              .toRight("transform.seqPack.idColumn required")
            text <- map.get("transform.seqPack.textColumn")
              .toRight("transform.seqPack.textColumn required")
            bu <- map.getOrElse("transform.seqPack.budget", "2048")
              .toLongOption.toRight("transform.seqPack.budget not a long")
            sw <- map.getOrElse("transform.seqPack.shardWidth", "100000")
              .toLongOption.toRight("transform.seqPack.shardWidth not a long")
          } yield TransformConfig.SeqPack(id, text, bu, sw)
        case "resampleByWeight" =>
          for {
            key <- map.get("transform.resampleByWeight.keyColumn")
              .toRight("transform.resampleByWeight.keyColumn required")
            rate <- map.get("transform.resampleByWeight.rateColumn")
              .toRight("transform.resampleByWeight.rateColumn required")
            denom <- map.getOrElse("transform.resampleByWeight.denom", "1000000")
              .toIntOption.toRight("transform.resampleByWeight.denom not an int")
          } yield TransformConfig.ResampleStage(key, rate, denom)
        case "lshDedup" =>
          for {
            ip <- map.get("transform.lshDedup.indexPath")
              .toRight("transform.lshDedup.indexPath required")
            id <- map.get("transform.lshDedup.idColumn")
              .toRight("transform.lshDedup.idColumn required")
            text <- map.get("transform.lshDedup.textColumn")
              .toRight("transform.lshDedup.textColumn required")
            tn <- map.getOrElse("transform.lshDedup.thresholdNum", "9")
              .toIntOption.toRight("transform.lshDedup.thresholdNum not an int")
            td <- map.getOrElse("transform.lshDedup.thresholdDenom", "10")
              .toIntOption.toRight("transform.lshDedup.thresholdDenom not an int")
            mb <- map.getOrElse("transform.lshDedup.minBands", "4")
              .toIntOption.toRight("transform.lshDedup.minBands not an int")
            mh <- map.getOrElse("transform.lshDedup.minMatchingHashes", "46")
              .toIntOption.toRight("transform.lshDedup.minMatchingHashes not an int")
            adv <- map.getOrElse("transform.lshDedup.advance", "false")
              .toBooleanOption.toRight("transform.lshDedup.advance not a boolean")
            mpk <- map.getOrElse("transform.lshDedup.maxPruneKeys", "2000000")
              .toIntOption.toRight("transform.lshDedup.maxPruneKeys not an int")
            mpb <- map.getOrElse("transform.lshDedup.minPruneBytes", "0")
              .toLongOption.toRight("transform.lshDedup.minPruneBytes not a long")
          } yield TransformConfig.LshDedupStage(ip, id, text, tn, td, mb, mh, adv,
            mpk, mpb)
        case "annSearch" =>
          for {
            root <- map.get("transform.annSearch.indexRoot")
              .toRight("transform.annSearch.indexRoot required")
            id <- map.get("transform.annSearch.idColumn")
              .toRight("transform.annSearch.idColumn required")
            vec <- map.get("transform.annSearch.vecColumn")
              .toRight("transform.annSearch.vecColumn required")
            k <- map.getOrElse("transform.annSearch.k", "10")
              .toIntOption.toRight("transform.annSearch.k not an int")
            np <- map.getOrElse("transform.annSearch.nProbe", "4")
              .toIntOption.toRight("transform.annSearch.nProbe not an int")
            ver <- map.getOrElse("transform.annSearch.versioned", "false")
              .toBooleanOption.toRight("transform.annSearch.versioned not a boolean")
            kc <- map.get("transform.annSearch.rerankKCand") match {
              case None => Right(None)
              case Some(v) => v.toIntOption.map(Some(_))
                .toRight("transform.annSearch.rerankKCand not an int")
            }
          } yield TransformConfig.AnnSearchStage(root, id, vec, k, np, ver,
            map.get("transform.annSearch.filterPath"),
            map.get("transform.annSearch.filterColumn"),
            map.get("transform.annSearch.rerankPath"), kc)
        case "annIngest" =>
          for {
            root <- map.get("transform.annIngest.indexRoot")
              .toRight("transform.annIngest.indexRoot required")
            id <- map.get("transform.annIngest.idColumn")
              .toRight("transform.annIngest.idColumn required")
            vec <- map.get("transform.annIngest.vecColumn")
              .toRight("transform.annIngest.vecColumn required")
            tag <- map.get("transform.annIngest.tag")
              .toRight("transform.annIngest.tag required")
          } yield TransformConfig.AnnIngestStage(root, id, vec, tag)
        case "forget" =>
          for {
            store <- map.get("transform.forget.store")
              .toRight("transform.forget.store required " +
                s"(${TransformConfig.ForgetStage.Stores.mkString("|")})")
            root <- map.get("transform.forget.root")
              .toRight("transform.forget.root required")
            id <- map.get("transform.forget.idColumn")
              .toRight("transform.forget.idColumn required")
          } yield TransformConfig.ForgetStage(store, root, id)
        case "rfm" =>
          for {
            key <- map.get("transform.rfm.keyColumn")
              .toRight("transform.rfm.keyColumn required")
            ts <- map.get("transform.rfm.tsColumn")
              .toRight("transform.rfm.tsColumn required")
            value <- map.get("transform.rfm.valueColumn")
              .toRight("transform.rfm.valueColumn required")
            asOf <- map.get("transform.rfm.asOf")
              .toRight("transform.rfm.asOf required (ISO date)")
            buckets <- map.getOrElse("transform.rfm.buckets", "5")
              .toIntOption.toRight("transform.rfm.buckets not an int")
          } yield TransformConfig.RfmStage(key, ts, value, asOf, buckets)
        case "transitionMatrix" =>
          for {
            key <- map.get("transform.transitionMatrix.keyColumn")
              .toRight("transform.transitionMatrix.keyColumn required")
            ts <- map.get("transform.transitionMatrix.tsColumn")
              .toRight("transform.transitionMatrix.tsColumn required")
            tpe <- map.get("transform.transitionMatrix.typeColumn")
              .toRight("transform.transitionMatrix.typeColumn required")
          } yield TransformConfig.TransitionMatrixStage(key, ts, tpe,
            list("transform.transitionMatrix.tieBreak"))
        case "attribution" =>
          for {
            key <- map.get("transform.attribution.keyColumn")
              .toRight("transform.attribution.keyColumn required")
            ts <- map.get("transform.attribution.tsColumn")
              .toRight("transform.attribution.tsColumn required")
            tpe <- map.get("transform.attribution.typeColumn")
              .toRight("transform.attribution.typeColumn required")
            conv <- map.get("transform.attribution.conversionType")
              .toRight("transform.attribution.conversionType required")
          } yield TransformConfig.AttributionStage(key, ts, tpe, conv,
            list("transform.attribution.touchTypes"),
            list("transform.attribution.tieBreak"))
        case "anomaly" =>
          for {
            value <- map.get("transform.anomaly.valueColumn")
              .toRight("transform.anomaly.valueColumn required")
            window <- map.getOrElse("transform.anomaly.window", "20")
              .toIntOption.toRight("transform.anomaly.window not an int")
            minPoints <- map.getOrElse("transform.anomaly.minPoints", "8")
              .toIntOption.toRight("transform.anomaly.minPoints not an int")
            z <- map.getOrElse("transform.anomaly.z", "3")
              .toIntOption.toRight("transform.anomaly.z not an int")
            maxAbs <- map.get("transform.anomaly.maxAbsValue")
              .toRight("transform.anomaly.maxAbsValue required (the 64-bit " +
                "overflow contract needs the caller's |value| bound)")
              .flatMap(_.toLongOption.toRight("transform.anomaly.maxAbsValue not a long"))
          } yield TransformConfig.AnomalyStage(
            list("transform.anomaly.keyColumns"),
            list("transform.anomaly.orderColumns"),
            value, window, minPoints, z, maxAbs)
        case "winsorize" =>
          for {
            value <- map.get("transform.winsorize.valueColumn")
              .toRight("transform.winsorize.valueColumn required")
            out <- map.get("transform.winsorize.outColumn")
              .toRight("transform.winsorize.outColumn required")
            pct <- map.getOrElse("transform.winsorize.pct", "5")
              .toIntOption.toRight("transform.winsorize.pct not an int")
          } yield TransformConfig.WinsorizeStage(
            list("transform.winsorize.groupColumns"), value, pct, out,
            map.getOrElse("transform.winsorize.tier", "exact"))
        case "intervalJoin" =>
          for {
            rp <- map.get("transform.intervalJoin.rightPath")
              .toRight("transform.intervalJoin.rightPath required")
            lLo <- map.get("transform.intervalJoin.leftLo")
              .toRight("transform.intervalJoin.leftLo required")
            lHi <- map.get("transform.intervalJoin.leftHi")
              .toRight("transform.intervalJoin.leftHi required")
            rLo <- map.get("transform.intervalJoin.rightLo")
              .toRight("transform.intervalJoin.rightLo required")
            rHi <- map.get("transform.intervalJoin.rightHi")
              .toRight("transform.intervalJoin.rightHi required")
            bw <- map.getOrElse("transform.intervalJoin.bandWidth", "0")
              .toDoubleOption.toRight("transform.intervalJoin.bandWidth not a double")
            keys <- list("transform.intervalJoin.keys").foldRight(
              Right(Nil): Either[String, List[(String, String)]]) { (p, acc) =>
              acc.flatMap { rest =>
                p.split("=") match {
                  case Array(a, b) if a.trim.nonEmpty && b.trim.nonEmpty =>
                    Right((a.trim, b.trim) :: rest)
                  case _ => Left(
                    s"transform.intervalJoin.keys entry '$p' is not left=right")
                }
              }
            }
          } yield TransformConfig.IntervalJoinStage(rp, lLo, lHi, rLo, rHi, keys, bw)
        case "components" =>
          for {
            src <- map.get("transform.components.srcColumn")
              .toRight("transform.components.srcColumn required")
            dst <- map.get("transform.components.dstColumn")
              .toRight("transform.components.dstColumn required")
            mi <- map.getOrElse("transform.components.maxIters", "10")
              .toIntOption.toRight("transform.components.maxIters not an int")
          } yield TransformConfig.ComponentsStage(src, dst, mi)
        case "triangles" =>
          for {
            src <- map.get("transform.triangles.srcColumn")
              .toRight("transform.triangles.srcColumn required")
            dst <- map.get("transform.triangles.dstColumn")
              .toRight("transform.triangles.dstColumn required")
          } yield TransformConfig.TrianglesStage(src, dst)
        case "reachable" =>
          for {
            src <- map.get("transform.reachable.srcColumn")
              .toRight("transform.reachable.srcColumn required")
            dst <- map.get("transform.reachable.dstColumn")
              .toRight("transform.reachable.dstColumn required")
            rp <- map.get("transform.reachable.rootsPath")
              .toRight("transform.reachable.rootsPath required")
            rc <- map.get("transform.reachable.rootColumn")
              .toRight("transform.reachable.rootColumn required")
            md <- map.getOrElse("transform.reachable.maxDepth", "3")
              .toIntOption.toRight("transform.reachable.maxDepth not an int")
          } yield TransformConfig.ReachableStage(src, dst, rp, rc, md)
        case "bitemporal" =>
          for {
            key <- map.get("transform.bitemporal.keyColumn")
              .toRight("transform.bitemporal.keyColumn required")
            vts <- map.get("transform.bitemporal.validTsColumn")
              .toRight("transform.bitemporal.validTsColumn required")
            tts <- map.get("transform.bitemporal.txTsColumn")
              .toRight("transform.bitemporal.txTsColumn required")
            op <- map.get("transform.bitemporal.opColumn")
              .toRight("transform.bitemporal.opColumn required")
            va <- map.get("transform.bitemporal.validAt")
              .toRight("transform.bitemporal.validAt required")
            ta <- map.get("transform.bitemporal.txAt")
              .toRight("transform.bitemporal.txAt required")
          } yield TransformConfig.BitemporalStage(key, vts, tts, op,
            map.getOrElse("transform.bitemporal.upsertOp", "upsert"),
            map.getOrElse("transform.bitemporal.deleteOp", "delete"),
            list("transform.bitemporal.valueColumns"), va, ta,
            list("transform.bitemporal.tieBreak"))
        case "linkExtract" =>
          for {
            html <- map.get("transform.linkExtract.htmlColumn")
              .toRight("transform.linkExtract.htmlColumn required")
            href <- map.get("transform.linkExtract.hrefColumn")
              .toRight("transform.linkExtract.hrefColumn required")
          } yield TransformConfig.LinkExtract(html, href)
        case "lexSearch" =>
          for {
            root <- map.get("transform.lexSearch.indexRoot")
              .toRight("transform.lexSearch.indexRoot required")
            qid <- map.get("transform.lexSearch.queryIdColumn")
              .toRight("transform.lexSearch.queryIdColumn required")
            term <- map.get("transform.lexSearch.termColumn")
              .toRight("transform.lexSearch.termColumn required")
            k <- map.getOrElse("transform.lexSearch.k", "10")
              .toIntOption.toRight("transform.lexSearch.k not an int")
          } yield TransformConfig.LexSearchStage(root, qid, term, k)
        case "rrfFuse" =>
          for {
            other <- map.get("transform.rrfFuse.otherPath")
              .toRight("transform.rrfFuse.otherPath required")
            qid <- map.get("transform.rrfFuse.queryIdColumn")
              .toRight("transform.rrfFuse.queryIdColumn required")
            id <- map.get("transform.rrfFuse.idColumn")
              .toRight("transform.rrfFuse.idColumn required")
            rank = map.getOrElse("transform.rrfFuse.rankColumn", "rank")
            k <- map.getOrElse("transform.rrfFuse.k", "10")
              .toIntOption.toRight("transform.rrfFuse.k not an int")
            kRrf <- map.getOrElse("transform.rrfFuse.kRrf", "60")
              .toIntOption.toRight("transform.rrfFuse.kRrf not an int")
          } yield TransformConfig.RrfFuseStage(other, qid, id, rank, k, kRrf)
        case "graphEpoch" =>
          for {
            root <- map.get("transform.graphEpoch.root")
              .toRight("transform.graphEpoch.root required")
            src <- map.get("transform.graphEpoch.srcColumn")
              .toRight("transform.graphEpoch.srcColumn required")
            dst <- map.get("transform.graphEpoch.dstColumn")
              .toRight("transform.graphEpoch.dstColumn required")
            tag <- map.get("transform.graphEpoch.tag")
              .toRight("transform.graphEpoch.tag required")
          } yield TransformConfig.GraphEpochStage(root, src, dst, tag)
        case "pageRank" =>
          def num(key: String, default: Int): Either[String, Int] =
            map.getOrElse(s"transform.pageRank.$key", default.toString)
              .toIntOption.toRight(s"transform.pageRank.$key not an int")
          for {
            src <- map.get("transform.pageRank.srcColumn")
              .toRight("transform.pageRank.srcColumn required")
            dst <- map.get("transform.pageRank.dstColumn")
              .toRight("transform.pageRank.dstColumn required")
            it <- num("iters", 3)
            dp <- num("dampingPct", 85)
            dg <- map.getOrElse("transform.pageRank.dangling", "false")
              .toBooleanOption
              .toRight("transform.pageRank.dangling not a boolean")
          } yield TransformConfig.PageRankStage(src, dst, it, dp, dg,
            seedsPath = map.getOrElse("transform.pageRank.seedsPath", ""),
            seedColumn = map.getOrElse("transform.pageRank.seedColumn", "id"))
        case "hits" =>
          for {
            src <- map.get("transform.hits.srcColumn")
              .toRight("transform.hits.srcColumn required")
            dst <- map.get("transform.hits.dstColumn")
              .toRight("transform.hits.dstColumn required")
            it <- map.getOrElse("transform.hits.iters", "2")
              .toIntOption.toRight("transform.hits.iters not an int")
          } yield TransformConfig.HitsStage(src, dst, it)
        case "mmrRerank" =>
          for {
            qid <- map.get("transform.mmrRerank.queryIdColumn")
              .toRight("transform.mmrRerank.queryIdColumn required")
            id <- map.get("transform.mmrRerank.idColumn")
              .toRight("transform.mmrRerank.idColumn required")
            score <- map.get("transform.mmrRerank.scoreColumn")
              .toRight("transform.mmrRerank.scoreColumn required")
            vec <- map.get("transform.mmrRerank.vecColumn")
              .toRight("transform.mmrRerank.vecColumn required")
            k <- map.getOrElse("transform.mmrRerank.k", "10")
              .toIntOption.toRight("transform.mmrRerank.k not an int")
            lam <- map.getOrElse("transform.mmrRerank.lambdaPct", "70")
              .toIntOption.toRight("transform.mmrRerank.lambdaPct not an int")
          } yield TransformConfig.MmrStage(qid, id, score, vec, k, lam)
        case "evalRanking" =>
          for {
            tp <- map.get("transform.evalRanking.truthPath")
              .toRight("transform.evalRanking.truthPath required")
            qid <- map.get("transform.evalRanking.queryIdColumn")
              .toRight("transform.evalRanking.queryIdColumn required")
            id <- map.get("transform.evalRanking.idColumn")
              .toRight("transform.evalRanking.idColumn required")
            rank = map.getOrElse("transform.evalRanking.rankColumn", "rank")
            k <- map.getOrElse("transform.evalRanking.k", "10")
              .toIntOption.toRight("transform.evalRanking.k not an int")
          } yield TransformConfig.EvalRankingStage(tp, qid, id, rank, k,
            map.get("transform.evalRanking.relColumn"))
        case "htmlExtract" =>
          map.get("transform.htmlExtract.textColumn")
            .toRight("transform.htmlExtract.textColumn required")
            .map(TransformConfig.HtmlExtract(_))
        case "urlCanon" =>
          map.get("transform.urlCanon.urlColumn")
            .toRight("transform.urlCanon.urlColumn required")
            .map(u => TransformConfig.UrlCanon(u,
              map.get("transform.urlCanon.hostColumn"),
              map.get("transform.urlCanon.domainColumn"),
              map.get("transform.urlCanon.trackedParams")
                .map(_.split(",").map(_.trim).filter(_.nonEmpty).toList)))
        case "lineDedup" =>
          def num(key: String, default: Int): Either[String, Int] =
            map.getOrElse(s"transform.lineDedup.$key", default.toString)
              .toIntOption.toRight(s"transform.lineDedup.$key not an int")
          for {
            id <- map.get("transform.lineDedup.idColumn")
              .toRight("transform.lineDedup.idColumn required")
            text <- map.get("transform.lineDedup.textColumn")
              .toRight("transform.lineDedup.textColumn required")
            minDup <- num("minDupCount", 2)
            minChars <- num("minLineChars", 2)
            segWords <- num("segmentWords", 0)
            adv <- map.getOrElse("transform.lineDedup.advance", "false")
              .toBooleanOption
              .toRight("transform.lineDedup.advance not a boolean")
            census = map.get("transform.lineDedup.censusDir")
            // the census pins eligibility in its own sidecar; accepting
            // an explicit minLineChars alongside it would be a silently
            // ignored knob — the failure shape the NearDupStore banding
            // check exists for
            _ <- if (census.isDefined &&
                map.contains("transform.lineDedup.minLineChars"))
              Left("transform.lineDedup.minLineChars is pinned by the " +
                "census sidecar — remove it when censusDir is set")
            else Right(())
          } yield TransformConfig.LineDedup(id, text, minDup, minChars, segWords,
            census, adv, map.get("transform.lineDedup.advanceTag"))
        case "lineFilter" =>
          def num(key: String, default: Int): Either[String, Int] =
            map.getOrElse(s"transform.lineFilter.$key", default.toString)
              .toIntOption.toRight(s"transform.lineFilter.$key not an int")
          for {
            id <- map.get("transform.lineFilter.idColumn")
              .toRight("transform.lineFilter.idColumn required")
            text <- map.get("transform.lineFilter.textColumn")
              .toRight("transform.lineFilter.textColumn required")
            minTok <- map.get("transform.lineFilter.minTokens")
              .toRight("transform.lineFilter.minTokens required")
              .flatMap(_.toIntOption.toRight("transform.lineFilter.minTokens not an int"))
            minKept <- num("minKeptLines", 1)
            segWords <- num("segmentWords", 0)
          } yield TransformConfig.LineFilter(id, text, minTok,
            list("transform.lineFilter.anchorWords"), minKept, segWords)
        case other => Left(s"unknown transform stage: $other")
      }
      list("transforms").foldRight(
        Right(Nil): Either[String, List[TransformConfig]]) { (n, acc) =>
        acc.flatMap(rest => stage(n).map(_ :: rest))
      }
    }

    for {
      s <- source
      tg <- target
      st <- stream
      ts <- transforms
      cfg <- PipelineConfig(s, tg, renames, map.get("savepoints.dir"),
        list("skipFiles").toSet, validation, st, ts).validate
    } yield cfg
  }
}
