package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-budget sequence packing — the "fill the context window" step
  * of a training-data pipeline: documents are concatenated, in order,
  * into sequences of at most `budget` tokens, opening a new sequence
  * whenever the next document would overflow the current one.
  *
  * Greedy packing is inherently sequential (each assignment depends on
  * the running fill), so a single global order would serialize the
  * corpus through one task. Instead the id space is RANGE-SHARDED:
  * packing runs greedily and deterministically inside each
  * `shardWidth`-wide id range, and shards pack in parallel. The only
  * deviation from a global greedy pass is at shard boundaries (the
  * first doc of a shard always opens a fresh sequence) — bounded waste
  * of less than one sequence per shard, the standard trade for making
  * the step data-parallel. Same discipline as the range-sharded islands
  * rank in operators/Sequences.scala.
  *
  * Determinism: the assignment is a pure function of ((id floor-div
  * shardWidth), id, capped token count) — independent of partitioning,
  * retries, and executor count (the shard's rows are sorted within the
  * partition before the scan). A document longer than the budget is
  * capped at `budget` for fill accounting, so it occupies exactly one
  * sequence alone and progress is guaranteed (the chunking operator —
  * Text.chunks — is the right tool BEFORE packing if oversized docs
  * should split instead).
  *
  * Plan shape: one hash repartition on the shard key, an intra-partition
  * sort, one sequential scan per shard inside mapPartitions (per-row
  * imperative state — the genuine mapPartitions case), no further
  * shuffle. Sequence ids are globally unique by construction:
  * shard·shardWidth + within-shard counter (< shardWidth sequences can
  * open inside a shard of shardWidth docs).
  */
object Packing {

  /** @param idCol    integral id defining the pack order — ids must be
    *                 UNIQUE (ties leave the within-sequence order, and
    *                 thus the assignment, partition-dependent) (shard =
    *                 floor(id / shardWidth), exact for negatives too)
    * @param tokenCol per-document token count (null → 0, capped at budget)
    * @return (idCol, seq_id, seq_pos, tok_used): the sequence each doc
    *         joined, its 0-based position in it, and its capped token
    *         contribution
    */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Long, shardWidth: Long): DataFrame = {
    require(budget > 0 && shardWidth > 0, "need positive budget and shardWidth")
    val prepared = df.select(
        // a NULL id would otherwise surface as an opaque executor NPE
        // deep in the packing scan — fail with the actual problem named
        when(col(idCol).isNull,
          raise_error(lit(s"packGreedy: NULL value in id column '$idCol'")))
          .otherwise(col(idCol).cast("long")).as("id"),
        // exact FLOOR division in integer ops: pmod is non-negative, so
        // (id - pmod(id, W)) is the largest multiple of W ≤ id and the
        // `div` is exact — agrees with floor semantics (DuckDB `//`) for
        // negative ids too, with no double-precision detour
        expr(s"(CAST(`$idCol` AS BIGINT) - pmod(CAST(`$idCol` AS BIGINT), ${shardWidth}L)) div ${shardWidth}L")
          .as("shard"),
        least(greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L)),
          lit(budget)).as("t"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("seq_pos", LongType, nullable = false),
      StructField("tok_used", LongType, nullable = false)))
    prepared.mapPartitions { rows =>
      // a partition holds whole shards (hash-partitioned on shard) in
      // (shard, id) order; reset the greedy state on shard change
      var shard = Long.MinValue
      var seqInShard = -1L
      var fill = 0L
      var pos = -1L
      rows.map { r =>
        val (id, sh, tk) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (sh != shard || seqInShard < 0 || fill + tk > budget) {
          seqInShard = if (sh != shard) 0L else seqInShard + 1
          shard = sh
          fill = tk
          pos = 0L
        } else {
          fill += tk
          pos += 1
        }
        Row(id, sh * shardWidth + seqInShard, pos, tk)
      }
    }(Encoders.row(outSchema))
  }
}
