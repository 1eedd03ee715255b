package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.pipeline.LexIndex

/** Continuous lexical-index ingest: documents stream in, their
  * postings become searchable epoch by epoch. Exactly-once WITHOUT a
  * commit marker: [[LexIndex.appendEpoch]] is replay-idempotent by
  * construction — a replayed micro-batch first retires its own tag's
  * files, and the delta anti-join then recomputes the SAME delta
  * against the restored index, so there is no partial state a marker
  * would need to fence (the marker protocol exists for multi-table
  * publishes like the near-dup store and the line census; a
  * single-table tag-retire-republish doesn't need it).
  */
object StreamingLex {

  def ingestIntoIndex(docs: DataFrame, idCol: String, textCol: String,
                      indexRoot: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          LexIndex.appendEpoch(batch, idCol, textCol, indexRoot, s"e$batchId")
      }
      .start()
}
