package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.pipeline.LinkGraph

/** Continuous link-graph ingest: crawl edges stream in, rank state
  * stays exact epoch by epoch through the store's frontier-bounded
  * maintenance. Exactly-once WITHOUT a commit marker, but for a
  * subtler reason than [[StreamingLex]]: [[LinkGraph.appendEpoch]] IS
  * a multi-table publish (out/in/deg/levels), yet every table's files
  * carry the epoch tag's deterministic names and the tag's seq is
  * recorded before anything publishes — a replayed micro-batch
  * retires every table's files for its tag, recomputes the SAME delta
  * against the restored store, and republishes at the SAME LSM
  * position, so any crash point is repaired by the replay itself
  * (LinkGraphSpec's crash-between-publishes case pins it).
  */
object StreamingGraph {

  def ingestIntoGraph(edges: DataFrame, srcCol: String, dstCol: String,
                      root: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          LinkGraph.appendEpoch(batch, srcCol, dstCol, root, s"e$batchId")
          ()
        }
      }
      .start()
}
