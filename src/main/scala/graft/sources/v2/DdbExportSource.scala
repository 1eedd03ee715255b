package graft.sources.v2

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util
import java.util.OptionalLong
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 table for the DynamoDB-S3-export layout (reference scan:
  * readers/DynamoDBS3Export.scala:54-221) — the connector-API rebuild of
  * `DdbTables.readS3Export`, making the format a first-class Spark
  * source:
  *
  *   spark.read.format("graft.sources.v2.DdbExportSource")
  *     .option("path", root)
  *     .option("skipFiles", "data/00001.json.gz,…")   // resume pruning
  *     .load()
  *
  * What the connector surface buys over the functional reader:
  *  - **planning-time resume pruning**: the skip-set filters data files
  *    in `planInputPartitions` (SURVEY §4: resume-driven pruning
  *    belongs at source construction), so skipped files never become
  *    tasks;
  *  - **statistics at planning time**: `estimateStatistics` reports the
  *    export's item count straight from the manifests and its
  *    compressed byte size from one directory listing (computed once,
  *    conservative fallback on listing failure), letting Catalyst make
  *    broadcast decisions for joins against small exports;
  *  - one input partition per data file — the reference's
  *    segment-per-task shape — with the gzip decode inside a
  *    `PartitionReader`, per-task filesystem client and all.
  *
  * Output schema is the same single `item_json` string column as
  * `DdbTables.readS3Export`; downstream key projection / validation /
  * rename operators apply unchanged.
  */
class DdbExportSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DdbExportSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DdbExportTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object DdbExportSource {
  val Schema: StructType = StructType(Seq(StructField("item_json", StringType, nullable = true)))
  val Name = "graft.sources.v2.DdbExportSource"

  /** Manifest listing: (dataFileKey, itemCount) in manifest order —
    * delegates to the single jackson-based parser in DdbTables so the
    * format cannot drift between the functional and connector readers.
    */
  def listDataFiles(root: String): Seq[(String, Long)] =
    graft.sources.DdbTables.listDataFiles(root,
      SparkSession.active.sparkContext.hadoopConfiguration)
}

private[v2] class DdbExportTable(root: String) extends Table with SupportsRead {
  require(root != null, "path option required")
  override def name(): String = s"ddb_export(`$root`)"
  override def schema(): StructType = DdbExportSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DdbExportScanBuilder(root, options)
}

private[v2] class DdbExportScanBuilder(root: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder {
  override def build(): Scan = {
    val skip = Option(options.get("skipFiles"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    new DdbExportScan(root, skip)
  }
}

private[v2] class DdbExportScan(root: String, skipFiles: Set[String])
    extends Scan with Batch with SupportsReportStatistics {

  // manifest read once at planning; skip-set applied before any task exists
  private lazy val files: Seq[(String, Long)] =
    DdbExportSource.listDataFiles(root).filterNot { case (k, _) => skipFiles.contains(k) }

  override def readSchema(): StructType = DdbExportSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"DdbExportScan(root=$root, files=${files.size}, skipped=${skipFiles.size})"

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (k, _) => DdbExportPartition(root, k): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new DdbExportReaderFactory(conf)
  }

  // computed at most once per scan (Catalyst may ask for stats several
  // times during planning); a listing failure falls back to a
  // conservative rows-based estimate rather than 0 bytes, which would
  // wrongly flip a large table into a broadcast build side
  private lazy val stats: (Long, Long) = {
    val rows = files.map(_._2).sum
    val bytes =
      try {
        val conf = SparkSession.active.sparkContext.hadoopConfiguration
        val fs = new Path(root).getFileSystem(conf)
        // one listing RPC per directory that holds data files, not one
        // getFileStatus per file
        val byDir = files.map(_._1).groupBy(k => new Path(root, k).getParent)
        val wanted = files.map { case (k, _) => new Path(root, k).toUri.getPath }.toSet
        byDir.keys.toSeq.flatMap(dir => fs.listStatus(dir).toSeq)
          .filter(st => wanted.contains(st.getPath.toUri.getPath))
          .map(_.getLen).sum
      } catch { case _: Exception => rows * 1024L }
    (rows, bytes)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(stats._2)
    override def numRows(): OptionalLong = OptionalLong.of(stats._1)
  }
}

private[v2] case class DdbExportPartition(root: String, dataFileKey: String)
    extends InputPartition

private[v2] class DdbExportReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DdbExportPartition]
    new PartitionReader[InternalRow] {
      private val fs = new Path(p.root).getFileSystem(conf.value)
      private val in = new BufferedReader(new InputStreamReader(
        new GZIPInputStream(fs.open(new Path(p.root, p.dataFileKey))),
        StandardCharsets.UTF_8))
      private var line: String = _
      override def next(): Boolean = {
        line = in.readLine()
        while (line != null && line.isEmpty) line = in.readLine()
        line != null
      }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(line))
      override def close(): Unit = in.close()
    }
  }
}
