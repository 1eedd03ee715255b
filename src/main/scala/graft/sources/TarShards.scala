package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shard export — the sample-shard layout
  * sequential training dataloaders consume (each shard is a plain
  * POSIX ustar archive of (name, payload) entries, readable by any tar
  * tool; shards stream end-to-end with no random access, which is what
  * makes the format work from object storage).
  *
  * Scale design: rows are range-partitioned on the key (deterministic
  * shard membership, no driver involvement, co-located with any
  * downstream by-key read), each task streams its rows into one or
  * more archives, rolling to a new file when `maxShardBytes` fills —
  * so shard size is bounded regardless of row-size skew, and a
  * 100-TB export is (corpus bytes / maxShardBytes) files written by
  * however many tasks the cluster runs. No bytes buffer in memory
  * beyond one entry. Headers are written with fixed mtime/uid/gid, so
  * the SAME rows produce byte-identical shards on retry (speculative
  * re-execution can't corrupt a half-read shard consumer).
  *
  * The returned manifest (one row per shard: path, entries, bytes) is
  * the index a dataloader shuffles shard order with.
  */
object TarShards {

  private val BlockSize = 512

  /** One ustar header block. Deterministic: mode 0644, uid/gid 0,
    * mtime 0. Names longer than 100 bytes are rejected (the ustar
    * prefix extension is deliberately not emitted — WebDataset sample
    * keys are short by construction).
    */
  private[sources] def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length > 0 && nameBytes.length <= 100,
      s"tar entry name must be 1..100 bytes, got ${nameBytes.length} ('$name')")
    require(size >= 0 && size <= 0x1FFFFFFFFL, // 8^11 - 1: 11 octal digits
      s"tar entry too large for a ustar size field: $size bytes")
    val h = new Array[Byte](BlockSize)
    def put(offset: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, offset, b.length)
    }
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    put(100, "0000644\u0000")                       // mode
    put(108, "0000000\u0000")                       // uid
    put(116, "0000000\u0000")                       // gid
    put(124, f"$size%011o\u0000")                   // size, octal
    put(136, "00000000000\u0000")                   // mtime 0: deterministic
    put(148, "        ")                            // chksum = spaces while summing
    h(156) = '0'                                    // typeflag: regular file
    put(257, "ustar\u000000")                       // magic + version
    val sum = h.foldLeft(0L)((acc, b) => acc + (b & 0xFF))
    put(148, f"$sum%06o\u0000 ")
    h
  }

  private def padding(size: Long): Int =
    ((BlockSize - (size % BlockSize)) % BlockSize).toInt

  /** Write `df`'s (`keyCol`: any castable-to-string, `payloadCol`:
    * binary) rows as tar shards under `dir`, ≤ `maxShardBytes` of
    * archive per shard (oversized single entries still get their own
    * shard — an entry is never split). Entry names are
    * `<key><suffix>`. Returns the manifest sorted by shard path.
    */
  def write(df: DataFrame, keyCol: String, payloadCol: String, dir: String,
            maxShardBytes: Long, numShards: Int, suffix: String = ".bin"): DataFrame = {
    require(maxShardBytes >= 3 * BlockSize,
      s"maxShardBytes must fit at least one empty entry, got $maxShardBytes")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = df.sparkSession
    val serializableConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirStr = dir

    val prepared = df
      .select(col(keyCol).cast("string").as("k"), col(payloadCol).as("p"))
      .repartitionByRange(numShards, col("k"))
      .sortWithinPartitions(col("k"))

    val manifest: Array[Row] = prepared.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val fs = new Path(dirStr).getFileSystem(serializableConf.value)
        var seq = 0
        var out: java.io.OutputStream = null
        var rel: String = null
        var bytes = 0L
        var entries = 0L
        val done = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        def open(): Unit = {
          rel = f"shard-$idx%05d-$seq%03d.tar"
          out = fs.create(new Path(dirStr, rel), true)
          bytes = 0L; entries = 0L; seq += 1
        }
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * BlockSize)) // end-of-archive marker
          out.close()
          done += ((rel, entries, bytes + 2L * BlockSize))
          out = null
        }
        try {
          open()
          rows.foreach { r =>
            val key = r.getString(0)
            require(key != null, "tar shard export: NULL key")
            val payload = r.getAs[Array[Byte]](1)
            require(payload != null, s"tar shard export: NULL payload for key '$key'")
            val entryBytes = BlockSize.toLong + payload.length + padding(payload.length)
            // roll BEFORE writing when the entry would overflow a
            // non-empty shard; a single oversized entry still ships
            if (entries > 0 && bytes + entryBytes + 2L * BlockSize > maxShardBytes) {
              close(); open()
            }
            out.write(header(key + suffix, payload.length))
            out.write(payload)
            out.write(new Array[Byte](padding(payload.length)))
            bytes += entryBytes; entries += 1
          }
        } finally close()
        done.iterator.map { case (p, n, b) => (p, n, b) }
      }
    }.map(t => Row(t._1, t._2, t._3)).collect()

    val schema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      StructField("n_entries", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifest.toIndexedSeq, 1), schema)
      .orderBy(col("shard"))
  }

  /** Minimal ustar reader for round-trip verification (and for
    * re-ingesting shards written by [[write]]): returns (name, payload)
    * entries of one archive. Reads sequentially — the same access
    * pattern a dataloader uses.
    */
  def readShard(dir: String, shard: String,
                conf: org.apache.hadoop.conf.Configuration): Seq[(String, Array[Byte])] = {
    val fs = new Path(dir).getFileSystem(conf)
    val in = fs.open(new Path(dir, shard))
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    try {
      val block = new Array[Byte](BlockSize)
      def readBlock(): Boolean = {
        var off = 0
        while (off < BlockSize) {
          val n = in.read(block, off, BlockSize - off)
          if (n < 0) return false
          off += n
        }
        true
      }
      var continue = true
      while (continue && readBlock()) {
        if (block.forall(_ == 0)) continue = false // end-of-archive
        else {
          val name = new String(block.takeWhile(_ != 0), StandardCharsets.UTF_8)
          val sizeField = new String(block, 124, 12, StandardCharsets.US_ASCII)
          val size = java.lang.Long.parseLong(sizeField.trim.stripSuffix("\u0000").trim, 8)
          val payload = new Array[Byte](size.toInt)
          var off = 0
          while (off < size) {
            val n = in.read(payload, off, (size - off).toInt)
            require(n >= 0, s"truncated entry '$name' in $shard")
            off += n
          }
          val pad = new Array[Byte](padding(size))
          var p = 0
          while (p < pad.length) {
            val n = in.read(pad, p, pad.length - p)
            require(n >= 0, s"truncated padding after '$name' in $shard")
            p += n
          }
          entries += ((name, payload))
        }
      }
    } finally in.close()
    entries.toSeq
  }
}
