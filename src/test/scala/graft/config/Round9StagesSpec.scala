package graft.config

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Pipeline, TestSpark}

/** Declarative stages for the round-9 operator tier: winsorize,
  * intervalJoin, graph ops (components / triangles / reachable) and
  * bitemporal snapshots — the YAML surface is the engine's user API
  * (the reference's users drive EVERYTHING through config), so every
  * operator must be reachable without Scala.
  */
class Round9StagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(text: String): PipelineConfig =
    PipelineConfig.parse(text).fold(e => fail(s"parse failed: $e"), identity)

  private def cfgFor(extra: String): PipelineConfig = {
    val out = Files.createTempDirectory("graft-r9s").resolve("out").toString
    parse(
      s"""source.type: parquet
         |source.path: ${TestSpark.sf}/lineitem.parquet
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |$extra""".stripMargin)
  }

  test("winsorize stage: exact and approx tiers from config") {
    val df = ((1 to 50).map(v => ("a", v.toLong)) ++ Seq(("b", 9L))).toDF("g", "v")
    val exact = cfgFor(
      """transforms: winsorize
        |transform.winsorize.groupColumns: g
        |transform.winsorize.valueColumn: v
        |transform.winsorize.pct: 9
        |transform.winsorize.outColumn: w
        |""".stripMargin)
    val got = Pipeline.transform(df, exact)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // group a: n=50, pct=9 -> k=ceil(4.5)=5 -> bounds [5, 46]
    // (pct picked so n*pct/100 is non-integral: the inclusive KLL rank and
    // the exact ceil-rank then select the same element in the approx tier)
    assert(got(("a", 1L)) == 5L && got(("a", 50L)) == 46L && got(("a", 20L)) == 20L)
    assert(got(("b", 9L)) == 9L)
    val approx = cfgFor(
      """transforms: winsorize
        |transform.winsorize.groupColumns: g
        |transform.winsorize.valueColumn: v
        |transform.winsorize.pct: 9
        |transform.winsorize.outColumn: w
        |transform.winsorize.tier: approx
        |""".stripMargin)
    assert(approx.transforms.head
      .asInstanceOf[TransformConfig.WinsorizeStage].tier == "approx")
    // 50-value groups fit a k=200 sketch uncompacted: tiers agree here
    val a = Pipeline.transform(df, approx)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == got)
    // bad tier fails at parse time, not mid-run
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |target.mode: overwrite
         |transforms: winsorize
         |transform.winsorize.groupColumns: g
         |transform.winsorize.valueColumn: v
         |transform.winsorize.outColumn: w
         |transform.winsorize.tier: sketchy
         |""".stripMargin).isLeft)
  }

  test("intervalJoin stage: auto width, equi-keys, overlap columns") {
    val rightDir = Files.createTempDirectory("graft-r9s-ij").resolve("r").toString
    Seq((10L, 1L, 0L, 10L), (11L, 1L, 50L, 60L), (12L, 2L, 0L, 10L))
      .toDF("b_id", "b_k", "b_lo", "b_hi").write.parquet(rightDir)
    val left = Seq((1L, 1L, 5L, 15L), (2L, 1L, 40L, 45L), (3L, 2L, 8L, 9L))
      .toDF("a_id", "a_k", "a_lo", "a_hi")
    val c = cfgFor(
      s"""transforms: intervalJoin
         |transform.intervalJoin.rightPath: $rightDir
         |transform.intervalJoin.leftLo: a_lo
         |transform.intervalJoin.leftHi: a_hi
         |transform.intervalJoin.rightLo: b_lo
         |transform.intervalJoin.rightHi: b_hi
         |transform.intervalJoin.keys: a_k=b_k
         |""".stripMargin)
    val got = Pipeline.transform(left, c)
      .select("a_id", "b_id", "overlap_lo", "overlap_hi")
      .as[(Long, Long, Long, Long)].collect().toSet
    // (1,10): [5,15)x[0,10) -> [5,10); (3,12): [8,9)x[0,10); key 1 vs 12 never
    assert(got == Set((1L, 10L, 5L, 10L), (3L, 12L, 8L, 9L)))
    // an explicit width gives the same pairs
    val fixed = cfgFor(
      s"""transforms: intervalJoin
         |transform.intervalJoin.rightPath: $rightDir
         |transform.intervalJoin.leftLo: a_lo
         |transform.intervalJoin.leftHi: a_hi
         |transform.intervalJoin.rightLo: b_lo
         |transform.intervalJoin.rightHi: b_hi
         |transform.intervalJoin.keys: a_k=b_k
         |transform.intervalJoin.bandWidth: 7
         |""".stripMargin)
    assert(Pipeline.transform(left, fixed)
      .select("a_id", "b_id", "overlap_lo", "overlap_hi")
      .as[(Long, Long, Long, Long)].collect().toSet == got)
    // malformed keys entry fails at parse time
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |target.mode: overwrite
         |transforms: intervalJoin
         |transform.intervalJoin.rightPath: $rightDir
         |transform.intervalJoin.leftLo: a_lo
         |transform.intervalJoin.leftHi: a_hi
         |transform.intervalJoin.rightLo: b_lo
         |transform.intervalJoin.rightHi: b_hi
         |transform.intervalJoin.keys: a_k
         |""".stripMargin).isLeft)
  }

  test("graph stages: components, triangles, reachable from one edge config") {
    // two components: {1,2,3} (a triangle) and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)).toDF("s", "d")
    val comp = Pipeline.transform(edges, cfgFor(
      """transforms: components
        |transform.components.srcColumn: s
        |transform.components.dstColumn: d
        |""".stripMargin))
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val tri = Pipeline.transform(edges, cfgFor(
      """transforms: triangles
        |transform.triangles.srcColumn: s
        |transform.triangles.dstColumn: d
        |""".stripMargin))
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val rootsDir = Files.createTempDirectory("graft-r9s-bfs").resolve("r").toString
    Seq(Tuple1(1L)).toDF("root").write.parquet(rootsDir)
    val reach = Pipeline.transform(edges, cfgFor(
      s"""transforms: reachable
         |transform.reachable.srcColumn: s
         |transform.reachable.dstColumn: d
         |transform.reachable.rootsPath: $rootsDir
         |transform.reachable.rootColumn: root
         |transform.reachable.maxDepth: 1
         |""".stripMargin))
      .select("vertex", "depth").as[(Long, Int)].collect().toSet
    assert(reach == Set((1L, 0), (2L, 1), (3L, 1)))
  }

  test("bitemporal stage: late corrections visible only past their tx time") {
    // key k: value 1 valid from t=10 (asserted t=10); correction to 5
    // asserted at t=30 for the same valid time; delete valid t=40 asserted 40
    val log = Seq(
      ("k", 10L, 10L, "upsert", 1L),
      ("k", 10L, 30L, "upsert", 5L),
      ("k", 40L, 40L, "delete", 0L)
    ).toDF("key", "valid_ts", "tx_ts", "op", "value")
    def snap(validAt: Long, txAt: Long) = Pipeline.transform(log, cfgFor(
      s"""transforms: bitemporal
         |transform.bitemporal.keyColumn: key
         |transform.bitemporal.validTsColumn: valid_ts
         |transform.bitemporal.txTsColumn: tx_ts
         |transform.bitemporal.opColumn: op
         |transform.bitemporal.valueColumns: value
         |transform.bitemporal.validAt: $validAt
         |transform.bitemporal.txAt: $txAt
         |""".stripMargin))
      .select("key", "value").as[(String, Long)].collect().toSet
    assert(snap(20L, 20L) == Set(("k", 1L))) // before the correction was known
    assert(snap(20L, 35L) == Set(("k", 5L))) // correction asserted by tx=35
    assert(snap(50L, 50L) == Set.empty)      // deleted by valid 40
  }

  test("target.compactTargetBytes: batch-append fragmentation compacts post-run") {
    val base = Files.createTempDirectory("graft-r9s-cmp")
    val src = base.resolve("src").toString
    (0 until 4).foreach(i =>
      spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
        .filter(pmod(col("n_nationkey"), lit(4)) === i).coalesce(1)
        .write.mode("append").parquet(src))
    val out = base.resolve("out").toString
    val c = parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: append
         |target.compactTargetBytes: 104857600
         |savepoints.dir: ${base.resolve("sp")}
         |validation.primaryKey: n_nationkey
         |""".stripMargin)
    val r = graft.Pipeline.run(spark, c, fileBatchSize = 1)
    // 4 per-batch appends -> one compacted file; rows and validation intact
    val files = graft.sources.ParquetSource.listParquetFiles(
      out, spark.sparkContext.hadoopConfiguration)
    assert(files.size == 1, s"expected 1 compacted file, got ${files.size}")
    assert(spark.read.parquet(out).count() == r.rowsCopied && r.rowsCopied == 25)
    assert(r.validation.get.isEmpty) // validated AFTER compaction
    // versioned + compact is rejected at parse time
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |target.versioned: true
         |target.compactTargetBytes: 1000
         |""".stripMargin).isLeft)
  }

  test("resampleByWeight stage thins per-row; lenient phashDedup survives corrupt media") {
    // per-row rates from config: weight 0 drops, weight denom keeps
    val df = ((1 to 50).map(i => (i.toLong, if (i % 2 == 0) 0L else 1000L)))
      .toDF("id", "w")
    val kept = Pipeline.transform(df, cfgFor(
      """transforms: resampleByWeight
        |transform.resampleByWeight.keyColumn: id
        |transform.resampleByWeight.rateColumn: w
        |transform.resampleByWeight.denom: 1000
        |""".stripMargin))
      .select("id").as[Long].collect().toSet
    assert(kept == (1 to 50).filter(_ % 2 == 1).map(_.toLong).toSet)
    // lenient phashDedup: two copies of a REAL image + one corrupt blob —
    // the dup still drops, the corrupt row survives as NULL instead of
    // killing the job (strict mode throws on it)
    def png(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = (x * 4 + y * 5 + seed) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = Seq(
      (1L, png(0)), (2L, png(0)), // identical image -> 2 drops
      (3L, "definitely not an image".getBytes)
    ).toDF("doc_id", "payload")
    def cfgLenient(flag: Boolean) = cfgFor(
      s"""transforms: phashDedup
         |transform.phashDedup.idColumn: doc_id
         |transform.phashDedup.payloadColumn: payload
         |transform.phashDedup.decoder: imageio
         |transform.phashDedup.maxDist: 4
         |transform.phashDedup.lenient: $flag
         |""".stripMargin)
    val out = Pipeline.transform(media, cfgLenient(true))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
    intercept[Exception](
      Pipeline.transform(media, cfgLenient(false)).collect())
  }

  test("anomaly stage: config flags match a direct rollingZFlags call") {
    // one flat series with a single spike at t=15: the trailing-10
    // baseline is constant, so only the spike should flag
    val rows = (1 to 30).map(t => ("k", t.toLong, if (t == 15) 500L else 100L))
    val df = rows.toDF("g", "t", "v")
    val cfg = cfgFor(
      """transforms: anomaly
        |transform.anomaly.keyColumns: g
        |transform.anomaly.orderColumns: t
        |transform.anomaly.valueColumn: v
        |transform.anomaly.window: 10
        |transform.anomaly.minPoints: 4
        |transform.anomaly.z: 3
        |transform.anomaly.maxAbsValue: 1000
        |""".stripMargin)
    val viaConfig = Pipeline.transform(df, cfg)
      .select("t", "flagged").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val direct = graft.operators.Anomaly.rollingZFlags(df, Seq("g"), Seq(col("t")),
        "v", window = 10, minPoints = 4, z = 3, maxAbsValue = 1000L)
      .select("t", "flagged").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaConfig == direct)
    assert(viaConfig(15L))
    assert(viaConfig.count(_._2) >= 1 && !viaConfig(10L))
    // overflow-unsafe combination refuses at parse/check time
    val bad = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |target.mode: overwrite
         |transforms: anomaly
         |transform.anomaly.keyColumns: g
         |transform.anomaly.orderColumns: t
         |transform.anomaly.valueColumn: v
         |transform.anomaly.maxAbsValue: 0
         |""".stripMargin)
    assert(bad.isLeft || bad.exists(_.transforms.exists(_.check.isDefined)))
    assert(PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |target.mode: overwrite
         |transforms: anomaly
         |transform.anomaly.keyColumns: g
         |transform.anomaly.orderColumns: t
         |transform.anomaly.valueColumn: v
         |""".stripMargin).isLeft) // maxAbsValue is mandatory
  }

  test("rfm / transitionMatrix / attribution stages match the direct calls") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "view", 10.0),
      (1L, "2024-01-02 10:00:00", "click", 0.0),
      (1L, "2024-01-03 10:00:00", "buy", 50.0),
      (2L, "2024-01-05 10:00:00", "view", 5.0),
      (2L, "2024-01-06 10:00:00", "buy", 20.0),
      (3L, "2024-01-04 10:00:00", "view", 1.0)
    ).toDF("uid", "ts", "etype", "amount")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

    val rfmCfg = cfgFor(
      """transforms: rfm
        |transform.rfm.keyColumn: uid
        |transform.rfm.tsColumn: ts
        |transform.rfm.valueColumn: amount
        |transform.rfm.asOf: 2024-02-01
        |transform.rfm.buckets: 3
        |""".stripMargin)
    val viaCfg = Pipeline.transform(ev, rfmCfg).orderBy("uid").collect().toSeq
    val direct = graft.operators.Rfm.scores(ev, "uid", "ts", "amount",
      to_date(lit("2024-02-01")), 3).orderBy("uid").collect().toSeq
    assert(viaCfg == direct && viaCfg.size == 3)

    val tmCfg = cfgFor(
      """transforms: transitionMatrix
        |transform.transitionMatrix.keyColumn: uid
        |transform.transitionMatrix.tsColumn: ts
        |transform.transitionMatrix.typeColumn: etype
        |""".stripMargin)
    val tm = Pipeline.transform(ev, tmCfg)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2)).toMap
    assert(tm((None, "view")) == 3L)          // three timeline entries
    assert(tm((Some("view"), "click")) == 1L)
    assert(tm((Some("view"), "buy")) == 1L)
    assert(tm((Some("click"), "buy")) == 1L)

    val atCfg = cfgFor(
      """transforms: attribution
        |transform.attribution.keyColumn: uid
        |transform.attribution.tsColumn: ts
        |transform.attribution.typeColumn: etype
        |transform.attribution.conversionType: buy
        |transform.attribution.touchTypes: view, click
        |""".stripMargin)
    val at = Pipeline.transform(ev, atCfg)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // key 1: view->click->buy; key 2: view->buy; key 3 never converts
    assert(at("view") == ((2L, 1L, 2L)))  // opens both journeys, closes key 2's
    assert(at("click") == ((0L, 1L, 1L))) // closes key 1's
    // conversion type listed as a touch fails the config check
    val bad = PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: x
         |target.type: parquet
         |target.path: y
         |target.mode: overwrite
         |transforms: attribution
         |transform.attribution.keyColumn: uid
         |transform.attribution.tsColumn: ts
         |transform.attribution.typeColumn: etype
         |transform.attribution.conversionType: buy
         |transform.attribution.touchTypes: buy, view
         |""".stripMargin)
    assert(bad.isLeft)
  }

  test("terminal graph stages write through the full pipeline run") {
    val edgesDir = Files.createTempDirectory("graft-r9s-e").resolve("edges").toString
    Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("s", "d").write.parquet(edgesDir)
    val out = Files.createTempDirectory("graft-r9s-o").resolve("out").toString
    val c = parse(
      s"""source.type: parquet
         |source.path: $edgesDir
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |transforms: components
         |transform.components.srcColumn: s
         |transform.components.dstColumn: d
         |""".stripMargin)
    Pipeline.run(spark, c)
    val got = spark.read.parquet(out).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }
}
