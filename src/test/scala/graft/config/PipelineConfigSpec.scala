package graft.config

import org.scalatest.funsuite.AnyFunSuite

class PipelineConfigSpec extends AnyFunSuite {

  private val base =
    """source.type: parquet
      |source.path: /data/in
      |target.type: parquet
      |target.path: /data/out
      |target.mode: overwrite
      |""".stripMargin

  test("minimal parquet-to-parquet config parses") {
    val cfg = PipelineConfig.parse(base).toOption.get
    assert(cfg.source == SourceConfig.Parquet("/data/in", None, None))
    assert(cfg.target == TargetConfig.Parquet("/data/out", "overwrite", "snappy"))
    assert(cfg.renames.isEmpty && cfg.validation.isEmpty)
  }

  test("full config with renames, filter, validation, savepoints") {
    val cfg = PipelineConfig.parse(base.replace("target.mode: overwrite",
      "target.mode: append") +
      """source.where: id > 10
        |source.columns: id, name
        |renames: name->full_name, id->pk
        |savepoints.dir: /tmp/sp
        |skipFiles: /a.parquet, /b.parquet
        |validation.primaryKey: pk
        |validation.compareColumns: full_name
        |validation.tolerance: 0.5
        |validation.failuresToFetch: 10
        |""".stripMargin).toOption.get
    assert(cfg.source == SourceConfig.Parquet("/data/in", Some("id > 10"), Some(List("id", "name"))))
    assert(cfg.renames.map(r => r.from -> r.to) == List("name" -> "full_name", "id" -> "pk"))
    assert(cfg.skipFiles == Set("/a.parquet", "/b.parquet"))
    assert(cfg.validation.get.tolerance == 0.5)
  }

  test("eager validation rejects bad configs at load") {
    assert(PipelineConfig.parse(base + "renames: a->x, b->X\n").isLeft)          // target collision
    assert(PipelineConfig.parse(base + "target.mode2: zap\n").isLeft)            // unknown key
    assert(PipelineConfig.parse(base + "validation.primaryKey:\n").isLeft)       // empty pk
    assert(PipelineConfig.parse(base + "validation.primaryKey: id\nvalidation.tolerance: -1\n").isLeft)
    assert(PipelineConfig.parse(base.replace("overwrite", "clobber")).isLeft)    // bad mode
    assert(PipelineConfig.parse(base + "target.compression: brotli2\n").isLeft)  // bad codec
    assert(PipelineConfig.parse("source.type: parquet\n").isLeft)                // missing pieces
  }

  test("jdbc source arm parses with partitioning") {
    val cfg = PipelineConfig.parse(
      """source.type: jdbc
        |source.url: jdbc:mysql://h/db
        |source.table: t
        |source.partitionColumn: id
        |source.numPartitions: 8
        |source.lowerBound: 0
        |source.upperBound: 1000
        |target.type: parquet
        |target.path: /out
        |target.mode: overwrite
        |""".stripMargin).toOption.get
    assert(cfg.source.asInstanceOf[SourceConfig.Jdbc].numPartitions == 8)
  }
}
