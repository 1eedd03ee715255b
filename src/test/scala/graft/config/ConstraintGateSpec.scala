package graft.config

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.{Pipeline, TestSpark}

/** The constraintGate stage: a declarative publish gate on the
  * `transforms:` surface — clean data passes through byte-identical,
  * violated constraints fail the pipeline BEFORE the target write,
  * naming each failing constraint with its violation count.
  */
class ConstraintGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-cgate").resolve("out").toString

  private def cfg(text: String): PipelineConfig =
    PipelineConfig.parse(text).fold(e => fail(s"parse failed: $e"), identity)

  private def nationCfg(out: String, extra: String): String =
    s"""source.type: parquet
       |source.path: ${TestSpark.sf}/nation.parquet
       |target.type: parquet
       |target.path: $out
       |target.mode: overwrite
       |transforms: constraintGate
       |$extra""".stripMargin

  test("clean data passes the gate and reaches the target unchanged") {
    val out = tmp()
    Pipeline.run(spark, cfg(nationCfg(out,
      """transform.constraintGate.notNull: n_nationkey, n_name
        |transform.constraintGate.uniqueKey: n_nationkey
        |transform.constraintGate.minRows: 1
        |""".stripMargin)))
    val got = spark.read.parquet(out)
    val src = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    assert(got.count() == src.count())
    assert(got.exceptAll(src).isEmpty)
  }

  test("a violated constraint fails the pipeline, names it, and writes nothing") {
    val out = tmp()
    val e = intercept[IllegalStateException] {
      Pipeline.run(spark, cfg(nationCfg(out,
        """transform.constraintGate.uniqueKey: n_regionkey
          |transform.constraintGate.minRows: 1000000
          |""".stripMargin)))
    }
    assert(e.getMessage.contains("unique(n_regionkey)"))
    assert(e.getMessage.contains("row_count"))
    assert(!new java.io.File(out).exists())
  }

  test("FK arm: orphans in the piped frame fail against a parquet reference") {
    val out = tmp()
    val e = intercept[IllegalStateException] {
      Pipeline.run(spark, cfg(
        s"""source.type: parquet
           |source.path: ${TestSpark.sf}/nation.parquet
           |target.type: parquet
           |target.path: $out
           |target.mode: overwrite
           |transforms: constraintGate
           |transform.constraintGate.fkColumn: n_nationkey
           |transform.constraintGate.fkRefPath: ${TestSpark.sf}/region.parquet
           |transform.constraintGate.fkRefColumn: r_regionkey
           |""".stripMargin))
    }
    assert(e.getMessage.contains("foreign_key(n_nationkey)"))
  }

  test("eager validation: empty gate and partial FK are rejected at parse time") {
    val bad1 = PipelineConfig.parse(nationCfg(tmp(), ""))
    assert(bad1.left.exists(_.contains("declares no constraint")))
    val bad2 = PipelineConfig.parse(nationCfg(tmp(),
      "transform.constraintGate.fkColumn: n_nationkey\n"))
    assert(bad2.left.exists(_.contains("all-or-none")))
  }
}
