package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyRenames + validateRenames") {
    val df = Seq((1, "a")).toDF("id", "name")
    val out = Relational.applyRenames(df, Seq(Relational.Rename("name", "label")))
    assert(out.columns.toSeq == Seq("id", "label"))
    assert(Relational.validateRenames(Seq("id", "name"), Seq(Relational.Rename("ID", "x"))).isRight)
    assert(Relational.validateRenames(Seq("id"), Seq(Relational.Rename("nope", "x"))).isLeft)
    assert(Relational.validateRenames(Seq("a", "b"),
      Seq(Relational.Rename("a", "X"), Relational.Rename("b", "x"))).isLeft)
  }

  test("renames apply simultaneously: a chain does not capture its own output") {
    val df = Seq((1, 2)).toDF("a", "b")
    // a fold of withColumnRenamed turned this into duplicate [c, c]
    val out = Relational.applyRenames(df,
      Seq(Relational.Rename("a", "b"), Relational.Rename("b", "c")))
    assert(out.columns.toSeq == Seq("b", "c"))
    assert(out.select("b").head().getInt(0) == 1) // original a
    assert(out.select("c").head().getInt(0) == 2) // original b
    // swap works too
    val swapped = Relational.applyRenames(df,
      Seq(Relational.Rename("a", "b"), Relational.Rename("b", "a")))
    assert(swapped.columns.toSeq == Seq("b", "a"))
    // validation rejects a target clashing with a surviving column
    assert(Relational.validateRenames(Seq("a", "b"),
      Seq(Relational.Rename("a", "b"))).isLeft)
  }

  test("applyRenames rejects duplicate output columns without opt-in validation") {
    // two distinct columns (A, a) both case-insensitively match one rename
    val twoToOne = Seq((1, 2)).toDF("A", "a")
    intercept[IllegalArgumentException] {
      Relational.applyRenames(twoToOne, Seq(Relational.Rename("a", "x")))
    }
    // target collides with a column that survives un-renamed
    val surviving = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Relational.applyRenames(surviving, Seq(Relational.Rename("a", "b")))
    }
    // two rename entries share a target
    intercept[IllegalArgumentException] {
      Relational.applyRenames(surviving,
        Seq(Relational.Rename("a", "x"), Relational.Rename("b", "X")))
    }
  }

  test("resolve is case-insensitive with ambiguity detection") {
    assert(Relational.resolve(Seq("Foo", "bar"), "foo") == Right("Foo"))
    assert(Relational.resolve(Seq("Foo", "foo"), "Foo") == Right("Foo")) // exact wins
    assert(Relational.resolve(Seq("Foo", "fOO"), "foo").isLeft)          // ambiguous
    assert(Relational.resolve(Seq("a"), "z").isLeft)
  }

  test("dropNullPrimaryKeys filters and counts via observe") {
    val df = Seq((Some(1), "a"), (None, "b"), (Some(3), null)).toDF("id", "v")
    val observed = Relational.dropNullPrimaryKeys(df, Seq("id"), "drops")
    assert(observed.count() == 2)
  }

  test("meta prefix add/strip round-trips") {
    val df = Seq((1, 10L)).toDF("c", "c_ttl")
    val prefixed = Relational.addMetaPrefix(df, Seq("c_ttl"))
    assert(prefixed.columns.contains("__graft_meta_c_ttl"))
    assert(Relational.stripMetaPrefix(prefixed).columns.toSeq == Seq("c", "c_ttl"))
    assert(Relational.dropMetaColumns(prefixed).columns.toSeq == Seq("c"))
  }

  test("prefixed adds src_/tgt_ prefixes") {
    val df = Seq((1, "x")).toDF("id", "v")
    assert(Relational.prefixed(df, "src_").columns.toSeq == Seq("src_id", "src_v"))
  }

  test("renameMapKeys rewrites item keys via transform_keys, values untouched") {
    val df = Seq(Map("pk" -> "1", "old" -> "a", "keep" -> "b")).toDF("item")
    val got = df.select(Relational.renameMapKeys(col("item"),
        Seq(Relational.Rename("old", "new_name"), Relational.Rename("pk", "id"))))
      .collect().head.getMap[String, String](0)
    assert(got == Map("id" -> "1", "new_name" -> "a", "keep" -> "b"))
    // duplicate targets collide case-SENSITIVELY (DynamoDB attribute
    // names are case-sensitive, so "x" and "X" are distinct and legal)
    intercept[IllegalArgumentException](Relational.renameMapKeys(col("item"),
      Seq(Relational.Rename("a", "x"), Relational.Rename("b", "x"))))
    assert(Relational.renameMapKeys(col("item"),
      Seq(Relational.Rename("a", "x"), Relational.Rename("b", "X"))) != null)
  }
}
