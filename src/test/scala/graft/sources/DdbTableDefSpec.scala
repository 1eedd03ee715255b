package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import DdbTableDef._

/** Fixture matrix for the pure table-definition replication logic
  * (reference DynamoUtils.scala:245-311, 561-582): billing-mode
  * derivation × throughput carriage × LSI/GSI projection.
  */
class DdbTableDefSpec extends AnyFunSuite {

  private val keys = Seq(KeyElement("pk", "HASH"), KeyElement("sk", "RANGE"))
  private val attrs = Seq(AttributeDef("pk", "S"), AttributeDef("sk", "N"),
    AttributeDef("gk", "S"))
  private val lsi = LocalIndex("by-sk", Seq(KeyElement("pk", "HASH"),
    KeyElement("sk", "RANGE")), Projection("KEYS_ONLY"))
  private val gsi = GlobalIndex("by-gk", Seq(KeyElement("gk", "HASH")),
    Projection("INCLUDE", Seq("sk")), Some(Throughput(7L, 3L)))

  private def desc(rcu: Long, wcu: Long, mode: Option[String]) =
    TableDescription("src", keys, attrs, Throughput(rcu, wcu), mode,
      Seq(lsi), Seq(gsi))

  test("provisioned source, no override: PROVISIONED carrying source units") {
    val m = deriveCreateRequest(desc(100L, 50L, Some(Provisioned)), "dst")
    assert(m.billingMode == Provisioned)
    assert(m.provisionedThroughput.contains(Throughput(100L, 50L)))
    assert(m.tableName == "dst" && m.keySchema == keys &&
      m.attributeDefinitions == attrs)
  }

  test("on-demand/zero-throughput source, no override: PAY_PER_REQUEST") {
    val m = deriveCreateRequest(desc(0L, 0L, Some(PayPerRequest)), "dst")
    assert(m.billingMode == PayPerRequest && m.provisionedThroughput.isEmpty)
  }

  test("explicit PROVISIONED with a zero unit is an eager error") {
    val e = intercept[IllegalArgumentException](
      deriveCreateRequest(desc(100L, 0L, None), "dst", Some(Provisioned)))
    assert(e.getMessage.contains("PROVISIONED"))
  }

  test("explicit PAY_PER_REQUEST overrides a provisioned source") {
    val m = deriveCreateRequest(desc(100L, 50L, Some(Provisioned)), "dst",
      Some(PayPerRequest))
    assert(m.billingMode == PayPerRequest && m.provisionedThroughput.isEmpty)
    // explicit on-demand request strips GSI throughput too
    assert(m.globalSecondaryIndexes.head.provisionedThroughput.isEmpty)
  }

  test("LSIs and GSIs replicate name, key schema, projection verbatim") {
    val m = deriveCreateRequest(desc(100L, 50L, Some(Provisioned)), "dst")
    assert(m.localSecondaryIndexes == Seq(lsi))
    val g = m.globalSecondaryIndexes.head
    assert(g.indexName == "by-gk" && g.keySchema == gsi.keySchema &&
      g.projection == Projection("INCLUDE", Seq("sk")))
    assert(g.provisionedThroughput.contains(Throughput(7L, 3L)))
  }

  test("reference quirk: GSI throughput keys off the REQUESTED mode") {
    // no override + on-demand source: table goes PAY_PER_REQUEST but the
    // GSI still carries throughput — faithful to DynamoUtils.scala:311
    // (target.billingMode.forall(_ == PROVISIONED) with an empty request)
    val m = deriveCreateRequest(desc(0L, 0L, Some(PayPerRequest)), "dst")
    assert(m.billingMode == PayPerRequest)
    assert(m.globalSecondaryIndexes.head.provisionedThroughput
      .contains(Throughput(7L, 3L)))
  }

  test("unknown billing mode is rejected") {
    assertThrows[IllegalArgumentException](
      deriveCreateRequest(desc(1L, 1L, None), "dst", Some("FLAT_RATE")))
  }

  test("scan/write throughput: provisioned units, on-demand default, pre-billing-mode") {
    assert(readThroughput(desc(100L, 50L, Some(Provisioned))) == 100L)
    assert(writeThroughput(desc(100L, 50L, Some(Provisioned))) == 50L)
    assert(readThroughput(desc(0L, 0L, Some(PayPerRequest)))
      == DefaultCapacityForOnDemand)
    // absent summary (pre-billing-mode table) reads as PROVISIONED
    assert(readThroughput(desc(9L, 4L, None)) == 9L)
    assert(writeThroughput(desc(9L, 4L, None)) == 4L)
  }
}
