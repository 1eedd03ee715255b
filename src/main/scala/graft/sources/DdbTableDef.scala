package graft.sources

/** Pure table-definition replication for DynamoDB-shaped tables — the
  * decision logic of the reference's `replicateTableDefinition` and
  * throughput derivation (DynamoUtils.scala:217-335,555-582) as data
  * transforms over plain models, with the service calls (describeTable,
  * createTable, waiters) factored out: given a source table description,
  * compute exactly the create-table request the reference would issue.
  * A deployment wires [[DdbTableDef.deriveCreateRequest]] to its SDK of
  * choice; the sandbox proves the decision table with fixture specs.
  */
object DdbTableDef {

  /** Key element: attribute + role (HASH | RANGE). */
  final case class KeyElement(attributeName: String, keyType: String)

  /** Attribute definition: name + scalar type (S | N | B). */
  final case class AttributeDef(attributeName: String, attributeType: String)

  final case class Throughput(readCapacityUnits: Long, writeCapacityUnits: Long)

  /** Index projection: KEYS_ONLY | INCLUDE(nonKeyAttributes) | ALL. */
  final case class Projection(projectionType: String,
                              nonKeyAttributes: Seq[String] = Seq.empty)

  final case class LocalIndex(indexName: String, keySchema: Seq[KeyElement],
                              projection: Projection)

  final case class GlobalIndex(indexName: String, keySchema: Seq[KeyElement],
                               projection: Projection,
                               provisionedThroughput: Option[Throughput])

  /** The subset of a DescribeTable response the replication logic
    * consumes. `billingModeSummary` is None on tables created before
    * billing modes existed — the reference treats that as PROVISIONED
    * when reading throughput and "decide from the capacity units" when
    * creating (DynamoUtils.scala:573-580,249-271).
    */
  final case class TableDescription(
      tableName: String,
      keySchema: Seq[KeyElement],
      attributeDefinitions: Seq[AttributeDef],
      provisionedThroughput: Throughput = Throughput(0L, 0L),
      billingModeSummary: Option[String] = None,
      localSecondaryIndexes: Seq[LocalIndex] = Seq.empty,
      globalSecondaryIndexes: Seq[GlobalIndex] = Seq.empty)

  /** The create-table request model `deriveCreateRequest` produces. */
  final case class CreateTableModel(
      tableName: String,
      keySchema: Seq[KeyElement],
      attributeDefinitions: Seq[AttributeDef],
      billingMode: String, // PROVISIONED | PAY_PER_REQUEST
      provisionedThroughput: Option[Throughput],
      localSecondaryIndexes: Seq[LocalIndex],
      globalSecondaryIndexes: Seq[GlobalIndex])

  val Provisioned = "PROVISIONED"
  val PayPerRequest = "PAY_PER_REQUEST"

  /** Read/write capacity a scan/write scheduler should assume for the
    * table: the provisioned units when the billing mode is PROVISIONED
    * (or the summary is absent — pre-billing-mode tables), else the
    * emr-dynamodb-connector's on-demand default
    * (DynamoDBConstants.DEFAULT_CAPACITY_FOR_ON_DEMAND; reference
    * DynamoUtils.scala:561-582).
    */
  val DefaultCapacityForOnDemand = 40000L

  def readThroughput(d: TableDescription): Long =
    tableThroughput(d, _.readCapacityUnits)

  def writeThroughput(d: TableDescription): Long =
    tableThroughput(d, _.writeCapacityUnits)

  private def tableThroughput(d: TableDescription, units: Throughput => Long): Long =
    if (d.billingModeSummary.forall(_ == Provisioned)) units(d.provisionedThroughput)
    else DefaultCapacityForOnDemand

  /** The create-table request that replicates `source` at the target,
    * mirroring the reference decision table (DynamoUtils.scala:245-311):
    *
    *  - requested PROVISIONED but the source throughput has a zero unit
    *    → error (the target would be un-writable);
    *  - requested PROVISIONED, or nothing requested while the source has
    *    both units set → PROVISIONED carrying the source's throughput;
    *  - anything else (explicit PAY_PER_REQUEST, or no request and an
    *    on-demand/zero-throughput source) → PAY_PER_REQUEST;
    *  - LSIs replicate name + key schema + projection verbatim;
    *  - GSIs replicate the same, carrying per-index throughput only when
    *    the target ends up PROVISIONED (on-demand tables reject it).
    *
    * `targetBillingMode` is the user's explicit override (None = derive
    * from the source, the reference's backward-compatible default).
    */
  def deriveCreateRequest(source: TableDescription, targetTableName: String,
                          targetBillingMode: Option[String] = None): CreateTableModel = {
    targetBillingMode.foreach(m =>
      require(m == Provisioned || m == PayPerRequest, s"unknown billing mode: $m"))
    val tp = source.provisionedThroughput
    val bothSet = tp.readCapacityUnits != 0L && tp.writeCapacityUnits != 0L
    if (targetBillingMode.contains(Provisioned) && !bothSet)
      throw new IllegalArgumentException(
        "readCapacityUnits and writeCapacityUnits must be set for PROVISIONED billing mode")
    val provisioned =
      (targetBillingMode.contains(Provisioned) || targetBillingMode.isEmpty) && bothSet
    val billing = if (provisioned) Provisioned else PayPerRequest
    // GSI throughput rides along only onto a PROVISIONED target; the
    // reference keys this off the REQUESTED mode (forall == PROVISIONED)
    val gsiKeepsThroughput = targetBillingMode.forall(_ == Provisioned)
    CreateTableModel(
      tableName = targetTableName,
      keySchema = source.keySchema,
      attributeDefinitions = source.attributeDefinitions,
      billingMode = billing,
      provisionedThroughput = if (provisioned) Some(tp) else None,
      localSecondaryIndexes = source.localSecondaryIndexes
        .map(i => LocalIndex(i.indexName, i.keySchema, i.projection)),
      globalSecondaryIndexes = source.globalSecondaryIndexes.map { i =>
        GlobalIndex(i.indexName, i.keySchema, i.projection,
          if (gsiKeepsThroughput) i.provisionedThroughput else None)
      })
  }
}
