package graft.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonGenerator, JsonParser, JsonToken}
import java.io.StringWriter
import java.util.Base64

/** DynamoDB-JSON codec for the S3-export file format (reference:
  * readers/DynamoDBS3Export.scala:240-292 decode,
  * writers/DynamoDBS3Export.scala:172-219 encode). One JSON object per
  * line, each `{"Item": {attr: {"S": …}|{"N": …}|…}}`.
  *
  * Implemented on Jackson streaming (already on the Spark classpath) so
  * it runs inside `mapPartitions` with zero extra dependencies and no
  * intermediate tree allocation on the hot path.
  *
  * Encoding is canonical for deterministic output (reference behavior):
  * map keys sorted alphabetically, SS sorted lexically, NS sorted
  * numerically, BS sorted by base64 form.
  */
object DdbJson {

  private val factory = new JsonFactory()

  // ---------------------------------------------------------------- decode

  def decodeItemLine(line: String): DdbValue.Item = {
    val p = factory.createParser(line)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT, "expected object")
      var item: DdbValue.Item = Map.empty
      var sawItem = false
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        p.nextToken()
        if (name == "Item") { item = decodeAttrMap(p); sawItem = true }
        else p.skipChildren()
      }
      // a line without an Item field is a malformed/truncated record or
      // stray metadata — surfacing it beats silently emitting an empty
      // item that would count in manifests and compare as equal
      require(sawItem, s"export line has no Item field: ${line.take(120)}")
      item
    } finally p.close()
  }

  /** Decode `{attr: {tag: value}, ...}` with the parser positioned on
    * START_OBJECT.
    */
  private def decodeAttrMap(p: JsonParser): DdbValue.Item = {
    require(p.currentToken() == JsonToken.START_OBJECT, "expected attribute map")
    val b = Map.newBuilder[String, DdbValue]
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      val attr = p.currentName()
      p.nextToken()
      b += attr -> decodeValue(p)
    }
    b.result()
  }

  /** Decode one `{tag: payload}` wrapper, parser on its START_OBJECT. */
  def decodeValue(p: JsonParser): DdbValue = {
    require(p.currentToken() == JsonToken.START_OBJECT, "expected value wrapper")
    require(p.nextToken() == JsonToken.FIELD_NAME, "expected type tag")
    val tag = p.currentName()
    p.nextToken()
    val v: DdbValue = tag match {
      case "S"    => DdbValue.S(p.getText)
      case "N"    => DdbValue.N(p.getText)
      case "BOOL" => DdbValue.Bool(p.getBooleanValue)
      case "NULL" => DdbValue.Null
      case "B"    => DdbValue.B(Base64.getDecoder.decode(p.getText))
      case "SS"   => DdbValue.Ss(decodeStringArray(p))
      case "NS"   => DdbValue.Ns(decodeStringArray(p))
      case "BS"   => DdbValue.Bs(decodeStringArray(p).map(Base64.getDecoder.decode))
      case "L" =>
        require(p.currentToken() == JsonToken.START_ARRAY, "L expects array")
        val b = List.newBuilder[DdbValue]
        while (p.nextToken() == JsonToken.START_OBJECT) b += decodeValue(p)
        DdbValue.L(b.result())
      case "M" => DdbValue.M(decodeAttrMap(p))
      case other => throw new IllegalArgumentException(s"unknown DynamoDB type tag: $other")
    }
    require(p.nextToken() == JsonToken.END_OBJECT, s"trailing content in $tag wrapper")
    v
  }

  private def decodeStringArray(p: JsonParser): List[String] = {
    require(p.currentToken() == JsonToken.START_ARRAY, "expected array")
    val b = List.newBuilder[String]
    while (p.nextToken() != JsonToken.END_ARRAY) b += p.getText
    b.result()
  }

  // ---------------------------------------------------------------- encode

  def encodeItemLine(item: DdbValue.Item): String = {
    val w = new StringWriter()
    val g = factory.createGenerator(w)
    g.writeStartObject()
    g.writeFieldName("Item")
    writeAttrMap(g, item)
    g.writeEndObject()
    g.close()
    w.toString
  }

  private def writeAttrMap(g: JsonGenerator, m: Map[String, DdbValue]): Unit = {
    g.writeStartObject()
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      g.writeFieldName(k)
      writeValue(g, v)
    }
    g.writeEndObject()
  }

  def writeValue(g: JsonGenerator, v: DdbValue): Unit = {
    g.writeStartObject()
    v match {
      case DdbValue.S(s)    => g.writeStringField("S", s)
      case DdbValue.N(n)    => g.writeStringField("N", n)
      case DdbValue.Bool(b) => g.writeBooleanField("BOOL", b)
      case DdbValue.Null    => g.writeBooleanField("NULL", true)
      case DdbValue.B(b)    => g.writeStringField("B", Base64.getEncoder.encodeToString(b))
      case DdbValue.Ss(xs) =>
        g.writeFieldName("SS"); g.writeStartArray()
        xs.sorted.foreach(g.writeString); g.writeEndArray()
      case DdbValue.Ns(xs) =>
        g.writeFieldName("NS"); g.writeStartArray()
        xs.sortBy(new java.math.BigDecimal(_)).foreach(g.writeString); g.writeEndArray()
      case DdbValue.Bs(xs) =>
        g.writeFieldName("BS"); g.writeStartArray()
        xs.map(Base64.getEncoder.encodeToString).sorted.foreach(g.writeString)
        g.writeEndArray()
      case DdbValue.L(xs) =>
        g.writeFieldName("L"); g.writeStartArray()
        xs.foreach(writeValue(g, _)); g.writeEndArray()
      case DdbValue.M(m) =>
        g.writeFieldName("M"); writeAttrMap(g, m)
    }
    g.writeEndObject()
  }
}
