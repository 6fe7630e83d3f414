package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The merged-schema tree behind ADX `buildschema`: one node per JSON
  * path, holding the SET of scalar type names seen there plus an
  * optional object-merge (key → child node) and an optional
  * array-merge (one node unioning every element). State size is
  * bounded by SCHEMA COMPLEXITY (distinct paths × alternatives), never
  * by group row count — the lawful partial+final shape
  * ([[BagMergeAgg]]'s contract; merge is key-wise set union,
  * associative + commutative). */
private[functions] final class SchemaNode {
  val scalars: mutable.TreeSet[String] = mutable.TreeSet.empty
  var obj: mutable.TreeMap[String, SchemaNode] = null
  var arr: SchemaNode = null

  def mergeFrom(other: SchemaNode): Unit = {
    scalars ++= other.scalars
    if (other.obj != null) {
      if (obj == null) obj = mutable.TreeMap.empty
      other.obj.foreach { case (k, v) =>
        obj.get(k) match {
          case Some(mine) => mine.mergeFrom(v)
          case None => obj.put(k, v): Unit
        }
      }
    }
    if (other.arr != null) {
      if (arr == null) arr = other.arr
      else arr.mergeFrom(other.arr)
    }
  }
}

/** Native aggregate behind `summarize buildschema(dyn)`:
  * `graft_build_schema(jsonText)` over each row's canonical JSON
  * rendering (`to_json` of the dynamic) returns the minimal schema
  * admitting every value, as canonical JSON text (the caller wraps
  * `parse_json`).
  *
  * Schema language (documented deviation — ADX's own rendering is
  * engine-internal and not fully specified publicly; this form keeps
  * ADX's recognizable conventions and is DETERMINISTIC):
  *  - scalars render as `"long"` / `"double"` / `"string"` / `"bool"`
  *    (JSON integer-valued numbers are `long`, fractional `double`);
  *  - objects render as `{"key": schema, ...}`, keys sorted by UTF-8
  *    bytes (the repo's one canonical key order, [[BagMergeAgg]]);
  *  - arrays render as ADX's indexer convention:
  *    `{"`indexer`": elementSchema}` with every element unioned;
  *  - a path seen with SEVERAL types renders the alternatives as a
  *    JSON array, ordered scalars-sorted, then the array form, then
  *    the object form;
  *  - JSON nulls and null rows contribute nothing; a path (or group)
  *    with no typed evidence renders `"dynamic"`.
  */
case class BuildSchemaAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SchemaNode] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_build_schema expects (string), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): SchemaNode = new SchemaNode

  private val factory = new JsonFactory()

  /** Consume the value whose first token is `tok`, folding its type
    * evidence into `node`. */
  private def addValue(node: SchemaNode, p: JsonParser, tok: JsonToken): Unit =
    tok match {
      case JsonToken.VALUE_NUMBER_INT => node.scalars.add("long"): Unit
      case JsonToken.VALUE_NUMBER_FLOAT => node.scalars.add("double"): Unit
      case JsonToken.VALUE_STRING => node.scalars.add("string"): Unit
      case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE =>
        node.scalars.add("bool"): Unit
      case JsonToken.VALUE_NULL => ()
      case JsonToken.START_OBJECT =>
        if (node.obj == null) node.obj = mutable.TreeMap.empty
        var t = p.nextToken()
        while (t != JsonToken.END_OBJECT) {
          val key = p.currentName()
          val vt = p.nextToken()
          addValue(node.obj.getOrElseUpdate(key, new SchemaNode), p, vt)
          t = p.nextToken()
        }
      case JsonToken.START_ARRAY =>
        if (node.arr == null) node.arr = new SchemaNode
        var t = p.nextToken()
        while (t != JsonToken.END_ARRAY) {
          addValue(node.arr, p, t)
          t = p.nextToken()
        }
      case other =>
        throw new IllegalArgumentException(s"buildschema: unexpected JSON token $other")
    }

  override def update(buf: SchemaNode, input: InternalRow): SchemaNode = {
    val v = child.eval(input)
    if (v != null) {
      val p = factory.createParser(v.asInstanceOf[UTF8String].toString)
      try {
        val t = p.nextToken()
        if (t != null) addValue(buf, p, t)
      } finally p.close()
    }
    buf
  }

  override def merge(buf: SchemaNode, other: SchemaNode): SchemaNode = {
    buf.mergeFrom(other)
    buf
  }

  private def escKey(k: String): String = {
    val sb = new StringBuilder
    k.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def utf8Less(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n) {
      val x = ab(i) & 0xff; val y = bb(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    ab.length < bb.length
  }

  private def render(node: SchemaNode): String = {
    val alts = mutable.ArrayBuffer.empty[String]
    node.scalars.foreach(s => alts += ("\"" + s + "\""))
    if (node.arr != null) alts += s"""{"`indexer`":${render(node.arr)}}"""
    if (node.obj != null)
      alts += node.obj.toSeq
        .sortWith((a, b) => utf8Less(a._1, b._1))
        .map { case (k, v) => "\"" + escKey(k) + "\":" + render(v) }
        .mkString("{", ",", "}")
    alts.size match {
      case 0 => "\"dynamic\""
      case 1 => alts.head
      case _ => alts.mkString("[", ",", "]")
    }
  }

  override def eval(buf: SchemaNode): Any =
    UTF8String.fromString(render(buf))

  private def writeNode(out: DataOutputStream, node: SchemaNode): Unit = {
    out.writeInt(node.scalars.size)
    node.scalars.foreach { s =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    if (node.obj != null) {
      out.writeInt(node.obj.size)
      node.obj.foreach { case (k, v) =>
        val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b)
        writeNode(out, v)
      }
    } else out.writeInt(-1)
    out.writeBoolean(node.arr != null)
    if (node.arr != null) writeNode(out, node.arr)
  }

  private def readNode(in: DataInputStream): SchemaNode = {
    val node = new SchemaNode
    def str(): String = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
    val ns = in.readInt()
    (0 until ns).foreach(_ => node.scalars.add(str()): Unit)
    val no = in.readInt()
    if (no >= 0) {
      node.obj = mutable.TreeMap.empty
      (0 until no).foreach(_ => node.obj.put(str(), readNode(in)): Unit)
    }
    if (in.readBoolean()) node.arr = readNode(in)
    node
  }

  override def serialize(buf: SchemaNode): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    writeNode(out, buf)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SchemaNode =
    readNode(new DataInputStream(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): BuildSchemaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BuildSchemaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BuildSchemaAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_build_schema"
  override def defaultResult: Option[Literal] =
    Some(Literal.create(UTF8String.fromString("\"dynamic\""), StringType))
}
