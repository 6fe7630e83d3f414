package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native top-k-per-group aggregate: `graft_topk(ord, id, k)` keeps the
  * k (ord, id) pairs with the highest ord (ties broken by lowest id) in
  * a bounded binary heap and returns them best-first as
  * `array<struct<ord: double, id: bigint>>`.
  *
  * This is the aggregate form of "top-k per key", replacing the
  * row_number-window formulation. The window plan shuffles EVERY row to
  * its key's partition and sorts each partition; this aggregate is a
  * partial+final HashAggregate — each map task reduces its slice to at
  * most k pairs per key before the shuffle, so shuffle volume is
  * min(rows, k·keys) and nothing is ever sorted beyond k elements.
  * At 100 TB with replay-heavy or skewed keys that is the difference
  * between shuffling the table and shuffling the answer.
  *
  * State is O(k) per key (a heap ordered worst-first for O(log k)
  * eviction), serialized as plain length-prefixed pairs between
  * partial and final aggregation.
  */
case class TopKBy(
    ordExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  /** worst-first ordering: head = lowest ord (highest id on ties). */
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (ord, id) => (-ord, id) }

  override def children: Seq[Expression] = Seq(ordExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType), StructField("id", LongType))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ordExpr.dataType.isInstanceOf[DoubleType])
      TypeCheckResult.TypeCheckFailure("graft_topk: ord must be double")
    else if (!idExpr.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckFailure("graft_topk: id must be bigint")
    else if (!kExpr.foldable || !kExpr.dataType.isInstanceOf[IntegerType] ||
             kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("graft_topk: k must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    ord: Double, id: Long): Unit =
    if (buf.size < k) buf.enqueue((ord, id))
    else {
      val (wOrd, wId) = buf.head
      if (ord > wOrd || (ord == wOrd && id < wId)) {
        buf.dequeue(); buf.enqueue((ord, id))
      }
    }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null)
      offer(buf, o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (o, i) => offer(buf, o, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy { case (ord, id) => (-ord, id) }
    new GenericArrayData(best.map { case (ord, id) =>
      InternalRow(ord, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (o, i) => out.writeDouble(o); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "graft_topk"
  override def defaultResult: Option[Literal] =
    Some(Literal.create(new GenericArrayData(Array.empty[Any]), dataType))
}
