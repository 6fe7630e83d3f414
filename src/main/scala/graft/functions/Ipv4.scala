package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel behind `ipv4_range_to_cidr_list` (r18): the greedy
  * minimal CIDR cover of [lo, hi] — from the low end, emit the largest
  * block both aligned at `cur` and fitting in the remainder. ≤ 62
  * blocks cover any 32-bit range. First shipped as a 64-step Spark SQL
  * `aggregate` fold, which evaluates its lambda INTERPRETED per row —
  * this Expression is the codegen'd replacement (the repo's preference
  * order: native Expression over interpreted HOF on anything that
  * could run corpus-scale, e.g. flow-log ranges). Same integer-only
  * arithmetic, so the DuckDB recursive-CTE oracle replay is unchanged
  * bit for bit. */
object Ipv4 {

  def rangeToCidrs(lo: Long, hi: Long): ArrayData = {
    if (lo < 0 || hi < 0 || lo > hi || hi > 0xFFFFFFFFL) return null
    val out = new java.util.ArrayList[Any](8)
    var cur = lo
    while (cur <= hi) {
      val align = if (cur == 0L) 0x100000000L else cur & -cur
      val rem = hi - cur + 1
      // highest power of two ≤ rem
      var h = rem
      h |= h >> 1; h |= h >> 2; h |= h >> 4
      h |= h >> 8; h |= h >> 16; h |= h >> 32
      val highest = (h >> 1) + 1
      val blk = math.min(align, highest)
      val p = 32 - java.lang.Long.bitCount(blk - 1)
      out.add(UTF8String.fromString(
        s"${cur >> 24 & 0xFF}.${cur >> 16 & 0xFF}.${cur >> 8 & 0xFF}.${cur & 0xFF}/$p")): Unit
      cur += blk
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_ipv4_cidrs(lo, hi)` → the greedy minimal CIDR cover as
  * ARRAY<STRING>; null on invalid/inverted ranges ([[Ipv4]]). */
case class Ipv4RangeToCidrs(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ipv4_cidrs expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ipv4_cidrs"

  override def nullSafeEval(lo: Any, hi: Any): Any =
    Ipv4.rangeToCidrs(lo.asInstanceOf[Long], hi.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lo, hi) => s"""
       |${ev.value} = graft.functions.Ipv4.rangeToCidrs($lo, $hi);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
