package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codepoint conversions for ADX `unicode_codepoints_from_string` /
  * `unicode_codepoints_to_string`. Native expressions because the
  * SQL-text routes fail outside Latin-1: Spark's `chr(n)` truncates to
  * n % 256, and per-index `substring` probing is O(n²) on UTF8String.
  * Pure integer↔UTF-8 transcoding — no floats, so the DuckDB oracle
  * (`unicode(substr(s,i,1))` / `chr(cp)`) matches bit-exactly,
  * including astral plane codepoints (both engines count CODEPOINTS,
  * not UTF-16 units). */
object Unicode {

  /** Codepoints of `s` in order; empty array for the empty string. */
  def codepointsOf(s: UTF8String): ArrayData = {
    if (s == null) return null
    val it = s.toString.codePoints().iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (it.hasNext) buf += it.nextInt()
    new GenericArrayData(buf.toArray)
  }

  /** String from codepoints; null if any element is null or not a
    * valid Unicode codepoint (ADX returns empty/garbage-free null). */
  def stringOf(arr: ArrayData): UTF8String = {
    if (arr == null) return null
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n + 8)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val cp = arr.getInt(i)
      if (!Character.isValidCodePoint(cp)) return null
      sb.appendCodePoint(cp)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_codepoints(s)` → array<int> of Unicode codepoints. */
case class UnicodeCodepoints(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_codepoints expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_codepoints"

  override def nullSafeEval(s: Any): Any =
    Unicode.codepointsOf(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.Unicode.codepointsOf($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_from_codepoints(arr)` → string (null on any invalid
  * codepoint — see [[Unicode.stringOf]]). */
case class UnicodeFromCodepoints(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_from_codepoints expects (array<int>), got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_from_codepoints"

  override def nullSafeEval(a: Any): Any =
    Unicode.stringOf(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.Unicode.stringOf($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
