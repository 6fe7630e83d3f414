package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ADX `parse_csv(text)` → array of the ONE record's fields. RFC 4180
  * quoting: fields separated by ',', a field may be wrapped in double
  * quotes, `""` inside a quoted field is a literal quote, commas and
  * newlines inside quotes are data. A character state machine — no
  * SQL split expresses the escape rule. Conventions: text after a
  * closing quote concatenates onto the field (lenient, like most
  * readers); a DANGLING open quote → null (the engine's
  * loud-malformed convention; DEVIATION from ADX's best-effort
  * truncation, documented here); ADX's multi-record input (it reads
  * only the first record) is NOT reproduced — the whole input is one
  * record, embedded newlines only inside quotes. */
object CsvParse {
  def parse(s: UTF8String): GenericArrayData = {
    if (s == null) return null
    val t = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val f = new java.lang.StringBuilder
    var i = 0
    var inQ = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < t.length && t.charAt(i + 1) == '"') { f.append('"'); i += 1 }
          else inQ = false
        } else f.append(c)
      } else c match {
        case ',' => out += UTF8String.fromString(f.toString); f.setLength(0)
        case '"' => inQ = true
        case other => f.append(other)
      }
      i += 1
    }
    if (inQ) return null // dangling quote
    out += UTF8String.fromString(f.toString)
    new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_parse_csv(s)` → ARRAY<STRING>; malformed (dangling quote) →
  * null. */
case class CsvParseExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_parse_csv expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_parse_csv"
  override def nullSafeEval(s: Any): Any =
    CsvParse.parse(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.CsvParse.parse($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
