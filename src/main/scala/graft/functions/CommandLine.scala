package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ADX `parse_command_line(cmd, 'windows')` — the Windows
  * CommandLineToArgvW / MSVCRT argument-splitting rules (published at
  * MSDN "Parsing C++ Command-Line Arguments"):
  *
  *  - arguments split on runs of space/tab outside quotes;
  *  - `"` toggles in-quotes (whitespace inside quotes is data);
  *  - 2n backslashes before a `"` → n backslashes, quote acts;
  *    2n+1 backslashes before a `"` → n backslashes + literal quote;
  *    backslashes NOT before a quote are literal;
  *  - `""` while in quotes emits one literal quote and stays in
  *    quotes (the post-2005 MSVCRT rule — the one modern Windows
  *    runtimes apply; spec-pinned since the pre-2005 rule differed).
  *
  * Blank/whitespace-only input → null (ADX's null-on-nothing
  * convention; the real API would return the program name, which has
  * no meaning for a field value). */
object CommandLine {
  def parse(s: UTF8String): GenericArrayData = {
    if (s == null) return null
    val t = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = t.length
    def ws(c: Char) = c == ' ' || c == '\t'
    while (i < n) {
      while (i < n && ws(t.charAt(i))) i += 1
      if (i < n) {
        val f = new java.lang.StringBuilder
        var inQ = false
        var done = false
        while (i < n && !done) {
          val c = t.charAt(i)
          if (c == '\\') {
            var nb = 0
            while (i < n && t.charAt(i) == '\\') { nb += 1; i += 1 }
            if (i < n && t.charAt(i) == '"') {
              var k = 0
              while (k < nb / 2) { f.append('\\'); k += 1 }
              if (nb % 2 == 1) { f.append('"'); i += 1 }
              // even: the quote is unescaped — fall through to the
              // quote branch on the next loop iteration
            } else {
              var k = 0
              while (k < nb) { f.append('\\'); k += 1 }
            }
          } else if (c == '"') {
            if (inQ && i + 1 < n && t.charAt(i + 1) == '"') {
              f.append('"'); i += 2
            } else { inQ = !inQ; i += 1 }
          } else if (!inQ && ws(c)) {
            done = true
          } else { f.append(c); i += 1 }
        }
        out += UTF8String.fromString(f.toString)
      }
    }
    if (out.isEmpty) null else new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_parse_cmdline(s)` → ARRAY<STRING>; blank input → null. */
case class CommandLineExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_parse_cmdline expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_parse_cmdline"
  override def nullSafeEval(s: Any): Any =
    CommandLine.parse(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.CommandLine.parse($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
