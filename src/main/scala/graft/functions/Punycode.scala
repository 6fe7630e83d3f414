package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3492 Punycode for ADX `punycode_from_string` /
  * `punycode_to_string` — the RAW single-label form (no `xn--` ACE
  * prefix, no IDNA mapping; ADX's functions are the bare bootstring
  * transform). Hand-built from the RFC's published algorithm
  * (parameters base 36 / tmin 1 / tmax 26 / skew 38 / damp 700 /
  * initial_bias 72 / initial_n 128): `java.net.IDN` cannot be used —
  * it injects the ACE prefix and IDNA2003 mapping, and pure-ASCII
  * labels round-trip unchanged there where raw punycode appends the
  * basic-codepoint delimiter (`'abc'` → `'abc-'`). Integer-only, so
  * the behavior is pinned by RFC test vectors in KqlSpec (no DuckDB
  * oracle exists for punycode). Malformed input on decode → null
  * (engine convention; documented deviation from ADX's empty
  * string). */
object Punycode {
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= (Base - TMin)
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def digitVal(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Encode; null on codepoints the 31-bit delta arithmetic cannot
    * carry (RFC overflow condition — practically unreachable for real
    * labels). */
  def encode(s: UTF8String): UTF8String = {
    if (s == null) return null
    val cps = s.toString.codePoints().toArray
    val out = new java.lang.StringBuilder
    cps.foreach(c => if (c < InitialN) out.append(c.toChar))
    val b = out.length()
    if (b > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    var h = b
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      if (m - n > (Int.MaxValue - delta) / (h + 1)) return null // overflow
      delta += (m - n) * (h + 1)
      n = m
      var i = 0
      while (i < cps.length) {
        val c = cps(i)
        if (c < n) {
          delta += 1
          if (delta == Int.MaxValue) return null
        }
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
        i += 1
      }
      delta += 1
      n += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** Decode; null on malformed punycode (bad digit, overflow,
    * non-ASCII input). */
  def decode(s: UTF8String): UTF8String = {
    if (s == null) return null
    val in = s.toString
    if (!in.forall(_ < 128)) return null
    // basic portion = everything before the LAST delimiter; a leading
    // '-' (delimiter at 0) means an empty basic portion per the RFC
    val lastDelim = in.lastIndexOf('-')
    val output = new java.util.ArrayList[Integer]
    val basicEnd = math.max(lastDelim, 0)
    var i0 = 0
    while (i0 < basicEnd) { output.add(in.charAt(i0).toInt); i0 += 1 }
    var n = InitialN
    var i = 0
    var bias = InitialBias
    var pos = if (lastDelim >= 0) lastDelim + 1 else 0
    while (pos < in.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= in.length) return null
        val d = digitVal(in.charAt(pos)); pos += 1
        if (d < 0) return null
        if (d > (Int.MaxValue - i) / w) return null
        i += d * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (d < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return null
          w *= (Base - t)
          k += Base
        }
      }
      val outLen = output.size() + 1
      bias = adapt(i - oldi, outLen, oldi == 0)
      if (i / outLen > Int.MaxValue - n) return null
      n += i / outLen
      i %= outLen
      if (!Character.isValidCodePoint(n)) return null
      output.add(i, n)
      i += 1
    }
    val sb = new java.lang.StringBuilder
    output.forEach(cp => { sb.appendCodePoint(cp.intValue()); () })
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_punycode_encode(s)` → raw RFC 3492 punycode label. */
case class PunycodeEncode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_punycode_encode expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_punycode_encode"
  override def nullSafeEval(s: Any): Any =
    Punycode.encode(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.Punycode.encode($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_punycode_decode(s)` → decoded label; malformed → null. */
case class PunycodeDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_punycode_decode expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_punycode_decode"
  override def nullSafeEval(s: Any): Any =
    Punycode.decode(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.Punycode.decode($s);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
