package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ADX's IPv6 scalar tier (`parse_ipv6` / `parse_ipv6_mask` /
  * `ipv6_compare` / `ipv6_is_match`) as native codegen expressions —
  * the sibling of the SQL-arithmetic IPv4 tier (IPv6 parsing needs
  * real branching: `::` gap expansion, embedded dotted-quad tails,
  * plain-IPv4 mapping — a SQL formulation would be interpreted HOF
  * soup). Conventions, mirroring the IPv4 tier's documented
  * deviations:
  *  - canonical form is 8 groups of 4 lowercase hex digits
  *    (`2001:0db8:…:0001`), ADX's rendering;
  *  - plain IPv4 input maps to `::ffff:a.b.c.d` (ADX behavior);
  *  - a "/prefix" SUFFIX on the input string → null — the explicit
  *    `parse_ipv6_mask` / 3-arg compare forms carry the prefix
  *    (parse_ipv4 rejects suffixed input the same way here);
  *  - compare masks BOTH addresses to the prefix then orders the full
  *    128 bits; is_match is compare = 0.
  * Null on malformed input or a prefix outside 0..128. */
object Ipv6 {

  // ASCII-only validation (r13 advice): Character.digit/Char.isDigit
  // accept non-ASCII Unicode digits (e.g. fullwidth '２'), which would
  // let '２001:db8::1' parse instead of canonicalizing to null.
  private def asciiHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexWord(p: String): Int =
    if (p.nonEmpty && p.length <= 4 && p.forall(asciiHex))
      Integer.parseInt(p, 16)
    else -1

  private def ipv4Octets(s: String): Array[Int] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return null
    val o = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(c => c >= '0' && c <= '9')) return null
      val v = p.toInt
      if (v > 255) return null
      o(i) = v
      i += 1
    }
    o
  }

  /** 8 16-bit words, or null on malformed input. */
  def words(s0: String): Array[Int] = {
    if (s0 == null) return null
    val s = s0.trim
    if (s.isEmpty || s.indexOf('/') >= 0) return null
    if (s.indexOf(':') < 0) {
      val o = ipv4Octets(s)
      if (o == null) return null
      return Array(0, 0, 0, 0, 0, 0xffff, (o(0) << 8) | o(1), (o(2) << 8) | o(3))
    }
    // allowV4: RFC 4291 permits the dotted quad only as the FINAL 32
    // bits of the address, so it may appear only as the last part of
    // the RIGHT side of '::' (or of a gapless address) — the left side
    // rejects '.' parts entirely (r13 advice: '1.2.3.4::' parsed).
    def sideWords(side: String, allowV4: Boolean): Array[Int] = {
      if (side.isEmpty) return Array.emptyIntArray
      val parts = side.split(":", -1)
      if (parts.exists(_.isEmpty)) return null
      val buf = new scala.collection.mutable.ArrayBuffer[Int](8)
      var i = 0
      while (i < parts.length) {
        val p = parts(i)
        if (p.indexOf('.') >= 0) {
          if (!allowV4 || i != parts.length - 1) return null
          val o = ipv4Octets(p)
          if (o == null) return null
          buf += ((o(0) << 8) | o(1))
          buf += ((o(2) << 8) | o(3))
        } else {
          val w = hexWord(p)
          if (w < 0) return null
          buf += w
        }
        i += 1
      }
      buf.toArray
    }
    val gi = s.indexOf("::")
    if (gi >= 0) {
      if (s.indexOf("::", gi + 1) >= 0) return null
      val left = sideWords(s.substring(0, gi), allowV4 = false)
      val right = sideWords(s.substring(gi + 2), allowV4 = true)
      if (left == null || right == null) return null
      val fill = 8 - left.length - right.length
      if (fill < 1) return null
      left ++ Array.fill(fill)(0) ++ right
    } else {
      val w = sideWords(s, allowV4 = true)
      if (w == null || w.length != 8) return null
      w
    }
  }

  /** Zero every bit past `prefix` (prefix validated by callers). */
  private def mask(w: Array[Int], prefix: Int): Array[Int] = {
    val out = new Array[Int](8)
    var i = 0
    while (i < 8) {
      val keep = math.max(0, math.min(16, prefix - 16 * i))
      out(i) = w(i) & ((0xffff << (16 - keep)) & 0xffff)
      i += 1
    }
    out
  }

  private def render(w: Array[Int]): UTF8String =
    UTF8String.fromString(w.map(x => f"$x%04x").mkString(":"))

  def canonical(s: UTF8String): UTF8String = {
    if (s == null) return null
    val w = words(s.toString)
    if (w == null) null else render(w)
  }

  def canonicalMask(s: UTF8String, prefix: Int): UTF8String = {
    if (s == null || prefix < 0 || prefix > 128) return null
    val w = words(s.toString)
    if (w == null) null else render(mask(w, prefix))
  }

  /** -1/0/1 over the first `prefix` bits, boxed; null on bad input. */
  def compare(a: UTF8String, b: UTF8String, prefix: Int): Any = {
    if (a == null || b == null || prefix < 0 || prefix > 128) return null
    val wa = words(a.toString)
    val wb = words(b.toString)
    if (wa == null || wb == null) return null
    val (ma, mb) = (mask(wa, prefix), mask(wb, prefix))
    var i = 0
    while (i < 8) {
      if (ma(i) != mb(i))
        return java.lang.Integer.valueOf(if (ma(i) < mb(i)) -1 else 1)
      i += 1
    }
    java.lang.Integer.valueOf(0)
  }
}

/** `graft_ipv6_canon(ip)` → canonical 8×4-hex form, null on bad input. */
case class Ipv6Canonical(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ipv6_canon expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ipv6_canon"
  override def nullSafeEval(ip: Any): Any =
    Ipv6.canonical(ip.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ip => {
      s"""
         |${ev.value} = graft.functions.Ipv6.canonical($ip);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_ipv6_mask(ip, prefix)` → canonical form masked to prefix. */
case class Ipv6CanonicalMask(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ipv6_mask expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ipv6_mask"
  override def nullSafeEval(ip: Any, p: Any): Any =
    Ipv6.canonicalMask(ip.asInstanceOf[UTF8String], p.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ip, p) => {
      s"""
         |${ev.value} = graft.functions.Ipv6.canonicalMask($ip, $p);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_ipv6_cmp(a, b, prefix)` → -1/0/1 over the first prefix bits. */
case class Ipv6Compare(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ipv6_cmp expects (string, string, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ipv6_cmp"
  override def nullSafeEval(a: Any, b: Any, p: Any): Any =
    Ipv6.compare(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      p.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, p) => {
      val r = ctx.freshName("ipv6cmp")
      s"""
         |Object $r = graft.functions.Ipv6.compare($a, $b, $p);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ${ev.isNull} ? -1 : ((java.lang.Integer) $r).intValue();
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
