package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the IPv6 core (pure JVM, no Spark session;
  * deterministic seed — the same 400 cases every run): canonicalization
  * is idempotent and textual-form-invariant (mixed case, zero-run
  * compression, dotted-quad tails all agree), masking is idempotent and
  * prefix-monotone, and compare is reflexive, antisymmetric, and
  * total-equal at prefix 0. */
class Ipv6PropertySpec extends AnyFunSuite {

  private def u(s: String): UTF8String = UTF8String.fromString(s)
  private def canon(s: String): String = {
    val r = Ipv6.canonical(u(s))
    if (r == null) null else r.toString
  }
  private def maskOf(s: String, p: Int): String = {
    val r = Ipv6.canonicalMask(u(s), p)
    if (r == null) null else r.toString
  }

  /** Render words through a textual form picked by the flags. */
  private def render(w: Seq[Int], compress: Boolean, upper: Boolean,
                     v4Tail: Boolean): String = {
    val groups = w.map(x => if (upper) f"$x%X" else f"$x%x")
    val s =
      if (v4Tail)
        (groups.take(6) :+
          s"${w(6) >> 8}.${w(6) & 0xff}.${w(7) >> 8}.${w(7) & 0xff}").mkString(":")
      else groups.mkString(":")
    if (!compress || v4Tail) s
    else "(^|:)0(:0)+(:|$)".r.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        val left = s.substring(0, m.start).stripSuffix(":")
        val right = s.substring(m.end).stripPrefix(":")
        // re-attach the boundary group the match consumed (group 3 is
        // ":" when the run is interior/leading, "" when trailing)
        val rightFull =
          if (m.group(3) == ":") s.substring(m.end - 1).stripPrefix(":") else right
        left + "::" + rightFull
    }
  }

  private val cases: List[(Seq[Int], String, Int)] =
    Gen.listOfN(400, for {
      // bias toward zero-heavy words so compression actually triggers
      w <- Gen.containerOfN[Seq, Int](8,
        Gen.frequency(2 -> Gen.const(0), 3 -> Gen.chooseNum(0, 0xffff)))
      c <- Gen.oneOf(true, false)
      up <- Gen.oneOf(true, false)
      v4 <- Gen.oneOf(true, false)
      p <- Gen.chooseNum(0, 128)
    } yield (w, render(w, c, up, v4), p))
      .pureApply(Gen.Parameters.default, Seed(13L))

  test("ipv6: canonicalization idempotent and invariant across textual forms") {
    cases.foreach { case (w, form, _) =>
      val c1 = canon(form)
      assert(c1 != null, s"failed to parse rendered form: $form")
      assert(canon(c1) == c1, s"not idempotent: $form")
      val full = w.map(x => f"$x%04x").mkString(":")
      assert(c1 == full, s"form $form canonicalized to $c1, expected $full")
    }
  }

  test("ipv6: masking idempotent, prefix-monotone, self-match under own prefix") {
    cases.foreach { case (_, form, p) =>
      val m1 = maskOf(form, p)
      assert(m1 != null)
      assert(maskOf(m1, p) == m1, s"mask not idempotent: $form/$p")
      assert(Ipv6.compare(u(form), u(m1), p) == 0,
        s"$form must match its own /$p mask")
      val q = p / 2
      assert(maskOf(m1, q) == maskOf(form, q),
        s"mask($p) then mask($q) must equal mask($q): $form")
    }
  }

  test("ipv6: dotted quad only as the final 32 bits; ASCII-only digits (r13 advice)") {
    // RFC 4291: the embedded IPv4 form occupies the LOW 32 bits — a
    // dotted quad left of '::', or not in last position, is malformed
    assert(canon("1.2.3.4::") == null)
    assert(canon("1.2.3.4::5") == null)
    assert(canon("::5:1.2.3.4:6") == null)
    assert(canon("1:1.2.3.4:2:3:4:5:6") == null)
    // ...while the legitimate tail forms still parse
    assert(canon("::ffff:1.2.3.4") == "0000:0000:0000:0000:0000:ffff:0102:0304")
    assert(canon("1:2:3:4:5:6:7.8.9.10") == "0001:0002:0003:0004:0005:0006:0708:090a")
    // non-ASCII Unicode digits (fullwidth '２' U+FF12, Devanagari '२'
    // U+0968) must canonicalize to null, not parse as their numeric value
    assert(canon("２001:db8::1") == null)
    assert(canon("::２") == null)
    assert(canon("२.168.1.1") == null)
    assert(canon("192.168.１.1") == null)
  }

  test("ipv6: compare reflexive, antisymmetric, total-equal at prefix 0") {
    cases.zip(cases.reverse).foreach { case ((_, fa, p), (_, fb, _)) =>
      assert(Ipv6.compare(u(fa), u(fa), p) == 0)
      val ab = Ipv6.compare(u(fa), u(fb), p).asInstanceOf[Integer].intValue
      val ba = Ipv6.compare(u(fb), u(fa), p).asInstanceOf[Integer].intValue
      assert(ab == -ba, s"antisymmetry: $fa vs $fb at /$p")
      assert(Ipv6.compare(u(fa), u(fb), 0) == 0)
    }
  }
}
