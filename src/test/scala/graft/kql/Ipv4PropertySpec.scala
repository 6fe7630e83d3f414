package graft.kql

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property pins for the IPv4 tier: parse/format round-trips and the
  * mask/range algebra on randomized addresses (deterministic seeds —
  * the same 300 addresses every run, so failures are reproducible, not
  * flaky). */
class Ipv4PropertySpec extends SparkSpec {
  import spark.implicits._

  private val addrGen: Gen[(Int, Int, Int, Int)] = for {
    a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    c <- Gen.choose(0, 255); d <- Gen.choose(0, 255)
  } yield (a, b, c, d)

  private val sample: List[(String, Long, Int)] =
    Gen.listOfN(300, for {
      q <- addrGen
      p <- Gen.choose(0, 32)
    } yield q -> p).pureApply(Gen.Parameters.default, Seed(7L))
      .map { case ((a, b, c, d), p) =>
        (s"$a.$b.$c.$d", ((a.toLong * 256 + b) * 256 + c) * 256 + d, p)
      }

  test("ipv4: parse/format round-trip and mask containment on 300 random addresses") {
    val df = sample.toDF("ip", "expected", "pfx")
    val reg = Map("T" -> df)
    val out = KqlParser.run(
      "T | extend got = parse_ipv4(ip), back = format_ipv4(parse_ipv4(ip)), " +
        "masked = parse_ipv4_mask(ip, pfx), " +
        "inown = ipv4_is_in_range(ip, strcat(format_ipv4(parse_ipv4_mask(ip, pfx)), '/', tostring(pfx))), " +
        "selfcmp = ipv4_compare(ip, ip)", reg).collect()
    out.foreach { r =>
      val (ip, expected) = (r.getAs[String]("ip"), r.getAs[Long]("expected"))
      assert(r.getAs[Long]("got") == expected, s"parse($ip)")
      assert(r.getAs[String]("back") == ip, s"format(parse($ip))")
      val (pfx, masked) = (r.getAs[Int]("pfx"), r.getAs[Long]("masked"))
      // mask zeroes the low 32-p bits and preserves the top p bits
      assert((masked & ((1L << (32 - pfx)) - 1)) == 0L, s"mask($ip, $pfx) low bits")
      assert((expected >> (32 - pfx)) == (masked >> (32 - pfx)), s"mask($ip, $pfx)")
      // every address is inside its own network, and equal to itself
      assert(r.getAs[Boolean]("inown"), s"$ip !in its own /$pfx")
      assert(r.getAs[Int]("selfcmp") == 0)
    }
  }
}
