package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the H3 core (pure JVM, no Spark session;
  * deterministic seed — the same 400 cases every run): token decode
  * inverts encode field-for-field, the center stays within the cell's
  * circumradius and re-encodes to the cell or a direct neighbor (an
  * edge cell's planar center can belong to the adjacent face — the
  * documented convention), parent/level laws hold along the
  * coarsening chain, and neighbors/rings keep their structural
  * invariants on arbitrary points including face edges and poles. */
class H3PropertySpec extends AnyFunSuite {

  private def u(s: String): UTF8String = UTF8String.fromString(s)
  private def tok(lon: Double, lat: Double, res: Int): String =
    H3.cellToken(lon, lat, res).toString
  private def neighbors(t: String): Seq[String] = {
    val a = H3.neighborsOf(u(t))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  private val cases: List[(Double, Double, Int)] =
    Gen.listOfN(400, for {
      // lat via uniform sin(lat) (area-uniform on the sphere), plus a
      // bias toward face-edge hotspots: the equator seam (lon 0) and
      // the poles
      lon <- Gen.frequency(
        5 -> Gen.chooseNum(-180.0, 180.0),
        1 -> Gen.chooseNum(-0.01, 0.01))
      sinLat <- Gen.chooseNum(-1.0, 1.0)
      lat0 = math.toDegrees(math.asin(sinLat))
      lat <- Gen.frequency(5 -> Gen.const(lat0),
        1 -> Gen.oneOf(89.999, -89.999, 90.0, -90.0))
      res <- Gen.chooseNum(1, 10)
    } yield (lon, lat, res))
      .pureApply(Gen.Parameters.default, Seed(29L))

  test("h3 property: decode inverts encode; re-pack is the identity") {
    cases.foreach { case (lon, lat, res) =>
      val t = tok(lon, lat, res)
      val d = H3.decode(u(t))
      assert(d != null, s"($lon, $lat, $res) produced undecodable $t")
      assert(d(0) == res, s"res field of $t")
      assert(d(1) >= 0 && d(1) < 20, s"face field of $t")
      assert(java.lang.Long.toHexString(
        H3.pack(d(0).toInt, d(1).toInt, d(2), d(3))) == t, s"re-pack of $t")
    }
  }

  test("h3 property: center within circumradius; re-encodes to cell or neighbor") {
    cases.foreach { case (lon, lat, res) =>
      val t = tok(lon, lat, res)
      val c = H3.centerOf(u(t))
      val (clon, clat) = (c.getDouble(0), c.getDouble(1))
      // the generating POINT is within one circumradius of the center
      // (gnomonic is distance-expanding; cube rounding picks a center
      // within the planar circumradius)
      val dLat = math.toRadians(clat - lat)
      val dLon = math.toRadians(clon - lon)
      val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
        math.cos(math.toRadians(lat)) * math.cos(math.toRadians(clat)) *
          math.sin(dLon / 2) * math.sin(dLon / 2)
      val distRad = 2.0 * math.asin(math.min(1.0, math.sqrt(a)))
      assert(distRad <= H3.sizeAt(res) * 1.0000001,
        s"($lon, $lat) res $res: point $distRad rad from center of $t")
      // the center itself re-encodes to the cell or, for edge cells
      // whose planar center belongs to an adjacent face (including the
      // 5-face icosahedron vertices, where the wrap geometry twists
      // beyond the axial neighborhood), to a cell whose center stays
      // within two circumradii — the locality contract
      val back = tok(clon, clat, res)
      if (back != t) {
        val bc = H3.centerOf(u(back))
        val bLat = math.toRadians(bc.getDouble(1) - clat)
        val bLon = math.toRadians(bc.getDouble(0) - clon)
        val ba = math.sin(bLat / 2) * math.sin(bLat / 2) +
          math.cos(math.toRadians(clat)) * math.cos(math.toRadians(bc.getDouble(1))) *
            math.sin(bLon / 2) * math.sin(bLon / 2)
        val bd = 2.0 * math.asin(math.min(1.0, math.sqrt(ba)))
        assert(bd <= 2.0 * H3.sizeAt(res),
          s"center of $t re-encoded to non-local $back ($bd rad)")
      }
    }
  }

  test("h3 property: parent/level laws along the coarsening chain") {
    cases.foreach { case (lon, lat, res) =>
      val t = tok(lon, lat, res)
      assert(H3.levelOf(u(t)) == res)
      val p = H3.parentOf(u(t), res - 1)
      assert(p != null && H3.levelOf(p) == res - 1, s"parent of $t")
      // self-parent at own res re-encodes the center: the identity for
      // interior cells, the center's owning cell for edge cells —
      // either way it decodes at the same res
      assert(H3.levelOf(H3.parentOf(u(t), res)) == res)
      // finer-than-cell res is rejected with null
      if (res < H3.MaxRes) assert(H3.parentOf(u(t), res + 1) == null)
      // the chain reaches res 0 with monotone levels
      var cur = u(t.toString)
      var r = res
      while (r > 0) {
        cur = UTF8String.fromString(H3.parentOf(cur, r - 1).toString)
        r -= 1
        assert(H3.levelOf(cur) == r)
      }
    }
  }

  test("h3 property: neighbor and ring invariants on arbitrary cells") {
    cases.foreach { case (lon, lat, res) =>
      val t = tok(lon, lat, res)
      val nb = neighbors(t)
      assert(nb.nonEmpty && nb.size <= 6 && nb.distinct.size == nb.size &&
        !nb.contains(t), s"neighbors of $t: $nb")
      nb.foreach(x => assert(H3.decode(u(x)) != null && H3.levelOf(u(x)) == res))
      val ringsArr = H3.ringsOf(u(t), 2)
      val rings = (0 until ringsArr.numElements()).map { k =>
        val rk = ringsArr.getArray(k)
        (0 until rk.numElements()).map(i => rk.getUTF8String(i).toString)
      }
      assert(rings.size == 3 && rings(1).size <= 6 && rings(2).size <= 12)
      val all = rings.flatten
      assert(all.distinct.size == all.size, s"rings of $t overlap")
      // ring 1 and the neighbor set agree modulo ring 0: ringsOf seeds
      // its dedupe with the RE-ENCODED center (for edge cells a
      // different cell than t, which then cannot reappear in ring 1)
      assert(rings(1).toSet.subsetOf(nb.toSet), s"ring 1 of $t !<= neighbors")
      assert((nb.toSet -- rings(1).toSet).subsetOf(rings(0).toSet),
        s"neighbors of $t missing from ring 1 beyond the ring-0 seed")
    }
  }
}
