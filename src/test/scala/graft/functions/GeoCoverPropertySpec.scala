package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the polygon/line cell covers (pure JVM,
  * deterministic seed): COMPLETENESS — every sampled interior point's
  * cell is in the polygon cover, and every on-line point's cell is in
  * the line cover — over randomized triangles/quads and polylines at
  * levels 4..7, including geometries straddling the lon=45° face
  * boundary so the cross-face wrap path executes inside covers. */
class GeoCoverPropertySpec extends AnyFunSuite {

  private def ring(pts: Seq[(Double, Double)]): GenericArrayData =
    new GenericArrayData((pts :+ pts.head)
      .map(p => new GenericArrayData(Array[Any](p._1, p._2)): Any).toArray)

  private def line(pts: Seq[(Double, Double)]): GenericArrayData =
    new GenericArrayData(pts
      .map(p => new GenericArrayData(Array[Any](p._1, p._2)): Any).toArray)

  private def tokens(a: org.apache.spark.sql.catalyst.util.ArrayData): Set[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toSet

  // even-odd, the engine's convention
  private def inside(pts: Seq[(Double, Double)], px: Double, py: Double): Boolean = {
    val closed = pts :+ pts.head
    var c = false
    for (e <- 0 until closed.length - 1) {
      val ((x1, y1), (x2, y2)) = (closed(e), closed(e + 1))
      if ((y1 > py) != (y2 > py) && px < x1 + (x2 - x1) * (py - y1) / (y2 - y1))
        c = !c
    }
    c
  }

  // random triangles/quads around a random center — half the centers
  // sit near the lon=45 face-0/face-1 boundary
  private val genPoly: Gen[(Seq[(Double, Double)], Int)] = for {
    cx <- Gen.oneOf(Gen.chooseNum(-20.0, 20.0), Gen.chooseNum(42.0, 48.0))
    cy <- Gen.chooseNum(-35.0, 35.0)
    n <- Gen.oneOf(3, 4)
    rs <- Gen.containerOfN[Seq, Double](n, Gen.chooseNum(0.5, 4.0))
    rot <- Gen.chooseNum(0.0, math.Pi / 2)
    lvl <- Gen.chooseNum(4, 7)
  } yield {
    val pts = rs.zipWithIndex.map { case (r, i) =>
      val a = rot + 2 * math.Pi * i / n
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
    (pts, lvl)
  }

  private val polys: List[(Seq[(Double, Double)], Int)] =
    Gen.listOfN(25, genPoly).pureApply(Gen.Parameters.default, Seed(29L))

  test("polygon cover: every sampled interior point's cell is covered (random rings, cross-face)") {
    var checkedTotal = 0
    polys.foreach { case (pts, lvl) =>
      val cover = S2.polygonCover(ring(pts), lvl)
      assert(cover != null, s"cover failed for $pts")
      val toks = tokens(cover)
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      var g = 99L
      for (_ <- 1 to 400) {
        g = g * 6364136223846793005L + 1442695040888963407L
        val fx = (g >>> 11).toDouble / (1L << 53).toDouble
        g = g * 6364136223846793005L + 1442695040888963407L
        val fy = (g >>> 11).toDouble / (1L << 53).toDouble
        val px = xs.min + (xs.max - xs.min) * fx
        val py = ys.min + (ys.max - ys.min) * fy
        if (inside(pts, px, py)) {
          checkedTotal += 1
          val tok = S2.cellToken(px, py, lvl).toString
          assert(toks.contains(tok),
            s"interior ($px, $py) cell $tok missing from level-$lvl cover of $pts")
        }
      }
    }
    assert(checkedTotal > 2000, s"sweep must hit interiors, got $checkedTotal")
  }

  test("line cover: every on-line point's cell is covered (random polylines, cross-face)") {
    val lines = Gen.listOfN(25, for {
      cx <- Gen.oneOf(Gen.chooseNum(-20.0, 20.0), Gen.chooseNum(42.0, 48.0))
      cy <- Gen.chooseNum(-35.0, 35.0)
      n <- Gen.chooseNum(2, 5)
      dxs <- Gen.containerOfN[Seq, Double](n, Gen.chooseNum(-5.0, 5.0))
      dys <- Gen.containerOfN[Seq, Double](n, Gen.chooseNum(-5.0, 5.0))
      lvl <- Gen.chooseNum(4, 7)
    } yield (dxs.zip(dys).scanLeft((cx, cy)) { case ((x, y), (dx, dy)) =>
      (x + dx, y + dy) }, lvl))
      .pureApply(Gen.Parameters.default, Seed(31L))
    lines.foreach { case (pts0, lvl) =>
      // clamp into valid coordinate space
      val pts = pts0.map { case (x, y) =>
        (math.max(-179.0, math.min(179.0, x)), math.max(-80.0, math.min(80.0, y))) }
      val cover = S2.lineCover(line(pts), lvl)
      assert(cover != null, s"line cover failed for $pts")
      val toks = tokens(cover)
      for (e <- 0 until pts.length - 1; s <- 0 to 200) {
        val t = s / 200.0
        val px = pts(e)._1 + (pts(e + 1)._1 - pts(e)._1) * t
        val py = pts(e)._2 + (pts(e + 1)._2 - pts(e)._2) * t
        val tok = S2.cellToken(px, py, lvl).toString
        assert(toks.contains(tok),
          s"on-line ($px, $py) cell $tok missing from level-$lvl cover")
      }
    }
  }
}
