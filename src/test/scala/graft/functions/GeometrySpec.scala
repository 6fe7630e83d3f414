package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Direct kernel pins for the [[Geom]] geometry tier: buffers,
  * Douglas–Peucker simplify, line∩polygon clipping, and the
  * Greiner–Hormann boolean core (intersection/union), ahead of the
  * parser-level oracles (degree-scale shapes near the equator so the
  * meter scales stay intuitive: 1° ≈ 111 km). */
class GeometrySpec extends AnyFunSuite {

  private def ring(pts: (Double, Double)*): Array[Array[Double]] =
    pts.map { case (x, y) => Array(x, y) }.toArray

  private def area(r: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- r.indices) {
      val j = (i + 1) % r.length
      s += r(i)(0) * r(j)(1) - r(j)(0) * r(i)(1)
    }
    math.abs(s / 2.0)
  }

  test("pointBuffer: n-gon polygon around the point; invalid inputs null") {
    val j = Geom.pointBufferJson(10.0, 0.0, 50000.0)
    assert(j != null)
    val s = j.toString
    assert(s.startsWith("""{"type":"Polygon""""))
    // 16 segments → 16 distinct vertices + closing point = 17 pairs
    assert(s.split("\\],\\[").length == 17)
    assert(Geom.pointBufferJson(10.0, 0.0, -1.0) == null)
    assert(Geom.pointBufferJson(200.0, 0.0, 1.0) == null)
    // r18 review: NaN/Infinity radius must null out, not crash in
    // round9 (NaN fails no <= 0 comparison)
    assert(Geom.pointBufferJson(10.0, 0.0, Double.NaN) == null)
    assert(Geom.pointBufferJson(10.0, 0.0, Double.PositiveInfinity) == null)
    assert(Geom.lineBufferJson(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)), Double.NaN, closed = false) == null)
  }

  test("simplify: spike collapse, detail retention, ring anchors") {
    // ~111 m spike at the middle vertex (0.001° of latitude)
    val line = ring((0, 0), (1, 0.001), (2, 0))
    val coarse = Geom.simplify(line, 1000.0, closed = false)
    assert(coarse.length == 2, "111 m deviation under a 1 km tolerance must drop")
    val fine = Geom.simplify(line, 10.0, closed = false)
    assert(fine.length == 3, "111 m deviation over a 10 m tolerance must stay")
    // zigzag: all vertices meaningful at small tolerance
    val zig = ring((0, 0), (1, 1), (2, 0), (3, 1), (4, 0))
    assert(Geom.simplify(zig, 10.0, closed = false).length == 5)
    assert(Geom.simplify(zig, 1e9, closed = false).length == 2)
    // closed ring: a square with one ~111 m dent vertex on an edge
    val sq = ring((0, 0), (1, 0.001), (2, 0), (2, 2), (0, 2))
    val rs = Geom.simplify(sq, 1000.0, closed = true)
    assert(rs.length == 4, s"dent must drop from the ring, got ${rs.length}")
  }

  test("clipLineToRing: crossing, inside, outside, double-crossing") {
    val sq = ring((0, 0), (4, 0), (4, 4), (0, 4))
    // horizontal line straight through
    val through = Geom.clipLineToRing(ring((-2, 2), (6, 2)), sq)
    assert(through.length == 1)
    assert(through.head.head.sameElements(Array(0.0, 2.0)) &&
      through.head.last.sameElements(Array(4.0, 2.0)))
    // wholly inside
    val in = Geom.clipLineToRing(ring((1, 1), (3, 3)), sq)
    assert(in.length == 1 && in.head.length == 2)
    // wholly outside
    assert(Geom.clipLineToRing(ring((10, 10), (12, 12)), sq).isEmpty)
    // W-shaped line dipping in and out → two kept runs
    val w = Geom.clipLineToRing(ring((-1, 1), (2, 1), (2, -1), (3, -1), (3, 1), (6, 1)), sq)
    assert(w.length == 2, s"expected 2 runs, got ${w.length}")
  }

  test("ghBool intersection/union: overlap, disjoint, containment") {
    val a = ring((0, 0), (4, 0), (4, 4), (0, 4))
    val b = ring((2, 2), (6, 2), (6, 6), (2, 6))
    val i = Geom.ghBool(a, b, 'i')
    assert(i.length == 1)
    assert(math.abs(area(i.head) - 4.0) < 1e-9, s"2x2 overlap, got ${area(i.head)}")
    val u = Geom.ghBool(a, b, 'u')
    assert(u.length == 1)
    assert(math.abs(area(u.head) - 28.0) < 1e-9, s"16+16-4, got ${area(u.head)}")
    // disjoint
    val far = ring((10, 10), (12, 10), (12, 12), (10, 12))
    assert(Geom.ghBool(a, far, 'i').isEmpty)
    assert(Geom.ghBool(a, far, 'u').length == 2)
    // containment
    val inner = ring((1, 1), (2, 1), (2, 2), (1, 2))
    assert(area(Geom.ghBool(a, inner, 'i').head) == 1.0)
    assert(area(Geom.ghBool(a, inner, 'u').head) == 16.0)
    assert(area(Geom.ghBool(inner, a, 'i').head) == 1.0)
  }

  test("ghBool: non-convex dent intersection") {
    // a C-shape clipped by a square spanning the mouth → two components
    val c = ring((0, 0), (5, 0), (5, 1), (1, 1), (1, 3), (5, 3), (5, 4), (0, 4))
    val sq = ring((4, -1), (6, -1), (6, 5), (4, 5))
    val i = Geom.ghBool(c, sq, 'i')
    assert(i.length == 2, s"the C's two arms, got ${i.length}")
    assert(math.abs(i.map(area).sum - 2.0) < 1e-9)
  }

  test("ghBool inclusion-exclusion fuzz: area(i) + area(u) == area(a) + area(b)") {
    // deterministic LCG-driven polygon pairs — convex (star-sorted
    // random radii would be non-convex; we use jittered regular
    // n-gons, which stay simple) at random offsets, so the pair
    // sweeps disjoint / partial-overlap / containment regimes. The
    // boolean core must satisfy inclusion-exclusion exactly (holes
    // cannot occur for these shapes).
    var seed = 0x2545F4914F6CDD1DL
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 11).toDouble / (1L << 53).toDouble)
    }
    def poly(cx: Double, cy: Double, r: Double, n: Int, phase: Double) =
      Array.tabulate(n) { k =>
        val th = 2 * math.Pi * k / n + phase
        Array(cx + r * math.cos(th), cy + r * math.sin(th))
      }
    var checked = 0
    for (t <- 0 until 60) {
      val a = poly(0, 0, 1.0 + next(), 5 + (next() * 4).toInt, next())
      val b = poly(next() * 4 - 2, next() * 4 - 2, 0.5 + next(),
        5 + (next() * 4).toInt, next())
      val i = Geom.ghBool(a, b, 'i')
      val u = Geom.ghBool(a, b, 'u')
      assert(i != null && u != null, s"trial $t returned null")
      val lhs = i.map(area).sum + u.map(area).sum
      val rhs = area(a) + area(b)
      assert(math.abs(lhs - rhs) < 1e-9,
        s"trial $t: i+u = $lhs vs a+b = $rhs (ni=${i.length}, nu=${u.length})")
      checked += 1
    }
    assert(checked == 60)
  }

  test("clipLineToRing conservation: kept length never exceeds, inside-line exact") {
    val sq = ring((0, 0), (4, 0), (4, 4), (0, 4))
    def len(l: Array[Array[Double]]): Double =
      l.sliding(2).map { case Array(p, q) =>
        math.hypot(q(0) - p(0), q(1) - p(1)) }.sum
    var seed = 42L
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 11).toDouble / (1L << 53).toDouble)
    }
    for (t <- 0 until 40) {
      val line = Array.tabulate(4)(_ =>
        Array(next() * 8 - 2, next() * 8 - 2))
      val total = len(line)
      val kept = Geom.clipLineToRing(line, sq).map(len).sum
      assert(kept <= total + 1e-9, s"trial $t kept $kept > total $total")
    }
    // same conservation against a NON-CONVEX ring (the C-shape), plus
    // complementarity: clip against the C and against its bounding box
    // must keep no more than the box clip alone (C ⊂ box)
    val c = ring((0, 0), (5, 0), (5, 1), (1, 1), (1, 3), (5, 3), (5, 4), (0, 4))
    val box = ring((0, 0), (5, 0), (5, 4), (0, 4))
    for (t <- 0 until 40) {
      val line = Array.tabulate(4)(_ =>
        Array(next() * 9 - 2, next() * 8 - 2))
      val total = len(line)
      val keptC = Geom.clipLineToRing(line, c).map(len).sum
      val keptB = Geom.clipLineToRing(line, box).map(len).sum
      assert(keptC <= total + 1e-9, s"trial $t C-kept $keptC > total $total")
      assert(keptC <= keptB + 1e-9,
        s"trial $t C-kept $keptC > box-kept $keptB (C is a subset of the box)")
    }
  }

  test("unionRings: transitive merge of an overlapping chain") {
    // offset y-ranges so every pairwise seam is transversal (exact
    // shared edges are the boolean core's documented-undefined class)
    val r1 = ring((0, 0), (2, 0), (2, 2), (0, 2))
    val r2 = ring((1, -0.5), (3, -0.5), (3, 2.5), (1, 2.5))
    val r3 = ring((2.5, 0.1), (4, 0.1), (4, 1.9), (2.5, 1.9))
    val u = Geom.unionRings(Seq(r1, r3, r2))
    assert(u.length == 1, s"chain must merge, got ${u.length} components")
    // 2x2 + 2x3 + 1.5x1.8 minus overlaps 1x2 and 0.5x1.8
    val expect = 4.0 + 6.0 + 2.7 - 2.0 - 0.9
    assert(math.abs(area(u.head) - expect) < 1e-9, s"expected $expect, got ${area(u.head)}")
  }
}
