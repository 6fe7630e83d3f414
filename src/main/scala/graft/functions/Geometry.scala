package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Computational-geometry kernels behind the ADX buffer / simplify /
  * boolean-operation tier (`geo_point_buffer`, `geo_line_buffer`,
  * `geo_polygon_buffer`, `geo_line_simplify`, `geo_polygon_simplify`,
  * `geo_union_*`, `geo_intersection_2polygons`,
  * `geo_intersection_line_with_polygon`).
  *
  * Conventions (the repo's geo tier contract, documented deviations
  * from ADX's spherical geodesics):
  *  - PLANAR lon/lat-degree geometry under the equirectangular meter
  *    scale the distance tier uses: kx = 111320·cos(radians(latRef)),
  *    ky = 110574, latRef = the geometry's mean vertex latitude
  *    (seed-0 left-to-right fold — geoLineCentroidSql's convention);
  *  - simple polygons, outer ring only — holes produced by a boolean
  *    operation are DISCARDED (the engine-wide "holes unsupported"
  *    deviation), points exactly on an edge are undefined;
  *  - outputs are DETERMINISTIC: result rings are canonically rotated
  *    to start at their lexicographically smallest vertex, oriented
  *    counter-clockwise, rings sorted by first vertex, and every
  *    coordinate one-rounded to 9 dp;
  *  - kernels return GeoJSON TEXT (the caller wraps `parse_json`), so
  *    Point/Polygon/MultiPolygon/MultiLineString outputs share one
  *    surface. Null/degenerate input → null.
  *
  * All kernels are DIM-SIDE by design (geometries are lookup-table
  * rows or per-row shapes of bounded vertex count, like the cover
  * machinery): costs are O(n·m) per edge pair, never corpus-scale.
  */
object Geom {

  private val Ky = 110574.0
  private def kxAt(latRef: Double): Double =
    111320.0 * math.cos(math.toRadians(latRef))

  /** Mean vertex latitude, seed-0 left-to-right (the centroid tier's
    * fold convention). */
  private def meanLat(pts: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < pts.length) { s += pts(i)(1); i += 1 }
    s / pts.length
  }

  private def round9(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(9, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  // ---- GeoJSON text rendering -------------------------------------

  private def num(v: Double): String = {
    val r = round9(v)
    if (r == math.rint(r) && math.abs(r) < 1e15) r.toLong.toString
    else r.toString
  }

  private def ptJson(p: Array[Double]): String = s"[${num(p(0))},${num(p(1))}]"

  private def ringJson(r: Array[Array[Double]]): String =
    r.map(ptJson).mkString("[", ",", "]")

  def polygonJson(rings: Seq[Array[Array[Double]]]): String =
    if (rings.isEmpty) """{"type":"GeometryCollection","geometries":[]}"""
    else if (rings.length == 1)
      s"""{"type":"Polygon","coordinates":[${ringJson(rings.head)}]}"""
    else
      s"""{"type":"MultiPolygon","coordinates":[${
        rings.map(r => s"[${ringJson(r)}]").mkString(",")}]}"""

  /** Polygon JSON from an OPEN ring preserving the caller's vertex
    * order (simplify keeps the input's start/orientation) — the
    * closing point is re-appended here. */
  def polygonRawJson(open: Array[Array[Double]]): String =
    s"""{"type":"Polygon","coordinates":[${ringJson(open :+ open.head)}]}"""

  def multiLineJson(lines: Seq[Array[Array[Double]]]): String =
    if (lines.isEmpty) """{"type":"GeometryCollection","geometries":[]}"""
    else if (lines.length == 1)
      s"""{"type":"LineString","coordinates":${ringJson(lines.head)}}"""
    else
      s"""{"type":"MultiLineString","coordinates":[${
        lines.map(ringJson).mkString(",")}]}"""

  // ---- canonicalization -------------------------------------------

  private def ptLess(a: Array[Double], b: Array[Double]): Boolean =
    a(0) < b(0) || (a(0) == b(0) && a(1) < b(1))

  /** Signed area (shoelace) of an OPEN ring (no repeated last point). */
  private def signedArea(r: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < r.length) {
      val j = (i + 1) % r.length
      s += r(i)(0) * r(j)(1) - r(j)(0) * r(i)(1)
      i += 1
    }
    s / 2.0
  }

  /** Canonical CLOSED GeoJSON ring from an open vertex ring: 9-dp
    * rounding, consecutive-duplicate collapse, CCW orientation,
    * rotation to the lexicographic min vertex, closing point
    * appended. Degenerate (< 3 distinct vertices) → null. */
  private def canonRing(raw: Array[Array[Double]]): Array[Array[Double]] = {
    val rounded = raw.map(p => Array(round9(p(0)), round9(p(1))))
    val dedup = mutable.ArrayBuffer.empty[Array[Double]]
    rounded.foreach { p =>
      if (dedup.isEmpty ||
          dedup.last(0) != p(0) || dedup.last(1) != p(1)) dedup += p
    }
    while (dedup.length > 1 && dedup.head(0) == dedup.last(0) &&
           dedup.head(1) == dedup.last(1)) dedup.remove(dedup.length - 1)
    if (dedup.length < 3) return null
    var open = dedup.toArray
    if (signedArea(open) < 0) open = open.reverse
    var mi = 0
    var i = 1
    while (i < open.length) { if (ptLess(open(i), open(mi))) mi = i; i += 1 }
    val rot = new Array[Array[Double]](open.length + 1)
    i = 0
    while (i < open.length) { rot(i) = open((mi + i) % open.length); i += 1 }
    rot(open.length) = rot(0)
    rot
  }

  def canonRingsPublic(raw: Seq[Array[Array[Double]]]): Seq[Array[Array[Double]]] =
    if (raw == null) null else canonRings(raw)

  private def canonRings(raw: Seq[Array[Array[Double]]]): Seq[Array[Array[Double]]] =
    raw.map(canonRing).filter(_ != null)
      .sortWith((a, b) => ptLess(a(0), b(0)) ||
        (a(0)(0) == b(0)(0) && a(0)(1) == b(0)(1) && a.length < b.length))

  // ---- point-in-ring (even-odd, open ring) ------------------------

  private def insideRing(x: Double, y: Double, r: Array[Array[Double]]): Boolean = {
    var in = false
    var i = 0
    while (i < r.length) {
      val j = (i + 1) % r.length
      val (x1, y1) = (r(i)(0), r(i)(1))
      val (x2, y2) = (r(j)(0), r(j)(1))
      if ((y1 > y) != (y2 > y) && x < x1 + (x2 - x1) * (y - y1) / (y2 - y1))
        in = !in
      i += 1
    }
    in
  }

  // ---- buffers ----------------------------------------------------

  val CircleSegments = 16

  /** n-gon circle around (lon, lat), radius meters, the point's own
    * latitude as the scale reference. Vertex k at angle 2π(k+½)/n —
    * the HALF-STEP offset keeps a circle vertex off the cardinal
    * directions, so the buffer union's circle-rectangle seams stay
    * transversal (the boolean core's degenerate vertex-on-edge class
    * is documented undefined). */
  def pointBufferRing(lon: Double, lat: Double, radiusM: Double): Array[Array[Double]] = {
    val kx = kxAt(lat)
    Array.tabulate(CircleSegments) { k =>
      val th = 2.0 * math.Pi * (k + 0.5) / CircleSegments
      Array(lon + radiusM * math.cos(th) / kx, lat + radiusM * math.sin(th) / Ky)
    }
  }

  def pointBufferJson(lon: Double, lat: Double, radiusM: Double): UTF8String =
    if (!(radiusM > 0) || radiusM.isInfinite || lon.isNaN || lat.isNaN ||
        math.abs(lon) > 180 || math.abs(lat) > 90) null
    else UTF8String.fromString(
      polygonJson(canonRings(Seq(pointBufferRing(lon, lat, radiusM)))))

  /** Oriented rectangle around segment AB dilated by r meters (in the
    * shared latRef scale), plus nothing else — endpoint circles come
    * from the caller's union. The rectangle is EXTENDED lengthwise by
    * r·10⁻⁶ m at both ends: without it, a rect's end edges coincide
    * exactly with the buffered ring's own edges (and with a sibling
    * rect's), putting every seam in the boolean core's
    * degenerate-overlap class and breaking the union merge; the
    * ε-extension makes every seam transversal at a sub-millimeter
    * shape cost (deterministic, documented approximation). */
  private def segmentRect(a: Array[Double], b: Array[Double], rM: Double,
                          kx: Double): Array[Array[Double]] = {
    val ax0 = a(0) * kx; val ay0 = a(1) * Ky
    val bx0 = b(0) * kx; val by0 = b(1) * Ky
    val dx = bx0 - ax0; val dy = by0 - ay0
    val len = math.sqrt(dx * dx + dy * dy)
    if (len == 0) return null
    val eps = rM * 1e-6
    val ux = dx / len; val uy = dy / len
    val ax = ax0 - ux * eps; val ay = ay0 - uy * eps
    val bx = bx0 + ux * eps; val by = by0 + uy * eps
    val nx = -uy * rM; val ny = ux * rM
    Array(
      Array((ax + nx) / kx, (ay + ny) / Ky),
      Array((bx + nx) / kx, (by + ny) / Ky),
      Array((bx - nx) / kx, (by - ny) / Ky),
      Array((ax - nx) / kx, (ay - ny) / Ky))
  }

  /** Buffer of a polyline (closed = polygon buffer includes the ring
    * itself): union of per-segment rectangles, per-vertex circles,
    * and — when closed — the original ring. */
  def lineBufferJson(ptsArr0: Array[Array[Double]], radiusM: Double,
                     closed: Boolean): UTF8String = {
    if (ptsArr0 == null || ptsArr0.length < (if (closed) 3 else 2) ||
        !(radiusM > 0) || radiusM.isInfinite)
      return null
    // drop exactly-collinear interior vertices first (tolerance-0
    // Douglas–Peucker): a collinear vertex makes two sibling rects
    // collinear-overlapping — the degenerate class the ε-extension
    // can't fix — and contributes nothing to the buffer shape
    val ptsArr = simplify(ptsArr0, 0.0, closed)
    if (ptsArr == null || ptsArr.length < (if (closed) 3 else 2)) return null
    val latRef = meanLat(ptsArr)
    val kx = kxAt(latRef)
    val shapes = mutable.ArrayBuffer.empty[Array[Array[Double]]]
    if (closed) shapes += ptsArr
    val n = if (closed) ptsArr.length else ptsArr.length - 1
    var i = 0
    while (i < n) {
      val a = ptsArr(i)
      val b = ptsArr((i + 1) % ptsArr.length)
      val rect = segmentRect(a, b, radiusM, kx)
      if (rect != null) shapes += rect
      i += 1
    }
    ptsArr.foreach { p =>
      shapes += Array.tabulate(CircleSegments) { k =>
        val th = 2.0 * math.Pi * (k + 0.5) / CircleSegments
        Array(p(0) + radiusM * math.cos(th) / kx, p(1) + radiusM * math.sin(th) / Ky)
      }
    }
    UTF8String.fromString(polygonJson(canonRings(unionRings(shapes.toSeq))))
  }

  // ---- Douglas–Peucker simplify -----------------------------------

  /** Point-to-SEGMENT meter distance in the latRef scale (the clamped
    * projection kernel the distance tier uses). */
  private def segDist(px: Double, py: Double, ax: Double, ay: Double,
                      bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val den = dx * dx + dy * dy
    val t = if (den == 0) 0.0
            else math.min(1.0, math.max(0.0, ((px - ax) * dx + (py - ay) * dy) / den))
    val ex = px - ax - t * dx; val ey = py - ay - t * dy
    math.sqrt(ex * ex + ey * ey)
  }

  /** Douglas–Peucker over the meter-scaled vertices: keep endpoints;
    * recursively keep the farthest vertex of any span whose deviation
    * exceeds tolM. Iterative explicit stack, processed in deterministic
    * (leftmost-span-first) order. Closed rings anchor at vertex 0 and
    * the ring's farthest vertex from it (the standard ring split). */
  def simplify(ptsArr: Array[Array[Double]], tolM: Double,
               closed: Boolean): Array[Array[Double]] = {
    if (ptsArr == null || tolM < 0) return null
    if (ptsArr.length < 3) return ptsArr
    val latRef = meanLat(ptsArr)
    val kx = kxAt(latRef)
    val xs = ptsArr.map(p => p(0) * kx)
    val ys = ptsArr.map(p => p(1) * Ky)
    val n = ptsArr.length
    val keep = new Array[Boolean](n)
    def dp(i0: Int, j0: Int): Unit = {
      val stack = mutable.Stack((i0, j0))
      keep(i0) = true; keep(j0) = true
      while (stack.nonEmpty) {
        val (i, j) = stack.pop()
        if (j - i >= 2) {
          var best = -1.0
          var bi = -1
          var k = i + 1
          while (k < j) {
            val d = segDist(xs(k), ys(k), xs(i), ys(i), xs(j), ys(j))
            if (d > best) { best = d; bi = k }
            k += 1
          }
          if (best > tolM) {
            keep(bi) = true
            stack.push((bi, j))
            stack.push((i, bi))
          }
        }
      }
    }
    if (!closed) dp(0, n - 1)
    else {
      // ring anchors: vertex 0 and the vertex farthest from it
      var far = 1
      var bestD = -1.0
      var k = 1
      while (k < n) {
        val dx = xs(k) - xs(0); val dy = ys(k) - ys(0)
        val d = dx * dx + dy * dy
        if (d > bestD) { bestD = d; far = k }
        k += 1
      }
      dp(0, far)
      // second arc: far..n-1..0 — relabel as a contiguous span by
      // walking the tail plus the wrap vertex
      val tail = (far to (n - 1)).toArray :+ 0
      val txs = tail.map(xs); val tys = tail.map(ys)
      val tkeep = new Array[Boolean](tail.length)
      val stack = mutable.Stack((0, tail.length - 1))
      tkeep(0) = true; tkeep(tail.length - 1) = true
      while (stack.nonEmpty) {
        val (i, j) = stack.pop()
        if (j - i >= 2) {
          var best = -1.0
          var bi = -1
          var k2 = i + 1
          while (k2 < j) {
            val d = segDist(txs(k2), tys(k2), txs(i), tys(i), txs(j), tys(j))
            if (d > best) { best = d; bi = k2 }
            k2 += 1
          }
          if (best > tolM) {
            tkeep(bi) = true
            stack.push((bi, j))
            stack.push((i, bi))
          }
        }
      }
      var t = 0
      while (t < tail.length) { if (tkeep(t)) keep(tail(t)) = true; t += 1 }
    }
    ptsArr.indices.filter(keep).map(ptsArr).toArray
  }

  // ---- segment intersection core ----------------------------------

  /** Proper-crossing parameter of AB×CD, or NaN when parallel or the
    * crossing falls outside either OPEN segment interior's closure.
    * Touching endpoints count (t/u in [0,1]). */
  private def crossParam(ax: Double, ay: Double, bx: Double, by: Double,
                         cx: Double, cy: Double, dx: Double, dy: Double): Double = {
    val den = (bx - ax) * (dy - cy) - (by - ay) * (dx - cx)
    if (den == 0) return Double.NaN
    val t = ((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx)) / den
    val u = ((cx - ax) * (by - ay) - (cy - ay) * (bx - ax)) / den
    if (t < 0 || t > 1 || u < 0 || u > 1) Double.NaN else t
  }

  // ---- line ∩ polygon ---------------------------------------------

  /** Clip a polyline to a ring's interior (even-odd): per segment,
    * collect every edge-crossing parameter, midpoint-test each
    * sub-interval, keep the inside runs, stitch adjacent kept runs
    * into maximal sub-lines. */
  def clipLineToRing(line: Array[Array[Double]],
                     ring: Array[Array[Double]]): Seq[Array[Array[Double]]] = {
    if (line == null || ring == null || line.length < 2 || ring.length < 3)
      return null
    val out = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Array[Double]]]
    var current: mutable.ArrayBuffer[Array[Double]] = null
    def emit(p: Array[Double]): Unit = {
      if (current == null) {
        current = mutable.ArrayBuffer(p)
        out += current
      } else {
        val l = current.last
        if (l(0) != p(0) || l(1) != p(1)) current += p
      }
    }
    var i = 0
    while (i < line.length - 1) {
      val a = line(i); val b = line(i + 1)
      val ts = mutable.ArrayBuffer(0.0, 1.0)
      var e = 0
      while (e < ring.length) {
        val c = ring(e); val d = ring((e + 1) % ring.length)
        val t = crossParam(a(0), a(1), b(0), b(1), c(0), c(1), d(0), d(1))
        if (!t.isNaN) ts += t
        e += 1
      }
      val sorted = ts.distinct.sorted
      var s = 0
      while (s < sorted.length - 1) {
        val t0 = sorted(s); val t1 = sorted(s + 1)
        val mx = a(0) + (t0 + t1) / 2 * (b(0) - a(0))
        val my = a(1) + (t0 + t1) / 2 * (b(1) - a(1))
        if (insideRing(mx, my, ring)) {
          // an inside sub-interval extends the open run (emit dedupes
          // the shared boundary point) or starts a new one
          emit(Array(a(0) + t0 * (b(0) - a(0)), a(1) + t0 * (b(1) - a(1))))
          emit(Array(a(0) + t1 * (b(0) - a(0)), a(1) + t1 * (b(1) - a(1))))
        } else current = null
        s += 1
      }
      i += 1
    }
    out.toSeq.map(_.toArray).filter(_.length >= 2)
      .map(_.map(p => Array(round9(p(0)), round9(p(1)))))
  }

  // ---- polygon boolean core (Greiner–Hormann, simple rings) -------

  private final class GV(val x: Double, val y: Double) {
    var next: GV = _
    var prev: GV = _
    var isIntersection = false
    var entry = false
    var neighbor: GV = _
    var alpha = 0.0
    var visited = false
  }

  private def buildList(r: Array[Array[Double]]): GV = {
    var head: GV = null
    var tail: GV = null
    r.foreach { p =>
      val v = new GV(p(0), p(1))
      if (head == null) { head = v; v.next = v; v.prev = v }
      else { v.prev = tail; v.next = head; tail.next = v; head.prev = v }
      tail = v
    }
    head
  }

  /** Greiner–Hormann boolean of two SIMPLE rings.
    * mode: 'i' = intersection, 'u' = union. Holes discarded.
    * Degenerate configurations (shared vertices, edge overlap) are
    * undefined — the engine-wide edge-points convention. */
  def ghBool(aRing: Array[Array[Double]], bRing: Array[Array[Double]],
             mode: Char): Seq[Array[Array[Double]]] = {
    if (aRing == null || bRing == null || aRing.length < 3 || bRing.length < 3)
      return null
    val a = buildList(aRing)
    val b = buildList(bRing)
    // phase 1: pairwise proper intersections inserted into both lists
    var inserted = 0
    var av = a
    do {
      val an = {
        var n = av.next
        while (n.isIntersection) n = n.next
        n
      }
      var bv = b
      do {
        val bn = {
          var n = bv.next
          while (n.isIntersection) n = n.next
          n
        }
        if (!av.isIntersection && !bv.isIntersection) {
          val den = (an.x - av.x) * (bn.y - bv.y) - (an.y - av.y) * (bn.x - bv.x)
          if (den != 0) {
            val t = ((bv.x - av.x) * (bn.y - bv.y) - (bv.y - av.y) * (bn.x - bv.x)) / den
            val u = ((bv.x - av.x) * (an.y - av.y) - (bv.y - av.y) * (an.x - av.x)) / den
            if (t > 0 && t < 1 && u > 0 && u < 1) {
              val ix = av.x + t * (an.x - av.x)
              val iy = av.y + t * (an.y - av.y)
              val va = new GV(ix, iy)
              val vb = new GV(ix, iy)
              va.isIntersection = true; vb.isIntersection = true
              va.neighbor = vb; vb.neighbor = va
              va.alpha = t; vb.alpha = u
              // insert sorted by alpha among intersections on this edge
              var pa = av
              while (pa.next.isIntersection && pa.next.alpha < t) pa = pa.next
              va.next = pa.next; va.prev = pa
              pa.next.prev = va; pa.next = va
              var pb = bv
              while (pb.next.isIntersection && pb.next.alpha < u) pb = pb.next
              vb.next = pb.next; vb.prev = pb
              pb.next.prev = vb; pb.next = vb
              inserted += 1
            }
          }
        }
        bv = bn
      } while (bv ne b)
      av = an
    } while (av ne a)

    val aPts = aRing
    val bPts = bRing
    if (inserted == 0) {
      // disjoint or containment
      val aInB = insideRing(aPts(0)(0), aPts(0)(1), bPts)
      val bInA = insideRing(bPts(0)(0), bPts(0)(1), aPts)
      return mode match {
        case 'i' =>
          if (aInB) Seq(aPts) else if (bInA) Seq(bPts) else Seq.empty
        case 'u' =>
          if (aInB) Seq(bPts) else if (bInA) Seq(aPts) else Seq(aPts, bPts)
        case _ => Seq.empty
      }
    }
    // phase 2: entry/exit marking (even-odd): walk each list; an
    // intersection toggles the inside state seeded by the head's
    // midpoint-free inside test
    def mark(head: GV, other: Array[Array[Double]]): Unit = {
      var inside = insideRing(head.x, head.y, other)
      var v = head.next
      while (v ne head) {
        if (v.isIntersection) { v.entry = !inside; inside = !inside }
        v = v.next
      }
    }
    mark(a, bPts)
    mark(b, aPts)
    // phase 3: traversal
    val results = mutable.ArrayBuffer.empty[Array[Array[Double]]]
    def unvisited(): GV = {
      var v = a.next
      while (v ne a) {
        if (v.isIntersection && !v.visited) return v
        v = v.next
      }
      null
    }
    var start = unvisited()
    while (start != null) {
      val ring = mutable.ArrayBuffer.empty[Array[Double]]
      var cur = start
      do {
        cur.visited = true
        if (cur.neighbor != null) cur.neighbor.visited = true
        // union walks exits forward / entries backward; intersection
        // the reverse
        val forward = if (mode == 'i') cur.entry else !cur.entry
        ring += Array(cur.x, cur.y)
        var v = cur
        var guard = 0
        do {
          v = if (forward) v.next else v.prev
          ring += Array(v.x, v.y)
          guard += 1
        } while (!v.isIntersection && guard < 100000)
        cur = v.neighbor
      } while ((cur ne start) && (cur.neighbor ne start) && ring.length < 100000)
      if (ring.length >= 3) results += ring.toArray
      start = unvisited()
    }
    // holes discarded: for intersection keep all traversed rings (they
    // are disjoint regions); for union keep only the OUTER boundary
    // rings — a traversed ring strictly inside another is a hole
    val rs = results.toSeq
    if (mode == 'u' && rs.length > 1) {
      rs.filter { r =>
        !rs.exists(o => (o ne r) && insideRing(r(0)(0), r(0)(1), o))
      }
    } else rs
  }

  /** Union of many rings: fold each ring into a set of DISJOINT
    * result components, merging transitively-overlapping components
    * via pairwise [[ghBool]] union. */
  def unionRings(rings: Seq[Array[Array[Double]]]): Seq[Array[Array[Double]]] = {
    val comps = mutable.ArrayBuffer.empty[Array[Array[Double]]]
    rings.filter(r => r != null && r.length >= 3).foreach { ring =>
      var merged = ring
      var changed = true
      while (changed) {
        changed = false
        var i = 0
        while (i < comps.length && !changed) {
          val u = ghBool(comps(i), merged, 'u')
          if (u != null && u.length == 1) {
            merged = u.head
            comps.remove(i)
            changed = true
          }
          i += 1
        }
      }
      comps += merged
    }
    comps.toSeq
  }
}

/** [[Geom]]'s Catalyst adapters: ArrayData⇄Array conversion plus the
  * JSON-level entry points the `graft_geo_*` Expressions call. */
object GeomJson {

  /** GeoJSON coordinate ArrayData → vertex array; `dropClosing` strips
    * a duplicated ring-closing point. Null/NaN/short input → null. */
  def toPts(a: ArrayData, dropClosing: Boolean): Array[Array[Double]] = {
    if (a == null) return null
    val n = a.numElements()
    val out = mutable.ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val p = a.getArray(i)
      if (p == null || p.numElements() < 2 ||
          p.isNullAt(0) || p.isNullAt(1)) return null
      val x = p.getDouble(0); val y = p.getDouble(1)
      if (x.isNaN || y.isNaN) return null
      out += Array(x, y)
      i += 1
    }
    if (dropClosing && out.length > 1 &&
        out.head(0) == out.last(0) && out.head(1) == out.last(1))
      out.remove(out.length - 1)
    if (out.isEmpty) null else out.toArray
  }

  def lineBuffer(line: ArrayData, r: Double): UTF8String =
    Geom.lineBufferJson(toPts(line, dropClosing = false), r, closed = false)

  def polygonBuffer(ring: ArrayData, r: Double): UTF8String =
    Geom.lineBufferJson(toPts(ring, dropClosing = true), r, closed = true)

  def simplifyLine(line: ArrayData, tol: Double): UTF8String = {
    val pts = toPts(line, dropClosing = false)
    if (pts == null || pts.length < 2 || tol < 0) return null
    val s = Geom.simplify(pts, tol, closed = false)
    UTF8String.fromString(Geom.multiLineJson(Seq(s)))
  }

  def simplifyPolygon(ring: ArrayData, tol: Double): UTF8String = {
    val pts = toPts(ring, dropClosing = true)
    if (pts == null || pts.length < 3 || tol < 0) return null
    val s = Geom.simplify(pts, tol, closed = true)
    if (s.length < 3) return null
    UTF8String.fromString(Geom.polygonRawJson(s))
  }

  def clipLine(line: ArrayData, ring: ArrayData): UTF8String = {
    val l = toPts(line, dropClosing = false)
    val r = toPts(ring, dropClosing = true)
    if (l == null || r == null || l.length < 2 || r.length < 3) return null
    UTF8String.fromString(Geom.multiLineJson(Geom.clipLineToRing(l, r)))
  }

  def polyBool(a: ArrayData, b: ArrayData, mode: UTF8String): UTF8String = {
    val ra = toPts(a, dropClosing = true)
    val rb = toPts(b, dropClosing = true)
    if (ra == null || rb == null || ra.length < 3 || rb.length < 3) return null
    val m = mode.toString
    if (m != "i" && m != "u") return null
    UTF8String.fromString(Geom.polygonJson(Geom.canonRingsPublic(
      Geom.ghBool(ra, rb, m.head))))
  }

  def unionPolygons(rings: ArrayData): UTF8String = {
    if (rings == null || rings.numElements() == 0) return null
    val rs = mutable.ArrayBuffer.empty[Array[Array[Double]]]
    var i = 0
    while (i < rings.numElements()) {
      if (rings.isNullAt(i)) return null
      val r = toPts(rings.getArray(i), dropClosing = true)
      if (r == null || r.length < 3) return null
      rs += r
      i += 1
    }
    UTF8String.fromString(Geom.polygonJson(Geom.canonRingsPublic(
      Geom.unionRings(rs.toSeq))))
  }

  def unionLines(lines: ArrayData): UTF8String = {
    if (lines == null || lines.numElements() == 0) return null
    val ls = mutable.ArrayBuffer.empty[Array[Array[Double]]]
    var i = 0
    while (i < lines.numElements()) {
      if (lines.isNullAt(i)) return null
      val l = toPts(lines.getArray(i), dropClosing = false)
      if (l == null || l.length < 2) return null
      ls += l
      i += 1
    }
    UTF8String.fromString(Geom.multiLineJson(ls.toSeq))
  }
}

/** Shared type-check helpers for the geo Expressions. */
private[functions] object GeomTypes {
  val pts: DataType => Boolean = {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }
  val multi: DataType => Boolean = {
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  }
  def fail(name: String, sig: String, got: Seq[DataType]): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(
      s"$name expects $sig, got (${got.map(_.simpleString).mkString(", ")})")
}

/** `graft_geo_point_buffer(lon, lat, radiusM)` → Polygon GeoJSON text. */
case class GeoPointBufferExpr(first: Expression, second: Expression,
                              third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else GeomTypes.fail(prettyName, "(double, double, double)", children.map(_.dataType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geo_point_buffer"
  override def nullSafeEval(lon: Any, lat: Any, r: Any): Any =
    Geom.pointBufferJson(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      r.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
       |${ev.value} = graft.functions.Geom.pointBufferJson($a, $b, $c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** Binary geo Expression scaffold: (array-ish, double) → JSON text. */
abstract class GeomBinaryJson extends
    org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  def staticCall: String
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (GeomTypes.pts(left.dataType) && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else GeomTypes.fail(prettyName, "(array<array<double>>, double)",
      Seq(left.dataType, right.dataType))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = graft.functions.GeomJson.$staticCall($a, $b);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
}

case class GeoLineBufferExpr(left: Expression, right: Expression)
    extends GeomBinaryJson {
  override def staticCall: String = "lineBuffer"
  override def prettyName: String = "graft_geo_line_buffer"
  override def nullSafeEval(l: Any, r: Any): Any =
    GeomJson.lineBuffer(l.asInstanceOf[ArrayData], r.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class GeoPolygonBufferExpr(left: Expression, right: Expression)
    extends GeomBinaryJson {
  override def staticCall: String = "polygonBuffer"
  override def prettyName: String = "graft_geo_polygon_buffer"
  override def nullSafeEval(l: Any, r: Any): Any =
    GeomJson.polygonBuffer(l.asInstanceOf[ArrayData], r.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class GeoSimplifyLineExpr(left: Expression, right: Expression)
    extends GeomBinaryJson {
  override def staticCall: String = "simplifyLine"
  override def prettyName: String = "graft_geo_simplify_line"
  override def nullSafeEval(l: Any, r: Any): Any =
    GeomJson.simplifyLine(l.asInstanceOf[ArrayData], r.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class GeoSimplifyPolygonExpr(left: Expression, right: Expression)
    extends GeomBinaryJson {
  override def staticCall: String = "simplifyPolygon"
  override def prettyName: String = "graft_geo_simplify_polygon"
  override def nullSafeEval(l: Any, r: Any): Any =
    GeomJson.simplifyPolygon(l.asInstanceOf[ArrayData], r.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_geo_clip_line(lineCoords, ringCoords)` → LineString /
  * MultiLineString / empty GeometryCollection text. */
case class GeoClipLineExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geo_clip_line"
  override def checkInputDataTypes(): TypeCheckResult =
    if (GeomTypes.pts(left.dataType) && GeomTypes.pts(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else GeomTypes.fail(prettyName,
      "(array<array<double>>, array<array<double>>)",
      Seq(left.dataType, right.dataType))
  override def nullSafeEval(l: Any, r: Any): Any =
    GeomJson.clipLine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = graft.functions.GeomJson.clipLine($a, $b);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_geo_poly_bool(ringA, ringB, 'i'|'u')` → Polygon /
  * MultiPolygon / empty GeometryCollection text. */
case class GeoPolyBoolExpr(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geo_poly_bool"
  override def checkInputDataTypes(): TypeCheckResult =
    if (GeomTypes.pts(first.dataType) && GeomTypes.pts(second.dataType) &&
        third.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else GeomTypes.fail(prettyName,
      "(array<array<double>>, array<array<double>>, string)",
      children.map(_.dataType))
  override def nullSafeEval(a: Any, b: Any, m: Any): Any =
    GeomJson.polyBool(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
       |${ev.value} = graft.functions.GeomJson.polyBool($a, $b, $c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** `graft_geo_union_polys(rings)` → dissolved Polygon / MultiPolygon. */
case class GeoUnionPolygonsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geo_union_polys"
  override def checkInputDataTypes(): TypeCheckResult =
    if (GeomTypes.multi(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else GeomTypes.fail(prettyName, "(array<array<array<double>>>)",
      Seq(child.dataType))
  override def nullSafeEval(rs: Any): Any =
    GeomJson.unionPolygons(rs.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.GeomJson.unionPolygons($a);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_geo_union_lines(lines)` → LineString / MultiLineString
  * collection (no collinear dissolve — documented deviation). */
case class GeoUnionLinesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geo_union_lines"
  override def checkInputDataTypes(): TypeCheckResult =
    if (GeomTypes.multi(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else GeomTypes.fail(prettyName, "(array<array<array<double>>>)",
      Seq(child.dataType))
  override def nullSafeEval(ls: Any): Any =
    GeomJson.unionLines(ls.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.GeomJson.unionLines($a);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
