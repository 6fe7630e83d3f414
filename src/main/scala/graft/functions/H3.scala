package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** H3-style icosahedral hexagonal cell system (public H3 definitions —
  * h3geo.org: gnomonic projection onto the 20 faces of a regular
  * icosahedron, nearest-face-center face selection, a hexagonal
  * lattice per face, aperture-7 cell-count scaling per resolution).
  * The THIRD cell system over the repo's integer-exact cell-join
  * backbone, next to geohash (lat/lon rectangles — stretch toward the
  * poles) and S2 (cube faces — near-uniform): icosahedral hexes have
  * the lowest shape distortion of the three and 6-fold neighbor
  * symmetry (every in-lattice cell has exactly 6 touching neighbors,
  * vs 8 "neighbors" of a square of which 4 touch only at a corner).
  *
  * Documented deviations from Uber's reference cells (kept because
  * the cell key only needs to be a deterministic, locality-preserving
  * partition of the sphere — and these keep every step after one trig
  * chain oracle-expressible as exact IEEE arithmetic):
  *  - the token encodes (res, face, q, r) DIRECTLY — axial hex
  *    coordinates on the owning face — rather than H3's base-cell +
  *    aperture-7 digit path. Resolution still scales cell count by
  *    7x per level (size /= sqrt 7), but WITHOUT H3's inter-level
  *    Class II/III rotation: parent/child cells are not aligned,
  *    which this engine never relies on (joins are same-resolution).
  *  - face selection is nearest face CENTER (as real H3 does), with
  *    ties to the lowest face id; the face numbering is the sorted
  *    vertex-triple order of the canonical (0, ±1, ±φ)-cyclic
  *    icosahedron, not H3's base-cell numbering.
  *  - cells are planar hexagons in each face's gnomonic plane; cells
  *    near face edges are clipped by face ownership instead of H3's
  *    pentagon mechanism (H3 places 12 pentagons at icosahedron
  *    vertices; here a near-vertex cell simply has fewer distinct
  *    wrapped neighbors).
  *  - neighbors re-encode the neighbor cell's virtual center through
  *    xyz (cross-face wrap, same convention as the S2 tier): off-face
  *    steps land in whichever cell owns that direction, duplicates
  *    and self-collisions dedupe away, so edge cells may report < 6.
  *
  * Float contract (same class as the S2 tier): one trig chain
  * (cos/sin of lon/lat) feeds a chain of +,-,*,/ and sqrt — every op
  * correctly-rounded IEEE, mirrored op-for-op by the DuckDB oracle —
  * into ONE floor-based hex rounding per axis. A last-ulp libm
  * difference flips a cell only if the true point sits within an ulp
  * of a lattice boundary — measure-zero, and the oracle compare
  * verifies the actual corpus. Everything after the rounding is pure
  * integer arithmetic.
  */
object H3 {

  val MaxRes = 12   // |q|,|r| < 2^19 holds through res 12 (see pack)
  val DefaultRes = 6

  /** Res-0 hex circumradius in gnomonic-plane units (the face
    * circumradius is tan 37.377° ≈ 0.764, so res 0 is a handful of
    * cells per face); each resolution divides by sqrt 7. */
  val Size0 = 0.35
  private val Sqrt7 = math.sqrt(7.0)
  private val Sqrt3 = math.sqrt(3.0)

  private val Phi = (1.0 + math.sqrt(5.0)) / 2.0
  private val VNorm = math.sqrt(1.0 + Phi * Phi)

  /** The 12 icosahedron vertices (0, ±1, ±φ) cyclic, normalized. */
  private val verts: Array[Array[Double]] = Array(
    Array(0.0, 1.0, Phi), Array(0.0, 1.0, -Phi),
    Array(0.0, -1.0, Phi), Array(0.0, -1.0, -Phi),
    Array(1.0, Phi, 0.0), Array(1.0, -Phi, 0.0),
    Array(-1.0, Phi, 0.0), Array(-1.0, -Phi, 0.0),
    Array(Phi, 0.0, 1.0), Array(Phi, 0.0, -1.0),
    Array(-Phi, 0.0, 1.0), Array(-Phi, 0.0, -1.0)
  ).map(_.map(_ / VNorm))

  /** The 20 faces as vertex-id triples, in sorted-triple order — the
    * face numbering contract shared with the DuckDB oracle. */
  private val faceIdx: Array[(Int, Int, Int)] = Array(
    (0, 2, 8), (0, 2, 10), (0, 4, 6), (0, 4, 8), (0, 6, 10),
    (1, 3, 9), (1, 3, 11), (1, 4, 6), (1, 4, 9), (1, 6, 11),
    (2, 5, 7), (2, 5, 8), (2, 7, 10), (3, 5, 7), (3, 5, 9),
    (3, 7, 11), (4, 8, 9), (5, 8, 9), (6, 10, 11), (7, 10, 11))

  /** Per-face frame: center c (unit), in-plane orthonormal e1, e2
    * (e1 toward the face's first vertex, e2 = c × e1). Derivation
    * order mirrors the oracle SQL op-for-op. */
  private val frames: Array[Array[Double]] = faceIdx.map { case (a, b, cc) =>
    val va = verts(a); val vb = verts(b); val vc = verts(cc)
    val mx = va(0) + vb(0) + vc(0)
    val my = va(1) + vb(1) + vc(1)
    val mz = va(2) + vb(2) + vc(2)
    val mn = math.sqrt(mx * mx + my * my + mz * mz)
    val cx = mx / mn; val cy = my / mn; val cz = mz / mn
    val d = va(0) * cx + va(1) * cy + va(2) * cz
    val wx = va(0) - d * cx; val wy = va(1) - d * cy; val wz = va(2) - d * cz
    val wn = math.sqrt(wx * wx + wy * wy + wz * wz)
    val e1x = wx / wn; val e1y = wy / wn; val e1z = wz / wn
    val e2x = cy * e1z - cz * e1y
    val e2y = cz * e1x - cx * e1z
    val e2z = cx * e1y - cy * e1x
    Array(cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z)
  }

  /** Hex circumradius at `res` — repeated division, so a fixed-res
    * oracle mirrors it as a literal division chain. */
  def sizeAt(res: Int): Double = {
    var s = Size0
    var k = 0
    while (k < res) { s = s / Sqrt7; k += 1 }
    s
  }

  /** Nearest face center to direction (x, y, z); lowest id on ties. */
  def faceOf(x: Double, y: Double, z: Double): Int = {
    var best = Double.NegativeInfinity
    var bf = 0
    var f = 0
    while (f < 20) {
      val fr = frames(f)
      val d = x * fr(0) + y * fr(1) + z * fr(2)
      if (d > best) { best = d; bf = f }
      f += 1
    }
    bf
  }

  /** Cell value of direction (x, y, z) at `res`: gnomonic projection
    * onto the owning face's plane, pointy-top axial hex coordinates,
    * cube rounding, bit-packed with a leading marker (see [[pack]]). */
  def cellOfXYZ(x: Double, y: Double, z: Double, res: Int): Long = {
    val f = faceOf(x, y, z)
    val fr = frames(f)
    val pd = x * fr(0) + y * fr(1) + z * fr(2)
    val tx = x / pd - fr(0); val ty = y / pd - fr(1); val tz = z / pd - fr(2)
    val lx = tx * fr(3) + ty * fr(4) + tz * fr(5)
    val ly = tx * fr(6) + ty * fr(7) + tz * fr(8)
    val size = sizeAt(res)
    val qf = (Sqrt3 / 3.0 * lx - ly / 3.0) / size
    val rf = (2.0 / 3.0 * ly) / size
    // cube rounding: floor(v + 0.5) per axis, largest-error axis fixed
    // (strict >, so exact ties fix the r axis — the oracle's CASE order)
    val yf = -qf - rf
    var rq = math.floor(qf + 0.5)
    var ry = math.floor(yf + 0.5)
    var rr = math.floor(rf + 0.5)
    val dq = math.abs(rq - qf)
    val dy = math.abs(ry - yf)
    val dr = math.abs(rr - rf)
    if (dq > dy && dq > dr) rq = -ry - rr
    else if (dy > dr) ry = -rq - rr
    else rr = -rq - ry
    pack(res, f, rq.toLong, rr.toLong)
  }

  private val Off = 1L << 19

  /** marker(bit 49) | res(4b) | face(5b) | q+2^19 (20b) | r+2^19 (20b). */
  def pack(res: Int, face: Int, q: Long, r: Long): Long =
    (1L << 49) | (res.toLong << 45) | (face.toLong << 40) |
      ((q + Off) << 20) | (r + Off)

  /** Token of the res-`res` cell containing (lon, lat); null for
    * invalid coordinates (negated inside-tests so NaN nulls out) or
    * an out-of-range resolution. */
  def cellToken(lonDeg: Double, latDeg: Double, res: Int): UTF8String = {
    if (!(lonDeg >= -180.0 && lonDeg <= 180.0) ||
        !(latDeg >= -90.0 && latDeg <= 90.0) ||
        res < 0 || res > MaxRes) return null
    val lon = math.toRadians(lonDeg)
    val lat = math.toRadians(latDeg)
    val x = math.cos(lat) * math.cos(lon)
    val y = math.cos(lat) * math.sin(lon)
    val z = math.sin(lat)
    UTF8String.fromString(java.lang.Long.toHexString(cellOfXYZ(x, y, z, res)))
  }

  /** (res, face, q, r) from a token; null on malformed input (bad hex,
    * missing marker bit, res/face out of range). */
  def decode(token: UTF8String): Array[Long] = {
    if (token == null) return null
    val s = token.toString
    if (s.isEmpty || s.length > 13 || !s.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))) return null
    val v = java.lang.Long.parseLong(s, 16)
    if (v <= 0 || (64 - java.lang.Long.numberOfLeadingZeros(v)) != 50) return null
    val res = ((v >> 45) & 0xfL).toInt
    val face = ((v >> 40) & 0x1fL).toInt
    if (res > MaxRes || face >= 20) return null
    val q = ((v >> 20) & 0xfffffL) - Off
    val r = (v & 0xfffffL) - Off
    Array(res.toLong, face.toLong, q, r)
  }

  /** xyz of cell (face, q, r, res)'s planar center — the gnomonic
    * plane point c + x·e1 + y·e2 (NOT normalized; every consumer is
    * scale-invariant: atan2 ratios and the nearest-face argmax). */
  private def centerXYZ(face: Int, q: Long, r: Long, res: Int): Array[Double] = {
    val size = sizeAt(res)
    val px = size * (Sqrt3 * q + Sqrt3 / 2.0 * r)
    val py = size * (1.5 * r)
    val fr = frames(face)
    Array(fr(0) + px * fr(3) + py * fr(6),
      fr(1) + px * fr(4) + py * fr(7),
      fr(2) + px * fr(5) + py * fr(8))
  }

  /** Cell-center (lon°, lat°) — atan2 inversion, the same float class
    * as the S2/haversine tiers. */
  def centerOf(token: UTF8String): ArrayData = {
    val d = decode(token)
    if (d == null) return null
    val w = centerXYZ(d(1).toInt, d(2), d(3), d(0).toInt)
    new GenericArrayData(Array[Any](
      math.toDegrees(math.atan2(w(1), w(0))),
      math.toDegrees(math.atan2(w(2), math.sqrt(w(0) * w(0) + w(1) * w(1))))))
  }

  /** Hex boundary ring of a cell — the 6 planar corners (pointy-top:
    * circumradius `size` at angles 30° + 60°·k CCW, exact ±√3/2 / ±½
    * literals) projected through the same inverse-gnomonic atan2
    * chain as [[centerOf]], closing vertex repeated (7 points of
    * [lon°, lat°]). A cell straddling a face EDGE keeps its planar
    * hexagon from the OWNING face's plane (the clipped-edge-cell
    * convention — corners may land slightly off the true ownership
    * boundary, documented at the object header); null on malformed
    * input. */
  def boundaryOf(token: UTF8String): ArrayData = {
    val d = decode(token)
    if (d == null) return null
    val res = d(0).toInt
    val size = sizeAt(res)
    val px = size * (Sqrt3 * d(2) + Sqrt3 / 2.0 * d(3))
    val py = size * (1.5 * d(3))
    val fr = frames(d(1).toInt)
    val kxs = Array(Sqrt3 / 2.0, 0.0, -(Sqrt3 / 2.0), -(Sqrt3 / 2.0), 0.0, Sqrt3 / 2.0)
    val kys = Array(0.5, 1.0, 0.5, -0.5, -1.0, -0.5)
    val pts = new Array[Any](7)
    var k = 0
    while (k < 6) {
      val cx = px + size * kxs(k)
      val cy = py + size * kys(k)
      val wx = fr(0) + cx * fr(3) + cy * fr(6)
      val wy = fr(1) + cx * fr(4) + cy * fr(7)
      val wz = fr(2) + cx * fr(5) + cy * fr(8)
      pts(k) = new GenericArrayData(Array[Any](
        math.toDegrees(math.atan2(wy, wx)),
        math.toDegrees(math.atan2(wz, math.sqrt(wx * wx + wy * wy)))))
      k += 1
    }
    pts(6) = pts(0)
    new GenericArrayData(pts)
  }

  /** Resolution of a token (boxed so null propagates); null on
    * malformed input. */
  def levelOf(token: UTF8String): Any = {
    val d = decode(token)
    if (d == null) null else java.lang.Integer.valueOf(d(0).toInt)
  }

  /** Containing cell at coarser resolution `res`: the cell's planar
    * center re-encoded at `res` — the natural parent definition for a
    * direct (face, q, r) token system (this engine has no aperture-7
    * digit hierarchy, so parents are by CONTAINMENT OF THE CENTER, not
    * H3's aligned subdivision — documented deviation; [[childrenOf]]
    * is the exact inverse, by lattice search + parent check). Null on
    * malformed input or res outside 0..cell res. */
  def parentOf(token: UTF8String, res: Int): UTF8String = {
    val d = decode(token)
    if (d == null || res < 0 || res > d(0).toInt) return null
    val w = centerXYZ(d(1).toInt, d(2), d(3), d(0).toInt)
    UTF8String.fromString(
      java.lang.Long.toHexString(cellOfXYZ(w(0), w(1), w(2), res)))
  }

  /** Children of a cell at finer resolution `childRes`: every res-
    * `childRes` cell whose parent (by [[parentOf]]'s center-containment
    * convention) is this cell — the exact inverse of parent, so
    * `parentOf(child, res) == cell` holds for every emitted child BY
    * CONSTRUCTION. DEVIATION (same family as parent): this token
    * system has no aperture-7 digit hierarchy, so children are found
    * by CANDIDATE ENUMERATION + parent check, not digit append:
    *
    *  1. SAMPLE the parent's hex disk (radius size_p + 2·size_c, the
    *     covers' construction) on the parent's OWN face plane at
    *     step size_c/4 per axis — every sample is a real point, so
    *     every candidate is a PRODUCIBLE cell (the encode of a point);
    *  2. each sample encodes through xyz at `childRes` (cross-face
    *     wrap: samples in parts of the parent hex owned by an adjacent
    *     face land in that face's cells, the rings/neighbors
    *     convention), distinct candidates collected;
    *  3. a candidate is kept iff its OWN planar center re-encodes at
    *     the parent res to exactly this cell — so
    *     `parentOf(child) == cell` holds by construction.
    *
    * Completeness is the covers' conservative contract: a child whose
    * parent is this cell has its center inside the parent hex, so its
    * region overlaps the sampled disk and a size_c/4 grid sample lands
    * in it (an ownership-clipped sliver thinner than the step could
    * escape — the partition pin in GeoSpec sweeps the actual regime,
    * including face-straddling cells). Resolution gap capped at 4
    * (7⁴ ≈ 2.4k children, ~((8·7^gap)²) sample encodes at gap 4 —
    * dim-side by design, like the covers); larger gaps are rejected
    * loudly. `childRes == res` returns `[cell]` (Uber H3's
    * convention). Null on malformed input or childRes < res /
    * > MaxRes. */
  def childrenOf(token: UTF8String, childRes: Int): ArrayData = {
    val d = decode(token)
    if (d == null || childRes < d(0).toInt || childRes > MaxRes) return null
    val p = d(0).toInt
    val gap = childRes - p
    require(gap <= 4,
      s"geo_h3cell_children: resolution gap $gap exceeds 4 (7^gap children " +
        "— drill down level by level instead)")
    val face = d(1).toInt
    val self = pack(p, face, d(2), d(3))
    if (gap == 0)
      return new GenericArrayData(Array[Any](
        UTF8String.fromString(java.lang.Long.toHexString(self))))
    val sp = sizeAt(p)
    val sc = sizeAt(childRes)
    // parent planar center in its OWN face frame (the sampling origin)
    val px = sp * (Sqrt3 * d(2) + Sqrt3 / 2.0 * d(3))
    val py = sp * (1.5 * d(3))
    val fr = frames(face)
    val half = sp + 2.0 * sc
    val step = sc / 4.0
    val m = math.ceil(half / step).toInt
    // 1+2: sample grid → candidate cells (distinct)
    val cand = new java.util.TreeSet[java.lang.Long]()
    var i = -m
    while (i <= m) {
      val sx = px + i * step
      var j = -m
      while (j <= m) {
        val sy = py + j * step
        val x = fr(0) + sx * fr(3) + sy * fr(6)
        val y = fr(1) + sx * fr(4) + sy * fr(7)
        val z = fr(2) + sx * fr(5) + sy * fr(8)
        cand.add(cellOfXYZ(x, y, z, childRes)): Unit
        j += 1
      }
      i += 1
    }
    // 3: parent check on each distinct candidate's own center
    val cells = new java.util.TreeSet[java.lang.Long]()
    val it0 = cand.iterator()
    while (it0.hasNext) {
      val c = it0.next().longValue()
      val cf = ((c >> 40) & 0x1fL).toInt
      val cq = ((c >> 20) & 0xfffffL) - Off
      val cr = (c & 0xfffffL) - Off
      val wc = centerXYZ(cf, cq, cr, childRes)
      if (cellOfXYZ(wc(0), wc(1), wc(2), p) == self) cells.add(c): Unit
    }
    val out = new Array[Any](cells.size())
    val it = cells.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(java.lang.Long.toHexString(it.next())); o += 1
    }
    new GenericArrayData(out)
  }

  /** Axial 6-neighborhood deltas, E → NE → NW → W → SW → SE. */
  private val deltas: Array[(Int, Int)] =
    Array((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))

  /** The axial deltas of hex ring `k` (6k cells for k ≥ 1; [(0, 0)]
    * for k = 0): start k steps east, walk the six edges. The standard
    * hex-ring enumeration, counter-clockwise from the east corner. */
  private[functions] def ringDeltas(k: Int): Array[(Int, Int)] = {
    if (k == 0) return Array((0, 0))
    val out = new Array[(Int, Int)](6 * k)
    // walk order: from (k, 0) apply each neighbor delta k times,
    // in the order NW, W, SW, SE, E, NE (indices 2,3,4,5,0,1) — the
    // convention that closes the ring back at the start
    var q = k; var r = 0
    var o = 0
    for (d <- Array(2, 3, 4, 5, 0, 1); _ <- 0 until k) {
      out(o) = (q, r); o += 1
      q += deltas(d)._1; r += deltas(d)._2
    }
    out
  }

  /** The cell of (lon°, lat°) plus its 6-neighborhood, added into
    * `cells` as packed longs — the hex 1-ring analog of the S2 cover's
    * 3×3 block (neighbors re-encode through xyz, so rings wrap across
    * faces). */
  private def addCellAndRing(cells: java.util.TreeSet[java.lang.Long],
                             lonDeg: Double, latDeg: Double, res: Int): Unit = {
    val lon = math.toRadians(lonDeg)
    val lat = math.toRadians(latDeg)
    val c = cellOfXYZ(math.cos(lat) * math.cos(lon),
      math.cos(lat) * math.sin(lon), math.sin(lat), res)
    cells.add(c): Unit
    val face = ((c >> 40) & 0x1fL).toInt
    val q = ((c >> 20) & 0xfffffL) - Off
    val r = (c & 0xfffffL) - Off
    var k = 0
    while (k < 6) {
      val (dq, dr) = deltas(k)
      val w = centerXYZ(face, q + dq, r + dr, res)
      cells.add(cellOfXYZ(w(0), w(1), w(2), res)): Unit
      k += 1
    }
  }

  /** Cell cover of a planar-lon/lat GeoJSON ring at `res` — the H3
    * sibling of [[S2.polygonCover]], same construction (edge samples +
    * even-odd interior lattice, each sample adding its cell + 1-ring)
    * and the same conservative over-covering contract: a false
    * candidate only costs the verify stage, a missed cell would drop
    * join hits. Completeness (within a face, formal): with step =
    * ¼·size in degrees, any polygon point p lies within
    * √2·step ≤ 0.354·size rad of a sample s; gnomonic plane distance
    * ≤ 1.585× sphere distance over a face (worst radial scale at the
    * 37.4° face circumradius), so |p−s|_plane ≤ 0.56·size < size, and
    * a hex whose region is within `size` of s's cell region is s's
    * cell or a direct neighbor (non-neighbor hex centers are ≥ 3·size
    * apart, regions ≥ size). ACROSS faces the unaligned lattices void
    * the formal bound — the wrap re-encode still lands rings on the
    * adjacent face and GeoSpec pins completeness empirically on
    * edge-straddling polygons, but a production fence spanning faces
    * should use a finer res or verify-with-slack; the registered join
    * keeps its fence inside one face. Lattice capped at 2M points
    * (loud reject), rings crossing the antimeridian rejected. */
  def polygonCover(ring: ArrayData, res: Int): ArrayData = {
    if (ring == null || res < 0 || res > MaxRes) return null
    val n = ring.numElements()
    if (n < 4) return null
    val lons = new Array[Double](n)
    val lats = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = ring.getArray(i)
      if (v == null || v.numElements() < 2) return null
      lons(i) = v.getDouble(0); lats(i) = v.getDouble(1)
      if (!(lons(i) >= -180.0 && lons(i) <= 180.0) ||
          !(lats(i) >= -90.0 && lats(i) <= 90.0)) return null
      i += 1
    }
    require(lons(0) == lons(n - 1) && lats(0) == lats(n - 1),
      "geo_polygon_to_h3cells: ring must be closed (first vertex == last " +
        "vertex, the GeoJSON closed-ring contract) — an open ring would " +
        "silently drop the closing edge from the cover")
    val minLon = lons.min; val maxLon = lons.max
    val minLat = lats.min; val maxLat = lats.max
    require(maxLon - minLon <= 180.0,
      "geo_polygon_to_h3cells: rings crossing the antimeridian are unsupported")
    val step = math.toDegrees(sizeAt(res)) / 4.0
    val nLon = math.ceil((maxLon - minLon) / step).toLong + 1
    val nLat = math.ceil((maxLat - minLat) / step).toLong + 1
    require(nLon * nLat <= 2000000L,
      s"geo_polygon_to_h3cells: cover lattice ${nLon}x$nLat exceeds 2M points " +
        "— use a coarser resolution or a smaller ring")
    def inside(px: Double, py: Double): Boolean = {
      var c = false; var e = 0
      while (e < n - 1) {
        val (x1, y1, x2, y2) = (lons(e), lats(e), lons(e + 1), lats(e + 1))
        if ((y1 > py) != (y2 > py) &&
            px < x1 + (x2 - x1) * (py - y1) / (y2 - y1)) c = !c
        e += 1
      }
      c
    }
    val cells = new java.util.TreeSet[java.lang.Long]()
    // 1. boundary: sample every edge at <= step per-axis spacing
    var e = 0
    while (e < n - 1) {
      val span = math.max(math.abs(lons(e + 1) - lons(e)),
        math.abs(lats(e + 1) - lats(e)))
      val k = math.max(1, math.ceil(span / step).toInt)
      var s = 0
      while (s <= k) {
        val t = s.toDouble / k
        addCellAndRing(cells, lons(e) + (lons(e + 1) - lons(e)) * t,
          lats(e) + (lats(e + 1) - lats(e)) * t, res)
        s += 1
      }
      e += 1
    }
    // 2. interior lattice
    var li = 0L
    while (li < nLat) {
      val lat = math.min(maxLat, minLat + li * step)
      var lj = 0L
      while (lj < nLon) {
        val lon = math.min(maxLon, minLon + lj * step)
        if (inside(lon, lat)) addCellAndRing(cells, lon, lat, res)
        lj += 1
      }
      li += 1
    }
    val out = new Array[Any](cells.size())
    val it = cells.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(java.lang.Long.toHexString(it.next())); o += 1
    }
    new GenericArrayData(out)
  }

  /** Cell cover of a planar-lon/lat GeoJSON LineString at `res` — the
    * boundary half of [[polygonCover]] on its own (the route/corridor
    * side of the hex cell join): every edge sampled at ≤ ¼·size per
    * axis, each sample adding its cell + hex 1-ring. Same completeness
    * contract and cross-face caveat as the polygon cover. ≥ 2
    * vertices; antimeridian-crossing lines rejected loudly. */
  def lineCover(line: ArrayData, res: Int): ArrayData = {
    if (line == null || res < 0 || res > MaxRes) return null
    val n = line.numElements()
    if (n < 2) return null
    val lons = new Array[Double](n)
    val lats = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = line.getArray(i)
      if (v == null || v.numElements() < 2) return null
      lons(i) = v.getDouble(0); lats(i) = v.getDouble(1)
      if (!(lons(i) >= -180.0 && lons(i) <= 180.0) ||
          !(lats(i) >= -90.0 && lats(i) <= 90.0)) return null
      i += 1
    }
    require(lons.max - lons.min <= 180.0,
      "geo_line_to_h3cells: lines crossing the antimeridian are unsupported")
    val step = math.toDegrees(sizeAt(res)) / 4.0
    val cells = new java.util.TreeSet[java.lang.Long]()
    var e = 0
    while (e < n - 1) {
      val span = math.max(math.abs(lons(e + 1) - lons(e)),
        math.abs(lats(e + 1) - lats(e)))
      val k = math.max(1, math.ceil(span / step).toInt)
      var s = 0
      while (s <= k) {
        val t = s.toDouble / k
        addCellAndRing(cells, lons(e) + (lons(e + 1) - lons(e)) * t,
          lats(e) + (lats(e + 1) - lats(e)) * t, res)
        s += 1
      }
      e += 1
    }
    val out = new Array[Any](cells.size())
    val it = cells.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(java.lang.Long.toHexString(it.next())); o += 1
    }
    new GenericArrayData(out)
  }

  /** ADX geo_h3cell_rings(cell, N) → array of rings: ring 0 = [cell],
    * ring k = the distinct cells at hex distance k, each candidate
    * re-encoded through xyz (the cross-face wrap convention shared
    * with [[neighborsOf]]). Near face edges wrapped candidates can
    * collide with each other or with an INNER ring — duplicates drop
    * and a cell never appears in two rings (inner-most wins), so edge
    * rings may hold fewer than 6k cells. Null on malformed input or
    * N < 0; N is capped at 16 (ADX's bound). */
  def ringsOf(token: UTF8String, n: Int): ArrayData = {
    val d = decode(token)
    if (d == null || n < 0 || n > 16) return null
    val res = d(0).toInt; val face = d(1).toInt
    val seen = new java.util.HashSet[Long]()
    val rings = new Array[Any](n + 1)
    var k = 0
    while (k <= n) {
      val ring = new java.util.LinkedHashSet[Any](6 * math.max(k, 1) + 2)
      for ((dq, dr) <- ringDeltas(k)) {
        val w = centerXYZ(face, d(2) + dq, d(3) + dr, res)
        val c = cellOfXYZ(w(0), w(1), w(2), res)
        if (seen.add(c))
          ring.add(UTF8String.fromString(java.lang.Long.toHexString(c))): Unit
      }
      rings(k) = new GenericArrayData(ring.toArray)
      k += 1
    }
    new GenericArrayData(rings)
  }

  /** 6-neighborhood tokens: each neighbor's virtual planar center is
    * re-encoded through xyz (cross-face wrap — an off-face step lands
    * in whichever cell owns that direction). Distinct, self excluded:
    * near a face edge or icosahedron vertex, wrapped neighbors can
    * collide with each other or with self and dedupe away, so edge
    * cells may report fewer than 6 (the pentagon-analog convention
    * documented above). Null on malformed input. */
  def neighborsOf(token: UTF8String): ArrayData = {
    val d = decode(token)
    if (d == null) return null
    val res = d(0).toInt; val face = d(1).toInt
    val self = pack(res, face, d(2), d(3))
    val out = new java.util.LinkedHashSet[Any](8)
    var k = 0
    while (k < 6) {
      val (dq, dr) = deltas(k)
      val w = centerXYZ(face, d(2) + dq, d(3) + dr, res)
      val c = cellOfXYZ(w(0), w(1), w(2), res)
      if (c != self)
        out.add(UTF8String.fromString(java.lang.Long.toHexString(c))): Unit
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ADX geo_h3cell_compact(cells): repeatedly replace every COMPLETE
    * sibling set with its parent until stable — the standard compact,
    * under THIS token system's center-containment parent/child
    * convention ([[parentOf]]/[[childrenOf]]): a sibling set is
    * complete when every cell of `childrenOf(parent)` is present
    * (clipped edge parents can have < 7 children — completeness is
    * against the ACTUAL child set, not a fixed aperture). Output is
    * sorted + deduped (deterministic). Dim-side by design, like the
    * covers: each fixpoint pass runs one childrenOf enumeration per
    * candidate parent. Null on malformed/null tokens (ADX's
    * null-on-invalid shape); mixed resolutions are fine. */
  def compactCells(cells: ArrayData): ArrayData = {
    if (cells == null) return null
    val set = new java.util.TreeSet[String]()
    var i = 0
    val n = cells.numElements()
    while (i < n) {
      if (cells.isNullAt(i)) return null
      val t = cells.getUTF8String(i)
      if (decode(t) == null) return null
      set.add(t.toString): Unit
      i += 1
    }
    var changed = true
    while (changed) {
      changed = false
      // group the current cells by their one-level-up parent
      val byParent = new java.util.TreeMap[String, java.util.TreeSet[String]]()
      val it = set.iterator()
      while (it.hasNext) {
        val s = it.next()
        val tok = UTF8String.fromString(s)
        val lvl = decode(tok)(0).toInt
        if (lvl > 0) {
          val p = parentOf(tok, lvl - 1).toString
          byParent.computeIfAbsent(p,
            _ => new java.util.TreeSet[String]()).add(s): Unit
        }
      }
      val pit = byParent.entrySet().iterator()
      while (pit.hasNext) {
        val e = pit.next()
        val p = e.getKey
        val present = e.getValue
        val ptok = UTF8String.fromString(p)
        val plvl = decode(ptok)(0).toInt
        val ch = childrenOf(ptok, plvl + 1)
        var complete = ch.numElements() > 0
        var j = 0
        while (complete && j < ch.numElements()) {
          complete = present.contains(ch.getUTF8String(j).toString)
          j += 1
        }
        if (complete) {
          j = 0
          while (j < ch.numElements()) {
            set.remove(ch.getUTF8String(j).toString): Unit
            j += 1
          }
          set.add(p): Unit
          changed = true
        }
      }
    }
    val out = new Array[Any](set.size())
    val oit = set.iterator()
    var o = 0
    while (oit.hasNext) { out(o) = UTF8String.fromString(oit.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** ADX geo_h3cell_uncompact(cells, res): every input cell expanded
    * to its full descendant set at `res` (cells already at `res` pass
    * through; [[childrenOf]]'s gap ≤ 4 bound applies per cell and a
    * larger gap rejects loudly). Output sorted + deduped. Null when
    * any token is malformed/null, finer than `res`, or `res` is out
    * of range — ADX's null-on-invalid shape. */
  def uncompactCells(cells: ArrayData, res: Int): ArrayData = {
    if (cells == null || res < 0 || res > MaxRes) return null
    val out = new java.util.TreeSet[String]()
    var i = 0
    val n = cells.numElements()
    while (i < n) {
      if (cells.isNullAt(i)) return null
      val t = cells.getUTF8String(i)
      val d = decode(t)
      if (d == null || d(0).toInt > res) return null
      val ch = childrenOf(t, res)
      var j = 0
      while (j < ch.numElements()) {
        out.add(ch.getUTF8String(j).toString): Unit
        j += 1
      }
      i += 1
    }
    val arr = new Array[Any](out.size())
    val oit = out.iterator()
    var o = 0
    while (oit.hasNext) { arr(o) = UTF8String.fromString(oit.next()); o += 1 }
    new GenericArrayData(arr)
  }
}

/** `graft_h3_cell(lon, lat, res)` → hex token of the containing
  * H3-style cell (see [[H3]] for semantics and deviations). One trig
  * chain + a 20-face argmax + integer arithmetic per row, fully
  * inside whole-stage codegen. */
case class H3CellToken(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_cell expects (double, double, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_cell"

  override def nullSafeEval(lon: Any, lat: Any, res: Any): Any =
    H3.cellToken(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      res.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, res) => {
      s"""
         |${ev.value} = graft.functions.H3.cellToken($lon, $lat, $res);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_h3_boundary(token)` → the closed 7-point hex ring as
  * ARRAY<ARRAY<DOUBLE>> ([lon°, lat°] per vertex); malformed → null. */
case class H3CellBoundary(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_boundary expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_boundary"

  override def nullSafeEval(tok: Any): Any =
    H3.boundaryOf(tok.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tok => {
      s"""
         |${ev.value} = graft.functions.H3.boundaryOf($tok);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_h3_center(token)` → [lon°, lat°] of the cell center. */
case class H3CellCenter(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_center expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_center"

  override def nullSafeEval(tok: Any): Any =
    H3.centerOf(tok.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tok => {
      s"""
         |${ev.value} = graft.functions.H3.centerOf($tok);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_h3_polygon_cover(ring, res)` → sorted cell-cover tokens of a
  * planar GeoJSON outer ring at `res` — see [[H3.polygonCover]] for
  * construction, completeness, and the cross-face caveat. Dim-side by
  * design: cost scales with ring bbox / cell size². */
case class H3PolygonCover(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }) && right.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_polygon_cover expects (array<array<double>>, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_polygon_cover"

  override def nullSafeEval(ring: Any, res: Any): Any =
    H3.polygonCover(ring.asInstanceOf[ArrayData], res.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ring, res) => {
      s"""
         |${ev.value} = graft.functions.H3.polygonCover($ring, $res);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_h3_line_cover(line, res)` → sorted cell-cover tokens of a
  * planar GeoJSON LineString at `res` — see [[H3.lineCover]]. Dim-side
  * by design, like the polygon cover. */
case class H3LineCover(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }) && right.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_line_cover expects (array<array<double>>, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_line_cover"

  override def nullSafeEval(line: Any, res: Any): Any =
    H3.lineCover(line.asInstanceOf[ArrayData], res.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (line, res) => {
      s"""
         |${ev.value} = graft.functions.H3.lineCover($line, $res);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_h3_level(token)` → the cell's resolution; null on malformed
  * input. */
case class H3CellLevel(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_level expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_level"

  override def nullSafeEval(tok: Any): Any =
    H3.levelOf(tok.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tok => {
      val r = ctx.freshName("graftH3Lvl")
      s"""
         |Object $r = graft.functions.H3.levelOf($tok);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ${ev.isNull} ? -1 : ((java.lang.Integer) $r).intValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_h3_parent(token, res)` → containing cell at coarser `res`
  * (center containment — see [[H3.parentOf]]'s deviation notes). */
case class H3CellParent(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_parent expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_parent"

  override def nullSafeEval(tok: Any, res: Any): Any =
    H3.parentOf(tok.asInstanceOf[UTF8String], res.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tok, res) => {
      s"""
         |${ev.value} = graft.functions.H3.parentOf($tok, $res);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_h3_rings(token, n)` → rings 0..n of distinct cells by hex
  * distance, cross-face wrapped; inner rings win wrap collisions —
  * see [[H3.ringsOf]]. */
case class H3CellRings(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_rings expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_rings"

  override def nullSafeEval(tok: Any, n: Any): Any =
    H3.ringsOf(tok.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tok, n) => {
      s"""
         |${ev.value} = graft.functions.H3.ringsOf($tok, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_h3_children(token, childRes)` → sorted tokens of every
  * res-`childRes` cell whose parent is this cell — the exact inverse
  * of `graft_h3_parent` (candidate enumeration + parent check; see
  * [[H3.childrenOf]] for the convention, the gap≤4 loud reject, and
  * the cross-face caveat). Dim-side by design. */
case class H3CellChildren(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_children expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_children"

  override def nullSafeEval(tok: Any, res: Any): Any =
    H3.childrenOf(tok.asInstanceOf[UTF8String], res.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tok, res) => {
      s"""
         |${ev.value} = graft.functions.H3.childrenOf($tok, $res);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_h3_neighbors(token)` → 6-neighborhood tokens (cross-face
  * wrapped; fewer near face edges/vertices — see [[H3.neighborsOf]]). */
case class H3CellNeighbors(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h3_neighbors expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_neighbors"

  override def nullSafeEval(tok: Any): Any =
    H3.neighborsOf(tok.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tok => {
      s"""
         |${ev.value} = graft.functions.H3.neighborsOf($tok);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_h3_compact(tokens)` → the minimal mixed-resolution cover:
  * complete sibling sets collapse to their parent, repeatedly (see
  * [[H3.compactCells]]; sorted + deduped, null on invalid). */
case class H3CellCompact(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_h3_compact expects (array<string>), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_compact"

  override def nullSafeEval(cells: Any): Any =
    H3.compactCells(cells.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cells => {
      s"""
         |${ev.value} = graft.functions.H3.compactCells($cells);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_h3_uncompact(tokens, res)` → every cell expanded to its
  * descendant set at `res` (see [[H3.uncompactCells]]; gap ≤ 4 per
  * cell, sorted + deduped, null on invalid). */
case class H3CellUncompact(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_h3_uncompact expects (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_h3_uncompact"

  override def nullSafeEval(cells: Any, res: Any): Any =
    H3.uncompactCells(cells.asInstanceOf[ArrayData], res.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cells, res) => {
      s"""
         |${ev.value} = graft.functions.H3.uncompactCells($cells, $res);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
