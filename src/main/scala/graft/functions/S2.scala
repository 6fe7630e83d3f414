package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** S2-style cube-face cell system (public S2 geometry definitions —
  * s2geometry.io: the six-face unit-cube projection, the canonical
  * face→(u,v) axes, and the quadratic ST transform that equalizes cell
  * size across a face). The spatial-join cell backbone's SECOND cell
  * system next to geohash: same integer-exact quantize→cell-key→
  * equi-join shape, but with near-uniform cell metric size (geohash
  * cells stretch toward the poles; S2 faces don't).
  *
  * Documented deviations from Google's reference cells (kept because
  * the cell key only needs to be a deterministic, locality-preserving
  * bijection — and these keep the math oracle-expressible):
  *  - intra-face ordering is MORTON (Z-order, i high bit of each
  *    pair), not the Hilbert curve: adjacency-preservation per level
  *    is identical for the 3×3 neighborhood use (neighbors are
  *    computed in (i, j) space, never by id arithmetic);
  *  - the token is the lowercase hex of
  *    `1 << (2·level+3) | face << (2·level) | pos` — the leading
  *    1-bit makes the level self-describing from the bit length
  *    (Google's token is the 64-bit id with a trailing lsb marker);
  *  - neighbors WRAP across faces (r13; same-face-only before): an
  *    (i, j) step off the face edge projects the virtual cell center
  *    through xyz onto the adjacent face's frame and re-quantizes at
  *    the same level — the quadratic ST transform is face-uniform, so
  *    cell boundaries line up along shared edges and the projection
  *    lands in the true edge-adjacent cell. Corner-diagonal steps
  *    (which have no geometric neighbor — three faces meet at a cube
  *    corner) land on a cell already produced by an edge step and
  *    dedupe away, so a corner cell reports 7 distinct neighbors,
  *    matching real S2's corner convention.
  *
  * Float contract: one trig chain (cos/sin of lon/lat, the ratios
  * u, v) feeds ONE IEEE-exact sqrt and ONE floor quantization per
  * axis. The floor is the only engine-visible boundary; as with the
  * haversine tier, a last-ulp libm difference flips a cell only if
  * the true value sits within an ulp of a 2^level grid line —
  * measure-zero, and the oracle compare verifies the actual corpus.
  * Everything after the quantize is pure integer arithmetic.
  */
object S2 {

  val MaxLevel = 28 // 2·28+4 = 60 bits: the token value stays a positive Long

  /** st ∈ [0,1] from u ∈ [-1,1] — the S2 quadratic transform. */
  def stFromUV(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u)
    else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  /** Inverse of [[stFromUV]]. */
  def uvFromST(s: Double): Double =
    if (s >= 0.5) (4.0 * s * s - 1.0) / 3.0
    else (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0

  private def ijFromST(s: Double, level: Int): Long = {
    val n = 1L << level
    math.min(n - 1, math.max(0L, math.floor(s * n).toLong))
  }

  /** Morton position: i supplies the HIGH bit of each 2-bit pair. */
  def morton(i: Long, j: Long, level: Int): Long = {
    var pos = 0L
    var k = level - 1
    while (k >= 0) {
      pos = (pos << 2) | (((i >> k) & 1L) << 1) | ((j >> k) & 1L)
      k -= 1
    }
    pos
  }

  def cellValue(face: Int, i: Long, j: Long, level: Int): Long =
    (1L << (2 * level + 3)) | (face.toLong << (2 * level)) | morton(i, j, level)

  /** (face, u, v) of a unit-sphere direction — canonical S2 face axes.
    * Tie order on equal |components|: x, then y, then z. */
  def faceUVFromXYZ(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    if (math.abs(x) >= math.abs(y) && math.abs(x) >= math.abs(z)) {
      if (x >= 0) (0, y / x, z / x) else (3, z / x, y / x)
    } else if (math.abs(y) >= math.abs(z)) {
      if (y >= 0) (1, -x / y, z / y) else (4, z / y, -x / y)
    } else {
      if (z >= 0) (2, -x / z, -y / z) else (5, -y / z, -x / z)
    }
  }

  /** (face, u, v) of a lon/lat point. */
  def faceUV(lonDeg: Double, latDeg: Double): (Int, Double, Double) = {
    val lon = math.toRadians(lonDeg)
    val lat = math.toRadians(latDeg)
    faceUVFromXYZ(math.cos(lat) * math.cos(lon),
      math.cos(lat) * math.sin(lon), math.sin(lat))
  }

  /** xyz of a face-frame point (u, v) — the inverse frames of
    * [[faceUVFromXYZ]] (also used by [[centerLonLat]]). Valid for
    * |u|,|v| beyond 1 (a direction past the face edge). */
  def faceXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1.0, u, v)
      case 1 => (-u, 1.0, v)
      case 2 => (-u, -v, 1.0)
      case 3 => (-1.0, -v, -u)
      case 4 => (v, -1.0, -u)
      case _ => (v, u, -1.0)
    }

  /** Token of the level-`level` cell containing (lon, lat); null for
    * invalid coordinates (including NaN — the range test is written
    * as a NEGATED inside-test so NaN fails it, where `abs(x) > 180`
    * is false for NaN and would fall through into faceUV producing a
    * spurious face-5 token) or an out-of-range level. */
  def cellToken(lonDeg: Double, latDeg: Double, level: Int): UTF8String = {
    if (!(lonDeg >= -180.0 && lonDeg <= 180.0) ||
        !(latDeg >= -90.0 && latDeg <= 90.0) ||
        level < 0 || level > MaxLevel) return null
    val (face, u, v) = faceUV(lonDeg, latDeg)
    val i = ijFromST(stFromUV(u), level)
    val j = ijFromST(stFromUV(v), level)
    UTF8String.fromString(java.lang.Long.toHexString(cellValue(face, i, j, level)))
  }

  /** (face, i, j, level) from a token; null on malformed input (bad
    * hex, odd bit-length, face ≥ 6). */
  def decode(token: UTF8String): Array[Long] = {
    if (token == null) return null
    val s = token.toString
    if (s.isEmpty || s.length > 15 || !s.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))) return null
    val v = java.lang.Long.parseLong(s, 16)
    if (v <= 0) return null
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(v)
    if (bits < 4 || (bits - 4) % 2 != 0) return null
    val level = (bits - 4) / 2
    if (level > MaxLevel) return null
    val face = (v >> (2 * level)) & 7L
    if (face >= 6) return null
    val pos = v & ((1L << (2 * level)) - 1)
    var i = 0L; var j = 0L
    var k = 0
    while (k < level) {
      i |= ((pos >> (2 * k + 1)) & 1L) << k
      j |= ((pos >> (2 * k)) & 1L) << k
      k += 1
    }
    Array(face, i, j, level.toLong)
  }

  /** Cell-center (lon°, lat°) — canonical face→xyz frames inverted
    * with atan2 (same float class as the haversine tier). */
  def centerLonLat(face: Long, i: Long, j: Long, level: Long): Array[Double] = {
    val n = (1L << level).toDouble
    val u = uvFromST((i + 0.5) / n)
    val v = uvFromST((j + 0.5) / n)
    val (x, y, z) = faceXYZ(face.toInt, u, v)
    Array(math.toDegrees(math.atan2(y, x)),
      math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))))
  }

  def centerOf(token: UTF8String): ArrayData = {
    val d = decode(token)
    if (d == null) return null
    new GenericArrayData(centerLonLat(d(0), d(1), d(2), d(3))
      .map(_.asInstanceOf[Any]))
  }

  /** The cell's 4 corners as a CLOSED lon/lat ring (5 pairs, last =
    * first) — backs `geo_s2cell_to_polygon`. Corners are the exact ST
    * cell bounds pushed through the same face→xyz→lon/lat chain as
    * [[centerLonLat]]; winding follows the face frame's (i, j) order
    * (i, j) → (i+1, j) → (i+1, j+1) → (i, j+1), which is CCW on
    * even-orientation faces (documented deviation: ADX normalizes to
    * geodesic CCW; corner POSITIONS are identical either way). */
  def polygonOf(token: UTF8String): ArrayData = {
    val d = decode(token)
    if (d == null) return null
    val n = (1L << d(3)).toDouble
    def corner(ci: Long, cj: Long): Any = {
      val u = uvFromST(ci / n)
      val v = uvFromST(cj / n)
      val (x, y, z) = faceXYZ(d(0).toInt, u, v)
      new GenericArrayData(Array[Any](
        math.toDegrees(math.atan2(y, x)),
        math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))))
    }
    val (i, j) = (d(1), d(2))
    new GenericArrayData(Array(corner(i, j), corner(i + 1, j),
      corner(i + 1, j + 1), corner(i, j + 1), corner(i, j)))
  }

  /** The level-`level` cell holding the virtual center of (i2, j2) in
    * `face`'s frame, where (i2, j2) may lie one step OUTSIDE the face
    * grid: the center projects through xyz onto whichever face owns
    * that direction and re-quantizes there (the quadratic ST transform
    * extends monotonically past [0,1], and is face-uniform, so cell
    * boundaries line up along shared edges and an off-edge step lands
    * in the true edge-adjacent cell — the r13 cross-face wrap). */
  private def wrapCell(face: Int, i2: Long, j2: Long, level: Int): Long = {
    val n = 1L << level
    if (i2 >= 0 && i2 < n && j2 >= 0 && j2 < n)
      return cellValue(face, i2, j2, level)
    val u = uvFromST((i2 + 0.5) / n.toDouble)
    val v = uvFromST((j2 + 0.5) / n.toDouble)
    val (x, y, z) = faceXYZ(face, u, v)
    val (f2, u2, v2) = faceUVFromXYZ(x, y, z)
    cellValue(f2, ijFromST(stFromUV(u2), level), ijFromST(stFromUV(v2), level), level)
  }

  /** Add the 3×3 cell ring around (lon, lat)'s cell (cross-face wrap). */
  private def add3x3Into(cells: java.util.TreeSet[java.lang.Long],
                         lon: Double, lat: Double, level: Int): Unit = {
    val (face, u, v) = faceUV(lon, lat)
    val ci = ijFromST(stFromUV(u), level)
    val cj = ijFromST(stFromUV(v), level)
    var dj = -1
    while (dj <= 1) {
      var di = -1
      while (di <= 1) {
        cells.add(wrapCell(face, ci + di, cj + dj, level)): Unit
        di += 1
      }
      dj += 1
    }
  }

  /** Sample every polyline edge at ≤ `step` per-axis spacing, adding
    * each sample's 3×3 ring — the boundary half of [[polygonCover]],
    * and the whole of [[lineCover]]. */
  private def sampleEdges3x3(cells: java.util.TreeSet[java.lang.Long],
                             lons: Array[Double], lats: Array[Double],
                             level: Int, step: Double): Unit = {
    var e = 0
    while (e < lons.length - 1) {
      val span = math.max(math.abs(lons(e + 1) - lons(e)),
        math.abs(lats(e + 1) - lats(e)))
      val k = math.max(1, math.ceil(span / step).toInt)
      var s = 0
      while (s <= k) {
        val t = s.toDouble / k
        add3x3Into(cells, lons(e) + (lons(e + 1) - lons(e)) * t,
          lats(e) + (lats(e + 1) - lats(e)) * t, level)
        s += 1
      }
      e += 1
    }
  }

  private def tokensOf(cells: java.util.TreeSet[java.lang.Long]): ArrayData = {
    val out = new Array[Any](cells.size())
    val it = cells.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(java.lang.Long.toHexString(it.next())); o += 1
    }
    new GenericArrayData(out)
  }

  /** Cell cover of a planar-lon/lat GeoJSON LineString at `level` —
    * the route/corridor side of the cell-join backbone. Every cell the
    * polyline passes through is covered: samples at ≤ ¼ min cell
    * extent per axis, each adding its 3×3 ring (same completeness
    * argument as [[polygonCover]]'s boundary half — a cell touching
    * the line holds a line point within `step` of a sample, so it is
    * in that sample's ring). ≥ 2 vertices; same validity/antimeridian
    * rules as the polygon cover. */
  def lineCover(line: ArrayData, level: Int): ArrayData = {
    if (line == null || level < 0 || level > MaxLevel) return null
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
      "geo_line_to_s2cells: lines crossing the antimeridian are unsupported")
    val step = math.toDegrees(2.0 / 3.0) / (1L << level).toDouble / 4.0
    val cells = new java.util.TreeSet[java.lang.Long]()
    sampleEdges3x3(cells, lons, lats, level, step)
    tokensOf(cells)
  }

  /** Cell cover of a planar-lon/lat GeoJSON ring at `level` (r12
    * verdict item 6 — the polygon side of the cell-join backbone).
    * Semantics match the repo's polygon tier: the ring is PLANAR in
    * lon/lat (straight edges, even-odd interior — the same convention
    * as geo_point_in_polygon, so cover and verify agree), holes
    * unsupported, rings crossing the antimeridian rejected loudly.
    *
    * Construction (complete by design, conservatively over-covering —
    * a candidate cell with no interior point only costs the verify
    * stage a false candidate, while a MISSED cell would silently drop
    * join hits):
    *  1. boundary: each edge is sampled at ≤ `step` spacing per axis
    *     and each sample's 3×3 cell ring is added;
    *  2. interior: a bbox lattice at `step` spacing, even-odd-tested,
    *     each inside point's 3×3 ring added.
    * With step = 1/4 of the minimum cell extent at `level` (min uv
    * derivative of the quadratic ST transform is 4/3 at the face
    * center, so min angular extent ≥ (2/3)/2^level rad; extents in
    * lon/lat DEGREES are ≥ angular extents), every cell holding an
    * interior point either touches the boundary (then it holds a
    * boundary point within `step` of an edge sample, so it is in that
    * sample's 3×3 ring) or lies entirely inside (then its inscribed
    * span ≥ 2·step contains a lattice point). Off-face samples wrap
    * via [[wrapCell]], so covers may span faces. GeoSpec pins
    * completeness empirically against dense random interior points.
    *
    * Cost is (bbox area / step²) point tests — dim-side work for fence
    * literals (the registered join has ONE polygon row); the lattice
    * is capped at 2M points and rejects loudly beyond. */
  def polygonCover(ring: ArrayData, level: Int): ArrayData = {
    if (ring == null || level < 0 || level > MaxLevel) return null
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
      "geo_polygon_to_s2cells: ring must be closed (first vertex == last " +
        "vertex, the GeoJSON closed-ring contract) — an open ring would " +
        "silently drop the closing edge from the cover")
    val minLon = lons.min; val maxLon = lons.max
    val minLat = lats.min; val maxLat = lats.max
    require(maxLon - minLon <= 180.0,
      "geo_polygon_to_s2cells: rings crossing the antimeridian are unsupported")
    val step = math.toDegrees(2.0 / 3.0) / (1L << level).toDouble / 4.0
    val nLon = math.ceil((maxLon - minLon) / step).toLong + 1
    val nLat = math.ceil((maxLat - minLat) / step).toLong + 1
    require(nLon * nLat <= 2000000L,
      s"geo_polygon_to_s2cells: cover lattice ${nLon}x$nLat exceeds 2M points " +
        "— use a coarser level or a smaller ring")
    // even-odd ray cast, same crossing test as geo_point_in_polygon
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
    def add3x3(lon: Double, lat: Double): Unit =
      add3x3Into(cells, lon, lat, level)
    // 1. boundary samples
    sampleEdges3x3(cells, lons, lats, level, step)
    // 2. interior lattice
    var li = 0L
    while (li < nLat) {
      val lat = math.min(maxLat, minLat + li * step)
      var lj = 0L
      while (lj < nLon) {
        val lon = math.min(maxLon, minLon + lj * step)
        if (inside(lon, lat)) add3x3(lon, lat)
        lj += 1
      }
      li += 1
    }
    tokensOf(cells)
  }

  /** 8-neighborhood tokens, dj slow (S→N) then di fast (W→E in face
    * coordinates) — mirrors the geohash neighbor order; off-face steps
    * wrap onto the adjacent face via [[wrapCell]]. Distinct, self
    * excluded: at a cube corner (three faces meet, so the diagonal
    * step has no geometric cell of its own) the projected diagonal
    * collides with an edge neighbor and dedupes away — a corner cell
    * reports 7, everywhere else 8. Null on malformed input. */
  def neighborsOf(token: UTF8String): ArrayData = {
    val d = decode(token)
    if (d == null) return null
    val (face, i, j, level) = (d(0), d(1), d(2), d(3).toInt)
    val self = cellValue(face.toInt, i, j, level)
    val out = new java.util.LinkedHashSet[Any](11)
    var dj = -1
    while (dj <= 1) {
      var di = -1
      while (di <= 1) {
        if (!(di == 0 && dj == 0)) {
          val c = wrapCell(face.toInt, i + di, j + dj, level)
          if (c != self)
            out.add(UTF8String.fromString(java.lang.Long.toHexString(c))): Unit
        }
        di += 1
      }
      dj += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_s2_cell(lon, lat, level)` → hex token of the containing
  * S2-style cell (see [[S2]] for semantics and deviations). One trig
  * chain + integer arithmetic per row, fully inside whole-stage
  * codegen — the SQL-text route would repeat the face/uv CASE tree
  * O(level) times in the Morton unroll (the geohash encoder's unroll
  * stays small only because its quantize is linear). */
case class S2CellToken(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_s2_cell expects (double, double, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_s2_cell"

  override def nullSafeEval(lon: Any, lat: Any, lvl: Any): Any =
    S2.cellToken(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      lvl.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, lvl) => {
      s"""
         |${ev.value} = graft.functions.S2.cellToken($lon, $lat, $lvl);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_s2_center(token)` → [lon°, lat°] of the cell center. */
case class S2CellCenter(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_s2_center expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_s2_center"

  override def nullSafeEval(tok: Any): Any =
    S2.centerOf(tok.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tok => {
      s"""
         |${ev.value} = graft.functions.S2.centerOf($tok);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_s2_cell_polygon(token)` → the cell's 4 corners as a closed
  * lon/lat ring (array<array<double>>, 5 entries) — see
  * [[S2.polygonOf]]; null on a malformed token. */
case class S2CellPolygon(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_s2_cell_polygon expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_s2_cell_polygon"

  override def nullSafeEval(tok: Any): Any =
    S2.polygonOf(tok.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tok => {
      s"""
         |${ev.value} = graft.functions.S2.polygonOf($tok);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_s2_polygon_cover(ring, level)` → sorted cell-cover tokens of
  * a planar GeoJSON outer ring (array<array<double>>) at `level` —
  * see [[S2.polygonCover]] for construction and completeness. Dim-side
  * by design: cost scales with ring bbox / cell size². */
case class S2PolygonCover(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }) && right.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_s2_polygon_cover expects (array<array<double>>, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_s2_polygon_cover"

  override def nullSafeEval(ring: Any, lvl: Any): Any =
    S2.polygonCover(ring.asInstanceOf[ArrayData], lvl.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ring, lvl) => {
      s"""
         |${ev.value} = graft.functions.S2.polygonCover($ring, $lvl);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_geo_dist_line(lon, lat, line)` → equirectangular
  * point-to-polyline minimum distance in meters (the corridor join's
  * verify stage as ONE codegen expression — the SQL-HOF formulation
  * evaluated interpreted per candidate and was the join's dominant
  * cost). Semantics and OP ORDER match the DuckDB oracle exactly:
  * mean latitude as a left-to-right fold over the vertices, meter
  * scales kx = 111320·cos(radians(latm)) / ky = 110574, per segment
  * ax = x1·kx, dx = (x2−x1)·kx, the clamped projection parameter, and
  * the min over segments — every op correctly-rounded IEEE, so
  * results are bit-equal to the mirrored SQL. Null for an invalid
  * point, a null line, or fewer than 2 vertices. */
object GeoDistPointToLine {
  /** The shared eval body (also called from generated code). */
  def dist(lonDeg: Double, latDeg: Double, line: ArrayData): Any = {
    if (line == null) return null
    if (!(lonDeg >= -180.0 && lonDeg <= 180.0) ||
        !(latDeg >= -90.0 && latDeg <= 90.0)) return null
    val n = line.numElements()
    if (n < 2) return null
    var latSum = 0.0
    var i = 0
    while (i < n) {
      val v = line.getArray(i)
      if (v == null || v.numElements() < 2) return null
      // inside-tests, so NaN vertices null out rather than poisoning
      // the mean-latitude fold into a NaN "distance"
      if (!(v.getDouble(0) >= -180.0 && v.getDouble(0) <= 180.0) ||
          !(v.getDouble(1) >= -90.0 && v.getDouble(1) <= 90.0)) return null
      latSum = latSum + v.getDouble(1)
      i += 1
    }
    val latm = latSum / n.toDouble
    val kx = 111320.0 * math.cos(math.toRadians(latm))
    val qx = lonDeg * kx
    val qy = latDeg * 110574.0
    var best = Double.PositiveInfinity
    i = 0
    while (i < n - 1) {
      val a = line.getArray(i)
      val b = line.getArray(i + 1)
      val ax = a.getDouble(0) * kx
      val ay = a.getDouble(1) * 110574.0
      val dx = (b.getDouble(0) - a.getDouble(0)) * kx
      val dy = (b.getDouble(1) - a.getDouble(1)) * 110574.0
      val len2 = dx * dx + dy * dy
      val t =
        if (len2 == 0.0) 0.0
        else math.min(1.0, math.max(0.0, ((qx - ax) * dx + (qy - ay) * dy) / len2))
      val ex = qx - ax - t * dx
      val ey = qy - ay - t * dy
      val d = math.sqrt(ex * ex + ey * ey)
      if (d < best) best = d
      i += 1
    }
    java.lang.Double.valueOf(best)
  }

  /** The closest POINT on the line (the argmin foot of [[dist]] —
    * identical per-segment arithmetic, the FIRST strictly-better
    * segment wins ties, so an endpoint shared by two segments
    * resolves to the lower segment index, the oracle's ORDER BY
    * d, i tiebreak). Returns [lon°, lat°] (degrees recovered by
    * dividing the meter foot by the same scale factors). */
  def closest(lonDeg: Double, latDeg: Double, line: ArrayData): Any = {
    if (line == null) return null
    if (!(lonDeg >= -180.0 && lonDeg <= 180.0) ||
        !(latDeg >= -90.0 && latDeg <= 90.0)) return null
    val n = line.numElements()
    if (n < 2) return null
    var latSum = 0.0
    var i = 0
    while (i < n) {
      val v = line.getArray(i)
      if (v == null || v.numElements() < 2) return null
      if (!(v.getDouble(0) >= -180.0 && v.getDouble(0) <= 180.0) ||
          !(v.getDouble(1) >= -90.0 && v.getDouble(1) <= 90.0)) return null
      latSum = latSum + v.getDouble(1)
      i += 1
    }
    val latm = latSum / n.toDouble
    val kx = 111320.0 * math.cos(math.toRadians(latm))
    val qx = lonDeg * kx
    val qy = latDeg * 110574.0
    var best = Double.PositiveInfinity
    var bx = 0.0
    var by = 0.0
    i = 0
    while (i < n - 1) {
      val a = line.getArray(i)
      val b = line.getArray(i + 1)
      val ax = a.getDouble(0) * kx
      val ay = a.getDouble(1) * 110574.0
      val dx = (b.getDouble(0) - a.getDouble(0)) * kx
      val dy = (b.getDouble(1) - a.getDouble(1)) * 110574.0
      val len2 = dx * dx + dy * dy
      val t =
        if (len2 == 0.0) 0.0
        else math.min(1.0, math.max(0.0, ((qx - ax) * dx + (qy - ay) * dy) / len2))
      val ex = qx - ax - t * dx
      val ey = qy - ay - t * dy
      val d = math.sqrt(ex * ex + ey * ey)
      if (d < best) {
        best = d
        bx = (ax + t * dx) / kx
        by = (ay + t * dy) / 110574.0
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](bx, by))
  }
}

/** `graft_geo_closest_line(lon, lat, line)` → [lon°, lat°] of the
  * closest point on the LineString; invalid input → null. */
case class GeoClosestPointOnLine(first: Expression, second: Expression,
                                 third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      (third.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_geo_closest_line expects (double, double, array<array<double>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geo_closest_line"

  override def nullSafeEval(lon: Any, lat: Any, line: Any): Any =
    GeoDistPointToLine.closest(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      line.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, line) => {
      val r = ctx.freshName("graftGeoClosest")
      s"""
         |Object $r = graft.functions.GeoDistPointToLine.closest($lon, $lat, $line);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ${ev.isNull} ? null :
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $r;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

case class GeoDistPointToLine(first: Expression, second: Expression,
                              third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      (third.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_geo_dist_line expects (double, double, array<array<double>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geo_dist_line"

  override def nullSafeEval(lon: Any, lat: Any, line: Any): Any =
    GeoDistPointToLine.dist(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      line.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, line) => {
      val r = ctx.freshName("graftGeoDist")
      s"""
         |Object $r = graft.functions.GeoDistPointToLine.dist($lon, $lat, $line);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : ((java.lang.Double) $r).doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_s2_line_cover(line, level)` → sorted cell-cover tokens of a
  * planar GeoJSON LineString (array<array<double>>) at `level` — see
  * [[S2.lineCover]]. Dim-side by design, like the polygon cover. */
case class S2LineCover(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }) && right.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_s2_line_cover expects (array<array<double>>, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_s2_line_cover"

  override def nullSafeEval(line: Any, lvl: Any): Any =
    S2.lineCover(line.asInstanceOf[ArrayData], lvl.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (line, lvl) => {
      s"""
         |${ev.value} = graft.functions.S2.lineCover($line, $lvl);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_s2_neighbors(token)` → 8-neighborhood tokens (cross-face
  * wrapped; 7 at cube corners — see [[S2.neighborsOf]]). */
case class S2CellNeighbors(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_s2_neighbors expects (string), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_s2_neighbors"

  override def nullSafeEval(tok: Any): Any =
    S2.neighborsOf(tok.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tok => {
      s"""
         |${ev.value} = graft.functions.S2.neighborsOf($tok);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
