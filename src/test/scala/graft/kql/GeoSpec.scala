package graft.kql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Geo scalar tier: RFC-pinned geohash values (the canonical
  * wikipedia/spec test vectors), pole and antimeridian edge cases for
  * the haversine distance, and circle membership semantics. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def one(e: String) =
    KqlParser.run(s"T | project r = $e", Map("T" -> Seq(1).toDF("x"))).head()

  test("geohash matches the spec test vectors") {
    // the canonical example: 57.64911N 10.40744E -> u4pruydqqvj
    assert(one("geo_point_to_geohash(10.40744, 57.64911, 11)").getString(0)
      == "u4pruydqqvj")
    // ezs42 (the original geohash.org example): 42.6N -5.6W
    assert(one("geo_point_to_geohash(-5.6, 42.6, 5)").getString(0) == "ezs42")
    // default accuracy is 5
    assert(one("geo_point_to_geohash(-5.6, 42.6)").getString(0) == "ezs42")
    // prefix property: a finer hash extends the coarser one
    val g11 = one("geo_point_to_geohash(10.40744, 57.64911, 11)").getString(0)
    val g4 = one("geo_point_to_geohash(10.40744, 57.64911, 4)").getString(0)
    assert(g11.startsWith(g4))
  }

  test("geohash edge cells: poles, antimeridian, boundary clamp, invalid -> null") {
    // +180 lon and -180 lon are distinct cells (the clamp keeps +180 in
    // the last cell; -180 is the first) — antimeridian neighbors land
    // in different buckets, the documented limitation of rectangular
    // cell joins there
    val e = one("geo_point_to_geohash(180.0, 0.0, 5)").getString(0)
    val w = one("geo_point_to_geohash(-180.0, 0.0, 5)").getString(0)
    assert(e != w)
    // north pole clamps into the top cell at every longitude band
    assert(one("geo_point_to_geohash(0.0, 90.0, 1)").getString(0) ==
      one("geo_point_to_geohash(0.0, 89.999999, 1)").getString(0))
    assert(one("geo_point_to_geohash(200.0, 0.0, 5)").isNullAt(0))
    assert(one("geo_point_to_geohash(0.0, 91.0, 5)").isNullAt(0))
  }

  test("haversine distance: known pair, poles, antimeridian wrap, invalid -> null") {
    // Oslo -> Copenhagen is ~483 km on the sphere
    val d = one("geo_distance_2points(10.75, 59.91, 12.57, 55.69)").getDouble(0)
    assert(d > 460000 && d < 500000, s"osl-cph $d")
    // same point -> 0; pole to pole -> half circumference (pi * R)
    assert(one("geo_distance_2points(10.0, 50.0, 10.0, 50.0)").getDouble(0) == 0.0)
    val pp = one("geo_distance_2points(0.0, 90.0, 120.0, -90.0)").getDouble(0)
    assert(math.abs(pp - math.Pi * 6371000.0) < 1.0, s"pole-pole $pp")
    // antimeridian: 179.5W to 179.5E at the equator is ~111 km, not ~40000 km
    val am = one("geo_distance_2points(179.5, 0.0, -179.5, 0.0)").getDouble(0)
    assert(am > 100000 && am < 120000, s"antimeridian $am")
    // any longitude at the same pole is the same point
    assert(one("geo_distance_2points(0.0, 90.0, 77.0, 90.0)").getDouble(0) < 1e-6)
    assert(one("geo_distance_2points(181.0, 0.0, 0.0, 0.0)").isNullAt(0))
  }

  test("point-in-circle membership, negative radius -> null") {
    assert(one("geo_point_in_circle(10.75, 59.91, 12.57, 55.69, 700000.0)").getBoolean(0))
    assert(!one("geo_point_in_circle(-21.94, 64.15, 12.57, 55.69, 700000.0)").getBoolean(0))
    assert(one("geo_point_in_circle(0.0, 0.0, 0.0, 0.0, -1.0)").isNullAt(0))
    assert(one("geo_point_in_circle(200.0, 0.0, 0.0, 0.0, 10.0)").isNullAt(0))
  }

  test("point-in-polygon: even-odd on a non-convex ring, boundary conventions") {
    // concave quad with a dent at (2, 2): the notch area is OUTSIDE
    val poly = """parse_json('{"type":"Polygon","coordinates":""" +
      """[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[2.0,2.0],[0.0,4.0],[0.0,0.0]]]}')"""
    def in(lon: Double, lat: Double): org.apache.spark.sql.Row =
      one(s"geo_point_in_polygon($lon, $lat, $poly)")
    assert(in(2.0, 1.0).getBoolean(0))     // deep inside
    assert(!in(2.0, 3.0).getBoolean(0))    // inside the dent -> out (even-odd)
    assert(in(0.5, 3.0).getBoolean(0))     // left lobe above the dent
    assert(in(3.5, 3.0).getBoolean(0))     // right lobe above the dent
    assert(!in(5.0, 1.0).getBoolean(0) && !in(-1.0, 1.0).getBoolean(0))
    assert(in(200.0, 1.0).isNullAt(0))     // invalid coordinate
    // degenerate ring (< 4 GeoJSON entries) and non-polygon input -> null
    assert(one("geo_point_in_polygon(1.0, 1.0, " +
      """parse_json('{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0]]]}'))""").isNullAt(0))
    assert(one("geo_point_in_polygon(1.0, 1.0, parse_json('{\"type\":\"Point\"}'))").isNullAt(0))
  }

  test("polygon area: unit triangle near analytic value, orientation-invariant, degenerate null") {
    def area(ring: String): org.apache.spark.sql.Row =
      one(s"""geo_polygon_area(parse_json('{"type":"Polygon","coordinates":[[$ring]]}'))""")
    // 1°x1° right triangle at ~50N: 0.5 * (111320*cos(latc)) * 110574
    val tri = area("[10.0,50.0],[11.0,50.0],[10.0,51.0],[10.0,50.0]").getDouble(0)
    val expect = 0.5 * 111320.0 * math.cos(math.toRadians(50.25)) * 110574.0
    assert(math.abs(tri - expect) / expect < 1e-9, s"$tri vs $expect")
    // winding direction must not change the magnitude (abs of shoelace)
    val rev = area("[10.0,50.0],[10.0,51.0],[11.0,50.0],[10.0,50.0]").getDouble(0)
    assert(rev == tri)
    assert(area("[0.0,0.0],[1.0,1.0]").isNullAt(0))
    assert(one("geo_polygon_area(parse_json('{\"type\":\"Point\"}'))").isNullAt(0))
  }

  test("polygon perimeter: analytic rectangle, orientation-invariant, degenerate null") {
    def per(ring: String): org.apache.spark.sql.Row =
      one(s"""geo_polygon_perimeter(parse_json('{"type":"Polygon","coordinates":[[$ring]]}'))""")
    // 1°x1° square at the equator-symmetric band: mean lat over the 5
    // entries (closing vertex included) = (0+0+1+1+0)/5 = 0.4
    val sq = per("[10.0,0.0],[11.0,0.0],[11.0,1.0],[10.0,1.0],[10.0,0.0]").getDouble(0)
    val kx = 111320.0 * math.cos(math.toRadians(0.4))
    val expect = 2.0 * kx + 2.0 * 110574.0
    assert(math.abs(sq - expect) / expect < 1e-12, s"$sq vs $expect")
    // reversed winding: same edges, same sum magnitude
    val rev = per("[10.0,0.0],[10.0,1.0],[11.0,1.0],[11.0,0.0],[10.0,0.0]").getDouble(0)
    assert(math.abs(rev - sq) / sq < 1e-12)
    assert(per("[0.0,0.0],[1.0,1.0]").isNullAt(0))
    assert(one("geo_polygon_perimeter(parse_json('{\"type\":\"Point\"}'))").isNullAt(0))
  }

  test("polygon centroid: analytic values, GeoJSON shape, zero-area null") {
    def cen(ring: String): org.apache.spark.sql.Row =
      one(s"""geo_polygon_centroid(parse_json('{"type":"Polygon","coordinates":[[$ring]]}'))""")
    // square: centroid at the middle, exactly (affine shoelace in degrees)
    val sq = cen("[10.0,50.0],[11.0,50.0],[11.0,51.0],[10.0,51.0],[10.0,50.0]").getStruct(0)
    assert(sq.getString(0) == "Point")
    val c = sq.getSeq[Double](1)
    assert(math.abs(c(0) - 10.5) < 1e-12 && math.abs(c(1) - 50.5) < 1e-12, c)
    // right triangle (0,0)(3,0)(0,3): centroid (1, 1)
    val tr = cen("[0.0,0.0],[3.0,0.0],[0.0,3.0],[0.0,0.0]").getStruct(0).getSeq[Double](1)
    assert(math.abs(tr(0) - 1.0) < 1e-12 && math.abs(tr(1) - 1.0) < 1e-12, tr)
    // winding direction must not move the centroid (signed/signed cancels)
    val trRev = cen("[0.0,0.0],[0.0,3.0],[3.0,0.0],[0.0,0.0]").getStruct(0).getSeq[Double](1)
    assert(trRev == tr)
    // zero-area (collinear) ring and degenerate input -> null
    assert(cen("[0.0,0.0],[1.0,1.0],[2.0,2.0],[0.0,0.0]").isNullAt(0))
    assert(cen("[0.0,0.0],[1.0,1.0]").isNullAt(0))
    assert(one("geo_polygon_centroid(parse_json('{\"type\":\"Point\"}'))").isNullAt(0))
  }

  test("line length/centroid: analytic values, degenerate nulls") {
    def lj(coords: String) =
      s"""parse_json('{"type":"LineString","coordinates":[$coords]}')"""
    // two-segment L at the equator band: mean lat over 3 vertices = 1/3
    val len = one(s"geo_line_length(${lj("[0.0,0.0],[1.0,0.0],[1.0,1.0]")})").getDouble(0)
    val kx = 111320.0 * math.cos(math.toRadians(1.0 / 3.0))
    assert(math.abs(len - (kx + 110574.0)) / len < 1e-12, len)
    // centroid: length-weighted midpoints
    val c = one(s"geo_line_centroid(${lj("[0.0,0.0],[1.0,0.0],[1.0,1.0]")})").getStruct(0)
    assert(c.getString(0) == "Point")
    val cc = c.getSeq[Double](1)
    val expX = (0.5 * kx + 1.0 * 110574.0) / (kx + 110574.0)
    val expY = (0.0 * kx + 0.5 * 110574.0) / (kx + 110574.0)
    assert(math.abs(cc(0) - expX) < 1e-12 && math.abs(cc(1) - expY) < 1e-12, cc)
    // single-vertex line and zero-length line -> null
    assert(one(s"geo_line_length(${lj("[0.0,0.0]")})").isNullAt(0))
    assert(one(s"geo_line_centroid(${lj("[2.0,2.0],[2.0,2.0]")})").isNullAt(0))
  }

  test("geo_intersects_2lines: crossing, touching, collinear, disjoint, degenerate") {
    def lj(coords: String) =
      s"""parse_json('{"type":"LineString","coordinates":[$coords]}')"""
    def x2(a: String, b: String) =
      one(s"geo_intersects_2lines(${lj(a)}, ${lj(b)})")
    // proper crossing
    assert(x2("[0.0,0.0],[2.0,2.0]", "[0.0,2.0],[2.0,0.0]").getBoolean(0))
    // touching at an endpoint
    assert(x2("[0.0,0.0],[1.0,1.0]", "[1.0,1.0],[2.0,0.0]").getBoolean(0))
    // collinear overlap
    assert(x2("[0.0,0.0],[3.0,0.0]", "[1.0,0.0],[5.0,0.0]").getBoolean(0))
    // collinear but disjoint
    assert(!x2("[0.0,0.0],[1.0,0.0]", "[2.0,0.0],[3.0,0.0]").getBoolean(0))
    // plainly disjoint
    assert(!x2("[0.0,0.0],[1.0,0.0]", "[0.0,1.0],[1.0,1.0]").getBoolean(0))
    // multi-segment: only the second segment of each crosses
    assert(x2("[0.0,5.0],[1.0,5.0],[3.0,0.0],[3.0,4.0]",
              "[0.0,6.0],[1.0,6.0],[2.0,2.0],[4.0,2.0]").getBoolean(0))
    // degenerate (single vertex) -> null
    assert(x2("[0.0,0.0]", "[0.0,1.0],[1.0,1.0]").isNullAt(0))
  }

  test("geohash central point: decode inverts encode, GeoJSON shape, malformed -> null") {
    // the cell center re-encodes to the SAME cell at every accuracy
    for (acc <- Seq(1, 3, 5, 7)) {
      val r = KqlParser.run(
        s"""T | extend gh = geo_point_to_geohash(10.40744, 57.64911, $acc)
           | | extend p = geo_geohash_to_central_point(gh)
           | | extend rt = geo_point_to_geohash(p.coordinates[0], p.coordinates[1], $acc)
           | | project ok = rt == gh, t = p.type""".stripMargin,
        Map("T" -> Seq(1).toDF("x"))).head()
      assert(r.getBoolean(0), s"roundtrip failed at acc=$acc")
      assert(r.getString(1) == "Point")
    }
    // the center of ezs42 lies inside the documented cell (42.6N 5.6W)
    val c = KqlParser.run(
      """T | extend p = geo_geohash_to_central_point('ezs42')
        | | project lon = p.coordinates[0], lat = p.coordinates[1]""".stripMargin,
      Map("T" -> Seq(1).toDF("x"))).head()
    assert(math.abs(c.getDouble(0) - -5.603) < 0.03 && math.abs(c.getDouble(1) - 42.605) < 0.03,
      s"ezs42 center ${c.getDouble(0)}, ${c.getDouble(1)}")
    assert(one("geo_geohash_to_central_point('ali0')").isNullAt(0)) // a/i/l/o not in alphabet
    assert(one("geo_geohash_to_central_point('')").isNullAt(0))
  }

  test("geohash neighbors: 8 distinct adjacent cells, antimeridian wrap, 5 at a pole") {
    def nbrs(gh: String): Seq[String] =
      one(s"geo_geohash_neighbors('$gh')").getSeq[String](0)
    def centerOf(gh: String): Seq[Double] = KqlParser.run(
      s"T | extend p = geo_geohash_to_central_point('$gh') | project c = p.coordinates",
      Map("T" -> Seq(1).toDF("x"))).head().getSeq[Double](0)
    val n = nbrs("ezs42")
    assert(n.size == 8 && n.distinct.size == 8 && !n.contains("ezs42"))
    // every neighbor's center is within ~1.5 cell spans of the home center
    val homeC = centerOf("ezs42")
    for (nb <- n) {
      val c = centerOf(nb)
      assert(math.abs(c(1) - homeC(1)) < 1.5 * (180.0 / 128) &&
        math.abs(c(0) - homeC(0)) < 1.5 * (360.0 / 256), s"$nb center $c vs $homeC")
    }
    // antimeridian: the +180-edge cell's neighbor set crosses to the
    // -180 side (some neighbor's center has the opposite lon sign)
    val am = nbrs(one("geo_point_to_geohash(179.9, 0.0, 4)").getString(0))
    val amLons = am.map(x => centerOf(x)(0))
    assert(amLons.exists(_ < 0), s"no wrap in $amLons")
    // a north-pole cell has no northern neighbors: 5 remain
    val pole = one("geo_point_to_geohash(0.0, 89.99, 2)").getString(0)
    assert(nbrs(pole).size == 5, s"pole $pole -> ${nbrs(pole)}")
    assert(one("geo_geohash_neighbors('xx@')").isNullAt(0))
  }

  // ---- S2 cell tier (r12) -------------------------------------------------

  test("s2: face assignment hits all six canonical faces at level 0") {
    // level 0 token = hex(8 | face): one cell per face, no quantization.
    // Face layout (s2geometry.io): 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z.
    assert(one("geo_point_to_s2cell(0.0, 0.0, 0)").getString(0) == "8")
    assert(one("geo_point_to_s2cell(90.0, 0.0, 0)").getString(0) == "9")
    assert(one("geo_point_to_s2cell(20.0, 80.0, 0)").getString(0) == "a")
    assert(one("geo_point_to_s2cell(180.0, 0.0, 0)").getString(0) == "b")
    assert(one("geo_point_to_s2cell(-90.0, 0.0, 0)").getString(0) == "c")
    assert(one("geo_point_to_s2cell(0.0, -80.0, 0)").getString(0) == "d")
    // invalid coordinates -> null (ADX convention)
    assert(one("geo_point_to_s2cell(200.0, 0.0, 5)").isNullAt(0))
  }

  test("s2: hand-derived level-1 vector and the parent-child pos relation") {
    // (0,0): face 0, u=v=0 -> s=t=0.5 exactly (0.5*sqrt(1)), i=j=floor(0.5*2)=1,
    // pos=morton(1,1)=3, value = 1<<5 | 0<<2 | 3 = 35 = 0x23.
    assert(one("geo_point_to_s2cell(0.0, 0.0, 1)").getString(0) == "23")
    // refining one level keeps the same prefix path: pos(L+1) DIV 4 == pos(L)
    import graft.functions.S2
    for (lvl <- Seq(3, 7, 10); (lon, lat) <- Seq((2.35, 48.86), (-17.45, 14.69), (151.21, -33.87))) {
      val d1 = S2.decode(S2.cellToken(lon, lat, lvl))
      val d2 = S2.decode(S2.cellToken(lon, lat, lvl + 1))
      assert(d1(0) == d2(0), "face stable across levels")
      assert(d2(1) >> 1 == d1(1) && d2(2) >> 1 == d1(2),
        s"(i, j) at level ${lvl + 1} must refine level $lvl")
    }
  }

  test("s2: token roundtrips through its center; central point is GeoJSON; malformed -> null") {
    for ((lon, lat, lvl) <- Seq((2.35, 48.86, 7), (0.0, 0.0, 11), (-170.7, -14.27, 9))) {
      val tok = one(s"geo_point_to_s2cell($lon, $lat, $lvl)").getString(0)
      val ctr = one(s"geo_s2cell_to_central_point('$tok')").getStruct(0)
      assert(ctr.getString(0) == "Point")
      val coords = ctr.getSeq[Double](1)
      val back = one(s"geo_point_to_s2cell(${coords(0)}, ${coords(1)}, $lvl)").getString(0)
      assert(back == tok, s"center of $tok must map back to it, got $back")
    }
    assert(one("geo_s2cell_to_central_point('zzz')").isNullAt(0))
    assert(one("geo_s2cell_neighbors('1')").isNullAt(0))   // bit length 1: no level
    assert(one("geo_s2cell_neighbors('f')").isNullAt(0))   // face 7 > 5
  }

  test("s2: neighbors are the 3x3 ring; face-edge steps wrap; corners report 7") {
    // interior cell: full 8-ring, all distinct, all same level/face
    val tok = one("geo_point_to_s2cell(2.35, 48.86, 7)").getString(0)
    val nb = one(s"geo_s2cell_neighbors('$tok')").getSeq[String](0)
    assert(nb.size == 8 && nb.distinct.size == 8 && !nb.contains(tok))
    import graft.functions.S2
    import org.apache.spark.unsafe.types.UTF8String
    val d0 = S2.decode(UTF8String.fromString(tok))
    nb.foreach { t =>
      val d = S2.decode(UTF8String.fromString(t))
      assert(d(0) == d0(0) && d(3) == d0(3))
      assert(math.abs(d(1) - d0(1)) <= 1 && math.abs(d(2) - d0(2)) <= 1)
    }
    // face-corner cell (i=j=0 on face 0): 3 in-face + 4 wrapped edge
    // neighbors; the corner-diagonal step has no geometric cell (three
    // faces meet at a cube corner) and dedupes into an edge wrap → 7.
    // The (-1, -1) uv corner of face 0 sits at lon -45, lat -35.264.
    val corner = one("geo_point_to_s2cell(-44.9, -35.2, 7)").getString(0)
    val cd = S2.decode(UTF8String.fromString(corner))
    assert(cd(1) == 0 && cd(2) == 0, s"corner cell expected at (0, 0), got $cd")
    val cnb = one(s"geo_s2cell_neighbors('$corner')").getSeq[String](0)
    assert(cnb.size == 7 && cnb.distinct.size == 7 && !cnb.contains(corner))

    // face-EDGE (non-corner) cell: full 8, wrapped ones on another
    // face, and adjacency is RECIPROCAL — each wrapped neighbor lists
    // this cell among its own neighbors (pins that the cross-face
    // projection lands in the true edge-adjacent cell, both ways)
    val edge = one("geo_point_to_s2cell(-44.9, 0.0, 7)").getString(0)
    val ed = S2.decode(UTF8String.fromString(edge))
    assert(ed(1) == 0 && ed(2) != 0, s"edge cell expected at i=0, got $ed")
    val enb = one(s"geo_s2cell_neighbors('$edge')").getSeq[String](0)
    assert(enb.size == 8 && enb.distinct.size == 8)
    val wrapped = enb.filter(t =>
      S2.decode(UTF8String.fromString(t))(0) != ed(0))
    assert(wrapped.size == 3, s"i=0 row: 3 off-face steps, got $wrapped")
    wrapped.foreach { t =>
      val back = one(s"geo_s2cell_neighbors('$t')").getSeq[String](0)
      assert(back.contains(edge), s"$t must list $edge back (reciprocity)")
    }

    // NaN coordinates: null token (the guard is an inside-test, so NaN
    // can't fall through faceUV into a spurious face-5 token)
    assert(one("geo_point_to_s2cell(sqrt(-1.0), 0.0, 7)").isNullAt(0))
    assert(one("geo_point_to_s2cell(0.0, sqrt(-1.0), 7)").isNullAt(0))
  }

  test("s2: cross-face wrap reciprocity holds along every face edge at multiple levels") {
    import graft.functions.S2
    import org.apache.spark.unsafe.types.UTF8String
    def neighbors(tok: String): Seq[String] = {
      val a = S2.neighborsOf(UTF8String.fromString(tok))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    // every face × every edge × a sweep of positions along it, at
    // levels 3/5/8: each cell's wrapped neighbors must list it back.
    // Corner cells are excluded from the strict-8 count (they report 7)
    // but still checked for reciprocity.
    for (level <- Seq(3, 5, 8); face <- 0 until 6) {
      val n = 1L << level
      val picks = Seq(0L, n / 3, n / 2, (2 * n) / 3, n - 1)
      for (p <- picks; (i, j) <- Seq((0L, p), (n - 1, p), (p, 0L), (p, n - 1))) {
        val tok = java.lang.Long.toHexString(S2.cellValue(face, i, j, level))
        val nb = neighbors(tok)
        val corner = (i == 0 || i == n - 1) && (j == 0 || j == n - 1)
        assert(nb.size == (if (corner) 7 else 8),
          s"face $face level $level ($i,$j): ${nb.size} neighbors")
        nb.foreach { t =>
          assert(neighbors(t).contains(tok),
            s"face $face level $level ($i,$j): $t does not list $tok back")
        }
      }
    }
  }

  test("s2: polygon cover is complete over dense pseudo-random interior points") {
    import graft.functions.S2
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // the non-convex dent ring the registered join uses
    val ring = Array(
      Array(-5.0, 45.0), Array(5.0, 43.0), Array(12.0, 50.0),
      Array(0.0, 47.5), Array(-8.0, 52.0), Array(-5.0, 45.0))
    val ad = new GenericArrayData(
      ring.map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
    val cover = S2.polygonCover(ad, 7)
    assert(cover != null && cover.numElements() > 50)
    val tokens = (0 until cover.numElements())
      .map(i => cover.getUTF8String(i).toString).toSet
    assert(tokens.size == cover.numElements(), "cover tokens distinct")
    // even-odd, same convention as the engine
    def inside(px: Double, py: Double): Boolean = {
      var c = false
      for (e <- 0 until ring.length - 1) {
        val (x1, y1) = (ring(e)(0), ring(e)(1))
        val (x2, y2) = (ring(e + 1)(0), ring(e + 1)(1))
        if ((y1 > py) != (y2 > py) && px < x1 + (x2 - x1) * (py - y1) / (y2 - y1))
          c = !c
      }
      c
    }
    // a deterministic low-discrepancy sweep of the bbox: every interior
    // point's cell must be in the cover (completeness — the property a
    // missed cell would break, silently dropping join hits)
    var checked = 0
    var g = 1234567L
    for (_ <- 1 to 20000) {
      g = (g * 6364136223846793005L + 1442695040888963407L)
      val fx = ((g >>> 11).toDouble / (1L << 53).toDouble)
      g = (g * 6364136223846793005L + 1442695040888963407L)
      val fy = ((g >>> 11).toDouble / (1L << 53).toDouble)
      val lon = -8.0 + 20.0 * fx
      val lat = 43.0 + 9.0 * fy
      if (inside(lon, lat)) {
        checked += 1
        val tok = S2.cellToken(lon, lat, 7).toString
        assert(tokens.contains(tok),
          s"interior point ($lon, $lat) cell $tok missing from cover")
      }
    }
    assert(checked > 3000, s"sweep must actually hit the interior, got $checked")
    // malformed: short ring, bad coordinates, antimeridian crossing
    val shortRing = new GenericArrayData(ring.take(3)
      .map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
    assert(S2.polygonCover(shortRing, 7) == null)
    val badRing = new GenericArrayData(Array[Any](
      new GenericArrayData(Array[Any](200.0, 0.0)),
      new GenericArrayData(Array[Any](0.0, 0.0)),
      new GenericArrayData(Array[Any](1.0, 1.0)),
      new GenericArrayData(Array[Any](200.0, 0.0))))
    assert(S2.polygonCover(badRing, 7) == null)
    val amRing = new GenericArrayData(Array[Any](
      new GenericArrayData(Array[Any](-179.0, 0.0)),
      new GenericArrayData(Array[Any](179.0, 0.0)),
      new GenericArrayData(Array[Any](179.0, 1.0)),
      new GenericArrayData(Array[Any](-179.0, 0.0))))
    assert(intercept[IllegalArgumentException] {
      S2.polygonCover(amRing, 7)
    }.getMessage.contains("antimeridian"))
    // unclosed ring (first != last) rejects loudly
    val openRing = new GenericArrayData((ring.dropRight(1) :+ Array(-4.0, 46.0))
      .map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
    assert(intercept[IllegalArgumentException] {
      S2.polygonCover(openRing, 7)
    }.getMessage.contains("closed"))
  }

  test("s2: geo_polygon_to_s2cells through the text front-end; default level 11") {
    val ringJson =
      """'{"type":"Polygon","coordinates":[[[-1.0,-1.0],[1.0,-1.0],[1.0,1.0],[-1.0,1.0],[-1.0,-1.0]]]}'"""
    val r = one(s"tolong(array_length(geo_polygon_to_s2cells(parse_json($ringJson), 7)))")
    assert(r.getLong(0) > 8, "a 2x2 degree ring at level 7 covers multiple cells")
    // default level is 11 → strictly more, finer cells
    val r11 = one(s"tolong(array_length(geo_polygon_to_s2cells(parse_json($ringJson))))")
    assert(r11.getLong(0) > r.getLong(0))
  }

  test("s2: line cover completeness; point-to-line distance conventions") {
    import graft.functions.S2
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val line = Array(Array(-15.0, 10.0), Array(-5.0, 14.0), Array(5.0, 12.0))
    val ad = new GenericArrayData(
      line.map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
    val cover = S2.lineCover(ad, 7)
    assert(cover != null && cover.numElements() > 10)
    val toks = (0 until cover.numElements())
      .map(i => cover.getUTF8String(i).toString).toSet
    // every point ON the line (dense parameter sweep) has its cell in
    // the cover — the property a cover miss would break
    for (e <- 0 until line.length - 1; s <- 0 to 500) {
      val t = s / 500.0
      val lon = line(e)(0) + (line(e + 1)(0) - line(e)(0)) * t
      val lat = line(e)(1) + (line(e + 1)(1) - line(e)(1)) * t
      assert(toks.contains(S2.cellToken(lon, lat, 7).toString),
        s"on-line point ($lon, $lat) cell missing from cover")
    }
    val short = new GenericArrayData(line.take(1)
      .map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
    assert(S2.lineCover(short, 7) == null)

    // distance conventions on an equator segment (latm = 0 → the meter
    // scales are exact, every assert bit-exact): on-segment → 0,
    // perpendicular → lat·110574, beyond-endpoint clamps to the vertex
    val lj = """'{"type":"LineString","coordinates":[[0.0,0.0],[1.0,0.0]]}'"""
    assert(one(s"geo_distance_point_to_line(0.5, 0.0, parse_json($lj))").getDouble(0) == 0.0)
    assert(one(s"geo_distance_point_to_line(0.5, 0.5, parse_json($lj))").getDouble(0) == 0.5 * 110574.0)
    assert(one(s"geo_distance_point_to_line(2.0, 0.0, parse_json($lj))").getDouble(0) == 111320.0)
    assert(one(s"geo_distance_point_to_line(200.0, 0.0, parse_json($lj))").isNullAt(0))
    // a 1-vertex line is degenerate → null
    val lj1 = """'{"type":"LineString","coordinates":[[0.0,0.0]]}'"""
    assert(one(s"geo_distance_point_to_line(0.5, 0.0, parse_json($lj1))").isNullAt(0))
  }

  test("h3: res-0 face assignment at face centers; invalid input -> null") {
    import graft.functions.H3
    // a point AT a face center projects to the lattice origin: token
    // = pack(0, face, 0, 0). Face centers from the canonical
    // sorted-triple numbering (lon, lat, face).
    val centers = Seq((0.0, 69.095, 0), (90.0, 20.905, 2), (45.0, 35.264, 3),
      (0.0, -69.095, 5), (-90.0, 20.905, 10), (20.905, 0.0, 16),
      (-20.905, 0.0, 17), (159.095, 0.0, 18))
    for ((lon, lat, f) <- centers) {
      val expect = java.lang.Long.toHexString(H3.pack(0, f, 0L, 0L))
      assert(one(s"geo_point_to_h3cell($lon, $lat, 0)").getString(0) == expect,
        s"face center ($lon, $lat) must land on face $f's origin cell")
    }
    assert(one("geo_point_to_h3cell(200.0, 0.0, 5)").isNullAt(0))
    assert(one("geo_point_to_h3cell(0.0, 91.0, 5)").isNullAt(0))
    // NaN nulls out (negated inside-test); ANSI SQL rejects a 0/0
    // literal, so pin via the static
    assert(H3.cellToken(Double.NaN, 10.0, 5) == null)
    assert(H3.cellToken(10.0, Double.NaN, 5) == null)
  }

  test("h3: token roundtrips through its center; central point is GeoJSON; malformed -> null") {
    import graft.functions.H3
    for ((lon, lat, res) <- Seq((2.35, 48.86, 5), (-20.9, 0.5, 7),
        (151.21, -33.87, 3), (139.7, 35.7, 9))) {
      val tok = one(s"geo_point_to_h3cell($lon, $lat, $res)").getString(0)
      val ctr = one(s"geo_h3cell_to_central_point('$tok')").getStruct(0)
      assert(ctr.getString(0) == "Point")
      val coords = ctr.getSeq[Double](1)
      val back = one(s"geo_point_to_h3cell(${coords(0)}, ${coords(1)}, $res)").getString(0)
      assert(back == tok, s"center of $tok must map back to it, got $back")
    }
    assert(one("geo_h3cell_to_central_point('zzz')").isNullAt(0))
    assert(one("geo_h3cell_neighbors('1')").isNullAt(0))      // no marker bit
    // face 20 is out of range: craft the value directly
    val bad = java.lang.Long.toHexString((1L << 49) | (20L << 40) | (524288L << 20) | 524288L)
    assert(one(s"geo_h3cell_neighbors('$bad')").isNullAt(0))
    // res 13 exceeds MaxRes both at encode and decode
    intercept[Exception](one("geo_point_to_h3cell(0.0, 0.0, 13)"))
    val badRes = java.lang.Long.toHexString((1L << 49) | (13L << 45) | (524288L << 20) | 524288L)
    assert(one(s"geo_h3cell_to_central_point('$badRes')").isNullAt(0))
  }

  test("h3: interior cells have 6 distinct reciprocal same-face neighbors") {
    import graft.functions.H3
    import org.apache.spark.unsafe.types.UTF8String
    def neighbors(tok: String): Seq[String] = {
      val a = H3.neighborsOf(UTF8String.fromString(tok))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    // points well inside faces (>= 8 degrees from every face edge)
    for ((lon, lat) <- Seq((-20.9, 0.5), (20.9, -0.5), (0.0, 66.0), (-45.0, -35.0));
         res <- Seq(4, 6, 8)) {
      val tok = one(s"geo_point_to_h3cell($lon, $lat, $res)").getString(0)
      val nb = neighbors(tok)
      assert(nb.size == 6 && nb.distinct.size == 6 && !nb.contains(tok),
        s"interior cell $tok at res $res: $nb")
      val face0 = H3.decode(UTF8String.fromString(tok))(1)
      nb.foreach { t =>
        assert(H3.decode(UTF8String.fromString(t))(1) == face0, "same face")
        assert(neighbors(t).contains(tok), s"$t must list $tok back")
      }
    }
  }

  test("h3: face-edge neighbors wrap onto the adjacent face and stay local") {
    import graft.functions.H3
    import org.apache.spark.unsafe.types.UTF8String
    def havM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val dLat = math.toRadians(lat2 - lat1); val dLon = math.toRadians(lon2 - lon1)
      val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.sin(dLon / 2) * math.sin(dLon / 2)
      2.0 * 6371000.0 * math.asin(math.min(1.0, math.sqrt(a)))
    }
    def centerOf(tok: String): (Double, Double) = {
      val c = H3.centerOf(UTF8String.fromString(tok))
      (c.getDouble(0), c.getDouble(1))
    }
    // 'gw' (0, 0) sits ON the edge between faces 16 and 17 (tie ->
    // 16); points just either side of several edges at several res.
    // Hex lattices on adjacent faces do NOT align (unlike the S2
    // quadratic-ST cube), so reciprocity is not asserted cross-face;
    // what must hold: valid distinct tokens at the same res, at
    // least one on a DIFFERENT face for an edge-straddling cell, and
    // every neighbor center within 3 cell sizes of the cell center
    // (locality of the wrap).
    for ((lon, lat) <- Seq((0.0, 0.0), (0.01, 66.0), (-41.8, 0.0), (90.0, 0.01));
         res <- Seq(3, 5, 7)) {
      val tok = one(s"geo_point_to_h3cell($lon, $lat, $res)").getString(0)
      val d = H3.decode(UTF8String.fromString(tok))
      val nbArr = H3.neighborsOf(UTF8String.fromString(tok))
      val nb = (0 until nbArr.numElements()).map(i => nbArr.getUTF8String(i).toString)
      assert(nb.nonEmpty && nb.size <= 6 && nb.distinct.size == nb.size)
      val faces = nb.map(t => H3.decode(UTF8String.fromString(t))(1)).toSet
      assert(faces.contains(d(1)) || faces.size > 1, "neighbors exist somewhere")
      assert(nb.forall(t => H3.decode(UTF8String.fromString(t))(0) == d(0)), "same res")
      val (clon, clat) = centerOf(tok)
      val sizeM = H3.sizeAt(res.toInt) * 6371000.0
      nb.foreach { t =>
        val (nlon, nlat) = centerOf(t)
        assert(havM(clon, clat, nlon, nlat) <= 3.0 * sizeM,
          s"wrapped neighbor $t of $tok drifted: ${havM(clon, clat, nlon, nlat)} m")
      }
      // an edge-straddling cell must reach the adjacent face
      if ((lon, lat) == (0.0, 0.0)) assert(faces.exists(_ != d(1)),
        s"edge cell $tok at res $res reported only same-face neighbors")
    }
  }

  test("h3: every point lies within one cell circumradius of its cell center") {
    import graft.functions.H3
    import org.apache.spark.unsafe.types.UTF8String
    // gnomonic projection is distance-expanding, cube rounding picks
    // a center within the planar circumradius, so the sphere distance
    // point -> center is <= size (in radians) with only ulp slack.
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 300) {
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = math.toDegrees(math.asin(rnd.nextDouble() * 2.0 - 1.0))
      val res = rnd.nextInt(9)
      val tok = H3.cellToken(lon, lat, res)
      assert(tok != null)
      val c = H3.centerOf(tok)
      val dLat = math.toRadians(c.getDouble(1) - lat)
      val dLon = math.toRadians(c.getDouble(0) - lon)
      val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
        math.cos(math.toRadians(lat)) * math.cos(math.toRadians(c.getDouble(1))) *
          math.sin(dLon / 2) * math.sin(dLon / 2)
      val distRad = 2.0 * math.asin(math.min(1.0, math.sqrt(a)))
      assert(distRad <= H3.sizeAt(res) * 1.0000001,
        s"($lon, $lat) res $res: $distRad rad > size ${H3.sizeAt(res)}")
    }
  }

  test("h3: rings — sizes, disjointness, ring-1 = neighbors, hex distance") {
    import graft.functions.H3
    import org.apache.spark.unsafe.types.UTF8String
    // interior cell: rings 0..3 have the exact lattice sizes and are
    // pairwise disjoint; ring 1 equals the neighbor set
    val tok = one("geo_point_to_h3cell(-20.9, 0.5, 6)").getString(0)
    val rings = one(s"geo_h3cell_rings('$tok', 3)").getSeq[scala.collection.Seq[String]](0)
    assert(rings.map(_.size) == Seq(1, 6, 12, 18))
    assert(rings.head.head == tok)
    val all = rings.flatten
    assert(all.distinct.size == all.size, "rings must be pairwise disjoint")
    val nb = one(s"geo_h3cell_neighbors('$tok')").getSeq[String](0)
    assert(rings(1).toSet == nb.toSet)
    // ring-2 cells are neighbors of some ring-1 cell but not of the center
    val nbSets = rings(1).map(t =>
      (0 until H3.neighborsOf(UTF8String.fromString(t)).numElements()).map(i =>
        H3.neighborsOf(UTF8String.fromString(t)).getUTF8String(i).toString).toSet)
    rings(2).foreach { t =>
      assert(nbSets.exists(_.contains(t)), s"$t unreachable from ring 1")
      assert(!nb.contains(t) && t != tok)
    }
    // edge cell ('gw' straddles faces 16/17): rings stay valid,
    // disjoint, and bounded by the lattice sizes
    val etok = one("geo_point_to_h3cell(0.0, 0.0, 5)").getString(0)
    val er = one(s"geo_h3cell_rings('$etok', 2)").getSeq[scala.collection.Seq[String]](0)
    assert(er.size == 3 && er(1).size <= 6 && er(2).size <= 12)
    val eall = er.flatten
    assert(eall.distinct.size == eall.size)
    // malformed input / out-of-range n -> null
    assert(one("geo_h3cell_rings('zzz', 2)").isNullAt(0))
    assert(H3.ringsOf(UTF8String.fromString(etok), 17) == null)
    intercept[Exception](one(s"geo_h3cell_rings('$etok', 17)"))
  }

  test("h3: level and parent — containment, monotone chain, conventions") {
    import graft.functions.H3
    import org.apache.spark.unsafe.types.UTF8String
    for ((lon, lat) <- Seq((-20.9, 0.5), (139.7, 35.7), (0.0, 66.0))) {
      val c8 = one(s"geo_point_to_h3cell($lon, $lat, 8)").getString(0)
      assert(one(s"geo_h3cell_level('$c8')").getInt(0) == 8)
      // default parent is one level up; its level is 7
      val p7 = one(s"geo_h3cell_parent('$c8')").getString(0)
      assert(one(s"geo_h3cell_level('$p7')").getInt(0) == 7)
      // parent by containment: re-encoding the child's center at res 7
      // gives the parent — modulo the lon/lat ROUND TRIP this spec
      // goes through (parentOf works on the exact planar center; the
      // unaligned res-8/res-7 lattices let a child center sit within
      // an ulp of a parent boundary), so tolerate a direct neighbor
      val ctr = one(s"geo_h3cell_to_central_point('$c8')").getStruct(0).getSeq[Double](1)
      val enc7 = one(s"geo_point_to_h3cell(${ctr(0)}, ${ctr(1)}, 7)").getString(0)
      val p7nb = one(s"geo_h3cell_neighbors('$p7')").getSeq[String](0)
      assert(enc7 == p7 || p7nb.contains(enc7),
        s"child center re-encoded to $enc7, parent $p7 (neighbors $p7nb)")
      // deep parent: explicit coarser res; chain is monotone in level
      val p3 = one(s"geo_h3cell_parent('$c8', 3)").getString(0)
      assert(one(s"geo_h3cell_level('$p3')").getInt(0) == 3)
    }
    // res above the cell's own res -> null (ADX convention); res 0 of a
    // res-0 cell is itself
    val c2 = one("geo_point_to_h3cell(-20.9, 0.5, 2)").getString(0)
    assert(one(s"geo_h3cell_parent('$c2', 3)").isNullAt(0))
    val c0 = one("geo_point_to_h3cell(-20.9, 0.5, 0)").getString(0)
    assert(one(s"geo_h3cell_parent('$c0', 0)").getString(0) == c0)
    assert(H3.parentOf(UTF8String.fromString(c0), -1) == null)
    assert(one("geo_h3cell_level('zzz')").isNullAt(0))
    assert(one("geo_h3cell_parent('zzz', 1)").isNullAt(0))
  }

  test("h3: children — reciprocity, coverage, counts, conventions") {
    import graft.functions.H3
    import org.apache.spark.unsafe.types.UTF8String
    // interior cell (face 17) and a face-edge cell (gw straddles 16/17)
    for ((lon, lat) <- Seq((-20.9, 0.5), (139.7, 35.7), (0.05, 0.05))) {
      val p4 = one(s"geo_point_to_h3cell($lon, $lat, 4)").getString(0)
      val kids = one(s"geo_h3cell_children('$p4', 5)").getSeq[String](0)
      // aperture 7: ~7 children; a face-EDGE cell's region is clipped
      // by ownership, so several of its hex's children center-round
      // into the adjacent face's parent instead (the 0.05/0.05 sample
      // measures 4 — brute-force verified)
      assert(kids.size >= 3 && kids.size <= 9, s"children of $p4: $kids")
      assert(kids.distinct.size == kids.size)
      assert(kids == kids.sorted, "children sorted")
      // RECIPROCITY: parent(child, 4) == cell for EVERY emitted child
      kids.foreach { k =>
        assert(one(s"geo_h3cell_level('$k')").getInt(0) == 5)
        assert(one(s"geo_h3cell_parent('$k', 4)").getString(0) == p4,
          s"parent of child $k is not $p4")
      }
      // childcount == size(children); default res is one level down
      assert(one(s"geo_h3cell_childcount('$p4', 5)").getInt(0) == kids.size)
      assert(one(s"geo_h3cell_children('$p4')").getSeq[String](0) == kids)
      // PARTITION COMPLETENESS: children-by-center-containment
      // partition the res-5 CELLS (each child cell has exactly one
      // parent), not the parent's REGION — the unaligned lattices let
      // a point sit in parent P while its res-5 cell's CENTER sits in
      // a neighbor of P (true of real H3 too: a child hex is not
      // geometrically contained in its parent hex). The exact pin is
      // therefore: every sampled res-5 cell W appears in
      // childrenOf(parentOf(W)) — the enumeration misses nothing.
      var g = 424242L
      var hits = 0
      for (_ <- 1 to 2000) {
        g = g * 6364136223846793005L + 1442695040888963407L
        val fx = (g >>> 11).toDouble / (1L << 53).toDouble
        g = g * 6364136223846793005L + 1442695040888963407L
        val fy = (g >>> 11).toDouble / (1L << 53).toDouble
        val plon = lon - 2.0 + 4.0 * fx
        val plat = lat - 2.0 + 4.0 * fy
        hits += 1
        val w = H3.cellToken(plon, plat, 5)
        val par = H3.parentOf(w, 4)
        val ch = H3.childrenOf(par, 5)
        val chSet = (0 until ch.numElements())
          .map(i => ch.getUTF8String(i).toString).toSet
        assert(chSet.contains(w.toString),
          s"res-5 cell $w missing from children of its own parent $par")
      }
      assert(hits > 100)
    }
    // gap 2: ~49 children, all reciprocal
    val p3 = one("geo_point_to_h3cell(-20.9, 0.5, 3)").getString(0)
    val kids2 = one(s"geo_h3cell_children('$p3', 5)").getSeq[String](0)
    assert(kids2.size >= 40 && kids2.size <= 58, s"gap-2 count ${kids2.size}")
    kids2.foreach { k =>
      assert(one(s"geo_h3cell_parent('$k', 3)").getString(0) == p3)
    }
    // conventions: same res -> [cell]; finer-than-MaxRes/coarser -> null;
    // gap > 4 rejects loudly; malformed -> null
    assert(one(s"geo_h3cell_children('$p3', 3)").getSeq[String](0) == Seq(p3))
    assert(one(s"geo_h3cell_children('$p3', 2)").isNullAt(0))
    assert(H3.childrenOf(UTF8String.fromString(p3), 13) == null)
    intercept[Exception](one(s"geo_h3cell_children('$p3', 8)").getSeq[String](0))
    assert(one("geo_h3cell_children('zzz', 5)").isNullAt(0))
    assert(one("geo_h3cell_childcount('zzz', 5)").isNullAt(0))
  }

  test("h3: polygon cover is complete over dense pseudo-random interior points") {
    import graft.functions.H3
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def cover(ring: Array[Array[Double]], res: Int): Set[String] = {
      val ad = new GenericArrayData(
        ring.map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
      val c = H3.polygonCover(ad, res)
      assert(c != null)
      val ts = (0 until c.numElements()).map(i => c.getUTF8String(i).toString)
      assert(ts.distinct.size == ts.size, "cover tokens distinct")
      ts.toSet
    }
    def inside(ring: Array[Array[Double]], px: Double, py: Double): Boolean = {
      var c = false
      for (e <- 0 until ring.length - 1) {
        val (x1, y1) = (ring(e)(0), ring(e)(1))
        val (x2, y2) = (ring(e + 1)(0), ring(e + 1)(1))
        if ((y1 > py) != (y2 > py) && px < x1 + (x2 - x1) * (py - y1) / (y2 - y1))
          c = !c
      }
      c
    }
    def sweep(ring: Array[Array[Double]], res: Int,
              bbox: (Double, Double, Double, Double), minHits: Int): Unit = {
      val tokens = cover(ring, res)
      var checked = 0
      var g = 987654321L
      for (_ <- 1 to 20000) {
        g = (g * 6364136223846793005L + 1442695040888963407L)
        val fx = ((g >>> 11).toDouble / (1L << 53).toDouble)
        g = (g * 6364136223846793005L + 1442695040888963407L)
        val fy = ((g >>> 11).toDouble / (1L << 53).toDouble)
        val lon = bbox._1 + (bbox._2 - bbox._1) * fx
        val lat = bbox._3 + (bbox._4 - bbox._3) * fy
        if (inside(ring, lon, lat)) {
          checked += 1
          val tok = H3.cellToken(lon, lat, res).toString
          assert(tokens.contains(tok),
            s"interior point ($lon, $lat) cell $tok missing from cover")
        }
      }
      assert(checked > minHits, s"sweep must hit the interior, got $checked")
    }
    // the registered fence (well inside face 17 — the formal regime)
    val fence = Array(
      Array(-27.0, -5.0), Array(-20.0, -6.5), Array(-15.0, -2.0),
      Array(-19.0, 1.5), Array(-16.0, 5.0), Array(-24.0, 6.0),
      Array(-22.0, 0.5), Array(-27.0, -5.0))
    sweep(fence, 3, (-27.0, -15.0, -6.5, 6.0), 3000)
    // a polygon STRADDLING the face 16/17 edge at lon 0 (the
    // empirical-only regime the scaladoc documents): completeness must
    // still hold on the sweep
    val straddle = Array(
      Array(-6.0, -4.0), Array(7.0, -5.0), Array(5.5, 4.0),
      Array(-1.0, 1.0), Array(-5.0, 5.0), Array(-6.0, -4.0))
    sweep(straddle, 4, (-6.0, 7.0, -5.0, 5.0), 3000)
    // malformed: short ring, bad coordinates, antimeridian crossing
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val shortRing = new GenericArrayData(fence.take(3)
      .map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any))
    assert(H3.polygonCover(shortRing, 3) == null)
    val xmer = Array(Array(170.0, 0.0), Array(-170.0, 0.0),
      Array(175.0, 5.0), Array(170.0, 0.0))
    intercept[IllegalArgumentException] {
      H3.polygonCover(new GenericArrayData(
        xmer.map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any)), 3)
    }
    // unclosed ring (first != last) rejects loudly — an open ring would
    // silently drop the closing edge from the cover
    val open = fence.dropRight(1) :+ Array(-26.0, -4.0)
    intercept[IllegalArgumentException] {
      H3.polygonCover(new GenericArrayData(
        open.map(p => new GenericArrayData(p.map(_.asInstanceOf[Any])): Any)), 3)
    }
  }

  test("h3: codegen and interpreted eval agree") {
    import graft.functions.H3
    val rows = Seq((10.75, 59.91), (-21.94, 64.15), (151.21, -33.87), (178.44, -18.14))
    val viaSql = rows.toDF("lon", "lat")
      .selectExpr("graft_h3_cell(lon, lat, 6) AS c")
      .collect().map(_.getString(0)).toSeq
    val direct = rows.map { case (lon, lat) => H3.cellToken(lon, lat, 6).toString }
    assert(viaSql == direct)
  }

  test("h3: boundaryOf — closed 7-point ring around the cell center") {
    import graft.functions.H3
    import org.apache.spark.unsafe.types.UTF8String
    for ((lon, lat) <- Seq((2.35, 48.86), (-20.905, 0.0), (139.7, 35.7),
        (-43.2, -22.9), (18.4, -33.9))) {
      val tok = H3.cellToken(lon, lat, 4)
      val ring = H3.boundaryOf(tok)
      assert(ring != null && ring.numElements() == 7)
      val pts = (0 until 7).map { i =>
        val p = ring.getArray(i); (p.getDouble(0), p.getDouble(1))
      }
      assert(pts(6) == pts(0)) // closing vertex repeats exactly
      assert(pts.take(6).distinct.size == 6)
      // every corner is equidistant-ish from the center (planar
      // circumradius projects to near-equal sphere distances at
      // res 4: spread under 12% of the mean) and the center's own
      // lon/lat sits strictly inside the corner bounding box
      val c = H3.centerOf(tok)
      val (clon, clat) = (c.getDouble(0), c.getDouble(1))
      def hav(aLon: Double, aLat: Double, bLon: Double, bLat: Double): Double = {
        val (p1, p2) = (math.toRadians(aLat), math.toRadians(bLat))
        val (dp, dl) = (p2 - p1, math.toRadians(bLon - aLon))
        2 * 6371000.0 * math.asin(math.sqrt(
          math.pow(math.sin(dp / 2), 2) +
            math.cos(p1) * math.cos(p2) * math.pow(math.sin(dl / 2), 2)))
      }
      val ds = pts.take(6).map { case (x, y) => hav(clon, clat, x, y) }
      assert((ds.max - ds.min) / (ds.sum / 6) < 0.12, s"corner spread at ($lon,$lat): $ds")
      assert(pts.take(6).map(_._1).min < clon && clon < pts.take(6).map(_._1).max)
      assert(pts.take(6).map(_._2).min < clat && clat < pts.take(6).map(_._2).max)
    }
    assert(H3.boundaryOf(UTF8String.fromString("zzzz")) == null)
    assert(H3.boundaryOf(null) == null)
  }

  test("s2: codegen and interpreted eval agree") {
    import graft.functions.S2
    import org.apache.spark.unsafe.types.UTF8String
    // the SQL path runs through whole-stage codegen; compare against
    // direct static calls (the interpreted eval delegates to the same
    // statics, so this pins the generated-code plumbing)
    val rows = Seq((10.75, 59.91), (-21.94, 64.15), (151.21, -33.87), (178.44, -18.14))
    val viaSql = rows.toDF("lon", "lat")
      .selectExpr("graft_s2_cell(lon, lat, 9) AS c")
      .collect().map(_.getString(0)).toSeq
    val direct = rows.map { case (lon, lat) => S2.cellToken(lon, lat, 9).toString }
    assert(viaSql == direct)
  }
}
