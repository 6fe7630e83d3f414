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
}
