package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(lat: Double, lon: Double, p: Int): String =
    Seq((lat, lon)).toDF("lat", "lon")
      .select(GeoOps.geohash(col("lat"), col("lon"), p).as("g"))
      .as[String].head()

  test("geohash matches the published reference cells") {
    // the canonical example cell (Wikipedia's geohash article)
    assert(hashOf(42.605, -5.603, 5) == "ezs42")
    // a longer published cell (Jutland, precision 11)
    assert(hashOf(57.64911, 10.40744, 11) == "u4pruydqqvj")
    // prefixes nest: the same point at lower precision is a prefix
    assert(hashOf(57.64911, 10.40744, 4) == "u4pr")
    assert(hashOf(57.64911, 10.40744, 1) == "u")
  }

  test("geohash edges: poles, antimeridian, origin, out-of-range → NULL") {
    assert(hashOf(90.0, 180.0, 4) == "zzzz") // top corner clamps into the last cell
    assert(hashOf(-90.0, -180.0, 4) == "0000")
    assert(hashOf(0.0, 0.0, 1) == "s")
    val bad = Seq((91.0, 0.0), (0.0, 181.0), (-90.5, 0.0))
      .toDF("lat", "lon")
      .select(GeoOps.geohash(col("lat"), col("lon"), 4).as("g"))
      .collect()
    assert(bad.forall(_.isNullAt(0)), bad.mkString(","))
    intercept[IllegalArgumentException] {
      GeoOps.geohash(col("lat"), col("lon"), 13)
    }
  }

  test("geohash blocking property: nearby points share prefixes, far points do not") {
    // two points ~150 m apart vs a point on another island-scale offset
    val a = hashOf(20.7967, -156.3319, 6)
    val b = hashOf(20.7979, -156.3324, 6)
    val far = hashOf(21.3069, -157.8583, 6)
    assert(a.take(5) == b.take(5), s"$a vs $b")
    assert(a.take(3) != far.take(3), s"$a vs $far")
  }

  test("geohashNeighborhood: 3x3 interior, pole clamp, antimeridian wrap") {
    def nbrs(lat: Double, lon: Double, p: Int): Set[String] =
      Seq((lat, lon)).toDF("lat", "lon")
        .select(GeoOps.geohashNeighborhood(col("lat"), col("lon"), p).as("n"))
        .as[Seq[String]].head().toSet
    // interior point: 9 distinct cells including its own
    val inner = nbrs(42.605, -5.603, 5)
    assert(inner.size == 9 && inner.contains("ezs42"), inner)
    // north-pole row: the northern neighbors fall off — 6 cells
    val pole = nbrs(90.0, 0.0, 3)
    assert(pole.size == 6, pole)
    assert(pole.contains(hashOf(90.0, 0.0, 3)))
    // antimeridian: the set still has 9 cells (longitude WRAPS) and
    // contains cells from both sides of the seam
    val seam = nbrs(10.0, 180.0, 3)
    assert(seam.size == 9, seam)
    assert(seam.contains(hashOf(10.0, 180.0, 3)))
    assert(seam.contains(hashOf(10.0, -179.9, 3)), seam)
  }

  test("explodeNeighborCells ≡ the array form, point by point") {
    import org.apache.spark.sql.functions.collect_set
    val pts = Seq(
      (1L, 42.605, -5.603), (2L, 90.0, 0.0), (3L, 10.0, 180.0),
      (4L, -90.0, -180.0), (5L, 0.0, 0.0)).toDF("k", "lat", "lon")
    val viaArray = pts.select($"k",
        GeoOps.geohashNeighborhood($"lat", $"lon", 4).as("cells"))
      .as[(Long, Seq[String])].collect().map { case (k, c) => k -> c.toSet }
      .toMap
    val viaExplode = GeoOps.explodeNeighborCells(pts, "lat", "lon", 4)
      .groupBy($"k").agg(collect_set($"cell").as("cells"))
      .as[(Long, Seq[String])].collect().map { case (k, c) => k -> c.toSet }
      .toMap
    assert(viaArray == viaExplode, s"$viaArray vs $viaExplode")
    // invalid coordinates emit nothing from the frame form
    val none = GeoOps.explodeNeighborCells(
      Seq((9L, 91.0, 0.0)).toDF("k", "lat", "lon"), "lat", "lon", 4)
    assert(none.count() == 0)
  }
}
