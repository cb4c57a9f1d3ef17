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

  test("pruneHotCells: a planted hot cell trips the pair budget; the rest survive") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // 40 points in one cell (780 pairs), 4 + 3 points in two others
    val pts = ((1 to 40).map(i => (i.toLong, "u4pru")) ++
      (41 to 44).map(i => (i.toLong, "gbsuv")) ++
      (45 to 47).map(i => (i.toLong, "ezs42"))).toDF("k", "cell")
    // budget 100 pairs ⇒ maxDocs = 14: only the 40-point cell is hot
    val (pruned, hot) = GeoOps.pruneHotCells(pts, "cell", maxCellPairs = 100L)
    assert(hot.collect().map(_.getString(0)).toSeq == Seq("u4pru"))
    val left = pruned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(left == Map("gbsuv" -> 4L, "ezs42" -> 3L), left)
    // the capped self-join: pair count is exactly the surviving cells'
    // n·(n−1)/2, never the hot cell's 780
    val nPairs = pruned.as("a").join(pruned.as("b"),
        col("a.cell") === col("b.cell") && col("a.k") < col("b.k")).count()
    assert(nPairs == 4 * 3 / 2 + 3 * 2 / 2, nPairs)
    // budget above the density: nothing pruned
    val (all, none2) = GeoOps.pruneHotCells(pts, "cell", maxCellPairs = 100000L)
    assert(none2.count() == 0 && all.count() == pts.count())
    // the fused window-count form agrees with the anti-join form
    val inline = GeoOps.pruneHotCellsInline(pts, "cell", maxCellPairs = 100L)
    assert(inline.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq ==
      pruned.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq)
    assert(GeoOps.pruneHotCellsInline(pts, "cell", 100000L).count() == pts.count())
  }
}
