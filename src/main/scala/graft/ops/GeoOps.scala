package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Geospatial bucketing — the reference's data model is literally
  * weather stations with coordinates (14 stations across 7 islands,
  * reference README.md:15-59), and the first thing a spatial pipeline
  * does with point data at scale is GRID it: geohash cells are the
  * standard shuffle/join/aggregation key for proximity workloads
  * (points in the same or neighboring cells are candidate neighbors —
  * the same blocking idea as LSH bands, on the globe).
  *
  * Everything here is EXACT integer arithmetic — quantize, interleave
  * bits, map 5-bit groups through the base32 alphabet — so the DuckDB
  * oracle replays it verbatim; no trigonometry anywhere (great-circle
  * DISTANCE needs libm sin/cos whose last ulp is engine-specific, so
  * ranking by distance belongs to a rerank stage, not the bucketing
  * key).
  */
object GeoOps {

  /** The standard geohash base32 alphabet (no a/i/l/o). */
  val Base32: String = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def lonBitsOf(precision: Int) = (precision * 5 + 1) / 2
  private def latBitsOf(precision: Int) = precision * 5 / 2

  /** Axis quantization: `floor((x + range) / (2·range) · 2^bits)`, the
    * top edge (x == +range) clamped into the LAST cell, not cell 2^b. */
  private def quant(x: Column, range: Double, bits: Int): Column = {
    val cells = 1L << bits
    least(
      floor((x.cast(DoubleType) + range) / (2 * range) * cells)
        .cast(LongType),
      lit(cells - 1))
  }

  /** Cell string from ALREADY-QUANTIZED axis indexes — the shared core
    * of [[geohash]] and the neighbor expansion in
    * [[geohashNeighborhood]] (which perturbs the integer indexes, never
    * the doubles). Interleaves with plan-time-unrolled shift-and-mask
    * terms (lon owns the even bit positions — the public geohash
    * layout), then slices the alphabet per 5-bit group. */
  def cellFromQuantized(latQ: Column, lonQ: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val totalBits = precision * 5
    val lonBits = lonBitsOf(precision)
    val latBits = latBitsOf(precision)
    val interleaved = (0 until totalBits).map { pos =>
      val isLon = pos % 2 == 0
      val srcBit =
        if (isLon) lonBits - 1 - pos / 2
        else latBits - 1 - pos / 2
      val src = if (isLon) lonQ else latQ
      shiftleft(
        shiftright(src, srcBit).bitwiseAND(lit(1L)),
        totalBits - 1 - pos)
    }.reduce(_ + _)
    val charCols = (0 until precision).map { i =>
      val group = shiftright(interleaved, (precision - 1 - i) * 5)
        .bitwiseAND(lit(31L))
      element_at(
        typedlit(Base32.toCharArray.map(_.toString).toSeq),
        (group + 1).cast(IntegerType))
    }
    concat(charCols: _*)
  }

  private def validCoord(lat: Column, lon: Column): Column =
    lat.isNotNull && lon.isNotNull &&
      lat >= -90.0 && lat <= 90.0 && lon >= -180.0 && lon <= 180.0

  /** Geohash cell id of (lat, lon) at `precision` base32 characters.
    * ONE closed-form integer column expression — codegen-friendly, no
    * UDF, no run-time loop (the `precision·5` interleave terms unroll
    * at PLAN time, ≤ 60 terms at the max precision 12).
    *
    * Out-of-range coordinates yield NULL (quarantine rows, never a
    * wrapped-around cell). */
  def geohash(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val latQ = quant(lat, 90.0, latBitsOf(precision))
    val lonQ = quant(lon, 180.0, lonBitsOf(precision))
    when(validCoord(lat, lon), cellFromQuantized(latQ, lonQ, precision))
  }

  /** The point's cell PLUS its (up to) 8 neighbors, as a distinct cell
    * array — the blocking set a border-correct proximity join explodes
    * on: a single-cell equi-join structurally misses every pair split
    * by a cell boundary, so production blocking emits the 3×3
    * neighborhood for one side of the join (emitting it for both sides
    * double-counts). Neighbor arithmetic happens on the QUANTIZED
    * integer indexes: longitude wraps at the antimeridian (pmod),
    * latitude CLAMPS at the poles (dropping the out-of-range northern/
    * southern neighbor — there is nothing north of the pole row).
    * Out-of-range coordinates yield NULL like [[geohash]]. */
  def geohashNeighborhood(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val latBits = latBitsOf(precision)
    val lonBits = lonBitsOf(precision)
    val latCells = 1L << latBits
    val lonCells = 1L << lonBits
    val latQ = quant(lat, 90.0, latBits)
    val lonQ = quant(lon, 180.0, lonBits)
    val cells = for (dLat <- -1 to 1; dLon <- -1 to 1) yield {
      val lq = latQ + dLat
      val gq = pmod(lonQ + dLon, lit(lonCells))
      when(lq >= 0L && lq < latCells,
        cellFromQuantized(lq, gq, precision))
    }
    when(validCoord(lat, lon),
      array_distinct(filter(array(cells: _*), c => c.isNotNull)))
  }

  /** Prune cells whose point density would blow the per-cell PAIR
    * budget — the geo twin of the LSH degenerate-bucket prune
    * ([[DedupOps.minHashLsh]]): a genuinely hot cell (city-density
    * data) makes the blocking self-join quadratic in that one cell, so
    * production blocking either refines the grid or DROPS the cell and
    * reports it, never silently scans n²/2 pairs. The doc threshold is
    * derived from `maxCellPairs` in exact driver-side arithmetic
    * (DedupOps.maxDocsForPairBudget — an in-plan n·(n−1)/2 wraps past
    * ~3e9 docs, admitting exactly the degenerate cells the cap exists
    * for); the over-budget cell set is found with a map-side-combined
    * count. The anti join carries NO broadcast hint: the hot set is
    * tiny for sane budgets, but its size is bounded only by
    * n/maxDocs — a degenerate maxCellPairs (maxDocs near 1) makes it
    * nearly every distinct cell, and a forced hint would bypass AQE's
    * size guard. AQE broadcasts when small and degrades to a shuffle
    * when not (the same reasoning as lineFrequencyFilter's unhinted
    * anti join).
    *
    * Returns (pruned frame, the over-budget cell frame) so callers can
    * surface WHAT was dropped — silent truncation reads as "covered
    * everything" when it didn't. */
  def pruneHotCells(df: org.apache.spark.sql.DataFrame, cellCol: String,
      maxCellPairs: Long): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val maxDocs = DedupOps.maxDocsForPairBudget(maxCellPairs)
    val hot = df.groupBy(col(cellCol))
      .agg(count(lit(1)).as("_cn"))
      .filter(col("_cn") > maxDocs) // doc threshold ⇔ pair budget
      .select(col(cellCol))
    (df.join(hot, Seq(cellCol), "left_anti"), hot)
  }

  /** [[pruneHotCells]]' FUSED form for consumers whose next operation
    * already shuffles on `cellCol` (the blocking self-join does): a
    * window count over the cell partition rides the SAME exchange and
    * sort the join needs — no second input scan, no broadcast-build
    * stage. Measured: the anti-join form cost geo_cell_pairs +65% /
    * the border key +40% steady-state at sf0.1; this form is ~free.
    * Use the anti-join form when the consumer does NOT shuffle on the
    * cell, or when the hot-cell REPORT is wanted. */
  def pruneHotCellsInline(df: org.apache.spark.sql.DataFrame,
      cellCol: String, maxCellPairs: Long): org.apache.spark.sql.DataFrame = {
    val maxDocs = DedupOps.maxDocsForPairBudget(maxCellPairs)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col(cellCol))
    df.withColumn("__cn", count(lit(1)).over(wc))
      .filter(col("__cn") <= maxDocs)
      .drop("__cn")
  }

  /** Frame-level neighborhood expansion — [[geohashNeighborhood]]'s
    * scalable form: EXPLODE THE OFFSETS FIRST (9 literal (dLat, dLon)
    * rows per point), then compute ONE [[cellFromQuantized]] over the
    * adjusted indexes. The array form inlines NINE full cell
    * expressions into one projection — an interpreted HOF chain over a
    * ~200-node tree that measured 2× slower than even the dense-grid
    * join it feeds (the CollapseProject/HOF re-evaluation class); this
    * shape keeps a single codegen-able cell expression in the plan.
    * Emits (input columns…, `cellOut`), up to 9 rows per valid point
    * (longitude wraps, pole rows drop their off-grid neighbors);
    * invalid coordinates emit nothing. */
  def explodeNeighborCells(df: org.apache.spark.sql.DataFrame,
      latCol: String, lonCol: String, precision: Int,
      cellOut: String = "cell"): org.apache.spark.sql.DataFrame = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val latBits = latBitsOf(precision)
    val lonBits = lonBitsOf(precision)
    val lat = col(latCol)
    val lon = col(lonCol)
    val offsets = typedlit(
      for { a <- -1 to 1; b <- -1 to 1 } yield (a, b))
    df.filter(validCoord(lat, lon))
      .withColumn("__latq", quant(lat, 90.0, latBits))
      .withColumn("__lonq", quant(lon, 180.0, lonBits))
      .withColumn("__d", explode(offsets))
      .withColumn("__latq2", col("__latq") + col("__d._1"))
      .filter(col("__latq2") >= 0L && col("__latq2") < (1L << latBits))
      .withColumn(cellOut, cellFromQuantized(
        col("__latq2"),
        pmod(col("__lonq") + col("__d._2"), lit(1L << lonBits)),
        precision))
      .drop("__latq", "__lonq", "__d", "__latq2")
  }
}
