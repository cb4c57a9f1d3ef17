package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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

  /** Geohash cell id of (lat, lon) at `precision` base32 characters
    * (5 bits each, lon takes the even bit positions — the public
    * geohash layout). Implemented as ONE closed-form integer column
    * expression: quantize each axis to its bit budget with pure
    * comparisons-free arithmetic
    * (`floor((x + range) / (2·range) · 2^bits)`, clamped at the top
    * edge), interleave with shift-and-mask terms, then slice the
    * alphabet per 5-bit group. Codegen-friendly: no UDF, no loop at
    * run time — the `precision·5` interleave terms unroll at PLAN
    * time into a fixed expression tree (≤ 60 terms at the max
    * precision 12).
    *
    * Out-of-range coordinates yield NULL (quarantine rows, never a
    * wrapped-around cell). */
  def geohash(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12], got $precision")
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2 // lon owns the even positions
    val latBits = totalBits / 2
    def quant(x: Column, range: Double, bits: Int): Column = {
      val cells = 1L << bits
      // top edge (x == +range) belongs to the LAST cell, not cell 2^b
      least(
        floor((x.cast(DoubleType) + range) / (2 * range) * cells)
          .cast(LongType),
        lit(cells - 1))
    }
    val latQ = quant(lat, 90.0, latBits)
    val lonQ = quant(lon, 180.0, lonBits)
    // interleaved index: bit (totalBits-1) is lon's MSB, then lat's
    // MSB, alternating downward
    val interleaved = (0 until totalBits).map { pos =>
      // pos counts from the MSB of the combined index
      val fromTop = pos
      val isLon = fromTop % 2 == 0
      val srcBit = // which bit of the source axis this position reads
        if (isLon) lonBits - 1 - fromTop / 2
        else latBits - 1 - fromTop / 2
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
        (group + 1).cast(org.apache.spark.sql.types.IntegerType))
    }
    val valid = lat.isNotNull && lon.isNotNull &&
      lat >= -90.0 && lat <= 90.0 && lon >= -180.0 && lon <= 180.0
    when(valid, concat(charCols: _*))
  }
}
