package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Probability recalibration by isotonic regression (Zadrozny & Elkan
  * 2002; the standard remedy once a reliability diagram shows a scorer
  * is a ranker, not a probability — exactly what `profile_calibration`
  * measured for the NB distillation tier: Brier 0.194 / ECE 0.184).
  *
  * Shape of the algorithm, engineered for the 100 TB design point and
  * for exact cross-engine verification:
  *
  *  - The corpus never sorts globally. Predictions quantize onto a
  *    HARD-BOUNDED grid of 10⁴+1 cells (floor(p·10⁴); p is already the
  *    upstream pipeline's DECIMAL(12,6), so the cell is exact decimal
  *    arithmetic), and ONE map-side-combinable aggregation produces
  *    the (cell, n, Σy) fit grid — ≤ 10001 rows by construction, at
  *    any corpus size.
  *
  *  - [[isotonicFitDense]] collects that model-sized grid (the
  *    [[BpeOps.bpeFit]] driver-fit contract — the collect is on a
  *    bounded post-aggregation table, never the corpus) and runs exact
  *    pool-adjacent-violators: block means compare by BigInt
  *    cross-multiplication (n and Σy are corpus-scale longs; a 2-count
  *    product overflows Long past ~3e9²), so pooling decisions are
  *    bit-deterministic with NO floating point anywhere. Each cell's
  *    calibrated value is round-half-up(10⁶·blockΣy/blockN) in exact
  *    integer arithmetic — micro-units, the [[UnigramLmOps]] grid
  *    discipline. The step function then extends DENSE over all 10001
  *    cells (carry-forward; leading cells backfill from the first
  *    block), so serve-time lookup is a broadcast EQUI-join — no
  *    as-of machinery on the hot path.
  *
  *  - The fit is REFUTABLE, not trusted: the staged artifact carries
  *    each observed cell's own (n, Σy) AND its block's (blockN,
  *    blockΣy), so a verifier re-derives everything that makes the
  *    function THE isotonic fit — (1) the staged grid matches an
  *    independent re-aggregation, (2) blocks are consistent runs
  *    (Σ cell n = blockN within a run), (3) block means strictly
  *    increase (cross-multiplied), (4) every within-block prefix mean
  *    ≥ the block mean (the PAV optimality/complementary-slackness
  *    condition — together with (3) it characterizes the unique L2
  *    isotonic solution), (5) cal_micro is the exact rounded block
  *    mean, and (6) the dense fill is the correct step extension.
  *    [[isotonicCheck]] computes ALL SIX in-plan with window functions
  *    (independent of the driver fold); the DuckDB oracle re-derives
  *    them again in SQL.
  */
object CalibrateOps {

  /** Fit-grid resolution: cell = floor(p·10⁴) ∈ [0, 10000]. */
  val GridCells = 10001

  /** Micro-unit quantum of calibrated probabilities (1e-6 grid). */
  val Micro = 1000000L

  /** Exact round-half-up of the rational (Micro·sy)/n in BigInt. */
  private def calMicroOf(sy: BigInt, n: BigInt): Long =
    ((BigInt(2) * Micro * sy + n) / (BigInt(2) * n)).toLong

  /** One dense calibrator row: `cell` ∈ [0,10000]; `n`/`sy` are the
    * cell's own fit counts (0 for unobserved cells); `blkN`/`blkSy`
    * the owning PAV block's totals (0 for unobserved); `calMicro` the
    * step function value at the cell. */
  final case class CalCell(cell: Int, n: Long, sy: Long,
      blkN: Long, blkSy: Long, calMicro: Long)

  /** TRAIN: exact PAV over the aggregated fit grid (`cellCol` INT in
    * [0,10000], `nCol`/`syCol` LONG counts), densely extended. See the
    * object doc for the contract. */
  def isotonicFitDense(grid: DataFrame, cellCol: String = "cell",
      nCol: String = "n", syCol: String = "sy"): Seq[CalCell] = {
    val rows = grid
      .select(col(cellCol).cast(IntegerType), col(nCol).cast(LongType),
        col(syCol).cast(LongType))
      .collect() // driver-side model fit: grid is ≤ 10001 rows by construction
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, "isotonicFitDense: empty fit grid")
    rows.foreach { case (c, n, sy) =>
      require(c >= 0 && c < GridCells, s"cell $c outside [0, ${GridCells - 1}]")
      require(n >= 1 && sy >= 0 && sy <= n, s"cell $c: bad counts n=$n sy=$sy")
    }
    require(rows.map(_._1).distinct.length == rows.length,
      "isotonicFitDense: duplicate cells — pass the AGGREGATED grid")
    // PAV with a block stack; pooling compares means by cross-mult.
    // >= merges equal means too, so staged blocks are maximal runs.
    final case class Blk(startIdx: Int, var n: BigInt, var sy: BigInt)
    val stack = collection.mutable.ArrayBuffer.empty[Blk]
    rows.zipWithIndex.foreach { case ((_, n, sy), i) =>
      stack += Blk(i, BigInt(n), BigInt(sy))
      while (stack.length >= 2 && {
        val a = stack(stack.length - 2); val b = stack.last
        a.sy * b.n >= b.sy * a.n // mean(prev) >= mean(cur) → pool
      }) {
        val b = stack.remove(stack.length - 1)
        val a = stack.last
        a.n += b.n; a.sy += b.sy
      }
    }
    // per observed cell: its block totals + rounded block mean
    val perObserved = new Array[(Long, Long, Long)](rows.length)
    stack.zipWithIndex.foreach { case (blk, bi) =>
      val end =
        if (bi + 1 < stack.length) stack(bi + 1).startIdx else rows.length
      val cm = calMicroOf(blk.sy, blk.n)
      (blk.startIdx until end).foreach { i =>
        perObserved(i) = (blk.n.toLong, blk.sy.toLong, cm)
      }
    }
    val byCell = rows.indices.map { i =>
      rows(i)._1 -> (rows(i), perObserved(i))
    }.toMap
    // dense step extension: carry forward; lead-in backfills from the
    // first block (the step function's left limit)
    val firstCal = perObserved(0)._3
    val out = collection.mutable.ArrayBuffer.empty[CalCell]
    var last = firstCal
    (0 until GridCells).foreach { c =>
      byCell.get(c) match {
        case Some(((_, n, sy), (bn, bsy, cm))) =>
          last = cm
          out += CalCell(c, n, sy, bn, bsy, cm)
        case None =>
          out += CalCell(c, 0L, 0L, 0L, 0L, last)
      }
    }
    out.toSeq
  }

  /** IN-PLAN refutation of a staged dense calibrator against an
    * independently re-aggregated fit grid (`gridDf`: cell, n, sy for
    * observed cells). Returns one row (`n_pav_bad` LONG) counting
    * violations of the six conditions in the object doc — zero iff
    * `calDf` is THE exact dense isotonic fit of `gridDf`. Window-based
    * — shares no code with the driver fold. Both frames are
    * model-sized (≤ 10001 rows). */
  def isotonicCheck(calDf: DataFrame, gridDf: DataFrame): DataFrame = {
    val joined = calDf.alias("c")
      .join(gridDf.select(col("cell"), col("n").as("_gn"),
        col("sy").as("_gsy")), Seq("cell"), "left")
    val wOrd = Window.orderBy(col("cell")) // ≤10001 rows: bounded frame
    // (1) staged per-cell counts match the re-aggregation (unobserved
    // cells must carry zeros)
    val gridBad = sum(when(
      coalesce(col("_gn"), lit(0L)) =!= col("n") ||
        coalesce(col("_gsy"), lit(0L)) =!= col("sy"), 1L).otherwise(0L))
    // observed-cell sub-sequence with block run ids: a run = maximal
    // streak of equal (blkN, blkSy)
    val obs = joined.filter(col("n") > 0)
      .withColumn("_chg", when(
        lag(col("blkN"), 1).over(wOrd).isNull ||
          lag(col("blkN"), 1).over(wOrd) =!= col("blkN") ||
          lag(col("blkSy"), 1).over(wOrd) =!= col("blkSy"), 1L)
        .otherwise(0L))
      .withColumn("_run", sum(col("_chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_pn", sum(col("n")).over(Window.partitionBy(col("_run"))
        .orderBy(col("cell"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_psy", sum(col("sy")).over(Window.partitionBy(col("_run"))
        .orderBy(col("cell"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def d20(c: Column): Column = c.cast(DecimalType(20, 0))
    val perRun = obs.groupBy(col("_run"))
      .agg(max(col("blkN")).as("bn"), max(col("blkSy")).as("bsy"),
        min(col("blkN")).as("bn2"), min(col("blkSy")).as("bsy2"),
        sum(col("n")).as("rn"), sum(col("sy")).as("rsy"),
        max(col("calMicro")).as("cm"), min(col("calMicro")).as("cm2"),
        // (4) prefix optimality: prefix_sy·blkN ≥ blkSy·prefix_n,
        // exact in DECIMAL(20)·DECIMAL(20) products
        sum(when(d20(col("_psy")) * d20(col("blkN")) <
          d20(col("blkSy")) * d20(col("_pn")), 1L).otherwise(0L))
          .as("prefBad"))
      // (2) run totals = the block totals every member claims
      .withColumn("_blkBad", when(
        col("bn") =!= col("bn2") || col("bsy") =!= col("bsy2") ||
          col("cm") =!= col("cm2") ||
          col("rn") =!= col("bn") || col("rsy") =!= col("bsy"), 1L)
        .otherwise(0L))
      // (5) calMicro = exact round-half-up block mean, i.e.
      //     cm = floor((2·10⁶·bsy + bn) / (2·bn)) ⇔
      //     cm·2·bn ≤ 2·10⁶·bsy + bn < (cm+1)·2·bn — checked by
      //     CROSS-MULTIPLICATION like (3)/(4): Spark decimal DIVISION
      //     rounds HALF_UP at scale 6 BEFORE floor, which false-flags
      //     genuine fits once blkN ≳ 1e6 (quotient fraction inside
      //     half an ulp of 1). Products ≤ ~2e26 fit DECIMAL(38,0).
      .withColumn("_cmBad", {
        val target = d20(col("bsy")) * lit(2L * Micro) + d20(col("bn"))
        val twoBn = d20(col("bn")) * lit(2L)
        when(d20(col("cm")) * twoBn > target ||
          (d20(col("cm")) + lit(1L)) * twoBn <= target, 1L)
          .otherwise(0L)
      })
      // (3) strictly increasing block means across runs
      .withColumn("_monoBad", when(
        lag(col("bsy"), 1).over(Window.orderBy(col("_run"))).isNotNull &&
          d20(lag(col("bsy"), 1).over(Window.orderBy(col("_run")))) *
            d20(col("bn")) >=
          d20(col("bsy")) *
            d20(lag(col("bn"), 1).over(Window.orderBy(col("_run")))),
        1L).otherwise(0L))
    val runBad = perRun.agg(
      (sum(col("_blkBad")) + sum(col("_cmBad")) + sum(col("_monoBad")) +
        sum(col("prefBad"))).as("_rb"))
    // (6) dense fill: unobserved cells carry the previous observed
    // cell's value; lead-in cells carry the first observed value
    val fill = joined
      .withColumn("_lastObs", last(when(col("n") > 0, col("calMicro")),
        ignoreNulls = true)
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_firstObs", first(when(col("n") > 0, col("calMicro")),
        ignoreNulls = true)
        .over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .agg(sum(when(col("n") === 0 &&
        col("calMicro") =!= coalesce(col("_lastObs"), col("_firstObs")),
        1L).otherwise(0L)).as("_fb"),
        // and the dense table covers every cell exactly once
        when(count(lit(1)) =!= GridCells.toLong, lit(1L)).otherwise(lit(0L))
          .as("_cov"),
        gridBad.as("_gb"))
    fill.crossJoin(runBad)
      .select((col("_fb") + col("_cov") + col("_gb") + col("_rb"))
        .as("n_pav_bad"))
  }
}
