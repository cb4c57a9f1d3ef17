package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  private def gridDf(cells: Seq[(Int, Long, Long)]) =
    cells.toDF("cell", "n", "sy")

  test("PAV: hand-computed pools, exact rounded means, dense fill") {
    // cells 10,20,30,40 with means 0.5, 1.0, 0.0, 0.75:
    // 1.0 > 0.0 pools (20,30) → mean 2/6 = 1/3; 0.5 ≥ 1/3 pools with
    // cell 10 → (10,20,30) mean 4/10 = 0.4 < 0.75 → two blocks
    val fit = CalibrateOps.isotonicFitDense(gridDf(Seq(
      (10, 4L, 2L), (20, 2L, 2L), (30, 4L, 0L), (40, 4L, 3L))))
    assert(fit.length == CalibrateOps.GridCells)
    val byCell = fit.map(c => c.cell -> c).toMap
    Seq(10, 20, 30).foreach { c =>
      assert(byCell(c).blkN == 10L && byCell(c).blkSy == 4L, byCell(c))
      assert(byCell(c).calMicro == 400000L)
    }
    assert(byCell(40).blkN == 4L && byCell(40).blkSy == 3L)
    assert(byCell(40).calMicro == 750000L)
    // dense fill: lead-in backfills block 1, gaps carry forward,
    // tail carries the last block
    assert(byCell(0).calMicro == 400000L && byCell(9).calMicro == 400000L)
    assert(byCell(25).calMicro == 400000L)
    assert(byCell(35).calMicro == 400000L) // gap between blocks: previous
    assert(byCell(41).calMicro == 750000L)
    assert(byCell(10000).calMicro == 750000L)
    // unobserved cells carry zero counts
    assert(byCell(25).n == 0L && byCell(25).blkN == 0L)
    // round-half-up: mean 1/3 → 333333.5-free case; mean 1/6 → 166667
    val f2 = CalibrateOps.isotonicFitDense(gridDf(Seq((0, 6L, 1L))))
    assert(f2.head.calMicro == 166667L, f2.head)
  }

  test("PAV matches the brute-force minimax characterization on random grids") {
    val rng = new scala.util.Random(11)
    (1 to 25).foreach { trial =>
      val k = 2 + rng.nextInt(8)
      val cells = (0 until k).map { i =>
        val n = 1L + rng.nextInt(9)
        (i * (1 + rng.nextInt(3)), n, rng.nextLong(n + 1).abs % (n + 1))
      }.distinctBy(_._1).sortBy(_._1)
      val fit = CalibrateOps.isotonicFitDense(gridDf(cells))
      val byCell = fit.map(c => c.cell -> c).toMap
      // iso(i) = max_{a<=i} min_{b>=i} mean(cells a..b), exact rationals
      def mean(a: Int, b: Int): (BigInt, BigInt) = {
        val slice = cells.slice(a, b + 1)
        (BigInt(slice.map(_._3).sum), BigInt(slice.map(_._2).sum))
      }
      cells.indices.foreach { i =>
        val cand = (0 to i).map { a =>
          (i until cells.length).map(b => mean(a, b))
            .minBy(identity)(Ordering.fromLessThan[(BigInt, BigInt)] {
              case ((s1, n1), (s2, n2)) => s1 * n2 < s2 * n1 })
        }.maxBy(identity)(Ordering.fromLessThan[(BigInt, BigInt)] {
          case ((s1, n1), (s2, n2)) => s1 * n2 < s2 * n1 })
        val got = byCell(cells(i)._1)
        assert(BigInt(got.blkSy) * cand._2 == cand._1 * BigInt(got.blkN),
          s"trial $trial cell ${cells(i)._1}: " +
            s"${got.blkSy}/${got.blkN} != ${cand._1}/${cand._2}")
      }
    }
  }

  test("isotonicCheck: zero on the genuine fit; planted defects are caught") {
    val cells = Seq((100, 5L, 4L), (200, 5L, 1L), (300, 4L, 4L))
    val fit = CalibrateOps.isotonicFitDense(gridDf(cells))
    val calDf = fit.toDF()
    val gDf = gridDf(cells)
    def bad(c: org.apache.spark.sql.DataFrame): Long =
      CalibrateOps.isotonicCheck(c, gDf).as[Long].head()
    assert(bad(calDf) == 0L, "genuine fit flagged")
    // planted: break monotonicity/fill by perturbing one cell's value
    val broken1 = calDf.withColumn("calMicro",
      when(col("cell") === 300, lit(100000L)).otherwise(col("calMicro")))
    assert(bad(broken1) > 0L, "non-monotone calibrator not caught")
    // planted: wrong block mean rounding
    val broken2 = calDf.withColumn("calMicro",
      when(col("cell") === 300, col("calMicro") + 1L)
        .otherwise(col("calMicro")))
    assert(bad(broken2) > 0L, "off-by-one block mean not caught")
    // planted: staged grid count disagrees with the re-aggregation
    val broken3 = calDf.withColumn("n",
      when(col("cell") === 100, lit(6L)).otherwise(col("n")))
    assert(bad(broken3) > 0L, "grid mismatch not caught")
    // planted: a block claiming totals its run doesn't sum to
    val broken4 = calDf.withColumn("blkN",
      when(col("cell") === 300, col("blkN") + 1L).otherwise(col("blkN")))
    assert(bad(broken4) > 0L, "inconsistent block totals not caught")
    // planted: wrong dense fill in a gap
    val broken5 = calDf.withColumn("calMicro",
      when(col("cell") === 150, lit(999999L)).otherwise(col("calMicro")))
    assert(bad(broken5) > 0L, "bad fill not caught")
  }

  test("isotonicCheck: corpus-scale block counts stay exact (cross-multiplied, no decimal division)") {
    // blkN in the billions: the pre-r14 check divided DECIMAL(38,0)s
    // (rounded HALF_UP at scale 6 BEFORE floor — false flags once
    // blkN ≳ 1e6); the cross-multiplied form is exact at any count
    val big = Seq(
      (100, 3333333333L, 1111111111L),
      (200, 4999999999L, 3999999997L))
    val fit = CalibrateOps.isotonicFitDense(gridDf2(big))
    val n = CalibrateOps.isotonicCheck(fit.toDF(), gridDf2(big))
      .as[Long].head()
    assert(n == 0L, s"genuine corpus-scale fit flagged: $n")
    // and the check still catches an off-by-one at this scale
    val broken = fit.toDF().withColumn("calMicro",
      when(col("cell") === 200, col("calMicro") + 1L)
        .otherwise(col("calMicro")))
    assert(CalibrateOps.isotonicCheck(broken, gridDf2(big))
      .as[Long].head() > 0L, "off-by-one at corpus scale not caught")
  }

  private def gridDf2(cells: Seq[(Int, Long, Long)]) = {
    import spark.implicits._
    cells.toDF("cell", "n", "sy")
  }

  test("isotonicCheck refutes a NON-isotonic 'fit' that is merely monotone") {
    // monotone and consistent-looking but NOT the L2 fit: collapse the
    // two blocks of (means 0.8, then 0.2→pool) ... construct: cells
    // with means 0.2, 0.8; the genuine fit keeps them separate; a
    // single pooled block (mean 0.5) is monotone and internally
    // consistent but violates the prefix condition on its own run? No:
    // prefix mean 0.2 < 0.5 → prefBad flags it. That is the check that
    // separates "a monotone step function" from "THE isotonic fit".
    val cells = Seq((100, 5L, 1L), (200, 5L, 4L))
    val pooled = Seq(
      CalibrateOps.CalCell(100, 5L, 1L, 10L, 5L, 500000L),
      CalibrateOps.CalCell(200, 5L, 4L, 10L, 5L, 500000L)) ++
      (0 until CalibrateOps.GridCells)
        .filterNot(c => c == 100 || c == 200)
        .map(c => CalibrateOps.CalCell(c, 0L, 0L, 0L, 0L, 500000L))
    val n = CalibrateOps.isotonicCheck(
      pooled.sortBy(_.cell).toDF(), gridDf(cells)).as[Long].head()
    assert(n > 0L, "over-pooled monotone function not refuted")
  }
}
