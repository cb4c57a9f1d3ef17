package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("renameCollisions suffixes shared non-key columns only") {
    val l = Seq((1, "x", "tz1")).toDF("k", "a", "timezone")
    val r = Seq((1, "y", "tz2")).toDF("k", "b", "timezone")
    val renamed = Joins.renameCollisions(l, r, Seq("k"), "_vc")
    assert(renamed.columns.toSet == Set("k", "b", "timezone_vc"))
  }

  test("saltedJoin returns exactly the rows of the plain join under skew") {
    val rnd = new scala.util.Random(11)
    // 90% of the big side lands on one hot key — the salting target
    val big = (1 to 2000).map { i =>
      val k = if (rnd.nextInt(10) < 9) 1 else 1 + rnd.nextInt(50)
      (k, i.toLong)
    }.toDF("k", "row_id")
    val small = (1 to 50).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select($"k", $"row_id", $"name")
      .as[(Int, Long, String)].collect().toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), $"row_id", nSalts = 8)
      .select($"k", $"row_id", $"name")
      .as[(Int, Long, String)].collect().toSet
    assert(salted == plain)
    // and the salt really fans the hot key out across sub-keys
    val saltSpread = big.filter($"k" === 1)
      .select(pmod(xxhash64($"row_id"), lit(8)).cast("int").as("s"))
      .distinct().count()
    assert(saltSpread == 8)
  }

  test("saltedJoin rejects join types it cannot preserve") {
    val big = Seq((1, 10L)).toDF("k", "row_id")
    val small = Seq((1, "a")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, small, Seq("k"), $"row_id", 4, "full")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, small, Seq("k"), $"row_id", 4, "right_outer")
    }
  }

  test("saltedJoin preserves left-join semantics for unmatched rows") {
    val big = Seq((1, 10L), (2, 20L), (99, 30L)).toDF("k", "row_id")
    val small = Seq((1, "a"), (2, "b")).toDF("k", "name")
    val out = Joins.saltedJoin(big, small, Seq("k"), $"row_id", 4, "left")
      .select($"k", $"row_id", $"name").as[(Int, Long, Option[String])]
      .collect().toSet
    assert(out == Set((1, 10L, Some("a")), (2, 20L, Some("b")), (99, 30L, None)))
  }
}
