package graft

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Plan-shape assertions (SURVEY.md §5.4): the optimizations the reference
  * hand-rolls or relies on must actually fire in our plans.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def li = Tables(spark, sf, "lineitem")

  test("NOT EXISTS SQL is planned as a LeftAnti join (RewritePredicateSubquery)") {
    Tables(spark, sf, "customer").createOrReplaceTempView("customer_v")
    Tables(spark, sf, "orders").createOrReplaceTempView("orders_v")
    val df = spark.sql(
      """SELECT c_custkey FROM customer_v c
        |WHERE NOT EXISTS (SELECT 1 FROM orders_v o WHERE o.o_custkey = c.c_custkey)""".stripMargin)
    val antiJoins = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti => j
    }
    assert(antiJoins.nonEmpty, df.queryExecution.optimizedPlan.toString)
  }

  test("orderBy + limit collapses to TakeOrderedAndProject (no full sort)") {
    val df = li.orderBy($"l_extendedprice".desc).limit(10)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("broadcast hint yields a BroadcastHashJoin") {
    val sup = Tables(spark, sf, "supplier")
    val df = li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("shuffle_hash hint yields a ShuffledHashJoin (no sort passes)") {
    val df = graft.queries.Catalog.specs("join_shuffle_hash").fn(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("filters and projections push into the parquet scan") {
    val df = li.filter($"l_returnflag" === "R").select($"l_orderkey", $"l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"), plan)
    // column pruning: the scan reads only the referenced columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double"), plan)
    assert(!plan.contains("l_comment"))
  }

  test("whole-stage codegen covers the aggregation hot path") {
    val df = li.groupBy($"l_returnflag").agg(sum($"l_quantity"))
    df.collect() // materialize THIS plan so AQE finalizes it with codegen stages
    // codegen'd spans print as `*(n)` in Spark 4 plan strings
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true") && plan.contains("*("), plan)
  }

  test("runtime bloom-filter pruning fires on a selective shuffle join") {
    // the 100 TB lever behind Spark's InjectRuntimeFilter rule: a
    // selective predicate on the dim side materializes a bloom filter
    // that pre-filters the fact side BEFORE the join shuffle — most fact
    // rows drop where they were read instead of being shuffled and then
    // discarded. Thresholds forced to 0 here because the test tables are
    // tiny; at real scale the defaults (10 MB dim / 10 GB fact) gate it.
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // creationSideThreshold is a MAX (dim must be small enough): default
    // 10 MB already admits the tiny dim; the application-side minimum
    // must drop to 0 because the test fact table is nowhere near 10 GB
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    val fact = Tables(s, sf, "lineitem")
    val dim = Tables(s, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
    val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("bloom"),
      s"expected an injected bloom filter in the optimized plan:\n$optimized")
    // semantics unaffected by the filter (it only removes non-matching rows early)
    val expected = fact.join(dim.hint("broadcast"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      .collect().toSeq
    assert(joined.collect().toSeq == expected)
  }

  test("dynamic partition pruning prunes fact partitions via a filtered dim join") {
    // the join-driven half of the pruning story (filter_partition_prune
    // asserts the static half): on a star schema at 100×, the dim-side
    // filter must reach the fact scan as a runtime partition filter —
    // otherwise the join reads every partition and filters after IO.
    // DPP is on by default; AQE on to assert the shape that ships.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp_fact").toFile.getAbsolutePath
    Tables(s, sf, "orders")
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(dir)
    val fact = s.read.parquet(dir)
    val nPart = fact.select($"o_orderpriority").distinct().count()
    assert(nPart >= 3, s"fixture must have several partitions, got $nPart")
    // dim with a selective filter on the non-key column — the predicate
    // DPP pushes across the join as a partition subquery. The dim must
    // be FILE-backed: a filtered LocalRelation constant-folds at
    // optimization time, leaving no Filter node for the pruning rule to
    // find (exactly why in-memory toy dims under-test this path).
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toFile.getAbsolutePath
    Seq(("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
      ("4-NOT SPECIFIED", 4), ("5-LOW", 5)).toDF("prio", "rank")
      .write.mode("overwrite").parquet(dimDir)
    val dim = s.read.parquet(dimDir).filter($"rank" === 1)
    val joined = fact.join(dim, $"o_orderpriority" === $"prio")
      .groupBy($"prio")
      .agg(sum($"o_totalprice".cast("decimal(18,4)")).as("tot"))
    joined.collect()
    val top = joined.queryExecution.executedPlan
    assert(top.toString.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n${top.toString.take(4000)}")
    // and the pruning actually happened: the fact scan read ONE partition.
    // (TreeNode.collect stops at AQE query-stage leaves — unwrap them.)
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(top).filter(
      _.metadata.get("Location").exists(_.contains("dpp_fact")))
    assert(scans.nonEmpty, top.toString.take(4000))
    val partsRead = scans.head.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(1L),
      s"DPP should leave 1 of $nPart partitions, metrics: " +
        scans.head.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
  }

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    // the other half of the skew story (Joins.saltedJoin is the manual
    // lever): AQE detects an oversized join partition at runtime and
    // splits it. Thresholds forced down because test data is KB-sized.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    // 90% of the left side lands on one key
    val big = (1 to 20000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val dim = (1 to 20000).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    val joined = big.join(dim, "k")
    // materialize THIS plan object so AQE finalizes it (count() would
    // execute a different QueryExecution)
    assert(joined.collect().length == 20000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the skewed join (skew=true):\n${plan.take(4000)}")
  }

  test("plan audit: every query key plans without CartesianProduct; BNLJ only where intended") {
    // the r1 close-out audit (BASELINE.md §4), promoted to a permanent
    // regression gate: a key that silently degrades to an unhinted
    // cartesian at any future round fails here, not in the bench tail
    // The allow-set is DERIVED from the QuerySpec.allowBnlj marker —
    // a key with an intentional BroadcastNestedLoopJoin (1-row
    // scalar-stats broadcast, bounded pair enumeration, or a
    // deliberate compression-path full scan) declares it at its own
    // definition site in Catalog.scala; this audit just reads it.
    val allowBnlj = graft.queries.Catalog.specs.collect {
      case (name, spec) if spec.allowBnlj => name
    }.toSet
    val offenders = graft.queries.Catalog.specs.toSeq.sortBy(_._1)
      .flatMap { case (name, spec) =>
        val plan = spec.fn(spark, sf).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") && !allowBnlj(name)
        if (cart || bnlj) Seq(s"$name: cartesian=$cart unexpected-bnlj=$bnlj") else Nil
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("vocab-scale keys carry no single-partition Window stage") {
    // `WindowExec` with an empty partitionSpec funnels its ENTIRE input
    // through one task (Spark logs `No Partition Defined` for it). Fine
    // over a handful of pre-aggregated rows, fatal over a web-corpus
    // vocabulary (10⁸–10⁹ distinct tokens) — which is exactly what
    // text_build_vocab / text_unigram_logprob aggregate over. Both were
    // rebuilt on zipWithIndex / 1-row-aggregate shapes; keep them that way.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val offenders = Seq("text_build_vocab", "text_unigram_logprob").flatMap { name =>
      val df = graft.queries.Catalog.specs(name).fn(spark, sf)
      df.collect() // finalize AQE so the real stages are inspectable
      flatten(df.queryExecution.executedPlan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => s"$name: $w"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("growth accounting plans exactly one Window (one-pass lag+lead)") {
    // the r12-flagged duplicated window sort: status (lag) and churn
    // (lead) branches each carried their own Window over the same
    // (cust, mi) spec — r13 computes both offsets in ONE window
    // projection and explodes per-row contributions, so the per-actor
    // sort is paid once. Keep it that way.
    val ga = graft.queries.Catalog.specs("agg_growth_accounting").fn(spark, sf)
    ga.collect()
    val nWindow = "(?m)^.*\\bWindow\\b".r.findAllIn(
      ga.queryExecution.optimizedPlan.toString).size
    assert(nWindow == 1,
      s"expected exactly 1 Window, got $nWindow:\n" +
        ga.queryExecution.optimizedPlan.toString)
  }

  test("round-9 keys keep their intended plan shapes") {
    // PSL registrable-domain extraction is a pure column program: the
    // whole snapshot rides inside the expression tree as hash-set
    // probes — any Join appearing here means the lookup regressed to a
    // rule-table join the 100 TB URL scan would pay per row
    val psl = graft.queries.Catalog.specs("text_url_psl_domain").fn(spark, sf)
    psl.collect()
    val pslPlan = psl.queryExecution.executedPlan.toString
    assert(!pslPlan.toLowerCase.contains("join"), pslPlan)

    // contamination scoring: the benchmark gram set must reach the
    // corpus stream as a BROADCAST hit-marker join (the corpus-sized
    // explode never shuffles on the gram), and the one-pass r10 shape
    // must keep exactly ONE corpus-side Generate (the two-branch form
    // re-shingled the corpus once per branch)
    val cs = graft.queries.Catalog.specs("dedup_contamination_score").fn(spark, sf)
    cs.collect()
    val csPlan = cs.queryExecution.executedPlan.toString
    assert(csPlan.contains("BroadcastHashJoin"), csPlan)
    val nGenerate = "(?m)^.*Generate\\b".r.findAllIn(
      cs.queryExecution.optimizedPlan.toString).size
    // one Generate for the corpus explode + one for the (small)
    // benchmark gram-set build — a third means a branch re-exploded
    assert(nGenerate <= 2, s"expected ≤ 2 Generates, got $nGenerate:\n" +
      cs.queryExecution.optimizedPlan.toString)
  }

  test("scale gate: no collect() in main ops/streaming sources") {
    def sources(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles).toSeq.flatten.flatMap {
        case d if d.isDirectory => sources(d)
        case f if f.getName.endsWith(".scala") => Seq(f)
        case _ => Nil
      }
    val offenders = for {
      f <- sources(new java.io.File("src/main/scala/graft"))
      line <- scala.io.Source.fromFile(f, "UTF-8").getLines()
      if line.matches(".*\\.collect\\(\\).*") && !line.trim.startsWith("//")
      // schema introspection collects metadata, not data
      if !line.contains("fields.collect")
      // explicitly-marked driver-side partition-TUPLE materialization
      // (bounded by partition count, not row count) is allowed
      if !line.contains("partition-tuple metadata")
      // explicitly-marked driver-side FILE-tuple materialization
      // (bounded by file count — the compaction/OPTIMIZE walk class:
      // one slim row per file, never data rows) is allowed
      if !line.contains("file-tuple metadata")
      // explicitly-marked offline MODEL fits collecting a BUDGETED
      // post-aggregation table (the pqFit/ivfFit/bpeFit contract:
      // model-sized, loud failure over budget) are allowed
      if !line.contains("driver-side model fit")
      // explicitly-marked reloads of a FROZEN vocab-sized model
      // artifact (the loadModel contract: the table IS the model, read
      // once on the driver so the encoder UDF can consult it) are
      // allowed
      if !line.contains("driver-side model reload")
      // explicitly-marked query-set broadcasts (r15, hnswCandidates):
      // the ANN query side is small BY CONTRACT — the same budget
      // class bruteTopK expresses as broadcast(queries), collected
      // only because the rows must reach a mapPartitions closure
      if !line.contains("driver-side query-set broadcast")
    } yield s"${f.getPath}: $line"
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
