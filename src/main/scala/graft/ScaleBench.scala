package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-curve harness: run the heavy-tail / LSH / CC / graph / window
  * keys at 1×, 3× and 10× the bench corpus (see [[ScaleGen]]) and report
  * per-key wall time plus the fitted scaling exponent
  * alpha = ln(t_b / t_a) / ln(size_b / size_a) — alpha ≈ 1 is linear,
  * the tolerance band the 100 TB story requires; anything clearly above
  * means a candidate-pair or shuffle blowup that one-SF timing cannot
  * see. Candidate-PAIR counts for the three LSH tiers are probed
  * directly (pairs, not seconds — the quantity whose quadratic escape
  * the band/budget parameters exist to prevent).
  *
  * Output: `SCALEBENCH {...}` JSON lines (one per key×dir + pair probes
  * + a final exponents summary). Results land in BASELINE.md §19.
  *
  * Env: SPARK_GRAFT_SCALE_DIRS ("label=dir,..." — defaults below),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 2, reported min),
  * SPARK_GRAFT_PROBES ("all" default, "none", or a comma list of probe
  * names — the 30×/100× legs select minhash_pairs only, because the
  * threshold-0.30 cosine probe counts a constant FRACTION of all N²/2
  * pairs BY DEFINITION and is already characterized at 1×/3×/10×).
  */
object ScaleBench {
  /** Keys whose INPUT is scale-proportional (documents/embeddings/events
    * with no fixed-size cap; the sim_ann_* query sides are capped at 5
    * rows by design but their candidate scans are the full table). */
  val defaultKeys: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash", "dedup_simhash",
    "dedup_embedding_cosine_lsh", "dedup_cluster_cc_chain",
    "sim_topk_cosine", "sim_ann_lsh", "sim_ann_ivf", "sim_ann_pq",
    "sim_ann_ivfpq",
    "graph_pagerank_scaled", "graph_label_propagation_scaled",
    "graph_triangle_scaled", "graph_assortativity_scaled",
    "corpus_prep_e2e", "text_pack_sequences_ids",
    "search_bm25_topk", "search_bm25_batch", "text_nb_quality_distill",
    "agg_funnel_stages", "win_attribution_last_touch",
    "dedup_minhash_vs_exact", "dedup_simhash_vs_exact",
    "search_bm25_model_roundtrip", "text_nb_model_roundtrip",
    "sim_embed_pca", "text_vocab_growth", "text_source_divergence",
    "sample_dsir_select", "text_zipf_slope", "ts_holt_winters")

  def main(args: Array[String]): Unit = {
    // `runMain graft.ScaleBench probes` = pair probes only, no key loop
    val probesOnly = args.toSeq == Seq("probes")
    val keys =
      if (probesOnly) Nil
      else if (args.nonEmpty) args.toSeq else defaultKeys
    val dirSpec = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIRS",
      "1=/root/testdata/sf0.1," +
        "3=/root/repo/scaledata/scale3x," +
        "10=/root/repo/scaledata/scale10x")
    val dirs: Seq[(Double, String)] = dirSpec.split(",").toSeq.map { p =>
      val Array(l, d) = p.split("=", 2); (l.toDouble, d)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // candidate-pair probes: the raw pair count per LSH tier and dir
    dirs.foreach { case (label, dir) =>
      Seq("documents", "embeddings", "events").foreach { n =>
        try Tables(spark, dir, n).count() catch { case _: Throwable => () }
      }
      val docs = Tables(spark, dir, "documents")
      val emb = Tables(spark, dir, "embeddings")
      val probes = Seq(
        "minhash_pairs" -> (() => graft.ops.DedupOps
          .minhashCandidatePairs(docs, "doc_id", "text", estThreshold = 0.5)
          .count()),
        "simhash_pairs" -> (() => graft.ops.DedupOps
          .simhashDupPairs(docs, "doc_id", "text").count()),
        // hamming ≤ 1: the tight-radius production setting — pair
        // density at radius 3 grows with corpus density by definition
        // (more docs per fixed signature space), the radius is the knob
        "simhash_pairs_h1" -> (() => graft.ops.DedupOps
          .simhashDupPairs(docs, "doc_id", "text", maxHamming = 1).count()),
        "cosine_lsh_pairs" -> (() => graft.ops.SimilarityOps
          .cosineDupPairs(emb, "vec_id", "embedding", threshold = 0.30)
          .count()),
        // threshold 0.90: the near-DUP production setting — at 0.30 the
        // pair set is a constant FRACTION of all N²/2 pairs (quadratic
        // for ANY exact algorithm); at 0.90 it tracks true duplicates
        "cosine_lsh_pairs_t90" -> (() => graft.ops.SimilarityOps
          .cosineDupPairs(emb, "vec_id", "embedding", threshold = 0.90)
          .count()))
      val probeSel = sys.env.getOrElse("SPARK_GRAFT_PROBES", "all")
      val selected = probeSel match {
        case "all" => probes
        case "none" => Nil
        case list =>
          val want = list.split(",").map(_.trim).toSet
          probes.filter { case (n, _) => want(n) }
      }
      selected.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val res: Either[String, Long] =
          try Right(f()) catch { case e: Throwable => Left(e.getClass.getSimpleName) }
        val sec = (System.nanoTime() - t0) / 1e9
        res match {
          case Right(c) => println(
            f"""SCALEBENCH {"probe":"$name","scale":$label%.0f,"pairs":$c,"sec":$sec%.3f}""")
          case Left(e) => println(
            s"""SCALEBENCH {"probe":"$name","scale":$label,"err":"$e"}""")
        }
      }
    }

    // per-key timings
    val times = scala.collection.mutable.Map[(String, Double), Double]()
    dirs.foreach { case (label, dir) =>
      keys.foreach { key =>
        val fn = SparkEntry.queries(key)
        val attempts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try Right((fn(spark, dir).count(), (System.nanoTime() - t0) / 1e9)._2)
          catch { case e: Throwable => Left(e.getClass.getSimpleName) }
        }
        val oks = attempts.collect { case Right(t) => t }
        if (oks.nonEmpty) {
          times((key, label)) = oks.min
          println(f"""SCALEBENCH {"key":"$key","scale":$label%.0f,"sec":${oks.min}%.3f}""")
        } else println(
          s"""SCALEBENCH {"key":"$key","scale":$label,"err":"${
            attempts.collectFirst { case Left(m) => m }.get}"}""")
      }
    }

    // fitted exponents vs the 1× base
    val base = dirs.head._1
    keys.foreach { key =>
      val pts = dirs.flatMap { case (l, _) => times.get((key, l)).map(l -> _) }
      if (pts.size == dirs.size) {
        val t1 = pts.head._2
        val alphas = pts.tail.map { case (l, t) =>
          val a = math.log(t / t1) / math.log(l / base)
          f""""alpha_${l.toInt}x":$a%.2f"""
        }
        println(s"""SCALEBENCH {"key":"$key",${alphas.mkString(",")},"t_1x":$t1}""")
      }
    }
    spark.stop()
  }
}
