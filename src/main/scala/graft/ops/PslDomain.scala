package graft.ops

import scala.io.Source

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registrable-domain ("eTLD+1") extraction backed by a bundled
  * Public Suffix List snapshot — the grouping grain for domain caps,
  * blocklists, and per-site statistics over a crawl corpus.
  *
  * The PSL is a DATA FILE, not an algorithm (reference README.md has no
  * URL stage; this is north-star extension surface): `co.uk`, `com.au`,
  * `gov.br` are registry suffixes that no label-counting heuristic can
  * know. The last-two-label rule merges every `*.co.uk` site into one
  * bucket — a domain-diversity cap then over-prunes exactly the
  * long-tail sites it exists to protect. The bundled snapshot
  * (`graft/psl_snapshot.dat`, curated from the public
  * publicsuffix.org list) carries the three PSL rule shapes:
  *
  *  - exact rules (`co.uk`): the suffix is the rule itself;
  *  - wildcard rules (`*.ck`): every 2nd-level label under the TLD is
  *    a registry — the suffix is one label LONGER than the base;
  *  - exception rules (`!www.ck`): carve-outs that override any other
  *    matching rule — the suffix is the rule MINUS its first label.
  *
  * Unlisted TLDs fall through to the PSL default rule `*` (last label
  * is the suffix), which reproduces the old last-two-label behavior —
  * so swapping this in under [[TextOps.urlDomain]] changes nothing for
  * hosts the snapshot doesn't cover. A host that IS a public suffix
  * (`co.uk`, `bar.ck`) has no registrable domain → empty string, same
  * as the old rule's single-label result.
  *
  * Scale shape: the lookup compiles to a zero-shuffle column program —
  * per rule-length `substring_index` probes against `isin` sets
  * (Catalyst converts large `In` lists to hash-set `InSet`, still
  * codegen'd). No join, no broadcast, no UDF: the whole snapshot rides
  * inside the expression tree, so a 100 TB URL scan pays one hash
  * probe per rule length per row. [[rulesDf]] exposes the same parsed
  * rules as a DataFrame so an external engine (the DuckDB oracle) can
  * replay the identical algorithm from the identical data.
  */
object PslDomain {

  /** One parsed rule: `kind` ∈ x (exact) / w (wildcard, `suffix` is
    * the base AFTER `*.`) / e (exception, `suffix` keeps all labels);
    * `nlabels` counts the labels of `suffix`. */
  final case class Rule(kind: String, suffix: String, nlabels: Int)

  /** Parsed snapshot, loaded once per JVM from the bundled resource. */
  lazy val rules: Seq[Rule] = {
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.dat")
    require(in != null, "missing bundled resource graft/psl_snapshot.dat")
    val src = Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines()
        .map(_.trim.toLowerCase)
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .map { l =>
          if (l.startsWith("!")) {
            val s = l.drop(1)
            val n = s.count(_ == '.') + 1
            // an exception rule shortens by one label; a 1-label rule
            // would yield suffixLen 0 and silently fold to "" — the
            // published list has none, and one appearing in a snapshot
            // refresh must fail the build, not ship wrong domains
            require(n >= 2, s"PSL exception rule with < 2 labels: !$s")
            Rule("e", s, n)
          } else if (l.startsWith("*.")) {
            val s = l.drop(2)
            Rule("w", s, s.count(_ == '.') + 1)
          } else Rule("x", l, l.count(_ == '.') + 1)
        }
        .toVector
    } finally src.close()
  }

  /** Longest suffix length any rule can produce (exception rules
    * shorten by one; wildcard rules lengthen by one) — bounds the
    * candidate probes both here and in an oracle restatement. */
  lazy val maxSuffixLabels: Int = rules.map {
    case Rule("w", _, n) => n + 1
    case Rule("e", _, n) => n - 1
    case Rule(_, _, n)   => n
  }.max

  /** The parsed rules as (kind, suffix, nlabels) — stage this to
    * parquet and an external engine can run the same match as a join
    * against last-k-label candidates. */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rules.map(r => (r.kind, r.suffix, r.nlabels))
      .toDF("kind", "suffix", "nlabels")
  }

  /** Registrable domain of a (lowercase, dot-separated) host column.
    *
    * Per the PSL algorithm: find the prevailing rule (exception beats
    * all; otherwise the longest match; otherwise the default rule
    * `*`), derive the public-suffix label count, and return the suffix
    * plus one label — or the empty string when the host IS a public
    * suffix (nothing registrable) or is a single unmatched label. */
  def registrableDomain(host: Column): Column = {
    val n = size(split(host, "\\."))
    // last-k labels, joined: substring_index("a.b.c", ".", -2) = "b.c".
    // When the host has fewer than k labels it returns the whole host,
    // which cannot collide: every probe set holds exactly-k-label keys.
    def lastK(k: Int) = substring_index(host, ".", -k)

    val byLen = rules.groupBy(r => (r.kind, r.nlabels))
    def sets(kind: String): Seq[(Int, Seq[String])] =
      byLen.collect { case ((`kind`, k), rs) => k -> rs.map(_.suffix) }
        .toSeq.sortBy(_._1)

    // Exception rules prevail unconditionally: suffix = rule minus its
    // first label, so matching an n-label exception yields length n-1.
    // Among MULTIPLE matching exception rules the PSL prevails the
    // LONGEST — probe descending so the coalesce picks it (ascending
    // would pick the shortest; latent with the current snapshot's
    // non-overlapping rules, divergent after any refresh that adds
    // overlap — and the DuckDB oracle restatement already takes max).
    val excLen = sets("e").reverse
      .map { case (k, sfx) => when(lastK(k).isin(sfx: _*), lit(k - 1)) }
      .reduceOption(coalesce(_, _))
    val exactLens = sets("x").map { case (k, sfx) =>
      when(lastK(k).isin(sfx: _*), lit(k)).otherwise(lit(0))
    }
    // A wildcard base match needs a label in the `*` position: the
    // host must extend at least one label past the base.
    val wildLens = sets("w").map { case (k, sfx) =>
      when(n >= k + 1 && lastK(k).isin(sfx: _*), lit(k + 1))
        .otherwise(lit(0))
    }
    val longest = greatest((exactLens ++ wildLens :+ lit(1)): _*)
    val suffixLen = excLen.map(coalesce(_, longest)).getOrElse(longest)

    // registrable = last (suffixLen + 1) labels; substring_index needs
    // a literal count, so branch over the finite suffix lengths.
    (1 to maxSuffixLabels).foldLeft(lit("")) { (acc, k) =>
      when(suffixLen === k && n > k, lastK(k + 1)).otherwise(acc)
    }
  }
}
