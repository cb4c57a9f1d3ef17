package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The operator catalog — one QuerySpec per SURVEY.md §2 key,
  * assembled from the per-family Catalog* objects (r16 split; the
  * driver contract `specs`/`queries`/`oracleSql` is unchanged).
  * Each part owns its keys; a duplicate key across parts is a
  * construction error, caught eagerly below.
  */
object Catalog {

  private val parts: Seq[Map[String, QuerySpec]] = Seq(
    CatalogAgg.specs,
    CatalogSqlFn.specs,
    CatalogScanSink.specs,
    CatalogProj.specs,
    CatalogJoins.specs,
    CatalogStream.specs,
    CatalogWinSetop.specs,
    CatalogProfile.specs,
    CatalogDedup.specs,
    CatalogGraphGeo.specs,
    CatalogSim.specs,
    CatalogMisc.specs,
    CatalogMultimodal.specs,
    CatalogText.specs,
    CatalogTextTok.specs,
    CatalogSample.specs,
    CatalogTs.specs)

  val specs: Map[String, QuerySpec] = {
    val merged = parts.reduce(_ ++ _)
    val total = parts.map(_.size).sum
    require(merged.size == total, {
      val dups = parts.flatMap(_.keys)
        .groupBy(identity).collect { case (k, v) if v.size > 1 => k }
      s"duplicate catalog keys across parts: ${dups.toSeq.sorted.mkString(", ")}"
    })
    merged
  }


  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map { case (k, v) => k -> v.fn }

  def oracleSql: Map[String, String] =
    specs.collect { case (k, QuerySpec(_, Some(sql), _)) => k -> sql }
}
