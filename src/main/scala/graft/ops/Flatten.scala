package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two signature flatten transforms (SURVEY.md §2.3),
  * re-expressed as fully distributed Spark plans.
  *
  *  - `explodeStructs` ≙ "vcFlatten" (reference README.md:643-666,
  *    1334-1358): explode an array-of-structs column, project struct
  *    fields to flat names.
  *  - `unzipParallelArrays` ≙ "omUnzip" (reference README.md:693-725,
  *    1384-1413). The reference collect()s each parallel array to the
  *    driver and zips in a Python loop — O(dataset) on one machine and
  *    broken for >1 input file. Here `arrays_zip` + `explode` keeps the
  *    unzip inside the plan (codegen'd, per-row, no shuffle), so it
  *    scales to any number of files/rows, and the per-file scalars ride
  *    along in the same row instead of the reference's
  *    `crossJoin(limit(1))` broadcast (README.md:728).
  */
object Flatten {

  /** Explode `arrayCol` (array of structs) and flatten.
    *
    * @param scalars (existing column expr -> output name) carried through
    * @param fields  (struct field name -> output name) projected per element
    */
  def explodeStructs(
      df: DataFrame,
      arrayCol: String,
      scalars: Seq[(String, String)],
      fields: Seq[(String, String)]): DataFrame = {
    val carried = scalars.map { case (c, a) => col(c).as(a) }
    df.select(carried :+ explode(col(arrayCol)).as("_row"): _*)
      .select(scalars.map { case (_, a) => col(a) } ++
        fields.map { case (f, a) => col(s"_row.$f").as(a) }: _*)
  }

  /** Unzip a struct-of-parallel-arrays column (`structCol`) into one row
    * per array index; each array field becomes a flat column, scalars are
    * carried through the explode.
    *
    * @param strict when true, raggedness (array-length mismatch within a
    *   row) raises — the distributed form of the reference's length check
    *   (README.md:699-704). The check is IN-PLAN (`raise_error` guarding
    *   the zip expression), so it costs zero extra scans: the failure
    *   surfaces from the same single pass that performs the unzip, at
    *   action time. An earlier version ran an eager
    *   `filter(ragged).limit(1).count()` pre-scan — a second full read of
    *   the input per call, which doubles the most expensive stage of a
    *   bulk pipeline at scale. When false, `arrays_zip` pads short arrays
    *   with nulls (lenient mode).
    */
  def unzipParallelArrays(
      df: DataFrame,
      structCol: String,
      scalars: Seq[(String, String)],
      strict: Boolean = true): DataFrame = {
    val st = df.schema(structCol).dataType match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"$structCol must be a struct of arrays, got $other")
    }
    val arrFields: Seq[String] = st.fields.collect {
      case StructField(n, ArrayType(_, _), _, _) => n
    }.toIndexedSeq
    require(arrFields.nonEmpty, s"$structCol has no array fields")

    val carried = scalars.map { case (c, a) => col(c).as(a) }
    val zipped0 = arrays_zip(arrFields.map(f => col(s"$structCol.$f").as(f)): _*)
    val zipped =
      if (strict && arrFields.size > 1) {
        val sizes = arrFields.map(f => size(col(s"$structCol.$f")))
        // per-row guard: rows with consistent lengths never evaluate the
        // raise_error branch (when() short-circuits), ragged rows fail the
        // job with a diagnostic carrying the offending sizes
        when(greatest(sizes: _*) =!= least(sizes: _*),
          raise_error(concat(
            lit(s"inconsistent array lengths under $structCol " +
              s"(fields: ${arrFields.mkString(", ")}); sizes: "),
            concat_ws(",", sizes.map(_.cast(StringType)): _*))))
          .otherwise(zipped0)
      } else zipped0
    df.select(carried :+ explode(zipped).as("_z"): _*)
      .select(scalars.map { case (_, a) => col(a) } ++
        arrFields.map(f => col(s"_z.$f").as(f)): _*)
  }

  /** Rebuild a struct-of-parallel-arrays from an array-of-structs column —
    * used by tests/queries to round-trip flat data through the unzip path.
    */
  def parallelArrays(arrayOfStructs: Column, fields: Seq[String]): Column =
    struct(fields.map(f => transform(arrayOfStructs, r => r.getField(f)).as(f)): _*)
}
