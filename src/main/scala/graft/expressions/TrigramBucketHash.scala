package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-trigram buckets as ONE native codegen'd pass — tier (b)
  * of the custom-operator ladder, the hot-path twin of
  * [[graft.ops.LangIdOps.trigramHashesOnCps]]'s two-projection HOF
  * chain (which itself exists because the one-projection form re-split
  * the document per element_at — BASELINE §39's lambda-inlining trap).
  * The HOF chain still materializes a boxed code-point array and a
  * boxed bucket array per row through interpreted lambdas; this
  * expression lowercases once, walks code points once, keeps a rolling
  * 3-window, and emits one primitive int array — no per-element
  * allocation, inside whole-stage codegen.
  *
  * Bit-compatibility contract (property-tested in ExpressionSpec):
  * `TrigramBucketHash(s, B, seed)` equals
  * `trigramHashesOnCps(cpsOf(s), B, seed)` element-for-element —
  * lowercase via UTF8String.toLowerCase (Spark's `lower`), code points
  * via the same per-character semantics as `ascii(split(s, ''))`
  * (Spark 4's ascii is code-point-valued, measured: 的 → 30340), hash
  * `h ← (h·31 + cp) mod (2³¹−1)` seeded `seed mod m` per gram, bucket
  * `h mod B`. Strings under 3 code points yield an EMPTY array (no
  * evidence), matching the HOF form; NULL input yields NULL.
  */
case class TrigramBucketHash(child: Expression, buckets: Int, seed: Long)
    extends UnaryExpression {

  require(buckets >= 2, s"trigram_bucket_hash: buckets must be >= 2, got $buckets")

  // a non-STRING child surfaces as a proper AnalysisException at analysis
  // time (not a constructor IllegalArgumentException) — the FreqSketch
  // checkInputDataTypes idiom
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_bucket_hash expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "trigram_bucket_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val cps = s.codePoints.toArray
    UnsafeArrayData.fromPrimitiveArray(
      TrigramBucketHash.hashAll(cps, buckets, seed))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val helper = TrigramBucketHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val uad = classOf[UnsafeArrayData].getName
      val s = ctx.freshName("s"); val cps = ctx.freshName("cps")
      s"""
         |String $s = $str.toLowerCase().toString();
         |int[] $cps = $s.codePoints().toArray();
         |${ev.value} = $uad.fromPrimitiveArray(
         |  $helper.hashAll($cps, $buckets, ${seed}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TrigramBucketHash = copy(child = newChild)
}

object TrigramBucketHash {
  private val M = 2147483647L // 2³¹ − 1, EmbedOps.hashModulus

  /** Rolling-window trigram hash over a code-point array — shared by
    * interpreted eval and generated code so both paths are ONE
    * implementation (no bit-drift between them by construction). */
  def hashAll(cps: Array[Int], buckets: Int, seed: Long): Array[Int] = {
    val n = cps.length
    if (n < 3) return Array.emptyIntArray
    val out = new Array[Int](n - 2)
    val s0 = seed % M
    var i = 0
    while (i < n - 2) {
      var h = (s0 * 31L + cps(i)) % M
      h = (h * 31L + cps(i + 1)) % M
      h = (h * 31L + cps(i + 2)) % M
      out(i) = (h % buckets).toInt
      i += 1
    }
    out
  }
}
