package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The Holt linear-smoothing fold `[l, b]` over a value window as ONE
  * native codegen'd pass — tier (b) of the custom-operator ladder
  * applied to the r15 verdict's ts_backtest question (the
  * trigram_bucket_hash discipline: prototype the native twin, measure,
  * land only what the measurement supports). The declarative form in
  * [[graft.ops.TimeSeriesOps.holtWindowed]] runs Catalyst's interpreted
  * `aggregate()` HOF: per input row it allocates a boxed two-element
  * array PER FOLD STEP (span−1 of them) and dispatches each arithmetic
  * op through interpreted expression eval. This expression reads the
  * primitive doubles once, keeps (l, b) in two locals, and emits one
  * primitive double array — no per-step allocation, inside whole-stage
  * codegen.
  *
  * Bit-compatibility contract (property-tested in ExpressionSpec):
  * `holt_fold(lst, α, β)` equals the HOF chain
  * `aggregate(slice(lst, 2, n−1), array(lst[0], 0.0), fold)`
  * element-for-element — seed (l = lst[0], b = 0), each step
  * `nl = x·α + (1−α)·(l + b); nb = β·(nl − l) + (1−β)·b` in EXACTLY
  * that IEEE order (the same chain DuckDB's list_reduce restates, so
  * established oracle hashes are unchanged by construction).
  *
  * Input contract: ARRAY<DOUBLE>. NULL input yields NULL; an EMPTY
  * array yields NULL; an array with a NULL ELEMENT yields NULL — the
  * HOF chain propagates a NULL element through the fold to a
  * [null, null] result, which is unrepresentable in this expression's
  * containsNull=false output, so the whole result goes NULL instead of
  * silently folding the element as 0.0 (r16 ADVICE). holtWindowed's
  * collect_list never emits NULL elements, so the hot path never pays
  * the branch.
  */
case class HoltFold(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression {

  require(alpha > 0.0 && alpha <= 1.0, s"holt_fold: alpha in (0,1], got $alpha")
  require(beta >= 0.0 && beta <= 1.0, s"holt_fold: beta in [0,1], got $beta")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "holt_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"holt_fold expects ARRAY<DOUBLE>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val folded = HoltFold.fold(input.asInstanceOf[ArrayData], alpha, beta)
    if (folded == null) null else UnsafeArrayData.fromPrimitiveArray(folded)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = HoltFold.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val uad = classOf[UnsafeArrayData].getName
      val folded = ctx.freshName("holtFolded")
      s"""
         |double[] $folded = $helper.fold($arr, ${alpha}D, ${beta}D);
         |if ($folded == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $uad.fromPrimitiveArray($folded);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HoltFold = copy(child = newChild)
}

object HoltFold {
  /** The fold itself — shared by interpreted eval and generated code so
    * both paths are ONE implementation (no bit-drift between them by
    * construction). Returns null for an empty array or any NULL element
    * (whole-result NULL — the containsNull=false output type can't
    * carry the HOF chain's [null, null]). */
  def fold(arr: ArrayData, alpha: Double, beta: Double): Array[Double] = {
    val n = arr.numElements()
    if (n == 0 || arr.isNullAt(0)) return null
    var l = arr.getDouble(0)
    var b = 0.0
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    var i = 1
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = arr.getDouble(i)
      val nl = x * alpha + ca * (l + b)
      b = beta * (nl - l) + cb * b
      l = nl
      i += 1
    }
    Array(l, b)
  }
}
