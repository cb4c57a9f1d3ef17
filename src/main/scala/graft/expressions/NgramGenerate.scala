package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (the UDTF-shaped extension point): yields
  * one (pos, ngram) row per token window, LAZILY — where
  * `posexplode(shingle_array(toks, n))` first materializes the whole
  * shingle array per row, this streams windows straight into the
  * `Generate` operator's row pipeline. For a 100k-token document the
  * array form allocates all ~100k shingles before the first downstream
  * row; the generator holds one window. Semantics are bit-parity with
  * `posexplode(shingle_array(...))` (unit-asserted): short arrays
  * (fewer than n tokens) yield ONE row joining all tokens — including
  * the empty array, which yields (0, "") exactly like ShingleArray's
  * empty shingle — NULL elements are skipped by concatWs, and a NULL
  * token array yields no rows.
  *
  * Completes the extension-type taxonomy alongside the scalar codegen
  * expressions (CosineSim/HashSigs), the typed Aggregator, the
  * TopKPerKey strategy+SparkPlan, and the DSV2 connector.
  * Reference counterpart: the flatten transforms' row-per-element
  * shape (reference README.md:640-676), as a reusable engine operator.
  */
case class NgramGenerate(child: Expression, shingleN: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(shingleN > 0, s"shingleN must be positive, got $shingleN")
  require(!child.resolved ||
    child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType,
    s"ngram_generate expects ARRAY<STRING> tokens, got ${child.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def prettyName: String = "ngram_generate"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val sep = UTF8String.fromString(" ")
    // isNullAt guard, NOT bare getUTF8String — same physical-
    // representation trap as ShingleArray (UnsafeArrayData yields ""
    // for a null slot, GenericArrayData yields null)
    def elem(k: Int): UTF8String =
      if (toks.isNullAt(k)) null else toks.getUTF8String(k)
    if (nTok < shingleN) {
      val all = new Array[UTF8String](nTok)
      var j = 0
      while (j < nTok) { all(j) = elem(j); j += 1 }
      Iterator.single(new GenericInternalRow(
        Array[Any](0, UTF8String.concatWs(sep, all: _*))))
    } else {
      val m = nTok - shingleN + 1
      new Iterator[InternalRow] {
        private var j = 0
        private val window = new Array[UTF8String](shingleN)
        override def hasNext: Boolean = j < m
        override def next(): InternalRow = {
          var i = 0
          while (i < shingleN) { window(i) = elem(j + i); i += 1 }
          val row = new GenericInternalRow(
            Array[Any](j, UTF8String.concatWs(sep, window: _*)))
          j += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramGenerate =
    copy(child = newChild)
}
