package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hash-signature expressions for the dedup operators — tier (b)
  * of the custom-operator ladder (SURVEY.md §7.3).
  *
  * The higher-order-function formulations in `DedupOps`
  * (`aggregate`/`zip_with`/`transform` folds) are semantically exact but
  * evaluate INTERPRETED: each shingle allocates fresh 64-element arrays
  * per fold step, costing ~64× the hashing work in boxing and dispatch.
  * At corpus scale the signature pass dominates MinHash dedup end to end
  * (measured ~5.7 s for 10k docs at sf0.1 vs sub-second for everything
  * else). These expressions compute bit-identical signatures in one tight
  * primitive loop, participate in whole-stage codegen, and allocate one
  * primitive array per row.
  *
  * Bit-compatibility contract (property-tested in ExpressionSpec):
  *  - `MinHashSig(sh, n)` == the fold
  *    `aggregate(transform(sh, s -> xxhash64(s)), repeat(MaxValue, n),
  *       (acc, h) -> zip_with(acc, transform(seeds, i -> xxhash64(h, i)), least))`
  *    where Spark's `xxhash64(string)` = XXH64.hashUTF8String(s, 42)
  *    and `xxhash64(longCol, intLit i)` = XXH64.hashInt(i, XXH64.hashLong(h, 42)).
  *    NULL elements follow the fold too: `xxhash64(null)` passes the
  *    seed (42) through, so a null shingle/token contributes exactly the
  *    seed-derived candidates on both paths — bit-compatibility holds on
  *    arrays containing nulls, not just on clean `split()` output.
  *  - `SimHashSig(tokens)` == the ±1 bit-count fold + sign-bit pack in
  *    `DedupOps.simhashHof` (integer addition is order-insensitive).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  require(!child.resolved ||
    child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType,
    s"minhash_sig expects ARRAY<STRING>, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      // null elements hash like the fold: Spark's xxhash64(null) passes
      // the seed (42) through, so a null shingle STILL contributes
      // min-hash candidates — skipping it would silently diverge from
      // the documented HOF twin on arrays containing nulls
      val h0 =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      val hs = XXH64.hashLong(h0, 42L)
      var i = 0
      while (i < numHashes) {
        val hi = XXH64.hashInt(i, hs)
        if (hi < sig(i)) sig(i) = hi
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val sig = ctx.freshName("sig"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val h0 = ctx.freshName("h0"); val hs = ctx.freshName("hs")
      val hi = ctx.freshName("hi"); val n = ctx.freshName("n")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h0;
         |  if ($arr.isNullAt($j)) {
         |    $h0 = 42L; // xxhash64(null) = seed, matching the HOF fold
         |  } else {
         |    $utf8 $s = $arr.getUTF8String($j);
         |    $h0 = $xxh.hashUTF8String($s, 42L);
         |  }
         |  long $hs = $xxh.hashLong($h0, 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $hi = $xxh.hashInt($i, $hs);
         |    if ($hi < $sig[$i]) $sig[$i] = $hi;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** MinHash signature computed DIRECTLY from the token array: builds each
  * n-gram shingle string (space-joined, same bytes as
  * `DedupOps.shingles`' `concat_ws(" ", slice(toks, i+1, n))`) in a tight
  * JVM loop and hashes it immediately — no materialized shingle array.
  * Profiling showed the interpreted HOF shingle construction (sequence →
  * slice → concat_ws per shingle) dominating the whole MinHash pipeline
  * (~2.8 s of a 3.6 s run at sf0.1); this fuses it away. Bit-equal to
  * `MinHashSig(shingles(text, n), numHashes)` — property-tested.
  *
  * Short docs (< n tokens, including zero) hash the whole token list as
  * one shingle, mirroring `DedupOps.shingles`.
  */
case class MinHashShingleSig(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  require(shingleN > 0, s"shingleN must be positive, got $shingleN")
  require(!child.resolved ||
    child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType,
    s"minhash_shingle_sig expects ARRAY<STRING> tokens, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingle_sig"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    def update(shingle: UTF8String): Unit = {
      val hs = XXH64.hashLong(XXH64.hashUTF8String(shingle, 42L), 42L)
      var i = 0
      while (i < numHashes) {
        val hi = XXH64.hashInt(i, hs)
        if (hi < sig(i)) sig(i) = hi
        i += 1
      }
    }
    // isNullAt guard (not bare getUTF8String): a null token must load as
    // null under EVERY ArrayData representation so concatWs skips it,
    // matching the HOF twin — UnsafeArrayData would otherwise yield ""
    def elem(k: Int): UTF8String =
      if (toks.isNullAt(k)) null else toks.getUTF8String(k)
    if (nTok < shingleN) {
      val all = new Array[UTF8String](nTok)
      var j = 0
      while (j < nTok) { all(j) = elem(j); j += 1 }
      update(UTF8String.concatWs(sep, all: _*))
    } else {
      val window = new Array[UTF8String](shingleN)
      var j = 0
      val last = nTok - shingleN
      while (j <= last) {
        var i = 0
        while (i < shingleN) { window(i) = elem(j + i); i += 1 }
        update(UTF8String.concatWs(sep, window: _*))
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val sig = ctx.freshName("sig"); val nTok = ctx.freshName("nTok")
      val sep = ctx.freshName("sep"); val win = ctx.freshName("win")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val hs = ctx.freshName("hs"); val hi = ctx.freshName("hi")
      val sh = ctx.freshName("sh"); val last = ctx.freshName("last")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $nTok = $toks.numElements();
         |$utf8 $sep = $utf8.fromString(" ");
         |if ($nTok < $shingleN) {
         |  $utf8[] $win = new $utf8[$nTok];
         |  for (int $j = 0; $j < $nTok; $j++)
         |    $win[$j] = $toks.isNullAt($j) ? null : $toks.getUTF8String($j);
         |  $utf8 $sh = $utf8.concatWs($sep, $win);
         |  long $hs = $xxh.hashLong($xxh.hashUTF8String($sh, 42L), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $hi = $xxh.hashInt($i, $hs);
         |    if ($hi < $sig[$i]) $sig[$i] = $hi;
         |  }
         |} else {
         |  $utf8[] $win = new $utf8[$shingleN];
         |  int $last = $nTok - $shingleN;
         |  for (int $j = 0; $j <= $last; $j++) {
         |    for (int $i = 0; $i < $shingleN; $i++)
         |      $win[$i] = $toks.isNullAt($j + $i) ? null : $toks.getUTF8String($j + $i);
         |    $utf8 $sh = $utf8.concatWs($sep, $win);
         |    long $hs = $xxh.hashLong($xxh.hashUTF8String($sh, 42L), 42L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $hi = $xxh.hashInt($i, $hs);
         |      if ($hi < $sig[$i]) $sig[$i] = $hi;
         |    }
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashShingleSig =
    copy(child = newChild)
}

/** Materialized word n-gram shingles from a token array, in one tight
  * codegen loop — byte-identical output to `DedupOps.shingles`' HOF form
  * (`transform(sequence(…), i -> concat_ws(" ", slice(toks, i+1, n)))`),
  * which runs INTERPRETED and dominated `decontaminate` /
  * `ngramJaccardPairs(shingleN ≥ 2)` end to end (measured ~3.1 s of a
  * 3.1 s sf0.1 decontaminate run; these operators need the shingle
  * STRINGS for set joins, so the hash-fused `MinHashShingleSig` cannot
  * serve them). Short inputs (< n tokens, including zero) yield the
  * whole token list space-joined as one shingle, mirroring the HOF.
  */
case class ShingleArray(child: Expression, shingleN: Int)
    extends UnaryExpression {

  require(shingleN > 0, s"shingleN must be positive, got $shingleN")
  require(!child.resolved ||
    child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType,
    s"shingle_array expects ARRAY<STRING> tokens, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  // NULL elements load as null (isNullAt guard, NOT bare getUTF8String:
  // UnsafeArrayData returns an empty string for a null slot where
  // GenericArrayData returns null — same input would shingle differently
  // depending on the physical representation); concatWs then SKIPS
  // nulls, matching the HOF form's concat_ws exactly.
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val sep = UTF8String.fromString(" ")
    def elem(k: Int): UTF8String =
      if (toks.isNullAt(k)) null else toks.getUTF8String(k)
    if (nTok < shingleN) {
      val all = new Array[UTF8String](nTok)
      var j = 0
      while (j < nTok) { all(j) = elem(j); j += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
    } else {
      val m = nTok - shingleN + 1
      val out = new Array[Any](m)
      val window = new Array[UTF8String](shingleN)
      var j = 0
      while (j < m) {
        var i = 0
        while (i < shingleN) { window(i) = elem(j + i); i += 1 }
        out(j) = UTF8String.concatWs(sep, window: _*)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val nTok = ctx.freshName("nTok"); val sep = ctx.freshName("sep")
      val win = ctx.freshName("win"); val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      def load(idx: String) =
        s"($toks.isNullAt($idx) ? null : $toks.getUTF8String($idx))"
      s"""
         |int $nTok = $toks.numElements();
         |$utf8 $sep = $utf8.fromString(" ");
         |Object[] $out;
         |if ($nTok < $shingleN) {
         |  $utf8[] $win = new $utf8[$nTok];
         |  for (int $j = 0; $j < $nTok; $j++) $win[$j] = ${load(s"$j")};
         |  $out = new Object[]{ $utf8.concatWs($sep, $win) };
         |} else {
         |  int $m = $nTok - $shingleN + 1;
         |  $out = new Object[$m];
         |  $utf8[] $win = new $utf8[$shingleN];
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $i = 0; $i < $shingleN; $i++) $win[$i] = ${load(s"$j + $i")};
         |    $out[$j] = $utf8.concatWs($sep, $win);
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** Intersection size of two SORTED ARRAY<BIGINT> inputs via a single
  * merge walk — O(n+m) on primitive longs, no hash set, no allocation.
  * This is the confirm-stage primitive for fuzzy dedup: per candidate
  * pair, `array_intersect`/`array_union` each build a hash set of ~100
  * STRINGS (measured 2.4 s of a 4 s fuzzyDedupE2E run at sf0.1); hashing
  * each doc's distinct shingles to longs ONCE per document and merging
  * sorted arrays per PAIR moves the per-pair cost to ~2(n+m) long
  * compares. |union| falls out as n_a + n_b − inter, so one expression
  * replaces both set ops.
  *
  * CONTRACT: both inputs sorted ascending with distinct elements
  * (`sort_array(array_distinct(...))`) and no NULL elements — the merge
  * walk's count is undefined otherwise (not validated per row: an
  * in-loop sortedness check would double the compares this expression
  * exists to remove). Interpreted eval and codegen share the identical
  * walk. */
case class SortedInterSize(left: Expression, right: Expression)
    extends BinaryExpression {

  require(Seq(left, right).forall(e => !e.resolved ||
    e.dataType == ArrayType(LongType) || e.dataType == ArrayType(LongType, false)),
    s"sorted_inter_size expects ARRAY<BIGINT> inputs, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_inter_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterSize =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFKC normalization as a native expression — the canonical
  * pre-hash text normalization for dedup (visually-identical strings
  * with different codepoint sequences — composed vs decomposed accents,
  * full-width forms, ligatures — must hash equal or every such pair
  * silently escapes exact dedup). Spark has no built-in normalizer; a
  * Scala UDF would break codegen — this stays a one-call expression
  * inside the generated plan (`java.text.Normalizer` is in the JDK, so
  * generated code links against nothing new).
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  require(!child.resolved || child.dataType == StringType,
    s"nfkc_normalize expects STRING, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val utf8 = classOf[UTF8String].getName
      s"""
         |${ev.value} = $utf8.fromString(
         |  java.text.Normalizer.normalize($in.toString(),
         |    java.text.Normalizer.Form.NFKC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per bit, sum ±1 across token hashes
  * (xxhash64 of each token, seed 42), then pack sign bits. Bit-equal to
  * the HOF fold in `DedupOps.simhashHof`. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  require(!child.resolved ||
    child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == StringType,
    s"simhash_sig expects ARRAY<STRING>, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      // null tokens hash like the fold (xxhash64(null) = seed 42)
      val h =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) {
        if ((h & (1L << i)) != 0L) counts(i) += 1L else counts(i) -= 1L
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0L) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val counts = ctx.freshName("counts"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |long[] $counts = new long[64];
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h;
         |  if ($arr.isNullAt($j)) {
         |    $h = 42L; // xxhash64(null) = seed, matching the HOF fold
         |  } else {
         |    $utf8 $s = $arr.getUTF8String($j);
         |    $h = $xxh.hashUTF8String($s, 42L);
         |  }
         |  for (int $i = 0; $i < 64; $i++) {
         |    if (($h & (1L << $i)) != 0L) $counts[$i]++; else $counts[$i]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0L) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
