package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-hashing expressions.
  *
  * The composable HigherOrderFunction formulations (transform /
  * aggregate lambdas) are interpreted per element, and any non-lambda
  * subexpression embedded in a lambda body is RE-EVALUATED per
  * element — a `transform(sequence(...), i -> slice(split(text), ...))`
  * re-splits the whole document once per shingle, and nesting the
  * signature transform multiplies again: measured 336 s for
  * MinHash+LSH over 5 000 docs at sf0.1. These expressions do the
  * whole chain in one Scala pass per row (~100× less work), using the
  * same xxhash64 core as Spark's hash function. CodegenFallback is
  * fine: the cost is the per-row loop, not the call boundary.
  */
object TextHashing {
  private val StrType = StringType

  @inline def hashString(s: UTF8String, seed: Long): Long =
    XxHash64Function.hash(s, StrType, seed)

  /** Word w-shingles (distinct, order of first occurrence). */
  def shingleStrings(text: UTF8String, w: Int): Array[UTF8String] = {
    val toks = text.split(UTF8String.fromString(" "), -1)
    if (toks.length <= w) Array(UTF8String.concatWs(UTF8String.fromString(" "), toks: _*))
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i + w <= toks.length) {
        seen.add(UTF8String.concatWs(UTF8String.fromString(" "),
          java.util.Arrays.copyOfRange(toks, i, i + w): _*))
        i += 1
      }
      seen.toArray(new Array[UTF8String](0))
    }
  }

  /** k MinHash values by double hashing: g_i(s) = h1(s) + i·h2(s)
    * (Kirsch–Mitzenmacher); min over shingles per i.
    */
  def minhash(shingles: Array[UTF8String], k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    var si = 0
    while (si < shingles.length) {
      val h1 = hashString(shingles(si), 0xA5A5A5A5L)
      val h2 = hashString(shingles(si), 0x5A5A5A5AL) | 1L
      var i = 0
      while (i < k) {
        val g = h1 + i * h2
        if (g < mins(i)) mins(i) = g
        i += 1
      }
      si += 1
    }
    mins
  }
}

/** text → array<string> of word w-shingles, one pass. */
case class WordShingles(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"needs string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextHashing.shingleStrings(v.asInstanceOf[UTF8String], w).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → array<long>: LSH band buckets of the doc's MinHash
  * signature (k = b·r hashes; bucket i hashes signature rows
  * [i·r, i·r+r)). Band index = array position (posexplode downstream).
  */
case class MinHashBandBuckets(child: Expression, b: Int, r: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"needs string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any = {
    val sig = TextHashing.minhash(TextHashing.shingleStrings(v.asInstanceOf[UTF8String], 3), b * r)
    val buckets = new Array[Any](b)
    var band = 0
    while (band < b) {
      var h = band.toLong * 0x9E3779B97F4A7C15L
      var j = 0
      while (j < r) {
        h = java.lang.Long.rotateLeft(h ^ (sig(band * r + j) * 0xC2B2AE3D27D4EB4FL), 31) * 0x9E3779B185EBCA87L
        j += 1
      }
      buckets(band) = h
      band += 1
    }
    new GenericArrayData(buckets)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** tokens-as-text → 64-bit SimHash (per token ±1 vote per bit of the
  * token's xxhash64; sign → bit).
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"needs string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = TextHashing.hashString(toks(t), 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → bigint: rolling polynomial hash over the code points,
  * h ← (h·31 + codepoint) mod 1e9+7 — single pass. The composable
  * form (transform(sequence(1, length), i → ascii(substr(text, i))))
  * re-slices the string per character on the interpreted HOF path:
  * O(n²) per document and the slowest honest-bench projection query.
  */
case class RollingHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"needs string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any = {
    var h = 0L
    val it = v.asInstanceOf[UTF8String].toString.codePoints().iterator()
    while (it.hasNext) {
      h = (h * 31L + it.nextInt()) % 1000000007L
    }
    java.lang.Long.valueOf(h)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → array<int>: per-list stopword hit counts in ONE tokenize
  * pass (duplicates count, like size(filter(tokens, isin(...)))).
  * The composable form re-tokenizes the document once per language
  * AND filters interpreted per element; this expression lowercases,
  * splits, and probes precomputed hash sets in a single loop.
  */
case class StopwordScores(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"needs string, got ${child.dataType}")

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    lists.map { ws =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toLowerCase
      .split(UTF8String.fromString(" "), -1)
    val counts = new Array[Int](lists.length)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < counts.length) {
        if (sets(l).contains(toks(t))) counts(l) += 1
        l += 1
      }
      t += 1
    }
    new GenericArrayData(counts.map(Integer.valueOf).asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** text → text with the given tokens removed (single pass: split on
  * spaces, drop hash-set members, re-join). The removal set is fixed
  * at plan time — the fit/transform shape: a tiny corpus-derived
  * vocabulary collected once, then applied as a map-only expression.
  */
case class RemoveTokens(child: Expression, toks: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"needs string, got ${child.dataType}")

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    toks.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val parts = v.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val kept = parts.filterNot(set.contains)
    UTF8String.concatWs(UTF8String.fromString(" "), kept: _*)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static normalization helper — top-level object WITHOUT a companion
  * class, so scalac emits static forwarders the generated Java below
  * can call directly.
  */
object TextNormalizer {
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    // fast path: already-normalized text (all-ASCII always is) keeps
    // the original UTF8String — no copy, no re-encode
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** text → Unicode-normalized text (NFC/NFD/NFKC/NFKD via
  * java.text.Normalizer). Spark has no normalization function; this
  * one stays inside whole-stage codegen — doGenCode emits a direct
  * static call, no fallback iterator — because normalization sits in
  * the hot path of every text-cleaning scan. The form is validated at
  * plan time (valueOf throws on construction of the generated code's
  * first evaluation; checkInputDataTypes rejects earlier for clarity).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"needs string, got ${child.dataType}")
    else if (!Seq("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(s"unknown normalization form $form")
    else TypeCheckResult.TypeCheckSuccess
  override def nullSafeEval(v: Any): Any =
    TextNormalizer.normalize(v.asInstanceOf[UTF8String], form)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.TextNormalizer.normalize($c, "$form")""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  def removeTokens(text: Column, toks: Seq[String]): Column =
    toCol(RemoveTokens(toExpr(text), toks))
  def wordShingles(text: Column, w: Int = 3): Column = toCol(WordShingles(toExpr(text), w))
  def minhashBandBuckets(text: Column, b: Int = 8, r: Int = 2): Column =
    toCol(MinHashBandBuckets(toExpr(text), b, r))
  def simhash64(text: Column): Column = toCol(SimHash64(toExpr(text)))
  def stopwordScores(text: Column, lists: Seq[Seq[String]]): Column =
    toCol(StopwordScores(toExpr(text), lists))
  def rollingHash(text: Column): Column = toCol(RollingHash(toExpr(text)))
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    toCol(UnicodeNormalize(toExpr(text), form))
}
