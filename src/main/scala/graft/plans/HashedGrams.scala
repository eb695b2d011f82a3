package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct hashed-gram set of a text column — the MinHash/n-gram
  * dedup kernel (`TextOps.hashedShingles` and the char-gram variant), fused
  * into one pass.
  *
  * The HOF form evaluates, PER GRAM, an interpreted expression chain of
  * `concat_ws`/`substr` → `md5` (hex string) → `conv` (hex parse via
  * strings) → `%` — on the dedup hot path that string round-trip dominates.
  * This expression digests each gram directly and folds the first 15 hex
  * chars (= 7 bytes + high nibble) into the 60-bit integer arithmetically,
  * with first-occurrence-order dedup — bitwise-identical output to the HOF
  * chain (parity-tested in NativeVecSpec over random inputs) and to the
  * DuckDB oracle's `md5` reconstruction.
  *
  * `word = true`: n-word shingles over a single-space split (short texts
  * fall back to one whole-text shingle). `word = false`: char n-grams.
  * Contract: tokenized/ASCII-ish text (the documents table) — char
  * positions count UTF-16 units, as all engine texts are single-byte.
  */
/** `modP = true` (the MinHash form) reduces each 60-bit digest prefix mod
  * the Mersenne prime 2^31−1 — required by the universal band-hash family
  * downstream. `modP = false` keeps the full 60-bit value: the form for
  * direct fingerprint joins (`dedup_substring`), where the 2^31 space
  * would make spurious key collisions the dominant join mass at corpus
  * scale (round-4 review finding).
  */
case class HashedGrams(child: Expression, n: Int, word: Boolean,
                       modP: Boolean = true)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_grams"

  override protected def nullSafeEval(input: Any): Any =
    HashedGrams.compute(input.asInstanceOf[UTF8String], n, word, modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashedGrams.compute($c, $n, $word, $modP);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedGrams {
  /** Mersenne prime 2^31−1 (mirror of TextOps.MinhashP). */
  private val P = 2147483647L

  /** One digest per task thread, reused across rows — `getInstance` is a
    * provider lookup + allocation, measurable on the exact per-row hot path
    * these kernels exist to speed up (round-2 ADVICE).
    */
  private[plans] val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel, also callable from generated code. */
  def compute(t: UTF8String, n: Int, word: Boolean, modP: Boolean): ArrayData = {
    val text = t.toString
    val md = md5Local.get()
    // LinkedHashSet = first-occurrence order, matching array_distinct
    val seen = new java.util.LinkedHashSet[java.lang.Long]

    def add(gram: String): Unit = {
      md.reset()
      val d = md.digest(gram.getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars = bytes 0..6 (14 hex) + high nibble of byte 7,
      // read as one unsigned 60-bit integer (== conv(substr(md5,1,15),16,10))
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      seen.add(if (modP) v % P else v)
    }

    if (word) {
      val w = text.split(" ", -1)
      val count = math.max(w.length - n + 1, 1)
      var i = 0
      while (i < count) {
        val end = math.min(i + n, w.length)
        add(w.slice(i, end).mkString(" "))
        i += 1
      }
    } else {
      val count = math.max(text.length - n + 1, 1)
      var i = 0
      while (i < count) {
        add(text.substring(i, math.min(i + n, text.length)))
        i += 1
      }
    }

    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Column entry: distinct hashed n-word shingles. */
  def wordGrams(text: Column, n: Int): Column =
    GraftSqlBridge.column(HashedGrams(GraftSqlBridge.expression(text), n, word = true))

  /** Column entry: distinct hashed char n-grams. */
  def charGrams(text: Column, n: Int): Column =
    GraftSqlBridge.column(HashedGrams(GraftSqlBridge.expression(text), n, word = false))

  /** Column entry: distinct FULL-60-bit hashed char n-grams (no mod-p
    * reduction) — for direct fingerprint joins, where key-space width is
    * what bounds spurious collisions.
    */
  def charGramsWide(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      HashedGrams(GraftSqlBridge.expression(text), n, word = false, modP = false))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Min md5 (as lowercase hex) over the n-word shingle set — the
    * `text_fingerprint` kernel. Tracks the minimum 16-byte digest with an
    * unsigned byte compare (equivalent to hex-string ordering, since hex of
    * unsigned bytes is order-preserving on equal lengths) and hex-formats
    * ONCE at the end — the HOF form builds and compares a per-shingle hex
    * STRING array. Identical value (parity-tested).
    */
  def minWordGramMd5(t: UTF8String, n: Int): UTF8String = {
    val text = t.toString
    val md = md5Local.get()
    val w = text.split(" ", -1)
    val count = math.max(w.length - n + 1, 1)
    var best: Array[Byte] = null
    var i = 0
    while (i < count) {
      val end = math.min(i + n, w.length)
      md.reset()
      val d = md.digest(w.slice(i, end).mkString(" ").getBytes(StandardCharsets.UTF_8))
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val out = new Array[Char](32)
    i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((best(i) & 0xff) >>> 4)
      out(2 * i + 1) = hexDigits(best(i) & 0x0f)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Static kernel for TopGramCount (also called from generated code). */
  def topWordGramCount(t: UTF8String, n: Int): Long = {
    val w = t.toString.split(" ", -1)
    val count = math.max(w.length - n + 1, 1)
    val m = new java.util.HashMap[String, Integer]
    var best = 0
    var i = 0
    while (i < count) {
      val end = math.min(i + n, w.length)
      val g = w.slice(i, end).mkString(" ")
      val c = m.merge(g, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** Native positional winnowed char-gram fingerprints — the
  * `dedup_substring_spans` kernel: one fused pass over the text emitting
  * (1-based char pos, full-60-bit md5-prefix hash) for every window
  * OCCURRENCE whose hash ≡ 0 mod `winnowMod`. The winnow runs INSIDE the
  * kernel, so only the ~1/winnowMod surviving windows ever materialize
  * (the HOF form builds the full per-window hash array, then filters —
  * measured 4.07 s vs 1.06 s for the set-valued kernel at sf0.1), and no
  * per-window interpreted substr → md5 → conv chain runs. Positions are
  * kept (unlike `HashedGrams`) because spans need offsets; duplicates are
  * kept because every occurrence must be coverable by a cut span.
  * Value-identical to the HOF chain (NativeVecSpec parity) and to the
  * DuckDB oracle's struct-list reconstruction.
  */
case class WinnowedGramPos(child: Expression, n: Int, winnowMod: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("g", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnowed_gram_pos"

  override protected def nullSafeEval(input: Any): Any =
    WinnowedGramPos.compute(input.asInstanceOf[UTF8String], n, winnowMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowedGramPos.compute($c, $n, $winnowMod);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedGramPos {
  def compute(t: UTF8String, n: Int, winnowMod: Int): ArrayData = {
    val text = t.toString
    val md = HashedGrams.md5Local.get()
    val buf = new scala.collection.mutable.ArrayBuffer[Any]
    val count = math.max(text.length - n + 1, 1)
    var i = 0
    while (i < count) {
      md.reset()
      val d = md.digest(
        text.substring(i, math.min(i + n, text.length)).getBytes(StandardCharsets.UTF_8))
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      if (v % winnowMod == 0)
        buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i + 1, v))
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  def of(text: Column, n: Int, winnowMod: Int): Column =
    GraftSqlBridge.column(
      WinnowedGramPos(GraftSqlBridge.expression(text), n, winnowMod))
}

/** Native max-occurrence count over the n-word-shingle MULTISET of a text
  * column — the `text_repetition` top-bigram kernel. Counting repeats per
  * row here turns the operator into a narrow zero-shuffle projection; the
  * compositional form (explode → groupBy(doc, gram) → groupBy(doc).max)
  * shuffles every bigram occurrence of the corpus just to take a per-doc
  * max. Counts STRING grams (no hashing), so the value is exactly the
  * oracle's `max(count(*)) GROUP BY doc, gram`. Short docs fall back to the
  * single whole-text shingle (count 1), like HashedGrams.
  */
case class TopGramCount(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "top_gram_count"

  override protected def nullSafeEval(input: Any): Any =
    HashedGrams.topWordGramCount(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashedGrams.topWordGramCount($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopGramCount {
  def of(text: Column, n: Int): Column =
    GraftSqlBridge.column(TopGramCount(GraftSqlBridge.expression(text), n))
}

/** Native min-shingle-md5 (see HashedGrams.minWordGramMd5). */
case class MinGramMd5(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "min_gram_md5"

  override protected def nullSafeEval(input: Any): Any =
    HashedGrams.minWordGramMd5(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashedGrams.minWordGramMd5($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinGramMd5 {
  def minWordGramMd5(text: Column, n: Int): Column =
    GraftSqlBridge.column(MinGramMd5(GraftSqlBridge.expression(text), n))
}

/** Native n-word shingle ARRAY of a text column (all occurrences, in order)
  * — the `text_ngrams`/`text_collocations` explode feed. The HOF form
  * (`transform(sequence(1, #w−n+1), i => concat_ws(" ", slice(w, i, n)))`)
  * is CodegenFallback: every element evaluates an interpreted
  * concat_ws/slice chain, which at 100× was a 28×-growth constant on the
  * collocation path (round-11 verdict #1).
  *
  * The kernel exploits that shingles of a single-space split, re-joined
  * with a single space, are contiguous BYTE SUBSTRINGS of the original
  * text (a 0x20 byte never occurs inside a multi-byte UTF-8 sequence): one
  * pass records word-start byte offsets, then each shingle is a zero-copy
  * `UTF8String.fromBytes` slice — no per-element string building at all.
  * Short docs (< n words) fall back to the single whole-text shingle,
  * exactly like the HOF (parity-tested bitwise in NativeVecSpec against
  * the retained `TextOps.shinglesHof`).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Static kernel (also called from generated code). */
  def compute(t: UTF8String, n: Int): ArrayData = {
    val bytes = t.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val nw = spaces + 1
    // starts(k) = byte offset of word k; sentinel starts(nw) = len + 1 so
    // that `starts(end) - 1` uniformly strips the separator/virtual space.
    val starts = new Array[Int](nw + 1)
    var k = 1
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }; i += 1 }
    starts(nw) = len + 1
    val count = math.max(nw - n + 1, 1)
    val out = new Array[AnyRef](count)
    var j = 0
    while (j < count) {
      val s = starts(j)
      val e = starts(math.min(j + n, nw)) - 1
      out(j) = UTF8String.fromBytes(bytes, s, e - s)
      j += 1
    }
    new GenericArrayData(out)
  }

  def of(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))
}

/** Native r=2 banded MinHash signatures over a hashed-shingle array
  * (`TextOps.bandSignatures` kernel): for each band b, the two smallest
  * values of the universal permutation ((2b+1)·h + 12345·b + 1) mod p,
  * packed as m1·2^31 + m2 — computed with a running two-min tracker in ONE
  * pass over the array, where the HOF form materializes and `array_sort`s a
  * permuted copy PER BAND. Single-element inputs yield a null signature
  * (matches nothing in either engine), exactly like the HOF chain
  * (parity-tested bitwise in NativeVecSpec).
  */
case class BandSigs(child: Expression, bands: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "band_sigs"

  override protected def nullSafeEval(input: Any): Any =
    BandSigs.compute(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BandSigs.compute($c, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 16-bit SimHash over the distinct whitespace-token set
  * (`TextOps.dedupSimhash` kernel): per token, bit i of the md5-derived
  * 32-bit hash votes ±1 on weight i; the signature sets bit i iff the
  * summed weight is positive. One digest + 16 integer ops per token vs the
  * HOF form's per-token 16-element array materialization and nested
  * zip_with folds. Integer additions commute exactly, so token order is
  * irrelevant and the value is bitwise-identical to the HOF fold
  * (parity-tested in NativeVecSpec) and to the DuckDB oracle.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash16.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  private val Bits = 16

  def compute(t: UTF8String): Long = {
    val md = HashedGrams.md5Local.get()
    val tokens = new java.util.LinkedHashSet[String]
    t.toString.split(" ", -1).foreach(tokens.add)
    val w = new Array[Int](Bits)
    val it = tokens.iterator()
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 bytes big-endian, as an unsigned int
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var i = 0
      while (i < Bits) {
        w(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (w(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  def of(text: Column): Column =
    GraftSqlBridge.column(SimHash16(GraftSqlBridge.expression(text)))
}

/** Native 60-bit SimHash over the distinct whitespace-token set — the
  * WIDE signature for corpus-scale Hamming dedup. 16 bits saturate at
  * 65 536 distinct signatures (every bucket non-empty on a large corpus,
  * so Hamming pairing over distinct signatures returns a dense graph); 60
  * bits give a 2^60 signature space that never saturates while staying a
  * signed-positive BIGINT both here and in DuckDB (the same 15-hex-char
  * trick as the shingle hash — a 64-bit value would overflow DuckDB's
  * signed CAST). Token bit i weights ±1 by bit i of the token's
  * md5-derived 60-bit hash (first 15 hex chars). Integer additions
  * commute exactly → bitwise-identical to the HOF fold (NativeVecSpec)
  * and the DuckDB oracle.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  private val Bits = 60

  def compute(t: UTF8String): Long = {
    val md = HashedGrams.md5Local.get()
    val tokens = new java.util.LinkedHashSet[String]
    t.toString.split(" ", -1).foreach(tokens.add)
    val w = new Array[Int](Bits)
    val it = tokens.iterator()
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars = bytes 0..6 + high nibble of byte 7, as one
      // unsigned 60-bit integer (== conv(substr(md5, 1, 15), 16, 10))
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = (h << 4) | ((d(7) & 0xffL) >>> 4)
      var i = 0
      while (i < Bits) {
        w(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (w(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  def of(text: Column): Column =
    GraftSqlBridge.column(SimHash60(GraftSqlBridge.expression(text)))
}

object BandSigs {
  private val P = 2147483647L

  def compute(hv: ArrayData, bands: Int): ArrayData = {
    val n = hv.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      if (n < 2) out(b) = null
      else {
        val a = 2L * b + 1
        val c = 12345L * b + 1
        var m1 = Long.MaxValue
        var m2 = Long.MaxValue
        var i = 0
        while (i < n) {
          val v = (a * hv.getLong(i) + c) % P
          if (v < m1) { m2 = m1; m1 = v }
          else if (v < m2) { m2 = v }
          i += 1
        }
        out(b) = m1 * 2147483648L + m2
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  def of(hv: Column, bands: Int): Column =
    GraftSqlBridge.column(BandSigs(GraftSqlBridge.expression(hv), bands))
}

/** Native hashed bag-of-words count vector — `rag_retrieve`'s embedding
  * kernel (round 10). One fused pass per row: split on single space, md5
  * per token (thread-local digest), 60-bit hex-prefix fold mod `dims`,
  * count per dimension — emitted as `array<float>` so the scoring stage
  * feeds `FloatVecDot` directly (counts ≪ 2^24, float lanes exact).
  *
  * Why native: the HOF form evaluates `dims` interpreted `filter` lambdas
  * per row over the hashed-token list (measured 3.9 s for 12k rows at
  * sf0.1 — ~7M boxed lambda invocations); this kernel is one arithmetic
  * loop, bitwise-identical output (parity law in NativeVecSpec, same
  * md5-prefix fold as every kernel in this family = the DuckDB oracle's
  * `CAST(('0x' || substr(md5(t),1,15)) AS BIGINT)` reconstruction).
  */
case class HashedBow(child: Expression, dims: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hashed_bow"

  override protected def nullSafeEval(input: Any): Any =
    HashedBow.compute(input.asInstanceOf[UTF8String], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashedBow.compute($c, $dims);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedBow {
  /** Static kernel, also callable from generated code. Tokenization is
    * `split(text, ' ')` semantics with trailing empties kept (limit −1),
    * matching both the Spark HOF form and DuckDB `string_split`.
    */
  def compute(t: UTF8String, dims: Int): ArrayData = {
    val md = HashedGrams.md5Local.get()
    val counts = new Array[Float](dims)
    val w = t.toString.split(" ", -1)
    var i = 0
    while (i < w.length) {
      md.reset()
      val d = md.digest(w(i).getBytes(StandardCharsets.UTF_8))
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      counts((v % dims).toInt) += 1f
      i += 1
    }
    new GenericArrayData(counts)
  }

  def of(text: Column, dims: Int): Column =
    GraftSqlBridge.column(HashedBow(GraftSqlBridge.expression(text), dims))
}

/** Native 2-D Hilbert index — `layout_hilbert`/`zonemap_skip`'s encode
  * kernel (round 10). The 16-level xy→d iteration (quadrant digit +
  * rotate/flip) as one arithmetic loop per row.
  *
  * Why native: the single-sourced per-level SQL fragments
  * (`Lakehouse.hilbertLevelSql` — still the oracle's form, and the parity
  * reference) execute as an 80-expression projection chain, ~1.1 µs/row
  * (measured 1.7 s over 600k orders at sf0.1). This kernel is the same
  * arithmetic fused; parity law in NativeVecSpec pins it bitwise to the
  * fragment chain over the full orders table, so a bit-order mistake
  * still breaks both engines or neither.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.HilbertKey.compute($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {
  /** Static kernel, also callable from generated code — the standard
    * xy2d loop (masking to `bits` per dim, full-grid N−1 flips; see
    * Lakehouse.hilbertLevelSql for the shared derivation notes).
    */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val n1 = (1L << bits) - 1
    var x = x0 & n1
    var y = y0 & n1
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      val s = 1L << i
      d += s * s * (3 * rx + ry - 2 * rx * ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }

  def of(x: Column, y: Column, bits: Int): Column =
    GraftSqlBridge.column(HilbertKey(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y), bits))
}
