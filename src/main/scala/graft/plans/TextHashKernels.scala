package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.ColumnBridge

/** Native single-pass kernels for the dedup sketch columns. They compute
  * EXACTLY the values of the declarative formulations in
  * [[graft.functions.TextFunctions]] — md5Long60(x) = the top 15 hex
  * digits of md5(utf8(x)) as a long, portable to DuckDB as
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` — so no oracle changes;
  * they exist because the expression-tree version costs one Catalyst
  * md5 → hex → substring → conv chain PER GRAM/TOKEN plus three HOF
  * passes per row, which profiling showed dominating d05 (the gram
  * sketch fill was 5.6 s of its ~6 s at sf0.1). One static call per row
  * keeps the whole computation inside whole-stage codegen. */
object TextHashKernels {

  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5: bytes 0..6 big-endian then the high nibble of
    * byte 7 — bit-identical to parsing the first 15 hex chars. */
  def md5Long60(bytes: Array[Byte]): Long = {
    val md = mdTL.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }

  private def sortDedup(a: Array[Long], m: Int): Array[Long] = {
    val arr = java.util.Arrays.copyOf(a, m)
    java.util.Arrays.sort(arr)
    var w = 0
    var r = 0
    while (r < arr.length) {
      if (w == 0 || arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(arr, w)
  }

  /** Sorted value-distinct md5Long60 over the character 4-grams of
    * `text` — the d05 gram-set column (distinct grams as strings, then
    * hash, then distinct values, then sort; texts shorter than 4 chars
    * yield the empty set). */
  def gram4Set(text: UTF8String): ArrayData = {
    val n = text.numChars()
    if (n < 4) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[UTF8String]()
    val out = new Array[Long](n - 3)
    var m = 0
    var i = 1
    while (i + 3 <= n) {
      val g = text.substringSQL(i, 4)
      if (seen.add(g)) { out(m) = md5Long60(g.getBytes); m += 1 }
      i += 1
    }
    new GenericArrayData(sortDedup(out, m))
  }

  private val Space = UTF8String.fromString(" ")

  /** Value-distinct md5Long60 hashes of the token 5-grams (consecutive
    * windows of 5 whitespace tokens joined by a single space) — the p02
    * contamination gram set. Matches
    * `array_distinct(transform(sequence(1, n-4),
    *   i => md5Long60(concat_ws(" ", slice(tokens, i, 5)))))`
    * as a SET (ordering differs; the column is exploded downstream). */
  def tokenGram5Set(text: UTF8String): ArrayData = {
    val parts = text.split(Space, -1)
    if (parts.length < 5) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](parts.length - 4)
    var m = 0
    var i = 0
    while (i + 5 <= parts.length) {
      val g = UTF8String.concatWs(Space,
        parts(i), parts(i + 1), parts(i + 2), parts(i + 3), parts(i + 4))
      val h = md5Long60(g.getBytes)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** One-pass repetition statistics for t07:
    * [n_tokens, n_distinct_tokens, top_word_count, top_bigram_count].
    * EXACTLY the integer counts of the HOF formulation
    * (`array_max(transform(array_distinct(xs), u -> size(filter(xs,
    * x -> x = u))))` over tokens and space-joined consecutive bigrams) —
    * tokens/bigrams compare as STRINGS, and the space join is injective
    * because tokens cannot contain the separator. Replaces an
    * O(n·distinct) nested-lambda count per row with two hash passes. */
  def repetitionStats(text: UTF8String): ArrayData = {
    val parts = text.split(Space, -1)
    val n = parts.length
    val wc = new java.util.HashMap[UTF8String, Integer]()
    var topW = 0
    var i = 0
    while (i < n) {
      val c = wc.merge(parts(i), 1, (a, b) => a + b)
      if (c > topW) topW = c
      i += 1
    }
    var topG = 0
    if (n >= 2) {
      val gc = new java.util.HashMap[UTF8String, Integer]()
      i = 0
      while (i + 2 <= n) {
        val g = UTF8String.concatWs(Space, parts(i), parts(i + 1))
        val c = gc.merge(g, 1, (a, b) => a + b)
        if (c > topG) topG = c
        i += 1
      }
    }
    new GenericArrayData(
      Array(n.toLong, wc.size.toLong, topW.toLong, topG.toLong))
  }

  /** t20's character-share repetition counters as one native pass:
    * [nWords, nDistinctWords, n3grams, nDistinct3grams,
    * topBigramCount, topBigramChars]. The top bigram tie-breaks to the
    * byte-wise smallest gram on equal counts, matching the oracle's
    * (count DESC, gram ASC) rank; topBigramChars counts CHARACTERS
    * (both engines' length()). */
  def repetitionCharStats(text: UTF8String): ArrayData = {
    val parts = text.split(Space, -1)
    val n = parts.length
    val wset = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) { wset.add(parts(i)); i += 1 }
    var n3 = 0L
    var nd3 = 0L
    if (n >= 3) {
      n3 = (n - 2).toLong
      val gset = new java.util.HashSet[UTF8String]()
      i = 0
      while (i + 3 <= n) {
        gset.add(UTF8String.concatWs(Space, parts(i), parts(i + 1),
          parts(i + 2)))
        i += 1
      }
      nd3 = gset.size.toLong
    }
    var topCnt = 0L
    var topChars = 0L
    if (n >= 2) {
      val gc = new java.util.HashMap[UTF8String, Integer]()
      i = 0
      while (i + 2 <= n) {
        gc.merge(UTF8String.concatWs(Space, parts(i), parts(i + 1)), 1,
          (a, b) => a + b)
        i += 1
      }
      var bestG: UTF8String = null
      val it = gc.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.toLong
        if (c > topCnt || (c == topCnt &&
            (bestG == null || e.getKey.compareTo(bestG) < 0))) {
          topCnt = c; bestG = e.getKey
        }
      }
      topChars = if (bestG == null) 0L else bestG.numChars().toLong
    }
    new GenericArrayData(
      Array(n.toLong, wset.size.toLong, n3, nd3, topCnt, topChars))
  }

  /** SORTED md5Long60 hashes of the distinct whitespace tokens — the
    * d03/d04 `hs` column post-sort. Tokens dedup as STRINGS; equal hash
    * values from distinct tokens are kept (hash collisions), matching
    * `array_sort(transform(array_distinct(split(text,' ')), md5Long60))`
    * exactly. */
  def tokenHashes(text: UTF8String): ArrayData = {
    val parts = text.split(Space, -1)
    val seen = new java.util.HashSet[UTF8String]()
    val out = new Array[Long](parts.length)
    var m = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (seen.add(t)) { out(m) = md5Long60(t.getBytes); m += 1 }
      i += 1
    }
    val arr = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(arr) // duplicates kept — only tokens dedup
    new GenericArrayData(arr)
  }

  /** d25's content-defined chunk cut as one native pass: boundary after
    * position i (1-based, i ≥ 8) when the trailing-8-char polynomial
    * Σ c·31^k mod (2^31−1) hits 0 mod 16; chunks are the substrings
    * between cuts (whole text when shorter than one window). EXACTLY
    * the HOF formulation `filter(sequence(8, len), i -> aggregate(...))`
    * + the zip_with cut — which profiling showed interpreted and
    * dominating d25 (25.6 s at sf0.1, ~8 substring+ascii calls per
    * character). Characters compare as UTF-16 units (= `ascii()`
    * codepoints for the BMP; the corpus is ASCII). */
  def cdcChunks(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < 8)
      return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    val M = 2147483647L
    val out = new java.util.ArrayList[Any]()
    var start = 0 // 0-based chunk start
    var i = 7 // 0-based index of the window END (1-based position i+1)
    while (i < n) {
      var h = 0L
      var k = i - 7
      while (k <= i) { h = (h * 31 + s.charAt(k)) % M; k += 1 }
      if (h % 16 == 0) {
        out.add(UTF8String.fromString(s.substring(start, i + 1)))
        start = i + 1
      }
      i += 1
    }
    if (start < n || out.isEmpty)
      out.add(UTF8String.fromString(s.substring(start)))
    new GenericArrayData(out.toArray)
  }

  /** Sorted (duplicates kept) xxhash64 of every n-token gram of the
    * token array — c12's per-n gram column. Bit-identical to
    * `sort_array(transform(sequence(0, size(tk)-n),
    *    i => xxhash64(concat_ws(" ", slice(tk, i+1, n)))))`
    * (xxhash64 of the space-joined gram's UTF-8 bytes, seed 42); fewer
    * than n tokens yields the empty array, matching the `when` branch. */
  def tokenGramXxSorted(tk: ArrayData, n: Int): ArrayData = {
    val m = tk.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val parts = new Array[UTF8String](m)
    var lens = 0L
    var i = 0
    while (i < m) {
      parts(i) = tk.getUTF8String(i)
      if (parts(i).numBytes > lens) lens = parts(i).numBytes
      i += 1
    }
    // reusable gram buffer: n tokens + (n-1) single-space separators
    val buf = new Array[Byte]((lens * n + (n - 1)).toInt)
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i + n <= m) {
      var w = 0
      var j = 0
      while (j < n) {
        if (j > 0) { buf(w) = ' '; w += 1 }
        val p = parts(i + j)
        p.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + w)
        w += p.numBytes
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          w, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Positional md5Long60 of every n-token gram (duplicates kept, one
    * element per start position) — d15's gram column. Bit-identical to
    * `transform(sequence(0, size(tk)-n),
    *    i => md5Long60(concat_ws(" ", slice(tk, i+1, n))))`;
    * callers guard size(tk) >= n (matching the old filter). */
  def tokenGramMd5Positional(tk: ArrayData, n: Int): ArrayData = {
    val m = tk.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val parts = new Array[UTF8String](m)
    var maxLen = 0
    var i = 0
    while (i < m) {
      parts(i) = tk.getUTF8String(i)
      if (parts(i).numBytes > maxLen) maxLen = parts(i).numBytes
      i += 1
    }
    val md = mdTL.get()
    val buf = new Array[Byte](maxLen * n + (n - 1))
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i + n <= m) {
      var w = 0
      var j = 0
      while (j < n) {
        if (j > 0) { buf(w) = ' '; w += 1 }
        val p = parts(i + j)
        p.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + w)
        w += p.numBytes
        j += 1
      }
      md.reset()
      md.update(buf, 0, w)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
      out(i) = (v << 4) | ((d(7) >> 4) & 0xFL)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64 (seed 42, Spark's default) of every 20-char window of
    * `text`, hashed in place over the string's UTF-8 bytes (char→byte
    * offsets walked once; multi-byte chars handled exactly like
    * substr's char addressing). Element i is the hash of the window at
    * 1-based char position i+1 — bit-identical to
    * `xxhash64(text.substr(i + 1, 20))`. See [[Gram20WindowHashes]]. */
  def gram20WindowHashes(text: UTF8String): ArrayData = {
    val K = 20
    val nChars = text.numChars()
    if (nChars < K) return new GenericArrayData(Array.emptyLongArray)
    val base = text.getBaseObject
    val off0 = text.getBaseOffset
    val nBytes = text.numBytes
    // byte offset of each char start (+ the terminal offset)
    val offs = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (b < nBytes) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      c += 1
    }
    offs(nChars) = nBytes
    val out = new Array[Long](nChars - K + 1)
    var i = 0
    while (i + K <= nChars) {
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off0 + offs(i), offs(i + K) - offs(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object MinhashKernel {
  import graft.functions.TextFunctions.{minhashA, minhashB, MinhashP}

  /** k-function MinHash signature over pre-hashed elements:
    * sig(j) = min over h of ((a_j·(h mod p) + b_j) mod p) — one pass,
    * 16 accumulators, bit-identical to the HOF formulation in
    * [[graft.functions.TextFunctions.minhashFromHashesHof]] (products
    * stay < 2^62; % matches Java remainder semantics both sides). An
    * empty input yields all-null, matching array_min(empty). */
  def sig(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](k)(null))
    val a = Array.tabulate(k)(minhashA)
    val b = Array.tabulate(k)(minhashB)
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hp = hs.getLong(i) % MinhashP
      var j = 0
      while (j < k) {
        val v = (a(j) * hp + b(j)) % MinhashP
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native MinHash signature (see [[MinhashKernel.sig]]): replaces 16
  * interpreted HOF passes per row — profiling showed the minhash HOFs,
  * not the md5s, dominating the d03/d05 sketch fills once the hash
  * kernels went native. */
final case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_signature"
  override def nullSafeEval(t: Any): Any =
    MinhashKernel.sig(t.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinhashKernel.sig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(MinhashSignature(ColumnBridge.expression(c), k))
}

sealed abstract class TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string arg, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHashKernels.$kernel($c)")
}

/** d05's gram-set column as one native call (see [[TextHashKernels]]). */
final case class Gram4HashSet(child: Expression) extends TextHashExpr {
  override def prettyName: String = "graft_gram4_hash_set"
  override protected def kernel: String = "gram4Set"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.gram4Set(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Gram4HashSet =
    copy(child = newChild)
}

object Gram4HashSet {
  def apply(c: Column): Column =
    ColumnBridge.column(Gram4HashSet(ColumnBridge.expression(c)))
}

/** p02's token-5-gram hash set as one native call. */
final case class Gram5TokenHashSet(child: Expression) extends TextHashExpr {
  override def prettyName: String = "graft_gram5_token_hash_set"
  override protected def kernel: String = "tokenGram5Set"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.tokenGram5Set(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Gram5TokenHashSet =
    copy(child = newChild)
}

object Gram5TokenHashSet {
  def apply(c: Column): Column =
    ColumnBridge.column(Gram5TokenHashSet(ColumnBridge.expression(c)))
}

/** Sorted distinct-token hashes as one native call. */
final case class TokenHashesSorted(child: Expression) extends TextHashExpr {
  override def prettyName: String = "graft_token_hashes_sorted"
  override protected def kernel: String = "tokenHashes"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.tokenHashes(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TokenHashesSorted =
    copy(child = newChild)
}

object TokenHashesSorted {
  def apply(c: Column): Column =
    ColumnBridge.column(TokenHashesSorted(ColumnBridge.expression(c)))
}

/** t07's repetition counters as one native call. */
final case class RepetitionStats(child: Expression) extends TextHashExpr {
  override def prettyName: String = "graft_repetition_stats"
  override protected def kernel: String = "repetitionStats"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.repetitionStats(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def apply(c: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c)))
}

/** t20's character-share repetition counters as one native call. */
final case class RepetitionCharStats(child: Expression) extends TextHashExpr {
  override def prettyName: String = "graft_repetition_char_stats"
  override protected def kernel: String = "repetitionCharStats"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.repetitionCharStats(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): RepetitionCharStats =
    copy(child = newChild)
}

object RepetitionCharStats {
  def apply(c: Column): Column =
    ColumnBridge.column(RepetitionCharStats(ColumnBridge.expression(c)))
}

/** d25's content-defined chunk substrings as one native call (see
  * [[TextHashKernels.cdcChunks]]); ArrayType(StringType), so the
  * downstream length()/md5Long60 run per CHUNK (~len/16 of them), not
  * per character position. */
final case class CdcChunks(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string arg, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.cdcChunks(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHashKernels.cdcChunks($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  def apply(c: Column): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(c)))
}

/** d21's sliding-window gram hashes as ONE native pass (r18): the
  * xxhash64 (seed 42) of every K=20-char window of `text`, index i ↔
  * 1-based position i+1. Bit-identical to
  * `xxhash64(text.substr(p, 20))` per position — Spark's XxHash64 over
  * a string hashes its UTF-8 bytes with seed 42, and this kernel hashes
  * the same byte ranges in place (char→byte offsets walked once, no
  * per-position substring copies). The SECOND seeded gram hash d21
  * needs, `xxhash64(substr, lit(7))`, is NOT a second string hash:
  * Spark folds multi-arg xxhash64 left-to-right, so it equals
  * `XXH64.hashInt(7, g1)` (lit(7) is IntegerType) — see [[Xx64IntWithSeed]]. Texts shorter
  * than 20 chars yield the empty array (the explode then drops the row,
  * exactly like the old `when(len < K, array())` branch). */
final case class Gram20WindowHashes(child: Expression) extends TextHashExpr {
  override def prettyName: String = "graft_gram20_window_hashes"
  override protected def kernel: String = "gram20WindowHashes"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.gram20WindowHashes(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Gram20WindowHashes =
    copy(child = newChild)
}

object Gram20WindowHashes {
  def apply(c: Column): Column =
    ColumnBridge.column(Gram20WindowHashes(ColumnBridge.expression(c)))
}

/** XXH64.hashInt(v, seed-column) — the INT-fold step of Spark's
  * multi-arg xxhash64, exposed so a chained hash like
  * `xxhash64(s, lit(v))` (v an Int literal → IntegerType → hashInt,
  * NOT hashLong) can be derived from the already-computed
  * `xxhash64(s)` without re-hashing the string (see
  * [[Gram20WindowHashes]]). */
final case class Xx64IntWithSeed(v: Int, child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long arg, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_xx64_int_with_seed"
  override def nullSafeEval(seed: Any): Any =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashInt(v, seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($v, $c)")
  override protected def withNewChildInternal(newChild: Expression): Xx64IntWithSeed =
    copy(child = newChild)
}

object Xx64IntWithSeed {
  def apply(v: Int, c: Column): Column =
    ColumnBridge.column(Xx64IntWithSeed(v, ColumnBridge.expression(c)))
}

/** c12's sorted n-token-gram xxhash column as one native call
  * (see [[TextHashKernels.tokenGramXxSorted]]). Input: array<string>.
  *
  * PRECONDITION (ADVICE r18 item 2): the input array and its elements
  * must be NON-NULL — callers feed it `tokens(text)` = split of a
  * non-null column, which never produces null elements. Semantics
  * differ from the HOF chain it replaced only outside that domain: a
  * null ARRAY yields NULL here (UnaryExpression null propagation) where
  * the old `when(size(tk) >= n, ...).otherwise(array())` yielded an
  * empty array, and a null ELEMENT would NPE where concat_ws skipped
  * nulls. Keep the precondition in mind if a new caller feeds it
  * anything but tokens(). */
final case class TokenGramXxSorted(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_gram_xx_sorted"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.tokenGramXxSorted(t.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHashKernels.tokenGramXxSorted($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenGramXxSorted =
    copy(child = newChild)
}

object TokenGramXxSorted {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(TokenGramXxSorted(ColumnBridge.expression(c), n))
}

/** d15's positional n-token-gram md5Long60 column as one native call
  * (see [[TextHashKernels.tokenGramMd5Positional]]). Input: array<string>. */
final case class TokenGramMd5Positional(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${o.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_gram_md5_positional"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.tokenGramMd5Positional(t.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHashKernels.tokenGramMd5Positional($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenGramMd5Positional =
    copy(child = newChild)
}

object TokenGramMd5Positional {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(TokenGramMd5Positional(ColumnBridge.expression(c), n))
}
