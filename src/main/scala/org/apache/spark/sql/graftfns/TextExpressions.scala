// Lives under org.apache.spark.sql because Expression-building blocks
// (AbstractDataType, ExpressionUtils.column) are private[sql] — the standard
// extension-point placement for custom Catalyst expressions.
package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-gram shingles of a text, as 64-bit hashes, in one pass.
  *
  * Why a custom Expression: the declarative shingle pipeline
  * (`filter(split(text)) |> transform(sequence, slice+concat_ws) |>
  * array_distinct`) runs three interpreted higher-order functions and
  * materializes every shingle string — it dominated near-dup dedup wall-clock.
  * This kernel tokenizes on single spaces (empties dropped, exactly
  * [[graft.ops.Text.tokens]] / the oracle's `string_split(text, ' ')` +
  * non-empty filter), then FNV-1a-64 hashes each n-token window over the
  * token bytes joined by a single 0x20 byte — i.e. the hash of the exact
  * shingle string's UTF-8 bytes, without building the string. Distinctness of
  * hashes ≡ distinctness of shingle strings modulo 64-bit collisions
  * (P ≈ m²/2⁶⁴ per document — negligible; overlap COUNTS are what downstream
  * Jaccard consumes, so a collision would only perturb one count).
  *
  * Fewer than `n` tokens ⇒ empty array (a document too short to shingle
  * contributes no candidates), mirroring the guarded `sequence` bound in
  * [[graft.ops.Dedup.shingles]].
  */
final case class ShingleHashes(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    ShingleHashes.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"org.apache.spark.sql.graftfns.ShingleHashes.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** FNV-1a 64-bit constants, shared by every token-hashing kernel in this
  * file AND re-derived in DuckDB oracle SQL — one definition so the kernels
  * cannot silently disagree.
  */
private[graftfns] object Fnv {
  val Offset = 0xcbf29ce484222325L
  val Prime = 0x100000001b3L
}

/** Shared 0x20 token-boundary scan for the kernels that need random access
  * to token extents (ShingleHashes, WordGrams). A space byte never occurs
  * inside a multi-byte UTF-8 sequence (continuation bytes are >= 0x80), so a
  * plain byte scan is a correct character-level split; semantics match
  * `graft.ops.Text.tokens` (split on 0x20 only, empties dropped).
  */
private[graftfns] object TokenScan {
  final class Bounds(val starts: Array[Int], val ends: Array[Int], val count: Int)

  def bounds(bytes: Array[Byte]): Bounds = {
    var tokenCount = 0
    var i = 0
    val len = bytes.length
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    while (i < len) {
      if (bytes(i) != 0x20) {
        val s = i
        while (i < len && bytes(i) != 0x20) i += 1
        starts(tokenCount) = s
        ends(tokenCount) = i
        tokenCount += 1
      } else i += 1
    }
    new Bounds(starts, ends, tokenCount)
  }
}

object ShingleHashes {
  private val FnvOffset = Fnv.Offset
  private val FnvPrime = Fnv.Prime

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val tb = TokenScan.bounds(bytes)
    val starts = tb.starts
    val ends = tb.ends
    val tokenCount = tb.count
    if (tokenCount < n) return new GenericArrayData(Array.empty[Long])
    val windows = tokenCount - n + 1
    val seen = new java.util.HashSet[java.lang.Long](windows * 2)
    val out = new Array[Long](windows)
    var outLen = 0
    var w = 0
    while (w < windows) {
      var h = FnvOffset
      var k = w
      while (k < w + n) {
        if (k > w) { h ^= 0x20L; h *= FnvPrime }
        var p = starts(k)
        val e = ends(k)
        while (p < e) { h ^= (bytes(p) & 0xffL); h *= FnvPrime; p += 1 }
        k += 1
      }
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }
}

/** Word n-gram STRINGS of a text, with duplicates, in document order — the
  * counting-side sibling of [[ShingleHashes]] (which emits distinct hashes
  * for candidate joins). One byte pass over the text: token boundaries from
  * the same 0x20 scan, each gram assembled as token bytes joined by single
  * spaces (normalizing runs of separators exactly like `concat_ws(" ",
  * slice(tokens, …))`, which this kernel replaces — the HOF chain is
  * interpreted per element and dominated n-gram counting wall-clock).
  *
  * Fewer than `n` tokens ⇒ empty array.
  */
final case class WordGrams(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    WordGrams.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"org.apache.spark.sql.graftfns.WordGrams.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordGrams {
  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val tb = TokenScan.bounds(bytes)
    val starts = tb.starts
    val ends = tb.ends
    val tokenCount = tb.count
    if (tokenCount < n) return new GenericArrayData(Array.empty[Any])
    val windows = tokenCount - n + 1
    val out = new Array[Any](windows)
    var w = 0
    while (w < windows) {
      var size = n - 1 // single-space separators
      var k = w
      while (k < w + n) { size += ends(k) - starts(k); k += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      k = w
      while (k < w + n) {
        if (k > w) { buf(pos) = 0x20; pos += 1 }
        val l = ends(k) - starts(k)
        System.arraycopy(bytes, starts(k), buf, pos, l)
        pos += l
        k += 1
      }
      out(w) = UTF8String.fromBytes(buf)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash signature over a shingle-hash set: element `i` of the output is
  * `min over x in hashes of mix(x ^ seed_i)` where `mix` is the SplitMix64
  * finalizer — the standard "one base hash + k cheap derived hash functions"
  * minhash family (Broder's min-wise permutations approximated by universal
  * hashing). One tight pass: k·|set| multiplies, no per-seed re-hash of the
  * underlying strings (the nested-HOF formulation re-hashed every shingle
  * string k times, interpreted — it dominated LSH dedup wall-clock).
  *
  * Empty input ⇒ empty array (callers drop unshingleable docs).
  */
final case class MinHashSignature(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(hashes: Any, k: Any): Any =
    MinHashSignature.compute(hashes.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, k) =>
      s"org.apache.spark.sql.graftfns.MinHashSignature.compute($h, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {
  /** SplitMix64 finalizer: full-avalanche 64-bit mix. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(hashes: ArrayData, k: Int): ArrayData = {
    // SQL-reachable via the registered function: name the bad argument
    // instead of a bare NegativeArraySizeException (k = 0 would also be
    // indistinguishable from the empty-input unshingleable-doc sentinel).
    if (k < 1)
      throw new IllegalArgumentException(s"minhash_signature k must be >= 1, got $k")
    val m = hashes.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = 0x9e3779b97f4a7c15L * (i + 1)
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = mix(hashes.getLong(j) ^ seed)
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-bit SimHash of a text in one pass: whitespace tokens (empties dropped),
  * FNV-1a-64 per token, per-bit ±1 votes, sign of each vote becomes the bit.
  *
  * Replaces an explode + 64-SUM-column hash aggregate (per-token rows through
  * a shuffle) with a per-document scalar — the simhash of a document is a
  * pure function of the document, so it never needed an aggregation: no
  * shuffle at all until the (tiny) per-doc hashes band-join.
  */
final case class SimHash64(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(text: Any): Any =
    SimHash64.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graftfns.SimHash64.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val FnvOffset = Fnv.Offset
  private val FnvPrime = Fnv.Prime

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val len = bytes.length
    while (i < len) {
      if (bytes(i) != 0x20) {
        var h = FnvOffset
        while (i < len && bytes(i) != 0x20) {
          h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      } else i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }
}

/** Count of BPE-style pre-tokens in one byte pass: the number of maximal runs
  * of lowercase-letters, digits, or other-non-whitespace — exactly
  * `size(regexp_extract_all(lower(text), "[a-z]+|[0-9]+|[^a-z0-9\s]+"))`
  * ([[graft.ops.Text.BpePattern]], shared with the DuckDB oracle) for ASCII
  * text, without running a regex engine (the regex was the single most
  * expensive scan in the pipeline — ~an order of magnitude slower than this
  * byte classifier for the same counts).
  *
  * Byte-level classification is exact because the classes partition bytes:
  * `A–Z`/`a–z` → letter (ASCII lowering is class-preserving), `0–9` → digit,
  * `\t\n\v\f\r ` → whitespace (Java regex `\s` ≡ RE2 `\s` on these six), and
  * everything else — including every byte ≥ 0x80, so multi-byte UTF-8 chars
  * group with their neighbors — → other. Caveat (documented, accepted): the
  * rare non-ASCII chars whose Unicode lowercase maps INTO `a–z` (e.g. U+212A
  * KELVIN SIGN → `k`) classify as other here but letter after `lower()`; the
  * corpora this targets are ASCII (verified for the test corpus).
  */
final case class BpeRunCount(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_run_count"

  override protected def nullSafeEval(text: Any): Any =
    BpeRunCount.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graftfns.BpeRunCount.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeRunCount {
  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    var count = 0L
    var prev = 0 // 0 = whitespace, 1 = letter, 2 = digit, 3 = other
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i) & 0xff
      val cls =
        if (b == ' ' || (b >= '\t' && b <= '\r')) 0 // \t \n \v \f \r
        else if ((b | 0x20) >= 'a' && (b | 0x20) <= 'z') 1
        else if (b >= '0' && b <= '9') 2
        else 3
      if (cls != 0 && cls != prev) count += 1
      prev = cls
      i += 1
    }
    count
  }
}

/** Order-sensitive rolling 31-bit fingerprint of a text's space-separated
  * tokens (0x20 only, matching [[graft.ops.Text.tokens]] and the DuckDB
  * oracle — tabs/newlines are token bytes, not separators) in one byte
  * pass: FNV-1a-64 per token (same per-token hash family as
  * [[ShingleHashes]]/[[SimHash64]]), folded left-to-right as
  * `acc·31 + (h AND (2³¹−1))` mod 2³¹. Unlike an md5 of the raw string it
  * tolerates repeated-space differences but NOT token reordering — the
  * provenance fingerprint for "same content, same order". FNV-1a is plain
  * integer arithmetic, so the DuckDB oracle reproduces it exactly (nested
  * `list_reduce` over chars then tokens, HUGEINT mod 2⁶⁴) — unlike the
  * xxhash64 HOF formulation this kernel replaces, which had no oracle.
  */
final case class RollingFp(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override protected def nullSafeEval(text: Any): Any =
    RollingFp.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graftfns.RollingFp.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFp {
  private val FnvOffset = Fnv.Offset
  private val FnvPrime = Fnv.Prime
  private val Mask = (1L << 31) - 1

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    var acc = 0L
    var i = 0
    val len = bytes.length
    while (i < len) {
      if (bytes(i) != 0x20) {
        var h = FnvOffset
        while (i < len && bytes(i) != 0x20) {
          h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1
        }
        acc = (acc * 31L + (h & Mask)) & Mask
      } else i += 1
    }
    acc
  }
}

/** Per-language stopword hit counts `(en, es, fr, de)` of a text in ONE byte
  * pass — the language-ID hot path. The declarative formulation runs four
  * interpreted `filter(array_contains(...))` traversals over the token
  * array (one per language) plus the tokenize itself; this kernel streams
  * the bytes once, packs each ≤4-byte token into a long key (every
  * dictionary word is 1–4 ASCII letters) and binary-searches a 34-entry
  * sorted key table built FROM [[graft.ops.Text.StopEn]]/Es/Fr/De at class
  * load — one source of truth, so the kernel and the CASE-chain oracle
  * cannot drift. A word shared by several dictionaries ("de", "la", "un")
  * carries a language bitmask and increments every owner, exactly like the
  * four independent `array_contains` passes.
  *
  * Tokens are 0x20-separated runs ([[graft.ops.Text.tokens]]); matching is
  * ASCII-case-insensitive, and any token byte outside `A–Za–z` (digits,
  * punctuation, every UTF-8 continuation byte) disqualifies the token —
  * byte-equivalent to `lower()`+equality for all-ASCII text. Caveat (the
  * [[BpeRunCount]] one): the rare non-ASCII chars whose UNICODE lowercase
  * folds into `a–z` differ from `lower()`-then-match; no dictionary word is
  * reachable that way from a single char (the corpora this targets are
  * ASCII, verified for the test corpus).
  */
final case class StopHits(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stop_hits"

  override protected def nullSafeEval(text: Any): Any =
    StopHits.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graftfns.StopHits.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopHits {
  /** `(length << 32) | up-to-4 packed lowercase bytes` — injective for 1–4
    * letter words (the length tag keeps "a" and "\0a"-style prefixes apart).
    */
  private def keyOf(w: String): Long = {
    require(w.nonEmpty && w.length <= 4 && w.forall(c => c >= 'a' && c <= 'z'),
      s"stopword '$w' not 1-4 lowercase ASCII letters")
    var packed = 0L
    w.foreach(c => packed = (packed << 8) | c.toLong)
    (w.length.toLong << 32) | packed
  }

  private val (keys, masks): (Array[Long], Array[Int]) = {
    val m = scala.collection.mutable.LongMap.empty[Int]
    val dicts = Seq(
      graft.ops.Text.StopEn, graft.ops.Text.StopEs,
      graft.ops.Text.StopFr, graft.ops.Text.StopDe)
    for ((ws, bit) <- dicts.zipWithIndex; w <- ws)
      m(keyOf(w)) = m.getOrElse(keyOf(w), 0) | (1 << bit)
    val sorted = m.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val counts = new Array[Long](4)
    var i = 0
    val len = bytes.length
    while (i < len) {
      if (bytes(i) != 0x20) {
        var tl = 0
        var packed = 0L
        var letters = true
        while (i < len && bytes(i) != 0x20) {
          var b = bytes(i) & 0xff
          if (b >= 'A' && b <= 'Z') b |= 0x20
          if (b < 'a' || b > 'z') letters = false
          else if (tl < 4) packed = (packed << 8) | b.toLong
          tl += 1
          i += 1
        }
        if (letters && tl <= 4) {
          val idx = java.util.Arrays.binarySearch(keys, (tl.toLong << 32) | packed)
          if (idx >= 0) {
            val mask = masks(idx)
            if ((mask & 1) != 0) counts(0) += 1
            if ((mask & 2) != 0) counts(1) += 1
            if ((mask & 4) != 0) counts(2) += 1
            if ((mask & 8) != 0) counts(3) += 1
          }
        }
      } else i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Per-document term frequencies in one pass: the DISTINCT space-separated
  * tokens of a text (0x20 only, matching [[graft.ops.Text.tokens]]) with
  * their in-document occurrence counts, as
  * `array<struct<term string, tf long>>` in first-occurrence order.
  *
  * Why a custom Expression: TF-IDF's first aggregation — `explode(tokens)`
  * → `groupBy(doc, term)` → count — hash-aggregates every token OCCURRENCE
  * (hundreds per document) just to rediscover row-local facts. A document's
  * term counts need no cross-row work at all, so this kernel folds them
  * inside the scan and the per-term corpus rollup becomes the plan's ONLY
  * aggregation: partial aggregation then carries one row per distinct term
  * per partition, never one per (doc, term).
  */
final case class TermCounts(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TermCounts.Out
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(text: Any): Any =
    TermCounts.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graftfns.TermCounts.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {
  val Out: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", LongType, nullable = false))),
    containsNull = false)

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val tb = TokenScan.bounds(bytes)
    // LinkedHashMap for deterministic (first-occurrence) output order; the
    // UTF8String keys WRAP the shared byte array — no per-token copy.
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](tb.count * 2)
    var k = 0
    while (k < tb.count) {
      val t = UTF8String.fromBytes(bytes, tb.starts(k), tb.ends(k) - tb.starts(k))
      val cell = m.get(t)
      if (cell == null) m.put(t, Array(1L)) else cell(0) += 1L
      k += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  /** Distinct word-n-gram shingle hashes of `text` as `array<long>`. */
  def shingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(
      ShingleHashes(
        ExpressionUtils.expression(text),
        ExpressionUtils.expression(org.apache.spark.sql.functions.lit(n))))

  /** Word n-gram strings of `text` (duplicates kept, document order). */
  def wordGrams(text: Column, n: Int): Column =
    ExpressionUtils.column(
      WordGrams(
        ExpressionUtils.expression(text),
        ExpressionUtils.expression(org.apache.spark.sql.functions.lit(n))))

  /** `k`-element minhash signature of a shingle-hash array. */
  def minhashSignature(hashes: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(
        ExpressionUtils.expression(hashes),
        ExpressionUtils.expression(org.apache.spark.sql.functions.lit(k))))

  /** 64-bit SimHash of a text column. */
  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))

  /** BPE-style pre-token count of a text column (byte-class run counter). */
  def bpeRunCount(text: Column): Column =
    ExpressionUtils.column(BpeRunCount(ExpressionUtils.expression(text)))

  /** Order-sensitive rolling 31-bit token fingerprint of a text column. */
  def rollingFp(text: Column): Column =
    ExpressionUtils.column(RollingFp(ExpressionUtils.expression(text)))

  /** Per-language stopword hit counts `(en, es, fr, de)` as `array<long>`. */
  def stopHits(text: Column): Column =
    ExpressionUtils.column(StopHits(ExpressionUtils.expression(text)))

  /** Distinct tokens of `text` with in-document counts
    * (`array<struct<term, tf>>`, first-occurrence order).
    */
  def termCounts(text: Column): Column =
    ExpressionUtils.column(TermCounts(ExpressionUtils.expression(text)))

  /** murmur3 32-bit finalizer over the low 32 bits of a long column
    * ([[Murmur32Fin]]).
    */
  def murmur32fin(v: Column): Column =
    ExpressionUtils.column(Murmur32Fin(ExpressionUtils.expression(v)))

  /** `|a ∩ b|` of two SORTED long-array columns ([[IntersectCountSorted]]). */
  def intersectCountSorted(a: Column, b: Column): Column =
    ExpressionUtils.column(IntersectCountSorted(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Intersection size of two SORTED `array<long>` columns — one merge walk,
  * O(|a| + |b|), no allocation. The verification kernel for candidate-pair
  * dedup ops ([[graft.ops.Dedup.jaccardPairsPrefixFiltered]]): the built-in
  * `array_intersect` builds a hash set and materializes the intersection
  * ARRAY per call (interpreted, allocating) when only the COUNT is needed.
  * Inputs must be ascending and duplicate-free — exactly what
  * `array_sort` over [[ShingleHashes]] (distinct by construction) yields;
  * unsorted input silently undercounts, so callers own the sort.
  */
final case class IntersectCountSorted(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountSorted.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftfns.IntersectCountSorted.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCountSorted {
  /** Called from both interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** murmur3's 32-bit finalizer over the low 32 bits of a long — the sketch
  * hash behind [[graft.ops.Sketches]] (KMV, KMV set ops, Count-Min).
  *
  * Why a custom Expression: the same lattice written in the Column DSL
  * (`pmod`/`shiftrightunsigned`/`bitwiseXOR` with 16-bit split multiplies to
  * stay inside ANSI Long bounds) references each mixing stage's operand ~4
  * times, so the Catalyst TREE grows ~4× per stage — thousands of nodes per
  * instance. That blows codegen back to interpreted eval AND makes every
  * optimizer pass walk the exponential tree (driver-side planning seconds
  * for a 10-row probe frame). One scalar node keeps the tree O(1) and the
  * arithmetic in plain JVM longs — bit-identical to the DSL formula and to
  * the oracle's HUGEINT replication (SketchesSpec pins equality against the
  * original Column formulation).
  */
final case class Murmur32Fin(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "murmur32fin"

  override protected def nullSafeEval(v: Any): Any =
    Murmur32Fin.compute(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"org.apache.spark.sql.graftfns.Murmur32Fin.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Murmur32Fin {
  private final val M = 4294967296L

  /** `z·k mod 2³²` via the same 16-bit-split lattice as the Column form
    * (`((z»16)·k mod 2³²)·2¹⁶ + (z∧0xFFFF)·k, mod 2³²`): every intermediate
    * stays ≤ 2⁴⁹, exactly the overflow-free shape the oracle replicates.
    */
  private def mulMod(z: Long, k: Long): Long =
    ((((z >>> 16) * k) % M) * 65536L + (z & 0xFFFFL) * k) % M

  /** Called from both interpreted eval and generated code. */
  def compute(v: Long): Long = {
    val z1 = java.lang.Math.floorMod(v, M)
    val z2 = mulMod(z1 ^ (z1 >>> 16), 2246822507L)
    val z3 = mulMod(z2 ^ (z2 >>> 13), 3266489909L)
    z3 ^ (z3 >>> 16)
  }
}
