package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenizer core — the GPT-2 algorithm (Radford et al.
  * 2019; Sennrich et al. 2016 for the merge loop), reimplemented from the
  * published description:
  *
  *  1. pre-tokenize with the GPT-2 regex (contractions, ` ?letters`,
  *     ` ?digits`, ` ?punct-runs`, whitespace with the trailing-space
  *     lookahead) so merges NEVER cross pre-token boundaries;
  *  2. map UTF-8 bytes to printable unicode chars (the byte-level trick:
  *     printable bytes map to themselves, the rest shift to 256+n — space
  *     becomes `Ġ`), so the merge alphabet is chars, never raw bytes;
  *  3. per pre-token, repeatedly merge the LOWEST-RANK adjacent symbol
  *     pair (all its occurrences, left to right) until no pair is in the
  *     rank table.
  *
  * Token COUNT drives packing/budget/dedup-segment operators; token
  * strings (in mapped-char space) are the audit surface. An id lookup is
  * a plain `map(vocab)` on top and deliberately not baked in here.
  *
  * 100 TB shape: pure per-row compute behind codegen'd expressions
  * ([[BpeTokens]]/[[BpeCount]]); the rank table rides the plan once per
  * task via the codegen reference array (fasttext-vocab scale — 50k
  * merges ≈ a few MB), and a bounded per-task concurrent cache exploits
  * Zipfian pre-token repetition exactly like the reference encoders'
  * lru_cache. No shuffle, no broadcast join, no UDF boxing. */
object Bpe {

  /** GPT-2 byte↔unicode table: bytes in the three printable ranges map to
    * themselves, the other 68 shift to 256+n (so every byte is a visible,
    * non-space char and merge symbols survive round-trips as strings). */
  val ByteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var shift = 0
    (0 until 256).foreach { b =>
      val printable = (b >= '!' && b <= '~') || (b >= 0xa1 && b <= 0xac) || (b >= 0xae && b <= 0xff)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }

  /** The GPT-2 pre-tokenizer. `\p{L}`/`\p{N}` and the `(?!\S)` lookahead
    * are the published pattern verbatim; Java regex supports both. */
  val PreTokenizer: Pattern =
    Pattern.compile("""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  /** UTF-8 bytes of `s`, mapped through [[ByteToChar]]. */
  def byteMap(s: String): String = {
    val bytes = s.getBytes("UTF-8")
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ByteToChar(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Inverse of [[ByteToChar]]: mapped char (code point < 324) → byte. */
  private val CharToByte: Array[Int] = {
    val out = Array.fill(324)(-1)
    (0 until 256).foreach(b => out(ByteToChar(b)) = b)
    out
  }

  /** DETOKENIZE: mapped-char token stream → original string — the
    * byte-level round trip GPT-2 BPE guarantees (every token is a
    * sequence of mapped BYTES, so concatenation + inverse byte map +
    * UTF-8 decode is lossless regardless of how text was split into
    * tokens). Raises on a char outside the 324-symbol byte alphabet —
    * a corrupted token must not silently decode. */
  def detokenize(tokens: Array[String]): String = {
    var total = 0
    var t = 0
    while (t < tokens.length) { total += tokens(t).length; t += 1 }
    val bytes = new Array[Byte](total)
    var k = 0
    t = 0
    while (t < tokens.length) {
      val s = tokens(t)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i).toInt
        val b = if (c < 324) CharToByte(c) else -1
        require(b >= 0, s"bpe detokenize: char U+${c.toHexString} is not in the byte alphabet")
        bytes(k) = b.toByte
        k += 1
        i += 1
      }
      t += 1
    }
    new String(bytes, "UTF-8")
  }

  /** Codegen entry for [[detokenize]] over Catalyst array data. */
  def detokenizeArray(tokens: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = tokens.numElements()
    val arr = new Array[String](n)
    var i = 0
    while (i < n) { arr(i) = tokens.getUTF8String(i).toString; i += 1 }
    UTF8String.fromString(detokenize(arr))
  }

  /** Merge-rank table + per-task encode cache. One instance per expression
    * rides the codegen reference array; generated code for MANY partitions
    * of one task set shares it, so the cache is concurrent and bounded
    * (Zipfian pre-tokens hit it constantly; unbounded growth would leak on
    * adversarial corpora). */
  final class Ranks(merges: Seq[(String, String)], cacheCap: Int = 1 << 16) extends Serializable {
    require(merges.nonEmpty, "bpe: merge table must be non-empty")
    private[Bpe] val rank = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        // NUL never appears in byte-mapped symbols (byte 0 maps to U+0100),
        // so it is a safe rank-key separator — reject it in inputs loudly
        require(!a.contains('\u0000') && !b.contains('\u0000'), s"bpe: NUL in merge symbol ($a, $b)")
        val prev = m.putIfAbsent(a + '\u0000' + b, Integer.valueOf(i))
        require(prev == null, s"bpe: duplicate merge pair ($a, $b)")
      }
      m
    }
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private[Bpe] def cached(word: String): Array[String] = {
      val hit = cache.get(word)
      if (hit != null) hit
      else {
        val toks = mergeLoop(word, rank)
        if (cache.size < cacheCap) cache.put(word, toks)
        toks
      }
    }
  }

  /** The Sennrich merge loop over one byte-mapped pre-token: find the
    * lowest-rank adjacent pair, merge ALL its occurrences left-to-right,
    * repeat. O(len²·merges-applied) worst case — pre-tokens are words, not
    * documents, so len is small; the per-task cache amortizes repeats. */
  private def mergeLoop(word: String, rank: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.length <= 1) return if (word.isEmpty) Array.empty else Array(word)
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    while (syms.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + '\u0000' + syms(i + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) return syms
      val a = syms(bi)
      val b = syms(bi + 1)
      val out = new Array[String](syms.length)
      var n = 0
      i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out(n) = a + b; n += 1; i += 2
        } else { out(n) = syms(i); n += 1; i += 1 }
      }
      syms = java.util.Arrays.copyOf(out, n)
    }
    syms
  }

  /** Tokenize a full string: pre-tokenize, byte-map, merge per pre-token. */
  def encode(s: String, ranks: Ranks): Array[String] = {
    val out = Array.newBuilder[String]
    val m = PreTokenizer.matcher(s)
    while (m.find()) out ++= ranks.cached(byteMap(m.group()))
    out.result()
  }

  /** Token count without materializing the token array per row (the
    * cache still holds per-PRE-TOKEN arrays, bounded by vocab not corpus). */
  def countTokens(s: String, ranks: Ranks): Int = {
    var n = 0
    val m = PreTokenizer.matcher(s)
    while (m.find()) n += ranks.cached(byteMap(m.group())).length
    n
  }

  /** Byte-mapped PRE-tokens of a string (no merging) — the training-side
    * counterpart of [[encode]]: BPE learns its merge table from the
    * frequency dictionary of exactly these units. */
  def preTokenArray(s: String): GenericArrayData = {
    val out = Array.newBuilder[Any]
    val m = PreTokenizer.matcher(s)
    while (m.find()) out += UTF8String.fromString(byteMap(m.group()))
    new GenericArrayData(out.result())
  }

  /** Codegen entry: tokens as Catalyst array data. */
  def encodeArray(s: String, ranks: Ranks): GenericArrayData = {
    val toks = encode(s, ranks)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `bpe_tokens(text)` — BPE token strings (mapped-char space) per row.
  * Generated code calls the static [[Bpe]] encoder with the rank table
  * from the reference array, so the expression stays inside whole-stage
  * codegen (SURVEY.md §2.10: expressions, not UDFs). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_tokens requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val ranks = new Bpe.Ranks(merges)

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeArray(input.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, classOf[Bpe.Ranks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Bpe.encodeArray($c.toString(), $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_count(text)` — BPE token count; same engine as [[BpeTokens]]
  * without per-row array materialization (the budget/packing hot path). */
case class BpeCount(child: Expression, merges: Seq[(String, String)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_count requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val ranks = new Bpe.Ranks(merges)

  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, classOf[Bpe.Ranks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Bpe.countTokens($c.toString(), $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_words(text)` — byte-mapped GPT-2 pre-tokens per row (no merge
  * table): the unit stream BPE TRAINING counts. Same codegen shape as
  * [[BpeTokens]]. */
case class BpeWords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_words requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Bpe.preTokenArray(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Bpe.preTokenArray($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_detokenize(tokens)` — mapped-char token array back to the
  * original string (inverse byte map + UTF-8 decode); the lossless
  * round-trip guarantee of byte-level BPE, gated end-to-end by x108. */
case class BpeDetokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_detokenize requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Bpe.detokenizeArray(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Bpe.detokenizeArray($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokens(GraftBridge.expression(text), merges))

  def bpeDetokenize(tokens: Column): Column =
    GraftBridge.column(BpeDetokenize(GraftBridge.expression(tokens)))

  def bpeWords(text: Column): Column =
    GraftBridge.column(BpeWords(GraftBridge.expression(text)))

  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeCount(GraftBridge.expression(text), merges))
}
