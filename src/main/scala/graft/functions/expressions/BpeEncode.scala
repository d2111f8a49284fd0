package graft.functions.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-scale BPE *encode*: apply a trained merge list (see
  * [[graft.functions.BpeTrainer]]) to a column of words, yielding the
  * concatenated subword tokens of every word in order.
  *
  * Semantics are the SEQUENTIAL apply — for each merge in learned order,
  * fuse every greedy left-to-right non-overlapping occurrence of the pair
  * inside the word (exactly `BpeTrainer.applyMerge`, so
  * `encode(words, train(...).merges)` reproduces `train(...).sequences`
  * bit for bit; for a merge list produced by BPE training this equals the
  * rank-priority encode, since every merge's parts predate it). Greedy
  * non-overlapping replacement is also what SQL `replace()` does, which is
  * what keeps this DuckDB-oracle-checkable: the oracle mirrors each merge as
  * one `replace()` over a chr(31)-delimited symbol string.
  *
  * Why a native expression and not a HOF fold: applying m merges
  * compositionally nests m `aggregate(...)` layers (BpeTrainer applies ONE
  * merge per round and re-checkpoints — fine for training, fatal for
  * encode), and higher-order functions run interpreted outside
  * whole-stage codegen. This is one reference-object call inside the
  * codegen span, with a bounded per-task word cache: natural-language
  * corpora are Zipf-distributed, so almost every word occurrence is a cache
  * hit and the corpus-scale cost is ~one hash probe per word — the shape a
  * 100 TB tokenize-everything scan needs. Encoding is embarrassingly
  * parallel (zero shuffle); only the caller's aggregate shuffles.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects array<string> of words, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val codec =
    new BpeCodec(merges.map { case (a, b) => Array(a, b) }.toArray, byteLevel)

  override def nullSafeEval(input: Any): Any =
    codec.encodeAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // One reference-object call (CharEntropy pattern): the expression stays
    // inside the WholeStageCodegen span; the codec carries the merge table
    // and the per-task word cache.
    val codecRef = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    defineCodeGen(ctx, ev, v => s"$codecRef.encodeAll($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Merge table + bounded word→tokens cache, shared across all rows of a task
  * (referenced from generated code). Thread-safe; above [[BpeCodec.CacheMax]]
  * distinct words the codec simply stops inserting — correctness never
  * depends on the cache.
  */
final class BpeCodec(merges: Array[Array[String]],
                     byteLevel: Boolean = false) extends Serializable {

  @transient private lazy val cache =
    new ConcurrentHashMap[String, Array[UTF8String]]()

  def encodeAll(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val toks = encodeWord(words.getUTF8String(i).toString)
        var j = 0
        while (j < toks.length) { out += toks(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def encodeWord(w: String): Array[UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms =
      if (byteLevel) BpeCodec.byteSymbolsOf(w) else BpeCodec.codePointsOf(w)
    var mi = 0
    while (mi < merges.length) {
      val a = merges(mi)(0)
      val b = merges(mi)(1)
      if (syms.length >= 2) {
        // presence scan first: a merge that does not apply allocates nothing
        var at = -1
        var i = 0
        while (at < 0 && i < syms.length - 1) {
          if (syms(i) == a && syms(i + 1) == b) at = i else i += 1
        }
        if (at >= 0) syms = BpeCodec.fuse(syms, a, b, at)
      }
      mi += 1
    }
    val toks = syms.map(UTF8String.fromString)
    if (cache.size < BpeCodec.CacheMax) cache.put(w, toks)
    toks
  }
}

object BpeCodec {
  /** Zipf head comfortably fits; beyond this the cache stops growing. */
  val CacheMax = 1 << 16

  /** GPT-2-style byte→printable-char table (the public `bytes_to_unicode`
    * construction): printable ASCII (33-126) and printable Latin-1
    * (161-172, 174-255) bytes keep their own code point; the remaining 68
    * bytes shift to 256+n. Bijective over 0..255, so ANY string — any
    * script, any binary-ish garbage — seeds from a closed 256-symbol base
    * vocabulary and decodes back exactly. On the `[a-z0-9]+` word universe
    * (q129's), every byte is in the keep range, so byte-level and
    * code-point seeding coincide — pinned by `BpeSpec`.
    */
  val ByteToChar: Array[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar.toString
      else { val c = (256 + n).toChar.toString; n += 1; c }
    }.toArray
  }

  val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (s, b) => s.charAt(0) -> b }.toMap

  /** Seed symbols of a word in byte-level mode: UTF-8 bytes, each remapped
    * to its printable char.
    */
  def byteSymbolsOf(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ByteToChar(bytes(i) & 0xff); i += 1 }
    out
  }

  /** Inverse of [[byteSymbolsOf]] over any concatenation of byte-level
    * symbols/tokens — the round-trip witness: decode(encode(w)) == w.
    */
  def decodeByteSymbols(syms: Seq[String]): String = {
    val bytes = syms.flatMap(_.iterator.map(CharToByte(_).toByte)).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  private[expressions] def codePointsOf(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Greedy left-to-right non-overlapping fuse of (a,b) from first hit `at`. */
  private[expressions] def fuse(syms: Array[String], a: String, b: String,
                                at: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < at) { out += syms(j); j += 1 }
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }
}

/** Registration + Column API for `bpe_encode` (TextVectorFns pattern). The
  * merge table travels as ONE foldable string literal — `a b;c d;...` in
  * learned order — frozen into the expression at resolution time.
  */
object BpeFns {
  val FnName = "bpe_encode"

  def serialize(merges: Seq[(String, String)]): String = {
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !s"$a$b".exists(c => c == ' ' || c == ';'),
        s"merge symbols must be non-empty and free of ' '/';': ($a,$b)")
    }
    merges.map { case (a, b) => s"$a $b" }.mkString(";")
  }

  def parse(s: String): Seq[(String, String)] =
    if (s.isEmpty) Seq.empty
    else s.split(';').toSeq.map { p =>
      val sp = p.indexOf(' ')
      require(sp > 0 && sp < p.length - 1, s"malformed merge '$p'")
      (p.substring(0, sp), p.substring(sp + 1))
    }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2 || exprs.length == 3,
      "bpe_encode(words, merges_literal[, byte_level])")
    require(exprs(1).foldable, "merge table must be a foldable literal")
    val byteLevel = exprs.length == 3 && {
      require(exprs(2).foldable, "byte_level must be a foldable literal")
      exprs(2).eval() == true
    }
    BpeEncode(exprs.head, parse(exprs(1).eval().toString), byteLevel)
  }

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column-API entry point; requires `register(spark)` once per session.
    * `byteLevel = true` seeds each word from its remapped UTF-8 bytes
    * ([[BpeCodec.byteSymbolsOf]]) instead of code points — the GPT-2-style
    * mode whose 256-symbol base vocabulary makes any string encodable.
    */
  def bpeEncodeNative(words: Column, merges: Seq[(String, String)],
                      byteLevel: Boolean = false): Column =
    if (byteLevel) call_function(FnName, words, lit(serialize(merges)), lit(true))
    else call_function(FnName, words, lit(serialize(merges)))
}
