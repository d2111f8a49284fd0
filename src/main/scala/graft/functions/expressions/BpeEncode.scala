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
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects array<string> of words, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val codec =
    new BpeCodec(merges.map { case (a, b) => Array(a, b) }.toArray)

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
final class BpeCodec(merges: Array[Array[String]]) extends Serializable {

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
    var syms = BpeCodec.codePointsOf(w)
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
    require(exprs.length == 2, "bpe_encode(words, merges_literal)")
    require(exprs(1).foldable, "merge table must be a foldable literal")
    BpeEncode(exprs.head, parse(exprs(1).eval().toString))
  }

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(FnName, builder, "built-in")
  }

  /** Column-API entry point; requires `register(spark)` once per session. */
  def bpeEncodeNative(words: Column, merges: Seq[(String, String)]): Column =
    call_function(FnName, words, lit(serialize(merges)))
}
