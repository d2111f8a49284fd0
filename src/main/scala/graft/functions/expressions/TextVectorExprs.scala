package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native random-hyperplane LSH signature over one array<double> column.
  *
  * The composable form (`VectorFns.lshSignature`: concat of per-plane
  * `aggregate(sequence(...))` folds) is correct but runs interpreted — Spark
  * excludes higher-order functions from whole-stage codegen, and at 8 planes
  * x 64 dims that is 512 lambda frames per row. This expression fuses the
  * whole signature into one primitive loop nest (planes x dims multiply-adds,
  * zero allocation until the final string), the shape a 100 TB bucketing scan
  * needs.
  *
  * Semantics are IDENTICAL to the fold form, bit for bit:
  *   - weight(f) = ((1103515245*f + 12345) % 2^31) / 2^31 - 0.5, exact
  *     integer LCG (same formula the DuckDB oracle mirrors in SQL);
  *   - proj accumulates left-to-right from a 0.0 seed — the same double-add
  *     sequence as `aggregate`, so the sign decisions can never diverge;
  *   - a null element poisons the fold to a null proj, and the fold form's
  *     `when(proj >= 0, "1").otherwise("0")` renders null as '0' — every
  *     plane reads the same elements, so any null in the first `dim`
  *     positions yields the all-zeros signature, reproduced here;
  *   - arrays shorter than `dim` yield NULL (the fold form's element_at
  *     would raise under ANSI; NULL keeps malformed embeddings visible
  *     without failing a 100 TB scan — documented divergence).
  */
case class LshSignature(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true // short arrays yield NULL

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim) return null
    val bits = new Array[Char](planes)
    var hasNull = false
    var d = 0
    while (d < dim && !hasNull) { hasNull = v.isNullAt(d); d += 1 }
    if (hasNull) {
      java.util.Arrays.fill(bits, '0')
    } else {
      var j = 0
      while (j < planes) {
        var proj = 0.0
        val base = j.toLong * dim
        var i = 0
        while (i < dim) {
          val m = (1103515245L * (base + i) + 12345L) % 2147483648L
          proj += v.getDouble(i) * (m.toDouble / 2.147483648e9 - 0.5)
          i += 1
        }
        bits(j) = if (proj >= 0) '1' else '0'
        j += 1
      }
    }
    UTF8String.fromString(new String(bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bits = ctx.freshName("bits")
      val hasNull = ctx.freshName("hasNull")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val proj = ctx.freshName("proj")
      val m = ctx.freshName("m")
      s"""
         |if ($v.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  char[] $bits = new char[$planes];
         |  boolean $hasNull = false;
         |  for (int $d = 0; $d < $dim && !$hasNull; $d++) {
         |    $hasNull = $v.isNullAt($d);
         |  }
         |  if ($hasNull) {
         |    java.util.Arrays.fill($bits, '0');
         |  } else {
         |    for (int $j = 0; $j < $planes; $j++) {
         |      double $proj = 0.0;
         |      long $base = (long) $j * $dim;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        long $m = (1103515245L * ($base + $i) + 12345L) % 2147483648L;
         |        $proj += $v.getDouble($i) * (((double) $m) / 2.147483648e9 - 0.5);
         |      }
         |      $bits[$j] = $proj >= 0 ? '1' : '0';
         |    }
         |  }
         |  ${ev.value} = UTF8String.fromString(new String($bits));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** Native count of array<string> elements belonging to a fixed token set —
  * the fused form of `size(filter(toks, t -> t.isin(set)))` used by the
  * stopword and language-marker scores. The HOF form allocates a filtered
  * copy of the token array per row per set (q52 runs FOUR sets per row);
  * this is one hash-probe loop, no allocation.
  *
  * Semantics match the HOF form exactly: null elements are not counted
  * (`isin` yields null, filter keeps only true), a NULL array yields NULL.
  */
case class TokenSetCount(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_count expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.size * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet<UTF8String>")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $arr.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

/** Native single-pass character-distribution Shannon entropy (log2 base, the
  * convention DuckDB's `entropy()` aggregate uses) of a string — the
  * repetition/garbage quality signal a corpus filter reads per document
  * (boilerplate and keyboard-mash both sit far from natural-language
  * entropy). The compositional form would explode one row per character
  * (a 500× row blowup at corpus scale) and aggregate back; this is one
  * histogram pass per row, zero shuffle, inside whole-stage codegen.
  *
  * Determinism: the entropy sum runs in ascending code-point order — a
  * canonical order, so the double accumulation is identical on every
  * executor, every retry, any partitioning. Empty string yields 0.0.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // One static call keeps the expression inside the WholeStageCodegen span
    // (same shape as Spark's own string built-ins delegating to UTF8String).
    defineCodeGen(ctx, ev,
      v => s"graft.functions.expressions.CharEntropy.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** H = log2(n) − (Σ c·log2(c))/n over per-character counts c. ASCII fast
    * path histograms raw UTF-8 bytes with no allocation; any multi-byte
    * sequence falls back to a code-point histogram (sorted keys, same
    * canonical summation order).
    */
  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0.0
    val hist = new Array[Int](128)
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      val b = bytes(i)
      if (b >= 0) hist(b) += 1 else ascii = false
      i += 1
    }
    if (ascii) entropyOf(hist.iterator.filter(_ > 0), n)
    else {
      // counts keyed by code point, summed in ascending-key order
      val m = new java.util.TreeMap[Integer, Integer]()
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        m.merge(cp, 1, (a, b) => a + b)
        j += Character.charCount(cp)
      }
      var total = 0
      m.forEach((_, c) => total += c)
      entropyOf(scala.jdk.CollectionConverters.IteratorHasAsScala(
        m.values().iterator()).asScala.map(_.intValue()), total)
    }
  }

  private val Log2 = math.log(2.0)

  private def entropyOf(counts: Iterator[Int], n: Int): Double = {
    var acc = 0.0
    counts.foreach(c => acc += c * (math.log(c.toDouble) / Log2))
    math.log(n.toDouble) / Log2 - acc / n
  }
}

/** Registration + Column-API entry points for the fused text/vector
  * expressions (sibling of CosineFns; GraftExtensions injects the same
  * builders cluster-wide). Extra arguments arrive as foldable literals and
  * are frozen into the expression at resolution time, so codegen sees
  * compile-time constants.
  */
object TextVectorFns {
  val LshFnName = "lsh_signature"
  val TokenSetFnName = "token_set_count"
  val CharEntropyFnName = "char_entropy"

  private def litInt(e: Expression): Int = {
    require(e.foldable, s"expected a foldable int literal, got $e")
    e.eval().asInstanceOf[Number].intValue()
  }
  private def litStr(e: Expression): String = {
    require(e.foldable, s"expected a foldable string literal, got $e")
    e.eval().toString
  }

  def lshBuilder(exprs: Seq[Expression]): Expression =
    LshSignature(exprs.head, litInt(exprs(1)), litInt(exprs(2)))

  def tokenSetBuilder(exprs: Seq[Expression]): Expression =
    TokenSetCount(exprs.head, exprs.tail.map(litStr))

  def charEntropyBuilder(exprs: Seq[Expression]): Expression =
    CharEntropy(exprs.head)

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    // Once per session (see CosineFns.register): avoids the per-call
    // "function replaced" WARN in driver-captured artifacts.
    def once(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    once(LshFnName, lshBuilder)
    once(TokenSetFnName, tokenSetBuilder)
    once(CharEntropyFnName, charEntropyBuilder)
  }

  /** Column-API entry points; require `register(spark)` once per session. */
  def lshSignatureNative(vec: Column, planes: Int, dim: Int): Column =
    call_function(LshFnName, vec, lit(planes), lit(dim))

  def tokenSetCountNative(toks: Column, tokens: Seq[String]): Column =
    call_function(TokenSetFnName, (toks +: tokens.map(lit)): _*)

  def charEntropyNative(text: Column): Column =
    call_function(CharEntropyFnName, text)
}
