package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Half-signature of a binary (sign-bit) vector quantization: packs the 32
  * sign bits of dims `[msb-31, msb]` (0-based, MSB first) of an
  * array<double> into one long — the q80 signature kernel.
  *
  * The composable form (`aggregate` over a `sequence`, acc*2 + signbit) is
  * semantically identical but interpreted: a lambda frame per bit per row.
  * This expression is one fused 32-iteration primitive loop inside
  * whole-stage codegen — the per-row cost that dominates a corpus-scale
  * signature build.
  *
  * Bit semantics mirror the fold exactly (and therefore the DuckDB oracle):
  * element >= 0 sets the bit; a NULL or out-of-range element contributes a
  * 0 bit (the fold's `when(...).otherwise(0)` with null-poisoned get).
  * Max value 2^32 - 1: never overflows a signed long in either engine.
  */
case class SignBits(vec: Expression, msb: Expression) extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = msb

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, msb.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sign_bits expects (array<double>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val top = m.asInstanceOf[Int]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < 32) {
      val idx = top - i
      val bit =
        if (idx >= 0 && idx < n && !x.isNullAt(idx) && x.getDouble(idx) >= 0.0) 1L else 0L
      acc = acc * 2 + bit
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < 32; $i++) {
         |  int $idx = $m - $i;
         |  long bit = ($idx >= 0 && $idx < $n && !$a.isNullAt($idx)
         |      && $a.getDouble($idx) >= 0.0) ? 1L : 0L;
         |  $acc = $acc * 2L + bit;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBits =
    copy(vec = newLeft, msb = newRight)
}

object SignBitsFns {
  val FnName = "sign_bits_native"

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(
        FnName, exprs => SignBits(exprs(0), exprs(1)), "built-in")
  }

  /** Column-API entry point; requires `register(spark)` once per session. */
  def signBitsNative(vec: Column, msb: Column): Column = call_function(FnName, vec, msb)
}
