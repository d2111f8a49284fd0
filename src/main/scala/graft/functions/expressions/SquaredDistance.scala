package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Native squared L2 distance over two array<double> columns —
  * [[CosineSimilarity]]'s sibling for the PQ family's hot loops.
  *
  * The composable form (`aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0.0, +)`) runs interpreted with a lambda frame per element, and it sits
  * inside the corpus-width stages of PQ training/encode (every vector
  * against every per-subspace centroid) and ADC table building. This
  * expression is one fused primitive loop.
  *
  * Semantics are IDENTICAL to the fold form: per element `d = x - y` then
  * `acc += d * d`, left to right — the same IEEE op sequence, so results
  * stay bit-deterministic with the DuckDB oracle mirrors (q83/q133/q134's
  * `list_reduce` folds the same way). Ragged inputs and NULL elements
  * yield NULL, exactly like the fold (zip_with pads with nulls and a null
  * poisons the sum).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sqdist_native expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SqDistFns {
  val FnName = "sqdist_native"

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(
        FnName, exprs => SquaredDistance(exprs(0), exprs(1)), "built-in")
  }

  /** Column-API entry point; requires `register(spark)` once per session. */
  def sqDistNative(a: Column, b: Column): Column = call_function(FnName, a, b)
}
