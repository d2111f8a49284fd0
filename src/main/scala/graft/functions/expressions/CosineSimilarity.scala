package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Native cosine similarity over two array<double> columns.
  *
  * The composable form (`zip_with` + `aggregate`, see VectorFns.cosine) is
  * correct but runs interpreted: Spark's higher-order functions are excluded
  * from whole-stage codegen and allocate a lambda frame per element. This
  * expression generates a single fused primitive loop (dot product and both
  * norms in one pass, no allocation), which is what a 100 TB brute-force
  * scoring scan needs.
  *
  * Semantics are IDENTICAL to the fold form: one left-to-right pass of
  * double adds, `dot / sqrt(na * nb)` — so results stay bit-deterministic
  * with the DuckDB oracle mirrors (list_reduce folds the same way).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // Ragged inputs and NULL elements yield NULL, matching the fold form
  // exactly (zip_with pads the shorter array with nulls and a null element
  // poisons the fold) — a silent common-prefix/zero-filled score would mask
  // malformed embeddings. Hence nullable even over non-null children.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineFns {
  val FnName = "cosine_native"

  /** Register the native expression in the session's FunctionRegistry so it
    * resolves both from SQL text and from `call_function` (the public
    * Expression->Column bridge in Spark 4; the Column constructor over raw
    * Expressions is spark-private).
    */
  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    // Once per session: re-registration logs a "function replaced" WARN on
    // every call site, polluting the one-line bench artifact the driver keeps.
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)))
      reg.createOrReplaceTempFunction(
        FnName, exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
  }

  /** Column-API entry point; requires `register(spark)` once per session. */
  def cosineNative(a: Column, b: Column): Column = call_function(FnName, a, b)
}
