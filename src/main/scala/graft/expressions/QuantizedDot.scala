package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Term-quantized dot product of two float vectors, as a native Catalyst
  * expression with whole-stage codegen (SURVEY.md §4.3 — the one hot inner
  * loop worth a custom Expression: the HOF equivalent
  * `aggregate(zip_with(a, b, ...))` allocates a zipped array per row and
  * interprets three lambdas per element; this emits one fused Java loop).
  *
  * Semantics (must stay bit-identical to the SQL oracle):
  *   qdot(a, b) = Σ_i  floor(a[i]·b[i]·1e9 + 0.5)  as BIGINT
  * with each term computed in double precision. Integer summation makes
  * the result independent of addition order — the property the whole
  * oracle-parity scheme rests on (see graft.ops.Fx).
  *
  * Null handling: null input → null (BinaryExpression default); null
  * elements are not expected (embeddings are dense) and would NPE-free
  * evaluate as 0f via ArrayData.getFloat contract not being exercised.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects two array<float> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(
        x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e9 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor(
         |    ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * 1.0E9 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** Register `quantized_dot(a, b)` so `expr("quantized_dot(...)")` works.
    * Idempotent; call from any query that uses it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot",
      { args: Seq[Expression] => QuantizedDot(args(0), args(1)) },
      "built-in")
}
