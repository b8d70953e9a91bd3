package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Term-quantized dot product of two numeric vectors, as a native Catalyst
  * expression with whole-stage codegen (SURVEY.md §4.3 — the one hot inner
  * loop worth a custom Expression: the HOF equivalent
  * `aggregate(zip_with(a, b, ...))` allocates a zipped array per row and
  * interprets three lambdas per element; this emits one fused Java loop).
  *
  * Accepts `array<float>` or `array<double>` on EITHER side independently
  * (embeddings are float; k-means centroids rebuilt from integer sums are
  * double — q61's assign loop is float × double).
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

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects two array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  private def isFloat(e: Expression): Boolean =
    elemType(e.dataType).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left)
    val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += math.floor(xv * yv * 1e9 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"((double) $arr.getFloat($i))"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor(
         |    ${get(a, left)} * ${get(b, right)} * 1.0E9 + 0.5);
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
