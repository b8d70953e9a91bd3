package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp-style rolling content fingerprint as a native expression:
  *
  *   fp(text) = fold over code points of  acc·31 + cp  (mod 1e9+7)
  *
  * Replaces `aggregate(split(text, ''), ...)` — which allocates a
  * one-string-per-character array and interprets a lambda per element —
  * with one loop over the string (TextOps q28's per-row hot path). The
  * fold is order-dependent by design (it is a positional fingerprint), so
  * it cannot be an aggregate; it stays a scalar expression evaluated where
  * the row already is — zero shuffle, codegen-friendly.
  *
  * Parity: identical to the DuckDB oracle's
  * `list_reduce(list_transform(string_split(text,''), ord), ...)` for any
  * text (both iterate unicode code points).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash",
      { args: Seq[Expression] => RollingHash(args.head) },
      "built-in")
}
