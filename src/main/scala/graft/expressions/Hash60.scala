package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable 60-bit hash as a native expression:
  *
  *   h60(x) = CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS BIGINT)
  *          = first 60 bits of md5(x), big-endian
  *
  * — but computed straight from the digest bytes: the SQL chain allocates
  * a 32-char hex string, a substring, and parses it back per call; this is
  * the innermost operation of every minhash/simhash/LSH pipeline (one call
  * per shingle), so those allocations are the measurable cost. DuckDB-
  * oracle twin: CAST('0x' || substring(md5(x), 1, 15) AS BIGINT).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h60 expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "h60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex digits (= 60 bits) of md5, as a non-negative long. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // big-endian first 8 bytes, dropped low nibble == 15 hex chars
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "h60", { args: Seq[Expression] => Hash60(args.head) }, "built-in")
}
