package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping character-4-grams of a string, each packed INJECTIVELY
  * into one BIGINT: gram(i) = c(i)<<48 | c(i+1)<<32 | c(i+2)<<16 | c(i+3).
  *
  * This replaces q34's md5-per-position gram hashing: a 4-char window fits
  * 4 × 16-bit code units exactly, so no hash function is needed at all —
  * zero collisions, and ONE rolling pass per row (shift-or per character)
  * instead of one md5 per character position. The oracle computes the
  * identical packing with ord(): `CAST(ord(txt[i:i]) AS BIGINT) << 48 |
  * …` — pure integer ops both sides.
  *
  * Parity domain: UTF-16 code units (Spark) equal Unicode code points
  * (DuckDB ord) for all BMP characters; the corpus is ASCII. Supplementary
  * (non-BMP) characters would diverge — acceptable for the
  * dedup-blocking use; hash-based H60 remains for general text.
  */
case class CharGram4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_gram4 expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram4"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val m = math.max(0, n - 3)
    val out = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 16) | s.charAt(i).toLong // keeps the last 4 code units
      if (i >= 3) out(i - 3) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |int $m = java.lang.Math.max(0, $n - 3);
         |long[] $out = new long[$m];
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h << 16) | (long) $s.charAt($i);
         |  if ($i >= 3) $out[$i - 3] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGram4 =
    copy(child = newChild)
}

object CharGram4 {
  /** Register `char_gram4(s)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_gram4",
      { args: Seq[Expression] => CharGram4(args.head) },
      "built-in")
}
