package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import expressions.{CharGram4, Hash60, QuantizedDot, RollingHash}

/** Library entry point via Spark's extension mechanism (SURVEY.md §4.3):
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * injects every graft custom expression into the session's function
  * registry at build time — SQL users get `quantized_dot` / `h60` /
  * `rolling_hash` / `char_gram4` in plain `spark.sql(...)` with zero
  * imperative registration calls, on every session of the application,
  * including sessions the library never sees (a JDBC/Thrift server, a
  * notebook kernel). The per-query `X.register(spark)` calls remain for
  * embedded use; this is the deployment-grade path.
  *
  * `spark.sql.extensions` is STATIC conf: Spark reads it from the
  * SparkContext when the application's FIRST session is built, so it
  * must be on the submit command / initial builder, not set afterwards.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String,
                 builder: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.expressions", name, usage),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("quantized_dot",
      "quantized_dot(a, b) - term-quantized BIGINT dot product of two " +
        "float/double vectors (codegen)",
      args => QuantizedDot(args(0), args(1))))
    ext.injectFunction(fn("h60",
      "h60(s) - first 60 bits of md5(s) as BIGINT (engine-portable hash)",
      args => Hash60(args.head)))
    ext.injectFunction(fn("rolling_hash",
      "rolling_hash(s) - polynomial rolling hash mod 2^61-1 (fingerprint)",
      args => RollingHash(args.head)))
    ext.injectFunction(fn("char_gram4",
      "char_gram4(s) - all overlapping char-4-grams, injectively packed " +
        "into BIGINTs (codegen rolling pass)",
      args => CharGram4(args.head)))
  }
}
