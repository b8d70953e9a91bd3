package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge: `SparkSessionExtensions.registerFunctions` is
  * `private[sql]`, and `spark.sql.extensions` is STATIC conf (read from
  * the SparkContext at first-session build), so a suite sharing the
  * JVM-wide test SparkContext cannot exercise the injection through a
  * fresh session. This applies an extensions instance's injected
  * functions to an explicit registry instead — the exact call Spark's
  * own session builder makes.
  */
object ExtensionsTestBridge {
  def registerInto(ext: SparkSessionExtensions,
                   registry: FunctionRegistry): Unit = {
    ext.registerFunctions(registry)
    ()
  }
}
