package graft

import org.apache.spark.sql.{ExtensionsTestBridge, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point. `spark.sql.extensions` is STATIC
  * conf — Spark reads it from the SparkContext when the FIRST session is
  * built — so a suite sharing the JVM-wide test context can't exercise it
  * through a fresh builder. Instead this applies `GraftExtensions` to a
  * real `SparkSessionExtensions` and registers the result into the shared
  * session's function registry via the same `registerFunctions` call
  * Spark's session builder makes, then checks the functions resolve and
  * agree with the driver-side twins in plain SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("GraftExtensions injects quantized_dot/h60/rolling_hash, usable from SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ExtensionsTestBridge.registerInto(ext,
      spark.sessionState.functionRegistry)
    val r = spark.sql(
      """SELECT
        |  quantized_dot(array(cast(1.5 as float), cast(2.0 as float)),
        |                array(cast(2.0 as double), cast(0.5 as double))) AS dq,
        |  h60('seed:0') AS h,
        |  rolling_hash('abc') AS rh""".stripMargin).head()
    // dq = floor(1.5*2*1e9+0.5) + floor(2*0.5*1e9+0.5)
    assert(r.getLong(0) == 3000000000L + 1000000000L)
    assert(r.getLong(1) == ops.DedupOps.h60("seed:0")) // driver-side twin
    assert(r.getLong(2) != 0L)
  }
}
