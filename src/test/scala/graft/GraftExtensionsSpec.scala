package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point: a session built with
  * `graft.GraftExtensions` must expose every custom function to plain SQL
  * with no imperative register() calls, agreeing with the registered
  * implementations.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-built session exposes quantized_dot/h60/rolling_hash in SQL") {
    // the shared test session predates this builder call and getOrCreate
    // would return it WITHOUT extensions — create() builds a NEW session
    // (sharing the JVM's SparkContext) and applies the extensions config
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .create()
    val fresh = s.newSession() // extensions propagate to child sessions
    try {
      val r = fresh.sql(
        """SELECT
          |  quantized_dot(array(cast(1.5 as float), cast(2.0 as float)),
          |                array(cast(2.0 as double), cast(0.5 as double))) AS dq,
          |  h60('seed:0') AS h,
          |  rolling_hash('abc') AS rh""".stripMargin).head()
      // dq = floor(1.5*2*1e9+0.5) + floor(2*0.5*1e9+0.5)
      assert(r.getLong(0) == 3000000000L + 1000000000L)
      assert(r.getLong(1) == ops.DedupOps.h60("seed:0")) // driver-side twin
      assert(r.getLong(2) != 0L)
    } finally {
      // do NOT stop s: the JVM-wide default session is shared with the
      // other suites; dropping our temp session objects suffices
    }
  }
}
