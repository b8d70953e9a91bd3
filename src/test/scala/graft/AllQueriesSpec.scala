package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface guard: every registered query returns rows at the smoke
  * SF and is run-to-run deterministic (collect twice, compare exactly).
  * The DuckDB gate catches cross-engine drift; this catches WITHIN-Spark
  * nondeterminism (shuffle-order-dependent ties, uncached RNG) that an
  * oracle built from a single Spark run could silently agree with.
  */
class AllQueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every query is non-empty and deterministic across runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val a = fn(spark, sf).collect()
        spark.catalog.clearCache()
        val b = fn(spark, sf).collect()
        spark.catalog.clearCache()
        if (a.isEmpty) Some(s"$name: empty result")
        else if (!a.sameElements(b)) Some(s"$name: nondeterministic")
        else None
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("every oracleSql key has a matching queries entry and vice versa is explained") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
    // every query is oracle-checked (q42 asserts its sketch contract as a
    // boolean column, so even the approx op has an exact oracle)
    assert(qs.diff(os).isEmpty,
      s"unexpected rows-only queries: ${qs.diff(os)}")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
