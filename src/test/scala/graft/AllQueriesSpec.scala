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

  test("README's registry inventory matches SparkEntry.queries (drift guard)") {
    // the README line "`queries` (N named operators, q01–qM)" must be
    // derived from the live registry — a stale count survived two rounds
    // before this guard
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = """\((\d+) named operators, q01–q(\d+)\)""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README lost the registry-inventory line"))
    val qs = SparkEntry.queries.keySet
    assert(m.group(1).toInt == qs.size,
      s"README says ${m.group(1)} operators, registry has ${qs.size}")
    val maxId = qs.map(_.drop(1).takeWhile(_.isDigit).toInt).max
    assert(m.group(2).toInt == maxId,
      s"README says q01–q${m.group(2)}, registry tops out at q$maxId")
    // and the count claimed as oracle-checked must match oracleSql
    assert(SparkEntry.oracleSql.size == qs.size,
      "oracle map diverged from the registry")
  }
}
