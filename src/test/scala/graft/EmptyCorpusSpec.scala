package graft

import org.scalatest.funsuite.AnyFunSuite

/** SF=0 degrade gate (BASELINE.md round 11): a 100 TB pipeline routinely
  * sees empty sources, empty partitions, and filters that drop every row
  * — the whole registered query surface must DEGRADE (0-row or
  * counts-of-zero results) rather than DIE on a corpus whose every table
  * has zero rows. The driver-side probe additionally proved the DuckDB
  * oracle agrees value-for-value at SF=0; this spec pins the crash-free
  * contract and the SQL-standard grand-row semantics in CI.
  */
class EmptyCorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sfempty")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  test("every registered query runs crash-free on the all-empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val r =
          try { fn(spark, emptyDir).collect(); None }
          catch {
            case e: Exception => Some(s"$name: ${e.getClass.getSimpleName}" +
              s" ${String.valueOf(e.getMessage).take(120)}")
          }
        spark.catalog.clearCache()
        r
      }
    assert(failures.isEmpty,
      s"${failures.length} queries die on an empty corpus:\n" +
        failures.mkString("\n"))
  }

  test("grouping queries emit the SQL-standard grand row at SF=0") {
    // Spark's Expand-based rollup/cube/grouping-sets emit NOTHING on an
    // empty source; the cascade forms restore the standard one-row
    // grand total (COUNT 0, SUM NULL) the oracle produces.
    Seq("q09_rollup", "q10_cube", "q50_grouping_sets").foreach { q =>
      val rows = SparkEntry.queries(q)(spark, emptyDir).collect()
      assert(rows.length == 1, s"$q: ${rows.mkString("; ")}")
      assert(rows.head.getAs[Long]("gid") == 3L, s"$q grand gid")
      assert(rows.head.getAs[Long]("n") == 0L, s"$q grand count")
    }
    spark.catalog.clearCache()
  }
}
