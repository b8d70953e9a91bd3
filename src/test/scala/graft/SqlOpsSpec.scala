package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.SqlOps

class SqlOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("scalar subquery outliers really are below 1/5 of their part average") {
    val out = SqlOps.q48ScalarSubquery(spark, sf)
    val avgs = Tables.lineitem(spark, sf)
      .groupBy("l_partkey").agg(avg("l_quantity").as("a"))
    val bad = out.join(avgs, "l_partkey")
      .filter(col("l_quantity") >= col("a") / 5 + 1e-9)
    assert(out.count() > 0)
    assert(bad.count() == 0)
  }

  test("INTERSECT ALL + EXCEPT ALL multiplicities reconstruct the multiset") {
    val rows = SqlOps.q49SetAll(spark, sf)
    // |A ∩all B| + |A \all B| == |A| for B ⊆ A
    assert(rows.count() == Tables.customer(spark, sf).count())
  }

  test("grouping sets: both level totals equal the grand total") {
    val r = SqlOps.q50GroupingSets(spark, sf).collect()
    val grand = r.filter(_.getAs[Long]("gid") == 3L).map(_.getAs[Long]("n")).sum
    val byPrio = r.filter(_.getAs[Long]("gid") == 1L).map(_.getAs[Long]("n")).sum
    val byStatus = r.filter(_.getAs[Long]("gid") == 2L).map(_.getAs[Long]("n")).sum
    assert(grand == Tables.orders(spark, sf).count())
    assert(byPrio == grand && byStatus == grand)
  }
}
