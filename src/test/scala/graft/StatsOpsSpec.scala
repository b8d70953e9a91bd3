package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.StatsOps

class StatsOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("percentiles are monotone and bracket the median") {
    val r = StatsOps.q56Percentiles(spark, sf)
    assert(r.filter(col("p25") > col("p50") || col("p50") > col("p75")
      || col("p75") > col("p90")).count() == 0)
    val bounds = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
    assert(r.join(bounds, "l_returnflag")
      .filter(col("p25") < col("lo") - 1 || col("p90") > col("hi") + 1)
      .count() == 0)
  }

  test("manual correlation is within [-1, 1] and close to Spark's corr") {
    val manual = StatsOps.q57Correlation(spark, sf)
    assert(manual.filter(abs(col("corr_qty_price")) > 1.0 + 1e-12).count() == 0)
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
    // quantization to whole dollars shifts low digits only
    val bad = manual.join(builtin, "l_returnflag")
      .filter(abs(col("corr_qty_price") - col("c")) > 1e-3)
    assert(bad.count() == 0)
  }

  test("histogram buckets partition the table") {
    val h = StatsOps.q58Histogram(spark, sf)
    assert(h.agg(sum("n")).head().getLong(0)
      == Tables.lineitem(spark, sf).count())
    assert(h.filter(col("bucket") < 0).count() == 0)
  }
}
