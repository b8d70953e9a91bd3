package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.Skew

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("salted join is row-identical to the plain join on a hot-key table") {
    // one pathological key: 10k rows of key 1 vs a handful of others
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (2L, i.toLong))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "orphan")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8,
      saltBy = Seq(col("payload")))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("salting spreads a hot key across many shuffle partitions") {
    val big = (1 to 10000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val salted = big.withColumn("__salt",
      pmod(hash(col("payload")), lit(8)))
    // the hot key now carries 8 distinct shuffle keys instead of 1
    assert(salted.select("k", "__salt").distinct().count() == 8)
  }

  test("q46 salted aggregate matches the unsalted plan") {
    val salted = Skew.q46SaltedJoin(spark, sf).collect()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_lines"),
        ops.Fx.moneySum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("s_name")).collect()
    assert(salted.sameElements(plain))
  }
}
