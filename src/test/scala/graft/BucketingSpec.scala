package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY.md §2.3/§4.4): pre-bucketing two
  * fact tables on the join key lets a sort-merge join read buckets
  * directly — NO shuffle exchange on either side. At 100 TB this converts
  * the dominant fact⋈fact shuffle into a local merge per bucket; the test
  * asserts the exchange really is gone from the physical plan.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")
    try {
      // force the shuffle-based path to be the only alternative
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      joined.write.mode("overwrite").format("noop").save() // finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count()) // every line has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("ensureTable orphan GC is age-gated: a fresh foreign directory survives") {
    import org.apache.hadoop.fs.Path
    ops.Skew.q185BucketJoin(spark, sf).collect() // family exists
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Simulate a CONCURRENT JVM sharing this warehouse: same table
    // family, absent from our catalog, freshly written.
    val foreign = new Path(wh, "graft_docs_b_feedf00d")
    fs.mkdirs(foreign)
    def rebuildDocs(): Unit = {
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_docs_b_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      ops.Skew.q185BucketJoin(spark, sf).collect()
    }
    rebuildDocs() // GC branch runs; the fresh foreign dir must survive
    assert(fs.exists(foreign),
      "orphan GC deleted a fresh (possibly live, foreign) directory")
    // A directory untouched past the gate IS a dead JVM's orphan:
    // backdate it and verify the GC still collects it.
    fs.setTimes(foreign,
      System.currentTimeMillis() - 2 * ops.Skew.orphanGcAgeMs, -1)
    rebuildDocs()
    assert(!fs.exists(foreign), "aged orphan escaped GC")
  }

  test("repartition-by-key reuses the exchange across two aggregations") {
    val li = Tables.lineitem(spark, sf)
      .repartition(col("l_orderkey"))
    val a = li.groupBy("l_orderkey").agg(sum("l_quantity"))
    val b = li.groupBy("l_orderkey").agg(max("l_extendedprice"))
    // both aggregations consume the same pre-partitioned data: the groupBy
    // does not introduce a second hashpartitioning exchange on top
    Seq(a, b).foreach { df =>
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning") ||
        plan.contains("AQEShuffleRead"))
      // exactly one shuffle of lineitem in the plan, not two stacked
      assert("Exchange hashpartitioning".r
        .findAllMatchIn(plan).length <= 1, plan)
    }
  }
}
