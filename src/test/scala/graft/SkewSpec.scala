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

  test("q185 bucketed join result equals the plain parquet join") {
    val bucketed = Skew.q185BucketJoin(spark, sf).collect()
    val plain = Tables.documents(spark, sf)
      .withColumn("n_tokens",
        size(filter(split(trim(lower(col("text"))), "[ \\t\\n\\r\\f]+"),
          t => t =!= lit(""))).cast("long"))
      .filter(col("n_tokens") >= 1L)
      .withColumn("cpt_x100", expr("n_chars * 100 div n_tokens"))
      .withColumn("band",
        when(col("cpt_x100") < 550L, "terse")
          .when(col("cpt_x100") < 700L, "typical")
          .otherwise("verbose"))
      .groupBy(col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("mean_cpt_x100", expr("sum_chars * 100 div sum_tokens"))
      .orderBy(col("source"), col("band"))
      .collect()
    assert(bucketed.sameElements(plain))
  }

  test("q185 joins its bucketed tables without an exchange on doc_id") {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val df = Skew.q185BucketJoin(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the co-location payoff: no shuffle of either corpus-sized side
      assert(!plan.contains("Exchange hashpartitioning(doc_id"),
        s"bucketed join still shuffles on doc_id:\n$plan")
    } finally saved.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("AQE splits a skewed sort-merge join at runtime (no manual salt)") {
    // the zero-code alternative to saltedJoin: AQE's skew-join rule
    // splits oversized partitions after the shuffle materializes. Thresholds
    // are lowered so the test corpus trips them the way a hot key would
    // at production scale; production keeps the defaults.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val bigRows = (1 to 4000).map(i => (1L, i.toLong)) ++
        (1 to 200).map(i => ((i % 7 + 2).toLong, i.toLong))
      val rightRows = (1 to 500).map(i => (1L, i.toLong)) ++
        (1 to 50).map(i => ((i % 7 + 2).toLong, i.toLong))
      val big = bigRows.toDF("k", "payload")
      val right = rightRows.toDF("k", "other")
      val joined = big.join(right, "k")
      // execute THIS dataframe's own plan (a write/count would build a
      // separate QueryExecution and leave this one isFinalPlan=false)
      val nRows = joined.queryExecution.executedPlan.execute().count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
      // correctness is untouched by the split
      val bigCnt = bigRows.groupBy(_._1).map { case (k, v) => k -> v.size }
      val rightCnt = rightRows.groupBy(_._1).map { case (k, v) => k -> v.size }
      val expected = bigCnt.map { case (k, c) =>
        c.toLong * rightCnt.getOrElse(k, 0) }.sum
      assert(nRows == expected)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
