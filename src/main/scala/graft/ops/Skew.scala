package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Fx._

/** Skew-mitigation utilities (SURVEY.md §4.2/§4.4: "skewed keys → salting
  * or AQE skew-join").
  *
  * AQE's skew-join splitting handles sort-merge joins after the fact; the
  * salting pattern below is the explicit, planner-independent form — the
  * tool to reach for when one key dominates (the reference corpus analog:
  * a handful of states own most county rows, SURVEY.md §4.2). A hot key's
  * rows scatter across `salts` shuffle partitions instead of one.
  */
object Skew {

  /** Equi-join with a salted key: `big`'s rows get a DETERMINISTIC salt
    * (hash of `saltBy`, not rand() — reruns and the oracle must agree),
    * `small` is replicated once per salt, and the join key becomes
    * (key, salt). Result is row-identical to the plain join; only the
    * shuffle distribution changes. `small` grows ×salts, so keep salts
    * modest (8–64) and the small side genuinely small — at 100 TB this is
    * the fact⋈mid-size-dim case where broadcast doesn't fit but one hot
    * key would otherwise pin a single reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltBy: Seq[Column]): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltBy: _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  // ---- q46: salted fact⋈dim join, oracle = the plain join --------------
  // lineitem⋈supplier on suppkey: ~10 suppliers per sf unit → every key is
  // hot by construction. The salted plan must produce exactly the rows of
  // the unsalted join (the oracle SQL is the PLAIN join — salting is a
  // physical rewrite, not a semantic one).
  def q46SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    saltedJoin(li, sup, "suppkey", salts = 16,
      saltBy = Seq(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_lines"),
        moneySum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("s_name"))
  }

  val q46Sql: String = s"""
    SELECT s_name, COUNT(*) AS n_lines,
      ${sqlMoneySum("l_extendedprice")} AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name ORDER BY s_name"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_salted_join" -> q46SaltedJoin _)

  val oracles: Map[String, String] = Map(
    "q46_salted_join" -> q46Sql)
}
