package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** O1 end-to-end artifact: one NytJob.runOnce call reproduces the
  * reference's whole counties-then-states job over NYT-shaped fixtures —
  * incremental across firings, date-partitioned sink, JDBC mirror — with
  * the §1.6 bug fixes (true nulls, deterministic conflict winner).
  */
class NytJobSpec extends AnyFunSuite {
  import SparkTestSession._

  System.setProperty("derby.stream.error.file",
    Files.createTempDirectory("graft-derby-log2").resolve("derby.log").toString)

  test("NytJob runs counties-then-states incrementally into partitioned sinks + JDBC mirror") {
    val root = Files.createTempDirectory("graft-nyt")
    val src = root.resolve("src"); val sink = root.resolve("sink")
    val ckpt = root.resolve("ckpt")
    Files.createDirectories(src.resolve("counties"))
    Files.createDirectories(src.resolve("states"))
    val url = s"jdbc:derby:${root.resolve("db")};create=true"
    def drop(feed: String, name: String, lines: String*): Unit =
      Files.writeString(src.resolve(feed).resolve(name),
        lines.mkString("\n") + "\n")

    // firing 1: both feeds, overlapping duplicate key inside counties
    drop("counties", "c1.csv",
      "date,county,state,fips,cases,deaths",
      "2020-03-15,King,Washington,53033,387,26",
      "2020-03-15,King,Washington,53033,400,27", // same key → first wins
      "2020-03-15,Unknown,Guam,,3,0")            // null fips preserved
    drop("states", "s1.csv",
      "date,state,fips,cases,deaths",
      "2020-03-15,Washington,53,904,48")
    NytJob.runOnce(spark, src.toString, sink.toString, ckpt.toString,
      Some(url))

    val counties = spark.read.parquet(sink.resolve("counties").toString)
    assert(counties.count() == 2)
    assert(counties.filter(col("cases") === 387).count() == 1) // tiebreak winner
    assert(counties.filter(col("fips").isNull).count() == 1)   // no -1 sentinel
    assert(Files.isDirectory(
      sink.resolve("counties").resolve("date=2020-03-15")))    // partitioned
    assert(spark.read.jdbc(url, "counties", new java.util.Properties)
      .count() == 2)
    assert(spark.read.jdbc(url, "states", new java.util.Properties)
      .count() == 1)

    // firing 2: new day for states only; counties checkpoint skips c1.csv
    drop("states", "s2.csv",
      "date,state,fips,cases,deaths",
      "2020-03-15,Washington,53,999,99", // conflict → stored row wins
      "2020-03-16,Washington,53,1000,52")
    NytJob.runOnce(spark, src.toString, sink.toString, ckpt.toString,
      Some(url))
    val states = spark.read.parquet(sink.resolve("states").toString)
    assert(states.count() == 2)
    assert(states.filter(col("cases") === 904).count() == 1)
    val statesDb = spark.read.jdbc(url, "states", new java.util.Properties)
    assert(statesDb.count() == 2)
    assert(statesDb.filter(col("cases") === 904).count() == 1)
    // counties untouched by firing 2
    assert(spark.read.parquet(sink.resolve("counties").toString).count() == 2)

    // firing 3: nothing new anywhere → pure no-op
    NytJob.runOnce(spark, src.toString, sink.toString, ckpt.toString,
      Some(url))
    assert(spark.read.parquet(sink.resolve("states").toString).count() == 2)
    assert(spark.read.jdbc(url, "states", new java.util.Properties)
      .count() == 2)
  }
}
