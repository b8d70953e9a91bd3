package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SynthEventsJobSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("sejob").toString
    SynthEventsJob.model(spark, sf, s"$d/model")
    SynthEventsJob.generate(spark, s"$d/model", s"$d/synthA", 300L, 7L, 12)
    SynthEventsJob.generate(spark, s"$d/model", s"$d/synthB", 300L, 7L, 12)
    d
  }

  private def collectSorted(dir: String) =
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
      .sortBy(x => (x._3, x._1))

  test("generation is bit-reproducible: same seed, same corpus") {
    val a = collectSorted(s"$root/synthA")
    val b = collectSorted(s"$root/synthB")
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("every synthetic transition exists in the model with positive count") {
    val model = spark.read.parquet(s"$root/model/transitions.parquet")
      .select("prev_type", "event_type", "n_trans").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val streams = collectSorted(s"$root/synthA").groupBy(_._3)
    streams.foreach { case (_, evts) =>
      val types = evts.sortBy(_._1).map(_._4).toSeq
      ("<start>" +: types.dropRight(1)).zip(types).foreach { tr =>
        assert(model.getOrElse(tr, 0L) > 0L, s"unmodeled transition $tr")
      }
    }
  }

  test("every synthetic gap falls inside one of its type's model cells") {
    val cells = spark.read.parquet(s"$root/model/gaps.parquet")
      .select("event_type", "min_gap_s", "max_gap_s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val streams = collectSorted(s"$root/synthA").groupBy(_._3)
    streams.foreach { case (_, evts) =>
      val ordered = evts.sortBy(_._1)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val gap = (b._2 - a._2) / 1000L // ms -> s (whole-second gaps)
          val support = cells.get(b._4).toSeq.flatten
          assert(support.exists(c => gap >= c._2 && gap <= c._3),
            s"gap $gap s of ${b._4} outside model support $support")
        case _ => ()
      }
    }
  }

  test("refit transition matrix tracks the model (closing the loop)") {
    val f = SynthEventsJob.fidelity(spark, s"$root/model", s"$root/synthA")
      .collect()
    assert(f.nonEmpty)
    // deterministic corpus → deterministic distances; 300 users of <=12
    // events land well under 20% L1 per matrix row
    f.foreach(r => assert(r.getAs[Long]("l1_ppm") <= 200000L,
      s"${r.getAs[String]("prev_type")} drifted: ${r.getAs[Long]("l1_ppm")}"))
  }

  test("the synthetic corpus drives the whole event-query family") {
    val d = s"$root/synthA"
    assert(ops.ExtOps.q170EventTransitions(spark, d).count() > 0)
    assert(ops.ExtOps.q172GapSpectrum(spark, d).count() > 0)
    assert(ops.ExtOps.q173UserRates(spark, d).count() > 0)
    assert(ops.ExtOps.q176DiurnalProfile(spark, d).count() > 0)
    assert(ops.ExtOps.q168BurstDetect(spark, d).count() > 0)
  }
}
