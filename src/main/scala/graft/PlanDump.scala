package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-13 optimization tooling: dump `.explain("formatted")` for named
  * registry queries to files, so plan-shape claims in OPTIMIZATION_r13.md
  * are checkable without running Spark (plans/r13/<q>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * Env: SPARK_GRAFT_CPUS (master local[N], same contract as Bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match the Bench session so dumped plans are the timed plans
      .config("spark.graft.scan.autoParallelize",
        sys.env.getOrElse("SPARK_GRAFT_SCAN_SPREAD", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ops.StageCache.clearAll()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
