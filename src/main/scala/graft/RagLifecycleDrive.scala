package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [[RagIndexJob]] lifecycle drive at stress scale — the measurement the
  * BASELINE.md scaling record needs and a spec can't give: what does the
  * scheduled `maintain` policy actually buy once a 10× corpus has been
  * incrementally ingested on top of a small build?
  *
  * Protocol: `build` on the base corpus → the stress corpus's extra
  * replicas ([[StressGen.KEY_OFFSET]] key bands) fired as N `update`
  * batches (accumulating append debt AND plane drift: the index grows
  * ~5× past the manifest's pinned plane count) → measure serve-path
  * lookups (median wall, recall@k vs the exact cosine truth over the
  * whole index) on the degraded index → `maintain` (expected: the
  * retune path) → re-measure the SAME queries against the SAME truth.
  * Membership never changes across maintain, so before/after isolates
  * exactly the layout + plane effects: file count, probe latency, and
  * the candidate-narrowing recall trade the retune makes.
  *
  * Usage: RagLifecycleDrive <baseSf> <stressDir> <workRoot>
  *        [updateBatches=3] [nQueries=48] [k=10]
  */
object RagLifecycleDrive {

  private def ms[A](body: => A): (A, Long) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1000000L)
  }

  /** Exact top-k (doc_id, chunk_idx) per query text over the WHOLE
    * index — the lookup's own cosine + tiebreak, minus the bucket
    * filter. Ground truth for recall@k. */
  private def exactTopK(idx: DataFrame, queryText: String, k: Int)
      : Set[(Long, Long)] = {
    val qa = queryText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .foldLeft((new Array[Long](RagIndexJob.Dim), 0)) { case ((a, i), b) =>
        a(i % RagIndexJob.Dim) += (b & 0xff).toLong; (a, i + 1)
      }._1
    val qNorm = qa.foldLeft(0d)((s, v) => s + v.toDouble * v.toDouble)
    idx
      .withColumn("dot",
        aggregate(zip_with(col("qa"), lit(qa), (x, w) => x * w),
          lit(0L), (acc, t) => acc + t))
      .withColumn("nq",
        aggregate(transform(col("qa"), x => x * x), lit(0L),
          (acc, t) => acc + t))
      .withColumn("cosine",
        col("dot").cast("double") /
          sqrt(col("nq").cast("double") * lit(qNorm)))
      .orderBy(col("cosine").desc, col("doc_id").asc, col("chunk_idx").asc)
      .limit(k)
      .select(col("doc_id"), col("chunk_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def median(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val baseSf = args(0)
    val stressDir = args(1)
    val workRoot = args(2)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(3)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(48)
    val k = args.lift(5).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(sys.env.get("SPARK_GRAFT_CPUS").fold(
        sys.env.getOrElse("SPARK_MASTER", "local[4]"))(c => s"local[$c]"))
      .appName("graft-rag-lifecycle-drive")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = s"$workRoot/ragidx"

    val ((nChunks, nUnique, planes0), buildMs) =
      ms(RagIndexJob.build(spark, baseSf, root))
    println(s"[rag-drive] build: $nChunks chunks -> $nUnique unique @" +
      s" $planes0 planes in ${buildMs} ms")

    // The stress corpus's non-base replicas, grouped into key-band
    // batches: replica r holds doc_id in [r*OFFSET, (r+1)*OFFSET).
    val stressDocs = spark.read
      .parquet(s"$stressDir/documents.parquet")
      .withColumn("replica",
        (col("doc_id") / lit(StressGen.KEY_OFFSET)).cast("int"))
    val replicas = stressDocs.select(col("replica")).distinct()
      .collect().map(_.getInt(0)).sorted.filter(_ > 0)
    val groups = replicas.grouped(
      math.max(1, (replicas.length + nBatches - 1) / nBatches)).toSeq
    groups.zipWithIndex.foreach { case (g, i) =>
      val dir = s"$workRoot/batch$i"
      stressDocs.filter(col("replica").isin(g.toSeq: _*))
        .drop("replica")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val (appended, updMs) = ms(RagIndexJob.update(spark, dir, root))
      println(s"[rag-drive] update $i (replicas ${g.mkString(",")}):" +
        s" +$appended chunks in ${updMs} ms")
    }

    // Deterministic serve workload: chunk-0 texts of evenly-strided base
    // docs (present since the build; membership is maintain-invariant).
    val idx = spark.read.parquet(s"$root/index.parquet").persist()
    val total = idx.count()
    val queries = idx
      .filter(col("chunk_idx") === 0 &&
        col("doc_id") < StressGen.KEY_OFFSET)
      .orderBy(col("doc_id")).limit(nQueries * 7)
      .collect().zipWithIndex.collect {
        case (r, i) if i % 7 == 0 => r.getAs[String]("chunk_text")
      }.take(nQueries)
    val truth = queries.map(q => q -> exactTopK(idx, q, k)).toMap
    idx.unpersist()

    def measure(label: String): Unit = {
      val files = RagIndexJob.indexDataFiles(spark, root)
      // mean bucket-slice size: the rows a single-probe lookup actually
      // re-ranks — THE scale lever a retune moves (wall ms at this SF is
      // job-launch-dominated and can't see it)
      val occ = spark.read.parquet(s"$root/index.parquet")
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .agg(avg(col("n"))).head().getDouble(0)
      Seq(false, true).foreach { mp =>
        RagIndexJob.lookup(spark, root, queries.head, k, mp).collect()
        val runs = queries.map { q =>
          val (hits, t) =
            ms(RagIndexJob.lookup(spark, root, q, k, mp).collect())
          val got = hits.map(r => (r.getAs[Long]("doc_id"),
            r.getAs[Long]("chunk_idx"))).toSet
          (t, (got & truth(q)).size.toDouble / k)
        }
        println(f"[rag-drive] $label probe=${if (mp) "multi" else "single"}:" +
          f" files=$files rows=$total avg_bucket_rows=$occ%.1f" +
          f" lookup_ms_median=${median(runs.map(_._1))}" +
          f" recall@$k=${runs.map(_._2).sum / runs.length}%.4f")
      }
    }

    measure("pre-maintain (append debt + stale planes)")
    val (did, maintMs) = ms(RagIndexJob.maintain(spark, root))
    println(s"[rag-drive] maintain: $did in ${maintMs} ms")
    measure("post-maintain")
    spark.stop()
  }
}
