package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

import ops.{MediaAsset, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("assets carry an opaque binary payload with typed metadata") {
    val a = Multimodal.assets(spark, sf)
    assert(a.schema("payload").dataType == BinaryType)
    assert(a.filter(col("kind").isin("image", "audio")).count() == a.count())
    // payload round-trips the source text byte-for-byte
    val one = a.filter(col("asset_id") === 0).head()
    val txt = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(new String(one.payload, "UTF-8") == txt)
  }

  test("feature extraction preserves cardinality and satisfies stub invariants") {
    val f = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
    assert(f.count() == Tables.documents(spark, sf).count())
    val bad = f.filter(r =>
      (r.kind == "image" && (r.width < 1 || r.height < 1 || r.n_frames != 1)) ||
      (r.kind == "audio" && (r.width != 0 ||
        r.n_frames != (r.n_bytes + 255) / 256)))
    assert(bad.count() == 0)
  }

  test("resize caps the long side and preserves non-images") {
    val f = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
    val r = Multimodal.resize(f, maxSide = 16)
    assert(r.filter(x => x.kind == "image" &&
      math.max(x.width, x.height) > 16).count() == 0)
    val audioBefore = f.filter(_.kind == "audio").collect().toSet
    val audioAfter = r.filter(_.kind == "audio").collect().toSet
    assert(audioBefore == audioAfter)
  }

  test("frame sampling keeps every k-th 256-byte frame") {
    import spark.implicits._
    val payload = Array.fill[Byte](256 * 5 + 10)(7) // 6 frames, last short
    val ds = Seq(MediaAsset(1L, "audio", payload)).toDS()
    val frames = Multimodal.sampleFrames(ds, every = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L))
    assert(frames.map(_.getLong(2)).toSeq == Seq(256L, 256L, 256L))
  }

  test("embedStub bridges binary payloads into the ANN column shape") {
    import spark.implicits._
    // identical payloads embed identically; a different payload differs
    val a = "the same bytes in both assets".getBytes("UTF-8")
    val tiny = Seq(MediaAsset(1L, "image", a), MediaAsset(2L, "audio", a),
      MediaAsset(3L, "image", "other bytes".getBytes("UTF-8"))).toDS()
    val e = Multimodal.embedStub(tiny).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(e(1L) == e(2L) && e(1L) != e(3L))
    assert(e.values.forall(_.length == 64))
    // corpus-wide: the output is consumable by the similarity operators'
    // exact cosine machinery (fixed-D float arrays, positive norms)
    val emb = Multimodal.embedStub(Multimodal.assets(spark, sf))
    val nqE = "aggregate(embedding, 0L, (acc, x) -> acc +" +
      " cast(floor(cast(x as double) * cast(x as double) * 1e9 + 0.5) as bigint))"
    val withNorm = emb.withColumn("nq", expr(nqE))
    assert(withNorm.filter(col("nq") <= 0).count() == 0)
    assert(withNorm.count() ==
      Tables.documents(spark, sf).filter(col("text").isNotNull).count())
    // brute top-1 over the bridged vectors: a well-formed cosine in
    // [-1, 1] for every asset, never the asset itself
    val l = withNorm.select(col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nq").as("a_nq"))
    val r = withNorm.select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nq").as("b_nq"))
    val top = l.crossJoin(r).filter(col("a_id") =!= col("b_id"))
      .withColumn("dq", expr("aggregate(zip_with(a_emb, b_emb," +
        " (x, y) -> cast(floor(cast(x as double) * cast(y as double)" +
        " * 1e9 + 0.5) as bigint)), 0L, (acc, t) -> acc + t)"))
      .withColumn("cos", col("dq").cast("double") /
        sqrt((col("a_nq") * col("b_nq")).cast("double")))
      .groupBy(col("a_id"))
      .agg(max(struct(col("cos"), (-col("b_id")).as("nb"))).as("best"))
    assert(top.filter(col("best.cos") < -1.0 || col("best.cos") > 1.0)
      .count() == 0)
    assert(top.count() == withNorm.count())
  }

  test("q143 binary landing: file round trip preserves every byte; scratch cleaned") {
    val landed = Multimodal.q143BinaryLanding(spark, sf).collect()
      .map(r => r.getAs[String]("kind") -> r).toMap
    // direct recount from the documents slice the assets derive from —
    // same per-kind counts, byte totals, and sorted content digests
    val direct = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("doc_id") < 500)
      .select(
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(length(col("payload")).cast("long")).as("total_bytes"),
        md5(concat_ws("", sort_array(collect_list(md5(col("payload"))))))
          .as("content_md5"))
      .collect().map(r => r.getAs[String]("kind") -> r).toMap
    assert(landed.keySet == direct.keySet && landed.keySet == Set("image", "audio"))
    landed.keySet.foreach { k =>
      assert(landed(k).getAs[Long]("n_assets") ==
        direct(k).getAs[Long]("n_assets"), s"kind $k count")
      assert(landed(k).getAs[Long]("total_bytes") ==
        direct(k).getAs[Long]("total_bytes"), s"kind $k bytes")
      assert(landed(k).getAs[String]("content_md5") ==
        direct(k).getAs[String]("content_md5"), s"kind $k digest")
    }
    // the session-salted scratch dir is gone (no leaked file-per-asset
    // copy of the corpus slice)
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-assets-land-" + java.lang.Long.toHexString(
        ops.DedupOps.h60("land:" + sf + ":" + spark.sparkContext.applicationId)))
    assert(!dir.exists, s"q143 leaked its scratch landing dir at $dir")
  }
}
