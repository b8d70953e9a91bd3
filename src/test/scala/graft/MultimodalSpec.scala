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
}
