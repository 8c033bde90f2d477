package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table types payloads and metadata per kind") {
    val m = Multimodal.mediaTable(spark, sf)
    val kinds = m.toDF().select("meta.kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(m.toDF().schema("payload").dataType.typeName == "binary")
  }

  test("feature extraction is deterministic with fixed dim and checksum") {
    val f1 = Multimodal.featureFrame(spark, sf)
    assert(f1.filter(size(col("embedding")) =!= Multimodal.StubCodec.FeatureDim)
      .count() == 0)
    val a = f1.orderBy("media_id").select("checksum").limit(5)
      .collect().map(_.getString(0))
    val b = Multimodal.featureFrame(spark, sf).orderBy("media_id")
      .select("checksum").limit(5).collect().map(_.getString(0))
    assert(a.sameElements(b))
    assert(a.forall(_.length == 64)) // sha-256 hex
  }

  test("frame sampling yields fixed-size windows at the given stride") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf),
      frameSize = 32, stride = 64)
    val bad = frames.filter(r => r.frame.length != 32).count()
    assert(bad == 0 && frames.count() > 0)
  }

  test("features feed VectorOps-compatible embedding column") {
    graft.functions.CosineSimilarity.register(spark)
    val f = Multimodal.featureFrame(spark, sf).limit(10)
      .select(col("media_id"), col("embedding"))
    val self = f.select(expr("cosine_sim(embedding, embedding)").as("s"))
      .agg(min("s")).collect()(0).getDouble(0)
    assert(self > 1.0 - 1e-6)
  }
}
