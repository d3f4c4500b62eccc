package graft

import graft.model.Tables
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  test("media table carries opaque binary payloads with typed metadata") {
    val media = MediaPipeline.mediaFromDocuments(Tables.load(spark, sf0001, "documents"))
    val schema = media.schema
    assert(schema("data").dataType == org.apache.spark.sql.types.BinaryType)
    assert(schema("declared_w").dataType == org.apache.spark.sql.types.IntegerType)
    val row = media.limit(1).collect()(0)
    assert(row.getAs[Array[Byte]]("data").nonEmpty)
  }

  test("decode runs once per batch of 64, not once per record") {
    FakeCodec.batchCalls.set(0L)
    val docs = Tables.load(spark, sf0001, "documents") // 500 rows
    val n = MediaPipeline.features(spark, docs).count()
    assert(n == 500)
    val calls = FakeCodec.batchCalls.get()
    // ≥ ceil(500/64) batches; well under one call per record even with
    // per-partition remainder batches (4 test partitions)
    assert(calls >= 8 && calls <= 32, s"codec batch calls: $calls")
  }

  test("decode output is deterministic across runs") {
    val docs = Tables.load(spark, sf0001, "documents")
    val a = MediaPipeline.features(spark, docs).collect().sortBy(_.media_id).toSeq
    val b = MediaPipeline.features(spark, docs).collect().sortBy(_.media_id).toSeq
    assert(a == b)
  }

  test("resize subsamples to the target grid deterministically") {
    val docs = Tables.load(spark, sf0001, "documents")
    val a = MediaPipeline.resized(spark, docs, 8, 6).collect().sortBy(_.media_id)
    val b = MediaPipeline.resized(spark, docs, 8, 6).collect().sortBy(_.media_id)
    assert(a.sameElements(b))
    assert(a.forall(r => r.out_w == 8 && r.out_h == 6 && r.out_len == 48))
    // a different grid yields different fingerprints for non-degenerate docs
    val c = MediaPipeline.resized(spark, docs, 4, 4).collect().sortBy(_.media_id)
    assert(a.zip(c).exists { case (x, y) => x.fp_resized != y.fp_resized })
  }
}
