package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media matches the canonical schema") {
    val media = Multimodal.syntheticMedia(spark, 12, partitions = 3)
    // name/type layout must match the canonical schema (nullability flags
    // differ through toDF and don't affect the storage contract)
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.rdd.getNumPartitions == 3)
    assert(media.count() == 12)
  }

  test("extractFeatures is deterministic, typed, and partition-preserving") {
    val media = Multimodal.syntheticMedia(spark, 20, partitions = 4)
    val f1 = Multimodal.extractFeatures(media, batchSize = 8)
    assert(f1.rdd.getNumPartitions == 4) // iterator-to-iterator, no shuffle
    val rows = f1.collect().sortBy(_.media_id)
    assert(rows.length == 20)
    // 4-byte magic header + 64 body; mp4 carries an 8-byte ftyp box
    assert(rows.forall(r => r.n_bytes == 68 || r.n_bytes == 72))
    assert(rows.forall(_.feature.length == 8))
    val rows2 = Multimodal.extractFeatures(media, batchSize = 3).collect().sortBy(_.media_id)
    assert(rows.zip(rows2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("resizeStub: deterministic nearest-neighbor shape change") {
    val grid = Array.tabulate(16)(_.toFloat) // 4x4
    val out = Multimodal.resizeStub(grid, 4, 4, 2, 2)
    assert(out.toSeq == Seq(0f, 2f, 8f, 10f))
    intercept[IllegalArgumentException](Multimodal.resizeStub(grid, 3, 3, 2, 2))
  }

  test("sampleFrames fans out one row per sampled video frame, no shuffle") {
    val media = Multimodal.syntheticMedia(spark, 12, partitions = 3)
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.rdd.getNumPartitions == 3)
    val rows = frames.collect()
    val videos = media.filter(col("modality") === "video").count()
    assert(rows.length == videos * 4)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3)))
    // deterministic across runs
    val rows2 = Multimodal.sampleFrames(media, nFrames = 4).collect()
    assert(rows.sortBy(r => (r.media_id, r.frame_idx)).zip(rows2.sortBy(r => (r.media_id, r.frame_idx)))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("sniffModality reads magic bytes as a column expression") {
    val media = Multimodal.syntheticMedia(spark, 9)
    val got = media
      .select(col("modality"), Multimodal.sniffModality(col("payload")).as("mime"))
      .distinct().as[(String, String)].collect().toMap
    assert(got == Map(
      "image" -> "image/jpeg",
      "audio" -> "audio/wav",
      "video" -> "video/mp4"))
  }
}
