package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.{MediaRow, extractFeatures}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("feature extraction is partition-parallel and deterministic") {
    val media = (0L until 20L).map(i =>
      MediaRow(i, if (i % 2 == 0) "image" else "audio",
        Array.fill[Byte](16)((i % 7).toByte), 64, 64))
    val ds = media.toDS().repartition(4)
    val feats = extractFeatures(ds).collect().sortBy(_.media_id)
    assert(feats.length == 20)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(_.n_bytes == 16))
    // same payload bytes -> same checksum/features regardless of partition
    val byPayload = feats.groupBy(f => f.media_id % 7)
    byPayload.values.foreach { g =>
      assert(g.map(_.checksum).distinct.length == 1)
    }
    // rerun matches (determinism)
    val again = extractFeatures(ds).collect().sortBy(_.media_id)
    assert(again.map(_.checksum).sameElements(feats.map(_.checksum)))
  }

  test("frame sampling explodes k offsets per row") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = java.util.Arrays.asList(
      Row(1L, "video", null, Row(null, null, null, Integer.valueOf(100))),
      Row(2L, "video", null, Row(null, null, null, Integer.valueOf(40))))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val sampled = Multimodal.sampleFrames(df, 4)
    assert(sampled.count() == 8)
    val offs = sampled.filter($"media_id" === 1L)
      .select("frame_offset").as[Int].collect().sorted
    assert(offs.sameElements(Array(0, 25, 50, 75)))
  }
}
