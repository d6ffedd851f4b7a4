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

  test("md5-derived extraction matches the known MD5 test vector") {
    // RFC 1321 test suite: md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    // checksum = first 15 hex chars; features = 24-bit windows / 2^24 - 0.5
    val ds = Seq(MediaRow(1L, "image", "abc".getBytes("UTF-8"), 4, 4)).toDS()
    val f = Multimodal.extractFeaturesMd5(ds).collect().head
    assert(f.n_bytes == 3)
    assert(f.checksum == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(f.feature.length == 4)
    assert(f.feature(0) == 0x900150 / 16777216.0 - 0.5)
    assert(f.feature(1) == 0x983cd2 / 16777216.0 - 0.5)
    // determinism across repartition (per-partition digest instances)
    val many = (0L until 12L).map(i =>
      MediaRow(i, "audio", Array.fill[Byte](8)((i % 3).toByte), 1, 1))
    val out = Multimodal.extractFeaturesMd5(many.toDS().repartition(5))
      .collect().sortBy(_.media_id)
    assert(out.groupBy(_.media_id % 3).values
      .forall(g => g.map(_.checksum).distinct.length == 1))
  }

  test("resize rewrites payload and metadata, preserves schema") {
    import org.apache.spark.sql.Row
    val rows = java.util.Arrays.asList(
      Row(1L, "image", Array.fill[Byte](32)(7),
        Row(Integer.valueOf(400), Integer.valueOf(200), null, null)),
      Row(2L, "image", Array.fill[Byte](32)(7),
        Row(Integer.valueOf(50), Integer.valueOf(50), null, null)),   // under box: untouched dims
      Row(3L, "audio", Array.fill[Byte](32)(1),
        Row(null, null, Integer.valueOf(16000), null)))               // non-image: payload passthrough
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema).repartition(2)
    val out = Multimodal.resize(df, 100, 100)
    assert(out.schema == Multimodal.mediaSchema)
    val m = out.collect().map(r => r.getLong(0) -> r).toMap
    // aspect-preserving fit: 400x200 -> 100x50, payload sized w*h*3
    assert(m(1L).getStruct(3).getInt(0) == 100 && m(1L).getStruct(3).getInt(1) == 50)
    assert(m(1L).getAs[Array[Byte]]("payload").length == 100 * 50 * 3)
    assert(m(2L).getStruct(3).getInt(0) == 50)
    // audio row keeps its payload and its FULL metadata — width/height
    // stay null, never fabricated from the target box
    assert(m(3L).getAs[Array[Byte]]("payload").sameElements(Array.fill[Byte](32)(1)))
    assert(m(3L).getStruct(3).isNullAt(0) && m(3L).getStruct(3).isNullAt(1))
    assert(m(3L).getStruct(3).getInt(2) == 16000)
    // deterministic
    assert(Multimodal.resize(df, 100, 100).collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 3L)))
  }

  test("resize survives a null meta struct") {
    import org.apache.spark.sql.Row
    val rows = java.util.Arrays.asList(
      Row(9L, "video", Array.fill[Byte](8)(3), null))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.resize(df, 100, 100).collect().head
    assert(out.getAs[Array[Byte]]("payload").length == 8)
    assert(out.isNullAt(3))
  }

  test("REAL codec: PNG encode→ImageIO decode is pixel-exact and " +
    "band sums read actual decoded pixels (r12 verdict item 4)") {
    val codec = new Multimodal.ImageCodec
    // 4 rows: black, white, pure red, mid-gray
    val colors = Array(0x000000, 0xffffff, 0xff0000, 0x808080)
    val png = codec.encodePngRows(8, 4, y => colors(y))
    assert(png.take(4).sameElements(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val img = codec.decode(png)
    assert(img.getWidth == 8 && img.getHeight == 4)
    // lossless round-trip: every pixel bit-exact
    for (y <- 0 until 4; x <- 0 until 8)
      assert((img.getRGB(x, y) & 0xffffff) == colors(y))
    // band sums (4 bands of 1 row × 8 cols): Σ(r+g+b) per band
    val sums = codec.bandSums(img, 4)
    assert(sums.sameElements(Array(0L, 8L * 765, 8L * 255, 8L * 384)))
    // undecodable payload fails loudly, not silently
    intercept[IllegalArgumentException] {
      codec.decode("not an image".getBytes("UTF-8"))
    }
  }

  test("REAL codec resize: aspect-preserving fit, never upscales, " +
    "output is a decodable PNG with uniform regions preserved") {
    val codec = new Multimodal.ImageCodec
    // 64×32 solid mid-gray: any correct resampler preserves the color
    val png = codec.encodePngRows(64, 32, _ => 0x808080)
    val (smallPng, nw, nh) = codec.resizePng(png, 16, 16)
    assert(nw == 16 && nh == 8) // 64x32 -> fit 16x16 box, aspect kept
    val small = codec.decode(smallPng)
    assert(small.getWidth == 16 && small.getHeight == 8)
    // uniform input stays uniform through bilinear resample
    for (y <- 0 until 8; x <- 0 until 16)
      assert((small.getRGB(x, y) & 0xffffff) == 0x808080)
    // under-box image is untouched (never upscaled)
    val (samePng, sw, sh) = codec.resizePng(png, 128, 128)
    assert(sw == 64 && sh == 32)
    val same = codec.decode(samePng)
    assert((same.getRGB(5, 5) & 0xffffff) == 0x808080)
  }

  test("REAL codec distributed decode + the stub-floor contrast: " +
    "8-dim centered real features do not cosine-collide where the " +
    "4-dim dense stub did") {
    import org.apache.spark.sql.functions._
    val codec = new Multimodal.ImageCodec
    // 40 random-content images + one engineered near-dup pair (same
    // rows except one)
    val rnd = new scala.util.Random(7)
    def rowColors(): Array[Int] = Array.fill(16)(rnd.nextInt(1 << 24))
    val base = (0 until 40).map(i => i.toLong -> rowColors())
    val nd = base.head._2.clone(); nd(15) = (nd(15) + 1) & 0xffffff
    val all = base :+ (99L -> nd)
    val rows = all.map { case (id, cols) =>
      Multimodal.ImageRow(id, codec.encodePngRows(16, 16, y => cols(y)))
    }
    val ds = rows.toDS().repartition(4)
    val bands = Multimodal.decodeBandSums(ds, 8).collect()
      .map(b => b.media_id -> b.bands).toMap
    assert(bands.size == 41)
    // centered features; cosine between all pairs
    def feat(s: Array[Long]): Array[Double] =
      s.map(v => (v - 12240.0) / 65536.0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = bands.keys.toSeq.sorted
    val collisions = (for {
      i <- ids; j <- ids if i < j
    } yield cos(feat(bands(i)), feat(bands(j)))).count(_ >= 0.95)
    // exactly the engineered pair (0, 99) survives the 0.95 bar; the
    // 4-dim md5 stub measured a dense floor here (q113's documented
    // 46.9 s sf1 artifact)
    assert(collisions == 1)
    assert(cos(feat(bands(0L)), feat(bands(99L))) >= 0.95)
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
