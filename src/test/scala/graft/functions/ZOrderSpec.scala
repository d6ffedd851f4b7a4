package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[ZOrder]]'s Morton pipeline against an independent JVM
  * reimplementation (bit-by-bit interleave, no magic numbers) and the
  * locality property that makes z-layouts prune: a small box in
  * (x, y) space touches few distinct cell prefixes.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // textbook interleave: bit i of x lands at position 2i, y at 2i+1
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue equals a bit-by-bit Morton interleave on a 16-bit grid " +
    "sweep; zCell is its prefix") {
    val pts = Seq(0L, 1L, 2L, 3L, 255L, 256L, 21845L, 43690L, 65535L)
    val df = pts.flatMap(x => pts.map(y => (x, y))).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .withColumn("cell", shiftright(col("z"), 28))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z === mortonRef(x, y), s"morton($x, $y)")
      assert(r.getLong(3) === (mortonRef(x, y) >> 28))
    }
    // hand anchors: x=0b1010, y=0b0101 interleave to 0b01100110
    assert(mortonRef(10L, 5L) === 102L)
    assert(df.filter(col("x") === 10).count() === 0) // sweep sanity
  }

  test("norm16 is deterministic min-max ranking; constant columns map " +
    "to 0") {
    val df = Seq(0.0, 2.5, 5.0, 7.5, 10.0).toDF("v")
      .withColumn("u", ZOrder.norm16(col("v"), lit(0.0), lit(10.0)))
      .withColumn("c", ZOrder.norm16(col("v"), lit(3.0), lit(3.0)))
    val got = df.orderBy("v").select("u").as[Long].collect().toSeq
    assert(got === Seq(0L, 16383L, 32767L, 49151L, 65535L))
    assert(df.select("c").as[Long].collect().toSet === Set(0L))
  }

  test("locality: a quadrant-sized box touches exactly its quadtree " +
    "tile's cell; the full plane touches all 16") {
    val grid = (0 until 64).flatMap(i => (0 until 64).map(j =>
      (i * 1000.0 / 63.0, j * 1000.0 / 63.0))).toDF("x", "y")
      .withColumn("cell", ZOrder.zCell(col("x"), col("y"),
        lit(0.0), lit(1000.0), lit(0.0), lit(1000.0), 4))
    assert(grid.select("cell").distinct().count() === 16)
    // the lower-left quarter of the plane = one 4x4 z-tile... at
    // bits=4 each tile is a 1/4 x 1/4 box, so a box inside one
    // sixteenth touches exactly 1 cell
    val tile = grid.filter(col("x") < 240.0 && col("y") < 240.0)
    assert(tile.select("cell").distinct().count() === 1)
    // a box spanning the x-midline at fixed y-quarter touches 2
    val two = grid.filter(col("x") >= 240.0 && col("x") < 510.0 &&
      col("y") < 240.0)
    assert(two.select("cell").distinct().count() === 2)
  }
}
