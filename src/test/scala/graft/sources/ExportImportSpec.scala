package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class ExportImportSpec extends SparkSpec {
  import spark.implicits._

  test("json round trip with legacy-typo rename and path rewrite") {
    val df = Seq(
      (1L, "catA", "/old/root/scene1.tif"),
      (2L, "catB", "/old/root/scene2.tif")).toDF("id", "category", "path")
    val dir = Files.createTempDirectory("ei").toString + "/t"
    // export under the legacy (typo) column name, as the reference did
    ExportImport.exportJson(df.withColumnRenamed("category", "Catagory"), dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("category", StringType),
      StructField("path", StringType)))
    val back = ExportImport.importJson(spark, dir, schema,
      renames = Map("Catagory" -> "category"),
      pathRewrites = Map("path" -> ("/old/root", "/new/base")))
    val rows = back.orderBy("id").as[(Long, String, String)].collect()
    assert(rows.sameElements(Array(
      (1L, "catA", "/new/base/scene1.tif"),
      (2L, "catB", "/new/base/scene2.tif"))))
  }

  test("typed columns survive the round trip (schema-on-read)") {
    val df = Seq((1L, 2.5, java.sql.Date.valueOf("2020-05-05"), true))
      .toDF("k", "x", "d", "b")
    val dir = Files.createTempDirectory("ei2").toString + "/t"
    ExportImport.exportJson(df, dir)
    val back = ExportImport.importJson(spark, dir, df.schema)
    // JSON read is always nullable; names+types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.as[(Long, Double, java.sql.Date, Boolean)].head() ==
      ((1L, 2.5, java.sql.Date.valueOf("2020-05-05"), true)))
  }
}
