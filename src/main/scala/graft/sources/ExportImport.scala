package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON table export/import (SURVEY.md §2.1 S7/S8):
  * the reference dumps whole sensor tables to a JSON file and reloads
  * them with path rewriting and a legacy-typo column fallback
  * (eodatadownlandsatgoogsensor.py:2527-2686). Here: distributed
  * `write.json` / `read.json` with explicit schema (schema-on-read
  * with a declared StructType, not inference, so types survive the
  * round trip) plus the same compat shims.
  */
object ExportImport {

  def exportJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Import with explicit schema; `renames` maps legacy column names
    * (e.g. the reference's `Collection_Catagory` typo) onto current
    * ones, and `pathRewrites` applies prefix rewrites to path-valued
    * columns (import-to-a-new-filesystem-root case).
    */
  def importJson(spark: SparkSession, path: String, schema: StructType,
                 renames: Map[String, String] = Map.empty,
                 pathRewrites: Map[String, (String, String)] = Map.empty): DataFrame = {
    var df = spark.read.schema(adjustSchema(schema, renames)).json(path)
    renames.foreach { case (legacy, current) =>
      df = df.withColumnRenamed(legacy, current)
    }
    pathRewrites.foreach { case (column, (from, to)) =>
      df = df.withColumn(column,
        regexp_replace(col(column), "^" + java.util.regex.Pattern.quote(from), to))
    }
    df
  }

  private def adjustSchema(schema: StructType, renames: Map[String, String]): StructType = {
    val inverse = renames.map(_.swap)
    StructType(schema.fields.map { f =>
      inverse.get(f.name).map(legacy => f.copy(name = legacy)).getOrElse(f)
    })
  }
}
