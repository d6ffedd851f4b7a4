package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}

class JsonSpec extends SparkSpec {
  import spark.implicits._

  private def setKey(json: String, key: String, value: String): String =
    Seq(Option(json)).toDF("j")
      .select(G.jsonSetKey($"j", lit(key), lit(value)))
      .as[String].head()

  test("json_set_key preserves sibling keys and nests fragments") {
    val out = setKey("""{"quicklook":{"imgs":["a.png"]}}""",
      "tilecache", """{"tiles":["t/0/0.png"],"zoom":12}""")
    // sibling untouched, new key is a real nested object (not an
    // escaped string), both reachable by JSON path
    val df = Seq(out).toDF("j")
    assert(df.select(get_json_object($"j", "$.quicklook.imgs[0]"))
      .as[String].head() == "a.png")
    assert(df.select(get_json_object($"j", "$.tilecache.zoom"))
      .as[String].head() == "12")
  }

  test("json_set_key: null json starts {}, replace overwrites, text fallback") {
    assert(setKey(null, "k", """{"a":1}""") == """{"k":{"a":1}}""")
    assert(setKey("""{"k":{"a":1},"o":2}""", "k", "3") == """{"k":3,"o":2}""")
    // non-JSON value stored as a string
    assert(setKey("{}", "path", "/data/x.tif") == """{"path":"/data/x.tif"}""")
    // null value -> JSON null; null key -> null result
    assert(setKey("{}", "k", null) == """{"k":null}""")
    assert(Seq("{}").toDF("j")
      .select(G.jsonSetKey($"j", lit(null).cast("string"), lit("v")))
      .as[String].head() == null)
  }

  test("json_set_key registered for SQL") {
    graft.plans.GraftExtensions.install(spark)
    assert(spark.sql(
      """SELECT json_set_key('{"a":1}', 'b', '2')""").as[String].head()
      == """{"a":1,"b":2}""")
  }
}
