package graft.pipeline

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.SceneCatalog
import graft.model.Scene
import graft.pipeline.StepRunner.{SceneStep, StepResult}
import graft.sources.CowTable

/** Top-level (not inner) classes: steps ship to executors and must not
  * capture the test suite.
  */
private[pipeline] class DownloadStep(failMod: Long) extends SceneStep {
  val name = "download"
  def workList(cat: SceneCatalog): DataFrame = cat.scnlistNeedDownload()
  def process(pid: Long): StepResult =
    StepResult(pid, success = failMod == 0 || pid % failMod != 0, s"dl $pid")
  def onSuccess = Map("Downloaded" -> lit(true))
}

private[pipeline] class ArdStep extends SceneStep {
  val name = "ard"
  def workList(cat: SceneCatalog): DataFrame = cat.scnlistNeedArd()
  def process(pid: Long): StepResult = StepResult(pid, success = true, s"ard $pid")
  def onSuccess = Map("ARDProduct" -> lit(true))
}

class StepRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def scene(pid: Long, date: String): Scene =
    Scene(pid, s"S$pid", s"P$pid", "LANDSAT_8",
      Timestamp.valueOf(date + " 10:00:00"), Date.valueOf(date), 10.0,
      52, 50, 2, 0, 1000, "gs://x", Timestamp.valueOf("2020-01-01 00:00:00"),
      None, None, Downloaded = false, None, None, ARDProduct = false,
      DCLoaded = false, Invalid = false, Archived = false, ExtendedInfo = None)

  private def mkCatalog(n: Int): SceneCatalog = {
    val root = Files.createTempDirectory("pipe").toString + "/scenes"
    val cat = new SceneCatalog(new CowTable(root, spark), spark)
    cat.table.overwrite((1 to n).map(i => scene(i.toLong, "2020-03-01")).toDF())
    cat
  }

  test("step run updates only succeeded rows; retry picks up failures") {
    val cat = mkCatalog(10)
    val step = new DownloadStep(3) // 3, 6, 9 fail first time
    val (n1, ok1) = StepRunner.runStep(spark, cat, step, parallelism = 4)
    assert(n1 == 10 && ok1 == 7)
    assert(cat.scnlistNeedDownload().as[Long].collect().toSet == Set(3L, 6L, 9L))
    // second run: only the 3 pending scenes are selected; all pass now
    val (n2, ok2) = StepRunner.runStep(spark, cat, new DownloadStep(0), 4)
    assert(n2 == 3 && ok2 == 3)
    assert(cat.scnlistNeedDownload().isEmpty)
  }

  test("ordered multi-step run honors state-machine ordering + audit") {
    val cat = mkCatalog(5)
    val audit = new AuditLog(
      Files.createTempDirectory("audit").toString + "/log", spark)
    val res = StepRunner.runAll(spark, cat,
      Seq(new DownloadStep(0), new ArdStep), parallelism = 2, Some(audit))
    assert(res == Seq(("download", 5L, 5L), ("ard", 5L, 5L)))
    assert(cat.scnlistNeedArd().isEmpty)
    val log = audit.entries().select("Description").as[String].collect()
    assert(log.length == 2)
    assert(log.exists(_.startsWith("download:")) && log.exists(_.startsWith("ard:")))
  }
}
