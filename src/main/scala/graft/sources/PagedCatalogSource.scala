package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reusable paged REST-catalogue source (SURVEY §2.1 S3–S5 closure;
  * r12 verdict item 3): the reference's CMR discovery loop —
  * `page_size=100, page_num++` per (product, bbox) with the
  * per-product watermark pushed into the request's temporal window
  * (`eodatadownICESAT2sensor.py:520-730`) and the ASF fetch shape
  * (`eodatadownsentinel1asf.py:392-519`) — as an engine component.
  *
  * The HTTP round-trip itself stays behind [[PagedCatalogSource.PageFetcher]]
  * (this container has no egress; production supplies a client, specs
  * supply a deterministic fake). Everything around it is engine-side:
  *
  *  - '''partition-per-page fan-out''': page 1 is probed once on the
  *    driver for the service's total-hits header; every remaining page
  *    is fetched ON EXECUTORS, one page per task — a 10k-page backfill
  *    is a 10k-task embarrassingly-parallel stage instead of the
  *    reference's serial `while True` (its loop at 100 granules/req ×
  *    ~0.5 s RTT is ~90 min per million granules; the fan-out is RTT ×
  *    pages/parallelism).
  *  - '''watermark pushdown''': the per-product high-water mark is a
  *    REQUEST parameter (temporal window start), so the service never
  *    ships already-ingested granules — pushdown into the source, the
  *    same idea as filter pushdown into a scan.
  *  - '''loud truncation''': a service whose hit count exceeds
  *    `maxPages × pageSize` fails with the exact numbers rather than
  *    silently ingesting a prefix (CMR itself caps paged offsets at
  *    1M granules — a silent prefix there is a data-loss bug).
  *  - '''engine-side parse''' ([[parseGranules]]): CMR granule JSON →
  *    typed columns via `from_json` + array folds, including the
  *    reference's bbox-UNION over `boxes` (\"S W N E\" strings) and
  *    `polygons` (\"lat lon ...\" rings), its invalid-granule policy
  *    (no geometry: tolerated only for granules ≤ 4 MB, loud error
  *    otherwise — .py:652-659), and its download-URL selection (first
  *    `application/x-hdfeos` link, loud when absent — .py:662-668).
  *    All of it is codegen'd Catalyst expressions — no UDF, no
  *    driver-side JSON walking.
  */
object PagedCatalogSource {

  /** One page request — the full parameter set the reference sends. */
  final case class PageRequest(product: String, version: String,
                               temporalStart: Option[Timestamp],
                               temporalEnd: Timestamp,
                               bbox: Option[(Double, Double, Double, Double)],
                               pageNum: Int, pageSize: Int)

  /** One page response: raw granule JSON documents (the `feed.entry`
    * array elements, verbatim) plus the service's total-hit count
    * when it reports one (CMR's `CMR-Hits` header). `totalHits` is
    * what unlocks the parallel fan-out; a service without it degrades
    * to the sequential driver loop — same results, reference-shaped
    * latency.
    */
  final case class PageResult(entries: Seq[String], totalHits: Option[Long])

  /** The app-layer boundary: fetch one page. Must be Serializable —
    * it executes INSIDE tasks for the fan-out path.
    */
  trait PageFetcher extends Serializable {
    def fetch(req: PageRequest): PageResult
  }

  /** Raw discovery: every granule JSON for `products` past each
    * product's watermark, as a DataFrame of (product, version,
    * page_num, entry_json). Page numbering is 1-based like CMR's.
    */
  def discoverRaw(spark: SparkSession, fetcher: PageFetcher,
                  products: Seq[(String, String)],
                  since: Map[String, Timestamp],
                  until: Timestamp,
                  bbox: Option[(Double, Double, Double, Double)] = None,
                  pageSize: Int = 100,
                  maxPages: Int = 100000): DataFrame = {
    import spark.implicits._
    val perProduct: Seq[DataFrame] = products.map { case (product, version) =>
      val req0 = PageRequest(product, version, since.get(product), until,
        bbox, pageNum = 1, pageSize = pageSize)
      val first = fetcher.fetch(req0)
      val firstDf = spark.createDataset(
        first.entries.map(e => (product, version, 1, e)))
      val restDf: DataFrame = first.totalHits match {
        case Some(hits) =>
          val nPages = math.ceil(hits.toDouble / pageSize).toLong
          require(nPages <= maxPages,
            s"PagedCatalogSource: product '$product' reports $hits hits " +
              s"= $nPages pages > maxPages=$maxPages at pageSize=" +
              s"$pageSize — refusing to silently ingest a prefix; raise " +
              s"maxPages or narrow the temporal/bbox window")
          if (nPages <= 1) spark.emptyDataset[(String, String, Int, String)]
            .toDF("product", "version", "page_num", "entry_json")
          else {
            // parallel fan-out: pages are fetched ON EXECUTORS and the
            // granule JSON never visits the driver. Task width is
            // capped at 4× the cluster's core count rather than one
            // task per page: concurrent fetches are bounded by cores
            // either way, so partition-per-page only added a per-page
            // task-scheduling constant (a 10k-page backfill was 10k
            // ~RTT-sized tasks; probed at sf0.1 the 3k-page gate spent
            // more driver time scheduling than fetching). 4×
            // oversubscription keeps retry granularity and straggler
            // back-fill; pages within a task fetch sequentially, as
            // the reference's loop did for ALL of them.
            val width = math.max(1, math.min(nPages.toInt - 1,
              spark.sparkContext.defaultParallelism * 4))
            spark.createDataset(2 to nPages.toInt)
              .repartition(width)
              .flatMap { pn =>
                fetcher.fetch(req0.copy(pageNum = pn)).entries
                  .map(e => (product, version, pn, e))
              }.toDF("product", "version", "page_num", "entry_json")
          }
        case None =>
          // no hit count: the reference's sequential loop, verbatim —
          // fetch until a short/empty page, loudly bounded by maxPages
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(String, String, Int, String)]
          var pn = 2
          var done = first.entries.size < pageSize
          while (!done) {
            require(pn <= maxPages,
              s"PagedCatalogSource: product '$product' exceeded " +
                s"maxPages=$maxPages with no total-hits header — " +
                s"refusing to silently ingest a prefix")
            val page = fetcher.fetch(req0.copy(pageNum = pn))
            buf ++= page.entries.map(e => (product, version, pn, e))
            done = page.entries.size < pageSize
            pn += 1
          }
          spark.createDataset(buf.toSeq)
            .toDF("product", "version", "page_num", "entry_json")
      }
      firstDf.toDF("product", "version", "page_num", "entry_json")
        .unionByName(restDf)
    }
    perProduct.reduce(_ unionByName _)
  }

  /** The CMR granule fields the reference extracts (.py:571-718). */
  val granuleSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("producer_granule_id", StringType),
    StructField("title", StringType),
    StructField("granule_size", DoubleType),
    StructField("online_access_flag", BooleanType),
    StructField("original_format", StringType),
    StructField("time_start", StringType),
    StructField("time_end", StringType),
    StructField("updated", StringType),
    StructField("boxes", ArrayType(StringType)),
    StructField("polygons", ArrayType(ArrayType(StringType))),
    StructField("links", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("href", StringType)))))))

  /** Typed parse of the raw discovery frame — every rule the
    * reference applies, as codegen'd expressions:
    *  - bbox-UNION over `boxes` (\"S W N E\"): fold to the enclosing
    *    (south, west, north, east);
    *  - else bbox over `polygons` (rings of \"lat lon lat lon …\"):
    *    min/max over the alternating coordinate stream;
    *  - neither: INVALID (dropped) when granule_size ≤ 4.0, loud
    *    error when a big granule has no geometry (.py:652-659);
    *  - remote_url = first application/x-hdfeos link, loud when a
    *    valid granule has none (.py:662-668).
    */
  def parseGranules(raw: DataFrame): DataFrame = {
    val g = raw.withColumn("g",
      from_json(col("entry_json"), granuleSchema))
    val hasBoxes = size(col("g.boxes")) > 0
    val hasPolys = size(col("g.polygons")) > 0
    // boxes: per box split once, then array-min/max folds per corner
    def boxCorner(idx: Int, agg: org.apache.spark.sql.Column
        => org.apache.spark.sql.Column) =
      agg(expr(s"transform(g.boxes, b -> cast(split(b, ' ')[$idx] " +
        "as double))"))
    // polygons: one flat alternating lat/lon token stream; index
    // parity picks the axis
    def polyAxis(parity: Int, agg: org.apache.spark.sql.Column
        => org.apache.spark.sql.Column) =
      agg(expr(
        s"""transform(
           |  filter(transform(flatten(transform(g.polygons,
           |    r -> flatten(transform(r, s -> split(s, ' '))))),
           |    (v, i) -> named_struct('v', cast(v as double), 'i', i)),
           |    t -> t.i % 2 = $parity),
           |  t -> t.v)""".stripMargin))
    val parsed = g.select(
      col("product"), col("version"), col("page_num"),
      col("g.id").as("granule_id"),
      col("g.producer_granule_id").as("producer_id"),
      col("g.title").as("title"),
      col("g.granule_size").as("total_size"),
      col("g.online_access_flag").as("online"),
      col("g.original_format").as("original_format"),
      to_timestamp(col("g.time_start")).as("start_time"),
      to_timestamp(col("g.time_end")).as("end_time"),
      to_timestamp(col("g.updated")).as("updated_time"),
      hasBoxes.as("has_boxes"), hasPolys.as("has_polys"),
      when(hasBoxes, "boxes").when(hasPolys, "polygons")
        .as("geom_source"),
      when(hasBoxes, boxCorner(0, array_min))
        .when(hasPolys, polyAxis(0, array_min)).as("south_lat"),
      when(hasBoxes, boxCorner(1, array_min))
        .when(hasPolys, polyAxis(1, array_min)).as("west_lon"),
      when(hasBoxes, boxCorner(2, array_max))
        .when(hasPolys, polyAxis(0, array_max)).as("north_lat"),
      when(hasBoxes, boxCorner(3, array_max))
        .when(hasPolys, polyAxis(1, array_max)).as("east_lon"),
      expr("""filter(g.links,
        |  l -> l.type = 'application/x-hdfeos')""".stripMargin)
        .as("dl_links"),
      col("g.granule_size").as("gsz"))
    parsed
      // no-geometry policy: small granules are dropped as invalid,
      // big ones fail the job with the producer id — never a silent
      // null bbox. The raise lives INSIDE the filter predicate (not a
      // separate projected column) so Catalyst's filter pushdown
      // cannot reorder the drop ahead of the check; when() keeps it
      // lazy for every row that has geometry or is small.
      .filter(col("has_boxes") || col("has_polys") ||
        when(col("gsz") > 4.0,
          raise_error(concat(lit("PagedCatalogSource: no BBOX or " +
            "polygon for large granule "), col("producer_id"))).isNotNull)
          .otherwise(lit(false)))
      .withColumn("remote_url",
        when(size(col("dl_links")) > 0, col("dl_links")(0)("href"))
          .otherwise(raise_error(concat(
            lit("PagedCatalogSource: no dataset URL for "),
            col("producer_id")))))
      .drop("has_boxes", "has_polys", "dl_links", "gsz")
  }

  /** discover = raw sweep + typed parse: the frame
    * [[graft.streaming.IncrementalIngest.ingestBatch]] lands keyed by
    * `granule_id` — the complete S3–S5 engine path from watermark to
    * catalogue rows.
    */
  def discover(spark: SparkSession, fetcher: PageFetcher,
               products: Seq[(String, String)],
               since: Map[String, Timestamp],
               until: Timestamp,
               bbox: Option[(Double, Double, Double, Double)] = None,
               pageSize: Int = 100,
               maxPages: Int = 100000): DataFrame =
    parseGranules(discoverRaw(spark, fetcher, products, since, until,
      bbox, pageSize, maxPages))
}
