package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.expression
import org.apache.spark.sql.functions._

import graft.functions.expressions._

/** Column-level API over the custom Catalyst expressions plus
  * composed built-in functions for text / similarity analysis.
  * Everything here is a pure `Column` transformation — no UDFs, no
  * driver-side loops — so plans stay codegen-friendly and distributed.
  */
object GraftFunctions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  // ---- geo (SURVEY §2.8 C8–C10) ----

  def bboxFromWkt(wkt: Column): Column = c(BBoxFromWkt(expression(wkt)))

  def bboxToWkt(bbox: Column): Column = c(BBoxToWkt(expression(bbox)))

  def bboxSplit(bbox: Column, maxWidthDeg: Double): Column =
    c(BBoxSplit(expression(bbox), expression(lit(maxWidthDeg))))

  /** Reference C9 wrap cut: complement boxes for spans wider than
    * `thresDeg` (see BBox.cutWrap for the exact semantics).
    */
  def bboxCutWrap(bbox: Column, thresDeg: Double): Column =
    c(BBoxCutWrap(expression(bbox), expression(lit(thresDeg))))

  def bboxIntersects(a: Column, b: Column): Column =
    c(BBoxIntersects(expression(a), expression(b)))

  /** Exact closed rect-vs-polygon test (J2/J3 second stage) — run it
    * AFTER a bbox prefilter; supports POLYGON with holes + MULTIPOLYGON.
    */
  def polygonIntersects(bbox: Column, wkt: Column): Column =
    c(PolygonIntersects(expression(bbox), expression(wkt)))

  // ---- C11 general reprojection: UTM (EPSG:326zz/327zz) closed forms

  /** struct<lon,lat> degrees → struct<easting,northing> meters. */
  def utmForward(pt: Column, epsg: Int): Column =
    c(UtmForward(expression(pt), expression(lit(epsg))))

  /** struct<easting,northing> meters → struct<lon,lat> degrees. */
  def utmInverse(pt: Column, epsg: Int): Column =
    c(UtmInverse(expression(pt), expression(lit(epsg))))

  /** Per-row EPSG variants (each scene reprojected into its own zone —
    * the multi-zone catalogue case).
    */
  def utmForward(pt: Column, epsg: Column): Column =
    c(UtmForward(expression(pt), expression(epsg)))

  def utmInverse(pt: Column, epsg: Column): Column =
    c(UtmInverse(expression(pt), expression(epsg)))

  /** bbox degrees → bbox in the target CRS (corner reprojection +
    * envelope — the reference's reprojBBOX_epsg shape for the
    * scene-vs-layer join, eodatadownlandsatgoogsensor.py:723-725).
    * Supports both projection families: UTM 326zz/327zz and polar
    * stereographic 3413/3031 (see ProjImpl.bboxToUtm for the polar
    * envelope caveat on pole-spanning boxes).
    */
  def bboxToUtm(b: Column, epsg: Int): Column =
    c(BBoxToUtm(expression(b), expression(lit(epsg))))

  // ---- C11 polar family: polar stereographic closed forms for the
  // grids polar ICESAT2/GEDI products actually ship in — EPSG:3413
  // (NSIDC Arctic) / EPSG:3031 (Antarctic). Same Snyder-series codegen
  // pattern as UTM; unsupported codes fail loudly.

  /** struct<lon,lat> degrees → struct<x,y> polar stereographic meters. */
  def psForward(pt: Column, epsg: Int): Column =
    c(PsForward(expression(pt), expression(lit(epsg))))

  /** struct<x,y> meters → struct<lon,lat> degrees. */
  def psInverse(pt: Column, epsg: Int): Column =
    c(PsInverse(expression(pt), expression(lit(epsg))))

  /** Per-row EPSG variants (mixed-hemisphere catalogues). */
  def psForward(pt: Column, epsg: Column): Column =
    c(PsForward(expression(pt), expression(epsg)))

  def psInverse(pt: Column, epsg: Column): Column =
    c(PsInverse(expression(pt), expression(epsg)))

  /** Build a bbox struct from four coordinate columns. */
  def bbox(north: Column, south: Column, east: Column, west: Column): Column =
    struct(north.cast("double").as("north"), south.cast("double").as("south"),
      east.cast("double").as("east"), west.cast("double").as("west"))

  // ---- C11: bbox reprojection (eodatadownlandsatgoogsensor.py:723-725
  // reprojects the scene bbox to the vector layer's EPSG before the
  // spatial join). Closed-form spherical web-mercator (EPSG:4326 ⇄
  // 3857) composed from built-in math functions — stays inside
  // whole-stage codegen, no UDF. Other EPSG codes stay out of scope
  // (the reference's own data is effectively 4326; SURVEY C11).

  private val EarthR = 6378137.0

  /** Longitude degrees → web-mercator x meters. */
  def mercX(lon: Column): Column = radians(lon) * EarthR

  /** Latitude degrees → web-mercator y meters (clamped to ±85.051129°,
    * the square-mercator domain).
    */
  def mercY(lat: Column): Column = {
    val clamped = greatest(lit(-85.051129), least(lit(85.051129), lat))
    log(tan(radians(clamped) / 2 + lit(math.Pi / 4))) * EarthR
  }

  /** Web-mercator x meters → longitude degrees. */
  def invMercX(x: Column): Column = degrees(x / EarthR)

  /** Web-mercator y meters → latitude degrees. */
  def invMercY(y: Column): Column =
    degrees(atan(exp(y / EarthR)) * 2 - lit(math.Pi / 2))

  /** bbox struct in degrees → bbox struct in EPSG:3857 meters. */
  def bboxToWebMercator(b: Column): Column =
    struct(mercY(b("north")).as("north"), mercY(b("south")).as("south"),
      mercX(b("east")).as("east"), mercX(b("west")).as("west"))

  /** bbox struct in EPSG:3857 meters → bbox struct in degrees. */
  def bboxFromWebMercator(b: Column): Column =
    struct(invMercY(b("north")).as("north"), invMercY(b("south")).as("south"),
      invMercX(b("east")).as("east"), invMercX(b("west")).as("west"))

  // ---- JSON mutation (SURVEY §7.5 JSONB read-modify-write) ----

  /** Set/replace one key in a JSON object column, preserving siblings;
    * null json starts `{}`, value parsed as JSON fragment when valid.
    */
  def jsonSetKey(json: Column, key: Column, value: Column): Column =
    c(JsonSetKey(expression(json), expression(key), expression(value)))

  // ---- hashing / fingerprints ----

  /** 64-bit SimHash fingerprint of a token array. */
  def simhash64(tokens: Column): Column = c(SimHash64(expression(tokens)))

  /** k-element MinHash signature of a token/shingle array. */
  def minhashSig(tokens: Column, k: Int): Column =
    c(MinHashSignature(expression(tokens), expression(lit(k))))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** First index where two long arrays agree (-1 if none) — the
    * first-band-wins LSH dedup primitive.
    */
  def firstEqualIndex(a: Column, b: Column): Column =
    c(FirstEqualIndex(expression(a), expression(b)))

  /** Per-document n-gram repetition stats in one codegen'd pass:
    * struct(n_grams, n_distinct, top_n).
    */
  def ngramRepetition(tokens: Column, n: Int): Column =
    c(NgramRepetition(expression(tokens), expression(lit(n))))

  /** Exact Jaccard over pre-sorted distinct token arrays (one-pass
    * merge, codegen'd; pair with `sortedWordSet`).
    */
  def sortedJaccard(a: Column, b: Column): Column =
    c(SortedJaccard(expression(a), expression(b)))

  /** Canonical word-set form for sortedJaccard. */
  def sortedWordSet(text: Column): Column =
    array_sort(array_distinct(tokens(text)))

  // ---- vectors ----

  /** Cosine similarity; accepts float or double arrays. */
  def cosineSim(a: Column, b: Column): Column =
    c(CosineSimilarity(
      expression(a.cast("array<double>")),
      expression(b.cast("array<double>"))))

  /** Random-hyperplane angular signature (SimHash for vectors):
    * hamming64 between signatures ≈ nbits·θ/π. The hash-bucketed ANN
    * path: block on signature prefixes/bands, verify with cosineSim.
    */
  def hyperplaneHash(vec: Column, nbits: Int): Column =
    c(HyperplaneHash(expression(vec.cast("array<double>")), expression(lit(nbits))))

  // ---- text analysis (composed built-ins) ----

  /** Whitespace tokenization after lowercase+trim. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** k-word shingles joined by a space: size n-k+1 (empty if n<k). */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(k)),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))

  /** BPE-ish token count: word pieces + standalone punctuation
    * (SURVEY §7.2 scale extensions; regex, not a learned vocab).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Fraction of tokens that appear in `stopwords` (duplicates count). */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(sw, t)))
        .cast("double") / size(toks).cast("double"))
  }

  /** Heuristic quality score in [0,1]: mixes length, alpha ratio and
    * stopword presence (reference-free; LLM-pipeline extension).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val lenScore = least(size(toks).cast("double") / lit(20.0), lit(1.0))
    val alphaRatio =
      when(length(text) === 0, 0.0)
        .otherwise(length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") /
          length(text).cast("double"))
    val swScore = least(stopwordRatio(toks, stopwords) * lit(4.0), lit(1.0))
    round((lenScore + alphaRatio + swScore) / lit(3.0), 6)
  }

  /** N-gram-profile language ID: scores the token array against each
    * language's marker-word list (distinct-marker hits via the
    * codegen'd set-intersect — a lambda `filter` here drops the whole
    * projection out of whole-stage codegen), returns the argmax
    * language code or `und` when nothing matches. Ties break toward
    * the lexicographically larger code (struct array_max).
    */
  def langIdNgram(toks: Column, profiles: Map[String, Seq[String]]): Column = {
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val mk = array(markers.map(lit): _*)
      struct(size(array_intersect(toks, mk)).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling-hash document fingerprint: min-of-ngram-hashes (winnowing
    * lite) — stable under small edits away from the minimizing ngram.
    * One-pass codegen'd expression (per-token hash + polynomial window
    * combine); 0 for texts shorter than n tokens.
    */
  def fingerprintMinNgram(toks: Column, n: Int): Column =
    c(MinNgramHash(expression(toks), expression(lit(n))))
}
