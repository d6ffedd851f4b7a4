package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => G}

/** Similarity search over the `embeddings` table (SURVEY.md §7.2):
  * brute-force cosine top-k as the exact baseline, an IVF-style
  * cluster-probed variant as the 100 TB scale path, and per-vector
  * nearest-neighbor (embedding near-dup dedup building block).
  *
  * Scale design: brute force broadcasts the query vector and scans —
  * embarrassingly parallel, no shuffle except the final top-k (a
  * TakeOrdered, not a sort). IVF assigns each vector to a coarse
  * centroid once (broadcast join + one pass), stores partitioned by
  * cluster id, and probes only nprobe clusters per query — the scan
  * shrinks by ~nlist/nprobe at identical plan shape.
  */
object VectorQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def emb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-k for one query vector (vec_id=0).
    "q33_knn_cosine" -> { (s, dir) =>
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .withColumn("cos", G.cosineSim(col("v"), col("qv")))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos"))
    },

    // Per-vector nearest neighbor within each label block (embedding
    // near-dup shape: blocked pair space + argmax, no global sort).
    "q34_nn_per_vector" -> { (s, dir) =>
      val e = emb(s, dir).filter(col("vec_id") < 50)
      val a = e.select(col("label"), col("vec_id").as("id_a"), col("v").as("v_a"))
      val b = e.select(col("label"), col("vec_id").as("id_b"), col("v").as("v_b"))
      a.join(b, Seq("label"))
        .filter(col("id_a") =!= col("id_b"))
        .withColumn("cos", G.cosineSim(col("v_a"), col("v_b")))
        .groupBy(col("label"), col("id_a"))
        .agg(max_by(col("id_b"), struct(col("cos"), -col("id_b"))).as("nn_id"),
          round(max(col("cos")), 6).as("nn_cos"))
        .orderBy("label", "id_a")
    },

    // IVF-style ANN: coarse centroids = first 16 vectors (deterministic
    // stand-in for k-means), assign every vector to its nearest
    // centroid via broadcast, then probe the 4 clusters nearest the
    // query and rank only within them.
    "q35_ann_ivf" -> { (s, dir) =>
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("cc", G.cosineSim(col("v"), col("cv")))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("cc"), -col("cid"))).as("cluster"),
          first(col("v")).as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val probed = cents.crossJoin(broadcast(q))
        .withColumn("qc", G.cosineSim(col("cv"), col("qv")))
        .orderBy(col("qc").desc, col("cid"))
        .limit(4)
        .select(col("cid").as("cluster"))
      assigned.join(broadcast(probed), Seq("cluster"))
        .crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .withColumn("cos", G.cosineSim(col("v"), col("qv")))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("cluster"), round(col("cos"), 6).as("cos"))
    },

    // Random-hyperplane LSH ANN: 64-bit angular signatures, banded
    // into 8×8-bit blocking keys; candidates sharing ≥1 band with the
    // query are ranked by exact cosine. The third ANN strategy beside
    // brute force (q33) and IVF (q35): pure hash blocking, no
    // training, ideal when queries arrive as a stream. Band width sets
    // the recall/candidate-rate trade: 8-bit bands admit ~(1-θ/π)^8
    // per band — sized for this corpus's ~70-90° neighbor angles.
    "q46_ann_hyperplane" -> { (s, dir) =>
      val e = emb(s, dir).withColumn("sig", G.hyperplaneHash(col("v"), 64))
      val banded = e.select(col("vec_id"), col("v"), col("sig"),
        posexplode(array((0 until 8).map(i =>
          col("sig").bitwiseAND(lit(0xffL << (8 * i)))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val qb = banded.filter(col("vec_id") === 0)
        .select(col("band"), col("bucket"), col("v").as("qv"))
      banded.join(broadcast(qb), Seq("band", "bucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("v"), col("qv")).distinct()
        .withColumn("cos", G.cosineSim(col("v"), col("qv")))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("cos"), 6).as("cos"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q33_knn_cosine" ->
      """SELECT vec_id,
        |  round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6) AS cos
        |FROM embeddings,
        |  (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
        |WHERE vec_id <> 0
        |ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qv) DESC, vec_id
        |LIMIT 10""".stripMargin,

    "q34_nn_per_vector" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 50),
        |pairs AS (
        |  SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(a.v, b.v) AS cos
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT label, id_a, id_b, cos,
        |    row_number() OVER (PARTITION BY label, id_a
        |                       ORDER BY cos DESC, id_b) AS rn
        |  FROM pairs)
        |SELECT label, id_a, id_b AS nn_id, round(cos, 6) AS nn_cos
        |FROM ranked WHERE rn = 1 ORDER BY label, id_a""".stripMargin
  )
}
