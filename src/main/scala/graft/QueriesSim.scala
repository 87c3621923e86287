package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity-search query surface over the `embeddings` table
  * (`vec_id`, `embedding: array<float>`, `label`). Embeddings are cast
  * to array<double> before any arithmetic so Spark and the DuckDB
  * oracle (DOUBLE[] cast) do identical-precision math; cosine values
  * are rounded to 6 decimals before ranking so ranks are float-stable.
  */
object QueriesSim {
  import QueriesCore.Q

  private def vecsD(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))

  /** Brute-force cosine top-10 per query vector (query set = every 50th
    * vector, broadcast; corpus streams — the exactness baseline).
    */
  def q40TopkBruteForce(s: SparkSession, dir: String): DataFrame = {
    val all = vecsD(s, dir)
    Similarity.topK(all, all.filter(pmod(col("vec_id"), lit(50)) === 0),
        "vec_id", "embedding", k = 10)
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs ≥ 0.42, exact (all-pairs).
    * The LSH-bucketed variant (q42) is the 100 TB scale path; this one
    * is the oracle-checkable ground truth.
    */
  def q41EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    // scoped to every 4th vector: all-pairs is quadratic by design — the
    // oracle-checkable exact baseline; LSH (q42) is the scale path.
    // norms precomputed once per row; pair stage = one dot + a divide,
    // in the same operation order as the oracle's list_cosine_similarity
    val all = vecsD(s, dir).filter(pmod(col("vec_id"), lit(4)) === 0)
      .withColumn("__n", Similarity.l2norm(col("embedding")))
    val l = all.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("__n").as("na"))
    val r = all.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("__n").as("nb"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= 0.42)
      .select("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }

  /** LSH (random-hyperplane) bucketed ANN top-5: the scale path —
    * per-query work is its bucket's slice, not the whole corpus. No
    * DuckDB oracle (bucketing is xxhash64-seeded); recall vs q40 is
    * asserted in ScalaTest.
    */
  def q42LshTopk(s: SparkSession, dir: String): DataFrame = {
    val all = vecsD(s, dir)
    Similarity.lshTopK(all, all.filter(pmod(col("vec_id"), lit(50)) === 0),
        "vec_id", "embedding", k = 5, nPlanes = 4, probes = 4)
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("query_id", "rank")
  }

  /** IVF-bucketed ANN top-5: the data-adaptive scale path beside LSH
    * (q42) — k-means inverted lists, nProbe closest lists per query.
    * No DuckDB oracle (Lloyd training isn't SQL-expressible there);
    * recall vs q40 exact is asserted in ScalaTest (SimilaritySpec).
    */
  def q46IvfTopk(s: SparkSession, dir: String): DataFrame = {
    val all = vecsD(s, dir)
    // quantizer trains on a deterministic 50% hash sample — the scale
    // posture (training cost halves; recall is assertion-covered in
    // OperatorsSpec at the same sampling)
    Similarity.ivfTopK(all, all.filter(pmod(col("vec_id"), lit(50)) === 0),
        "vec_id", "embedding", k = 5, nCentroids = 16, nProbe = 4, iters = 2,
        trainSamplePct = 50)
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "q40_topk_brute_force" -> q40TopkBruteForce _,
    "q41_embedding_near_dup" -> q41EmbeddingNearDup _,
    "q42_lsh_topk" -> q42LshTopk _,
    "q46_ivf_topk" -> q46IvfTopk _,
  )

  val oracles: Map[String, String] = Map(
    "q40_topk_brute_force" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        |      FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    round(list_cosine_similarity(qv, cv), 6) AS cos_sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q41_embedding_near_dup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id % 4 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |FROM e a, e b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.42
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
