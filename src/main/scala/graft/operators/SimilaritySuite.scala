package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Similarity-search queries over the `embeddings` fixture. The exact
  * (brute-force) paths carry DuckDB oracles via list_cosine_similarity on
  * DOUBLE[]-cast lists; the LSH paths (hyperplane-seed-dependent) get
  * rows-only checks plus recall unit tests against the exact answer.
  */
object SimilaritySuite {

  /** Exact cosine top-5 for the first 5 vectors as queries. */
  def embedTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
  }

  /** Exact near-dup pairs above cosine 0.4 (calibrated: the fixture's max
    * pairwise cosine is ~0.51, so this keeps a small non-empty tail).
    */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(spark, dir), threshold = 0.4)

  /** ANN top-5 via random-hyperplane LSH (no oracle: seeded hyperplanes).
    * The fixture's embeddings are near-random, so bucket width is tuned
    * coarse (6 bits x 8 tables) to yield a real candidate set; clustered
    * data would use finer buckets (recall is unit-tested on clusters).
    */
  def embedAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.annTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
      nBits = 6, tables = 8)
  }

  /** IVF-indexed ANN top-5 (no oracle: seeded centroids). Coarse cell count
    * for the near-random fixture vectors; recall unit-tested on clusters.
    */
  def embedIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
      nCells = 8, nProbe = 3)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_topk"    -> (embedTopK _),
    "embed_neardup" -> (embedNearDup _),
    "embed_ann"     -> (embedAnnTopK _),
    "embed_ivf"     -> (embedIvfTopK _))

  val oracles: Map[String, String] = Map(
    "embed_topk" ->
      """SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |       list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                              CAST(q.embedding AS DOUBLE[])) AS cos,
        |       CAST(row_number() OVER (
        |         PARTITION BY q.vec_id
        |         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                         CAST(q.embedding AS DOUBLE[])) DESC,
        |                  e.vec_id ASC) AS INT) AS rank
        |FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
        |WHERE e.vec_id <> q.vec_id
        |QUALIFY rank <= 5""".stripMargin,
    "embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                              CAST(b.embedding AS DOUBLE[])) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) > 0.4""".stripMargin)
}
