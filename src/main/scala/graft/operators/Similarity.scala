package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (`embedding: array<float>`, 64-dim).
  *
  * Two paths, per the mandated extension surface:
  *  - brute-force cosine top-k: the exact baseline. The (small) query
  *    set is broadcast, so the corpus is scanned once with no shuffle
  *    of the vector column; per-pair math is higher-order-function
  *    column arithmetic inside codegen (no UDFs). At 100 TB this is a
  *    single map-side pass + a per-query top-k (TakeOrdered-shaped
  *    window over query_id partitions).
  *  - IVF-style bucketed ANN: vectors are assigned to their nearest
  *    coarse centroid at write time; a query probes only its own
  *    centroid's bucket, cutting the scanned fraction to ~1/n_centroids.
  *    Centroids here are a deterministic subsample (vec_id % 97 == 0)
  *    standing in for k-means (which would be an offline job at scale).
  */
object Similarity {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** dot(a, b) via zip_with + aggregate — sequential left fold, so the
    * result is reproducible (no parallel-reduction reordering). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-5 cosine neighbors for queries vec_id < 20. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asD(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rn"),
        round(col("sim"), 4).as("sim_r4"))
  }

  /** Near-duplicate pairs by embedding cosine >= 0.4 (a < b). */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asD(col("embedding")).as("v"))
    val l = e.select(col("vec_id").as("a"), col("v").as("va"))
    val r = e.select(col("vec_id").as("b"), col("v").as("vb"))
    l.join(r, col("a") < col("b"))
      .filter(cosine(col("va"), col("vb")) >= 0.4)
      .select("a", "b")
  }

  /** IVF-style ANN: probe only the query's centroid bucket; top-3 per
    * query. Approximate by construction — driver records rows-only. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asD(col("embedding")).as("v"))
    val cents = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    // assign every vector to its nearest centroid (broadcast centroids)
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("v"), col("cv")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id"))
    val queries = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("cent_id").as("qcent"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    assigned.join(broadcast(queries), col("cent_id") === col("qcent")
        && col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_brute" -> knnBrute _,
    "embed_neardup" -> embedNearDup _,
    "knn_ivf" -> knnIvf _)

  val oracles: Map[String, String] = Map(
    "knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |             CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20)
        |SELECT query_id, neighbor_id, rn, round(sim, 4) AS sim_r4 FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim,
        |    CAST(row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
        |        DESC, e.vec_id ASC) AS BIGINT) AS rn
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.query_id)
        |WHERE rn <= 5""".stripMargin,
    "embed_neardup" ->
      """SELECT a.vec_id AS a, b.vec_id AS b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.4""".stripMargin)
    // knn_ivf: approximate — rows-only.
}
