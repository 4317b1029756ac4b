package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gram / scatter matrix over the embedding corpus — the sufficient
  * statistic behind PCA, whitening, linear probes and covariance
  * estimation: G[i][j] = Σ_vec v[i]·v[j], a d×d matrix accumulated in
  * ONE pass over n vectors. At 100 TB this is the canonical "big data,
  * small model" reduction: per-partition partial Gram matrices merge by
  * addition, so the shuffle carries O(partitions · d²) cells while the
  * scan does all the work.
  *
  * Exact arithmetic: float dot-sums are order-dependent, so the gate
  * quantizes to a FIXED integer grid first (q = round(v·1000) — unlike
  * `embed_quantize`'s per-vector scale, a shared grid is what makes
  * cross-vector sums meaningful) and accumulates exact integers;
  * |q|≤1024, so a cell bounds at n·2^20 — BIGINT-safe past 10^12
  * vectors.
  *
  * Shape: double posexplode fans each vector into its d·(d+1)/2 upper-
  * triangle terms and a hash aggregate folds them — ALL inside
  * whole-stage codegen with map-side partial aggregation, so each
  * partition emits at most 2080 rows (d=64) into the only exchange.
  * The d² fan-out per row is not overhead — it IS the Gram matrix's
  * O(n·d²) multiply count; no alternative shape does fewer multiplies.
  */
object GramMatrix {

  /** Fixed quantization grid (thousandths). */
  val gridScale = 1000.0

  /** Upper-triangle exact Gram over quantized embeddings:
    * (i, j, g, n_vecs) with 0 <= i <= j < d. */
  def gram(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * gridScale).cast("long")).as("qv"))
    q.select(posexplode(col("qv")).as(Seq("i", "qi")), col("qv"))
      .select(col("i"), col("qi"), posexplode(col("qv")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(col("qi") * col("qj")).as("g"),
        count(lit(1)).as("n_vecs"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("g"), col("n_vecs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_gram" -> gram _)

  val oracles: Map[String, String] = Map(
    "embed_gram" ->
      s"""WITH q AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(round(x * $gridScale) AS BIGINT)) AS qv
         |  FROM embeddings)
         |SELECT i.i, j.j,
         |  CAST(sum(qv[i.i + 1] * qv[j.j + 1]) AS BIGINT) AS g,
         |  count(*) AS n_vecs
         |FROM q, range(0, 64) i(i), range(0, 64) j(j)
         |WHERE j.j >= i.i
         |GROUP BY 1, 2""".stripMargin)
}
