package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (mandated extension surface): image/audio/
  * video payloads modeled as opaque `binary` columns plus typed metadata,
  * with decode / feature-extraction as a typed per-partition batch stage.
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment) with a deterministic fake — [[decodeStub]] — but the
  * Spark-side plumbing is real: schema (binary payload + struct-ish
  * metadata), partition-parallel batch iteration (`mapPartitions`, the
  * Scala analogue of `mapInPandas` batches: the decoder amortizes any
  * per-batch model/codec setup across a partition), and frame-sampling
  * as a generator (`explode`). At 100 TB payload bytes stay columnar in
  * parquet; only projected batches ever materialize, and the decode
  * stage carries no shuffle.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMeta(asset_id: Long, kind: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long)

  /** Synthesize an asset table from `documents` (payload = utf8 bytes of
    * the text; kind cycles image/audio/video by doc_id). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** Deterministic fake decoder — stands in for an image/audio codec.
    * Derives "media dimensions" purely from payload size so the oracle
    * can reproduce them. A real deployment swaps only this function. */
  def decodeStub(a: Asset): DecodedMeta = {
    val n = a.payload.length.toLong
    DecodedMeta(a.asset_id, a.kind,
      byte_len = n,
      width = n % 640 + 1,
      height = (n * 7) % 480 + 1,
      n_frames = if (a.kind == "video") n % 5 + 2 else 1L)
  }

  /** Decode stage: per-partition batch iteration (setup once per
    * partition, then stream the batch through the decoder). */
  def decodeAll(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition decoder init would go here (model/codec handle)
      batch.map(decodeStub)
    }
  }

  /** Gate query: decoded metadata for every asset. */
  def metaQuery(spark: SparkSession, dir: String): DataFrame =
    decodeAll(assets(spark, dir)).toDF()

  /** Frame sampling: one row per sampled frame of each video asset —
    * generator-shaped (posexplode of a per-asset frame index array). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    metaQuery(spark, dir)
      .filter(col("kind") === "video")
      .select(col("asset_id"), col("width"), col("height"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> metaQuery _,
    "multimodal_frames" -> frameSample _)

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2
        |       THEN octet_length(encode(text)) % 5 + 2 ELSE 1 END AS BIGINT)
        |    AS n_frames
        |FROM documents""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
        |    CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height,
        |    CAST(octet_length(encode(text)) % 5 + 2 AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT asset_id, width, height, CAST(f.i AS BIGINT) AS frame_idx
        |FROM m, LATERAL (SELECT unnest(range(m.n_frames)) AS i) f""".stripMargin)
}
