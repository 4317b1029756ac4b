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

  /** Resize-planning output: original dims, thumbnail dims fit into
    * [[thumbBox]]² (aspect preserved, never upscaled), and the RGB
    * byte estimate the downstream batch writer sizes buffers by. */
  case class ResizedMeta(asset_id: Long, kind: String, width: Long,
      height: Long, out_w: Long, out_h: Long, out_bytes: Long)

  val thumbBox = 256L

  /** Thumbnail/resize stage — the standard preprocessing step between
    * decode and featurize in any image pipeline. The pixel work is the
    * stub (no codecs here); the REAL contract is the plumbing: dims
    * arrive from [[decodeAll]], the fit computation is pure integer
    * arithmetic (floor scaling, no upscale, 1px floor — so the oracle
    * reproduces it bit-for-bit), and execution is the same
    * per-partition typed batch stage (`mapPartitions`) a real resizer
    * amortizes its buffer/codec setup across. No shuffle anywhere:
    * decode → resize is one fused narrow stage at any corpus size. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeAll(assets(spark, dir)).mapPartitions { batch =>
      // per-partition resize buffer init would go here
      batch.map { m =>
        val longSide = math.max(m.width, m.height)
        val (ow, oh) =
          if (longSide <= thumbBox) (m.width, m.height)
          else (math.max(1L, m.width * thumbBox / longSide),
            math.max(1L, m.height * thumbBox / longSide))
        ResizedMeta(m.asset_id, m.kind, m.width, m.height, ow, oh, ow * oh * 3L)
      }
    }.toDF()
  }

  // --- feature extraction + similarity composition ----------------------

  /** Deterministic fake featurizer: 16-bucket byte histogram, L1
    * normalized — stands in for an image/audio embedding model. Real
    * deployments swap this function; the pipeline shape (binary column
    * in, fixed-width vector out, per-partition batching) is the real
    * contract. */
  def featurizeStub(payload: Array[Byte]): Array[Double] = {
    val h = new Array[Double](16)
    var i = 0
    while (i < payload.length) { h((payload(i) & 0xff) / 16) += 1.0; i += 1 }
    val n = math.max(payload.length, 1).toDouble
    var j = 0
    while (j < 16) { h(j) /= n; j += 1 }
    h
  }

  case class AssetFeature(asset_id: Long, kind: String, feature: Array[Double])

  /** Decode->featurize stage: same mapPartitions batch shape as
    * decodeAll (model handle initialized once per partition). */
  def featurize(assets: Dataset[Asset]): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition featurizer/model init would go here
      batch.map(a => AssetFeature(a.asset_id, a.kind, featurizeStub(a.payload)))
    }
  }

  /** End-to-end multimodal search: payload -> feature vector -> top-3
    * most-similar assets of the same kind for the first 5 assets of
    * each kind. Composes the multimodal plumbing with the ANN kernel
    * (Similarity.pairSims). Approximate feature space -> rows-only. */
  def featureKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = featurize(assets(spark, dir))
      .map { f =>
        var s = 0.0; var i = 0
        while (i < f.feature.length) { s += f.feature(i) * f.feature(i); i += 1 }
        (f.asset_id, f.kind, f.feature, math.sqrt(s))
      }.toDF("id", "kind", "v", "n")
    val vecs = feats.select(col("id"), col("v"), col("n"))
      .as[Similarity.Vec]
    val probes = feats.filter(col("id") < 15)
      .select(col("id"), col("v"), col("n")).as[Similarity.Vec].collect()
    val kinds = feats.select(col("id").as("a_id"), col("kind"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b")).orderBy(col("sim").desc, col("a").asc)
    Similarity.pairSims(vecs, probes, (c, q) => c != q, minSim = -2.0)
      .join(kinds, col("a") === col("a_id"))
      .join(kinds.select(col("a_id").as("b_id"), col("kind").as("qkind")),
        col("b") === col("b_id"))
      .filter(col("kind") === col("qkind"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("b").as("query_asset"), col("a").as("similar_asset"),
        col("kind"), col("rn"), round(col("sim"), 4).as("sim_r4"))
  }

  /** Perceptual hash (aHash family): 16 bits, bit b set iff byte-
    * histogram bucket b is at or above the bucket mean — the
    * cross-multiplied integer comparison 16·c_b ≥ n, so the hash is
    * bit-portable. A real pHash swaps the histogram for DCT
    * coefficients of the decoded image; the dataflow (binary in,
    * small int out, map-side) is identical. */
  def phashStub(payload: Array[Byte]): Long = {
    val c = new Array[Long](16)
    var i = 0
    while (i < payload.length) { c((payload(i) & 0xff) / 16) += 1; i += 1 }
    var h = 0L
    var b = 0
    while (b < 16) {
      if (16L * c(b) >= payload.length) h |= 1L << b
      b += 1
    }
    h
  }

  case class AssetHash(asset_id: Long, kind: String, phash: Long)

  /** Near-duplicate media detection — the [[graft.operators.Dedup]]
    * pipeline shape applied to the multimodal column: per-asset
    * perceptual hash (map-side, [[phashStub]]), LSH banding of the 16
    * bits into 4 nibbles (any pair within Hamming distance 3 leaves
    * ≥1 nibble untouched — pigeonhole, so banding loses nothing at
    * the gate threshold), an EQUI-join on (kind, band, value), and an
    * exact `bit_count(xor)` verify. Never an all-pairs comparison;
    * candidate fanout is governed by band-bucket occupancy exactly as
    * in `dedup_simhash_pairs` (the bucket-cap guard there applies
    * verbatim if media collections cluster). The gate probes the
    * newly-ingested batch (asset_id % 10 = 0) against the FULL
    * collection — the incremental-ingest shape of `dedup_containment`
    * — because a 16-bit histogram hash on a template-heavy corpus has
    * quadratic true all-pairs output; production widens the hash to
    * 64 DCT bits (8-bit bands, same dataflow) before widening the
    * probe side. */
  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = assets(spark, dir)
      .mapPartitions(_.map(a => AssetHash(a.asset_id, a.kind,
        phashStub(a.payload)))).toDF()
    def bands(df: DataFrame) = df
      .select(col("asset_id"), col("kind"), col("phash"),
        explode(array((0 until 4).map(i => struct(lit(i).as("bi"),
          expr(s"(phash DIV ${1L << (4 * i)}L) % 16").as("bv"))): _*))
          .as("b"))
      .select(col("asset_id"), col("kind"), col("phash"),
        col("b.bi"), col("b.bv"))
    bands(h.filter(pmod(col("asset_id"), lit(10)) === 0)).as("x")
      .join(bands(h).as("y"),
        col("x.kind") === col("y.kind") && col("x.bi") === col("y.bi")
          && col("x.bv") === col("y.bv")
          && col("x.asset_id") =!= col("y.asset_id"))
      .select(col("x.asset_id").as("probe_id"),
        col("y.asset_id").as("match_id"),
        col("x.kind").as("kind"),
        col("x.phash").as("a_hash"), col("y.phash").as("b_hash"))
      .distinct()
      .withColumn("dist",
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast("long"))
      .filter(col("dist") <= 3)
  }

  /** Audio window width / stride (ms) and the fake bytes→duration
    * rate for [[audioWindows]]. */
  val audioWinMs = 1000L
  val audioStrideMs = 600L
  val audioMsPerByte = 40L

  /** Overlapping window segmentation of the audio assets — the
    * fixed-width/stride chunking an ASR/audio-embedding stage consumes
    * ([[graft.operators.TrainPrep]] chunking, ported to the time
    * axis): every window of [[audioWinMs]] ms starting each
    * [[audioStrideMs]] ms with start < duration, the final window
    * clamped to the asset end. Duration derives deterministically
    * from payload size ([[decodeStub]]'s discipline — a real decoder
    * swaps in). Map-side `sequence`/`explode` generation: window
    * count is `(duration−1) DIV stride + 1` per asset, no shuffle at
    * all — output IO is the whole cost at any corpus size. */
  def audioWindows(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).toDF()
      .filter(col("kind") === "audio")
      .select(col("asset_id"),
        (length(col("payload")) * audioMsPerByte).cast("long")
          .as("duration_ms"))
      .withColumn("window_idx", explode(expr(
        s"sequence(0, (duration_ms - 1) DIV $audioStrideMs)")))
      .select(col("asset_id"), col("duration_ms"), col("window_idx"),
        (col("window_idx") * audioStrideMs).as("start_ms"),
        least(col("window_idx") * audioStrideMs + audioWinMs,
          col("duration_ms")).as("end_ms"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_audio_windows" -> audioWindows _,
    "multimodal_meta" -> metaQuery _,
    "multimodal_frames" -> frameSample _,
    "multimodal_resize" -> resizePlan _,
    "multimodal_phash_pairs" -> phashPairs _,
    "multimodal_feature_knn" -> featureKnn _)

  val oracles: Map[String, String] = Map(
    "multimodal_audio_windows" ->
      s"""WITH a AS (SELECT doc_id AS asset_id,
         |    CAST(octet_length(encode(text)) * $audioMsPerByte AS BIGINT)
         |      AS duration_ms
         |  FROM documents WHERE doc_id % 3 = 1)
         |SELECT asset_id, duration_ms, CAST(w.i AS BIGINT) AS window_idx,
         |  CAST(w.i * $audioStrideMs AS BIGINT) AS start_ms,
         |  least(w.i * $audioStrideMs + $audioWinMs, duration_ms)
         |    AS end_ms
         |FROM a, LATERAL (SELECT
         |  unnest(range((duration_ms - 1) // $audioStrideMs + 1)) AS i) w""".stripMargin,
    // ASCII corpus => byte histogram == char histogram (see
    // multimodal_feature_knn); the oracle brute-forces all same-kind
    // pairs, which the banded join provably equals at dist <= 3.
    "multimodal_phash_pairs" ->
      """WITH f AS (SELECT doc_id AS id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
        |      AS kind,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(16), b -> CASE WHEN
        |        16 * len(list_filter(string_split_regex(text, ''),
        |          c -> ascii(c) // 16 = b)) >= length(text)
        |        THEN CAST(1 AS BIGINT) << b ELSE 0 END)),
        |      (p, q) -> p | q) AS phash
        |  FROM documents)
        |SELECT a.id AS probe_id, b.id AS match_id, a.kind,
        |  a.phash AS a_hash, b.phash AS b_hash,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist
        |FROM f a JOIN f b
        |  ON a.kind = b.kind AND a.id <> b.id AND a.id % 10 = 0
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3""".stripMargin,
    "multimodal_resize" ->
      s"""WITH m AS (SELECT doc_id AS asset_id,
         |    CASE WHEN doc_id % 3 = 0 THEN 'image'
         |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |    CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
         |    CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT)
         |      AS height
         |  FROM documents),
         |r AS (SELECT *, greatest(width, height) AS ls FROM m)
         |SELECT asset_id, kind, width, height,
         |  CASE WHEN ls <= $thumbBox THEN width
         |       ELSE greatest(1, width * $thumbBox // ls) END AS out_w,
         |  CASE WHEN ls <= $thumbBox THEN height
         |       ELSE greatest(1, height * $thumbBox // ls) END AS out_h,
         |  (CASE WHEN ls <= $thumbBox THEN width
         |        ELSE greatest(1, width * $thumbBox // ls) END)
         |  * (CASE WHEN ls <= $thumbBox THEN height
         |          ELSE greatest(1, height * $thumbBox // ls) END) * 3
         |    AS out_bytes
         |FROM r""".stripMargin,
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
    // The featurizer is DuckDB-expressible because the corpus is pure
    // ASCII (verified across SFs): the payload's byte histogram equals
    // the text's char histogram. Same sequential-fold cosine as the
    // pairSims kernel -> bit-identical sims -> hash-checked gate.
    "multimodal_feature_knn" -> {
      def fold16(x: String, y: String) =
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          s"list_transform(range(16), i -> $x[i+1] * $y[i+1])), (p,q) -> p+q)"
      def cos16(a: String, b: String) =
        s"(${fold16(a, b)} / (sqrt(${fold16(a, a)}) * sqrt(${fold16(b, b)})))"
      s"""WITH f AS (SELECT doc_id AS id,
         |    CASE WHEN doc_id % 3 = 0 THEN 'image'
         |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |    list_transform(range(16), b ->
         |      CAST(len(list_filter(string_split_regex(text, ''),
         |        c -> ascii(c) // 16 = b)) AS DOUBLE)
         |      / CAST(greatest(length(text), 1) AS DOUBLE)) AS v
         |  FROM documents),
         |cand AS (SELECT q.id AS query_asset, a.id AS similar_asset, a.kind,
         |    ${cos16("a.v", "q.v")} AS sim
         |  FROM f a JOIN f q ON a.kind = q.kind AND q.id < 15 AND a.id <> q.id)
         |SELECT query_asset, similar_asset, kind, rn,
         |  round(sim, 4) AS sim_r4 FROM (
         |  SELECT query_asset, similar_asset, kind, sim,
         |    CAST(row_number() OVER (PARTITION BY query_asset
         |      ORDER BY sim DESC, similar_asset ASC) AS BIGINT) AS rn
         |  FROM cand) WHERE rn <= 3""".stripMargin
    },
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
