package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Multimodal column plumbing: image/audio/video payloads ride through
 * the engine as opaque `binary` columns with a typed metadata struct;
 * feature extraction runs batched per partition so a real decoder
 * (JNI codec, GPU preprocessor) amortizes setup per batch, not per
 * row.
 *
 * The decode itself is a STUB — deterministic fake features standing
 * in for pixel decoding (this container has no image/audio codecs).
 * Everything around it is real and tested: the binary schema, the
 * metadata struct, the mapPartitions batching shape, and the feature
 * output schema. Swapping `decodeBatch` for a real codec changes no
 * plumbing.
 */
object Multimodal {

  /** A media row: payload + typed metadata (what a manifest-backed
    * media lake scan would produce). */
  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String, n_bytes: Int)

  /** Extracted features for one media payload. `thumb_md5` is the
    * checksum of the STUB-resized payload (every 4th byte — the 1-D
    * stand-in for a thumbnail/downsample; a real resize slots into
    * the same per-batch decode hook and the plumbing is unchanged). */
  final case class MediaFeature(
      doc_id: Long, n_bytes: Int, byte_sum: Long, width: Int, height: Int,
      thumb_md5: String, batch_id: Int)

  /** Media table synthesized from documents: UTF-8 payload bytes +
    * metadata. A real pipeline reads (path, bytes, mime) from a
    * manifest; the schema and downstream plumbing are identical.
    *
    * The m01–m03 DuckDB oracles slice and checksum the VARCHAR by
    * CHARACTERS (DuckDB has no BLOB substring/md5), while Spark
    * slices the binary payload by BYTES — equivalent only while every
    * doc is pure ASCII. That assumption is load-bearing for the hash
    * gate, so it is asserted per row here: a non-ASCII doc fails the
    * job loudly instead of silently hash-diverging. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(octet_length(payload) === length(col("text")), payload)
        .otherwise(raise_error(concat(
          lit("mediaTable: non-ASCII text in doc_id="), col("doc_id"),
          lit(" (m01-m03 oracles assume byte==char slicing)")))).as("media"),
      lit("text/plain").as("mime"),
      octet_length(payload).as("n_bytes"))
  }

  /**
   * STUB decoder for one batch. Real decoders go here (one codec
   * init per batch); the fake emits deterministic pseudo-dimensions
   * from the payload hash and a byte checksum standing in for pixel
   * statistics.
   */
  private def decodeBatch(batch: Seq[MediaRow], batchId: Int): Seq[MediaFeature] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.media.length) { sum += (r.media(i) & 0xff); i += 1 }
      val h = scala.util.hashing.MurmurHash3.bytesHash(r.media, 42)
      // stub resize: keep every 4th byte (deterministic, per-row —
      // batching/partitioning cannot change it)
      val thumb = Array.tabulate((r.media.length + 3) / 4)(j => r.media(j * 4))
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(thumb)
        .map("%02x".format(_)).mkString
      MediaFeature(r.doc_id, r.media.length, sum,
        width = 64 + (h & 0x3f), height = 64 + ((h >>> 8) & 0x3f), md5, batchId)
    }

  /** Batched per-partition feature extraction: groups the partition
    * iterator into fixed-size batches (bounded memory), decodes each
    * batch, streams features out. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
          decodeBatch(batch, bi)
        }
      }
  }

  /** m01: metadata + checksum features (the SQL-expressible subset —
    * the full stub output incl. pseudo-dimensions is spec-checked). */
  def m01Multimodal(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("n_bytes"), col("byte_sum"))
      .orderBy("doc_id")

  /**
   * Per-modality catalog profile — the first query any multimodal
   * pipeline runs (size budgeting, shard planning, codec mix): one
   * map-side-combined aggregate over the catalog, |modalities| rows
   * out, no second pass. Modalities here are synthesized
   * deterministically from the id (the test corpus is text-only);
   * with a real mime column the plan is unchanged.
   */
  def mediaStats(media: DataFrame): DataFrame =
    media
      .groupBy("mime")
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        round(avg(col("n_bytes")), 4).as("avg_bytes"),
        max(col("n_bytes")).as("max_bytes"))

  /** m04: modality-profiled catalog (synthetic 4-way mime mix). */
  def m04MediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaStats(mediaTable(spark, dir).withColumn("mime",
      element_at(array(lit("audio/wav"), lit("image/jpeg"), lit("text/plain"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int"))))
      .orderBy("mime")

  /**
   * Fixed-size chunking of a binary payload column — the media
   * counterpart of c02's shard packing: split each payload into
   * `chunkBytes`-sized pieces (training-window/codec-frame prep) as a
   * pure generate+projection plan. `substring` slices BinaryType by
   * BYTES; no decode, no shuffle — chunking 100 TB of media is one
   * scan.
   */
  def chunkMedia(media: DataFrame, chunkBytes: Int): DataFrame =
    media
      .withColumn("chunk_idx", explode(sequence(
        lit(0), greatest(ceil(col("n_bytes") / chunkBytes.toDouble).cast("int") - 1, lit(0)))))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substring(media, chunk_idx * $chunkBytes + 1, $chunkBytes)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        octet_length(col("chunk")).as("chunk_bytes"),
        md5(col("chunk")).as("chunk_md5"))

  /**
   * Deterministic frame sampling — the video/audio keyframe-selection
   * shape: treat each `frameBytes` slice as a frame, keep every
   * `stride`-th frame PLUS the final one (so short payloads and
   * trailing content are always represented). The filter runs on the
   * generated index BEFORE the byte slice and checksum project, so
   * skipped frames cost nothing; like m02 this is scan → generate →
   * filter → project, no shuffle — sampling 100 TB of media is one
   * pass. A real decoder would replace the byte slicing behind the
   * same (doc, frame_idx) contract (the m01 stub boundary).
   */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0,
      s"sampleFrames: frameBytes and stride must be positive, got $frameBytes/$stride")
    media
      .withColumn("__nf", greatest(
        ceil(col("n_bytes") / frameBytes.toDouble).cast("int"), lit(1)))
      .withColumn("frame_idx", explode(sequence(lit(0), col("__nf") - 1)))
      .filter(col("frame_idx") % stride === 0 || col("frame_idx") === col("__nf") - 1)
      .select(col("doc_id"), col("frame_idx"),
        octet_length(expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_bytes"),
        md5(expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_md5"))
  }

  /** m03: every 4th 256-byte frame of each payload, plus the last. */
  def m03FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), frameBytes = 256, stride = 4)
      .orderBy("doc_id", "frame_idx")

  /** m02: 256-byte chunks of every media payload with per-chunk
    * checksums. */
  def m02Chunk(spark: SparkSession, dir: String): DataFrame =
    chunkMedia(mediaTable(spark, dir), 256)
      .orderBy("doc_id", "chunk_idx")

  /** Text is ASCII, so byte_sum ≡ codepoint sum in DuckDB (and string
    * substrings ≡ byte slices for m02). */
  val oracleSql: Map[String, String] = Map(
    "m04_media_stats" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 'audio/wav' WHEN 1 THEN 'image/jpeg'
        |      WHEN 2 THEN 'text/plain' ELSE 'video/mp4' END AS mime
        |  FROM documents
        |)
        |SELECT mime, count(*) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  round(avg(n_bytes), 4) + 0 AS avg_bytes,
        |  CAST(max(n_bytes) AS INT) AS max_bytes
        |FROM m GROUP BY mime ORDER BY mime""".stripMargin,
    "m01_multimodal" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(string_split(text, ''), x -> ord(x))) AS BIGINT) AS byte_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_chunk" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    greatest(CAST(ceil(octet_length(encode(text)) / 256.0) AS INT), 1) AS nch
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, text, unnest(range(0, nch)) AS chunk_idx FROM c
        |)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(octet_length(encode(substring(text, CAST(chunk_idx * 256 + 1 AS INT), 256))) AS INT) AS chunk_bytes,
        |  md5(substring(text, CAST(chunk_idx * 256 + 1 AS INT), 256)) AS chunk_md5
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,
    "m03_frame_sample" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    greatest(CAST(ceil(octet_length(encode(text)) / 256.0) AS INT), 1) AS nf
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, text, nf, unnest(range(0, nf)) AS fi FROM c
        |)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(octet_length(encode(substring(text, CAST(fi * 256 + 1 AS INT), 256))) AS INT) AS frame_bytes,
        |  md5(substring(text, CAST(fi * 256 + 1 AS INT), 256)) AS frame_md5
        |FROM idx WHERE fi % 4 = 0 OR fi = nf - 1
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
