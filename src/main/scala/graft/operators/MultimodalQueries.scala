package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{FrameSample, MediaBlob, MediaCodec, MediaFeatures}

/** Multimodal-column pipeline: opaque binary payloads + typed metadata,
  * processed with executor-side batched mapPartitions (the JVM analog of
  * a pandas-batch UDF: codec/model init amortized per batch, bytes never
  * leave the executor).
  *
  * The media table is derived deterministically from `documents` (the
  * payload is the UTF-8 text bytes; dims/frame counts are functions of
  * doc_id), so the stubbed decode has a bit-exact SQL oracle while the
  * Spark side genuinely round-trips binary: encode → BinaryType column →
  * batch decode over Array[Byte].
  *
  * Scale: all three queries are embarrassingly parallel maps; the only
  * care needed at 100 TB is batch size (fixed rows per decode call) and
  * payload-size skew — metadata columns let Catalyst filter (e.g.
  * media_type = 'video') before any payload byte is touched.
  */
object MultimodalQueries {

  val BatchSize = 64

  /** Deterministic media table derived from documents. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaBlob] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaBlob(
          doc_id = id,
          media_type = mt,
          width = 32 + (id % 8).toInt * 16,
          height = 32 + (id % 5).toInt * 16,
          n_frames = 1 + (id % 7).toInt,
          data = text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** DuckDB fragments for the metadata derivation above. */
  private val WidthSql = "(32 + (doc_id % 8) * 16)"
  private val HeightSql = "(32 + (doc_id % 5) * 16)"
  private val FramesSql = "(1 + (doc_id % 7))"
  private val TypeSql =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
  /** Byte-value list of the ASCII payload. */
  private val BytesSql = "list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"

  // ------------------------------------------------------- mm_features
  /** Batched decode: fixed-size batches inside each partition, one
    * decodeBatch call per batch (batch shape is part of the contract —
    * see MultimodalQueriesSpec). */
  def mmFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .mapPartitions(_.grouped(BatchSize).flatMap(b => MediaCodec.decodeBatch(b)))
      .toDF()
  }

  val mmFeaturesSql: String =
    s"""SELECT doc_id, $TypeSql AS media_type,
       |  CAST(length(text) AS BIGINT) AS n_bytes,
       |  CAST(list_sum($BytesSql) AS BIGINT) AS sum_bytes,
       |  CAST(list_min($BytesSql) AS INTEGER) AS min_byte,
       |  CAST(list_max($BytesSql) AS INTEGER) AS max_byte,
       |  CAST(list_sum($BytesSql) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS mean_byte
       |FROM documents""".stripMargin

  // ------------------------------------------------------- mm_resize
  /** Stub resize of image payloads: metadata update + payload truncation
    * to the new pixel budget; only images are touched (metadata filter
    * happens before any payload byte is read). */
  def mmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(_.media_type == "image")
      .map(MediaCodec.resize)
      .map(b => (b.doc_id, b.width, b.height, b.data.length.toLong))
      .toDF("doc_id", "new_width", "new_height", "payload_bytes")
  }

  val mmResizeSql: String =
    s"""SELECT doc_id,
       |  CAST(greatest($WidthSql // 2, 1) AS INTEGER) AS new_width,
       |  CAST(greatest($HeightSql // 2, 1) AS INTEGER) AS new_height,
       |  CAST(least(length(text),
       |    greatest($WidthSql // 2, 1) * greatest($HeightSql // 2, 1)) AS BIGINT) AS payload_bytes
       |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  // --------------------------------------------------- mm_frame_sample
  /** Frame sampling of video payloads: slice into n_frames equal frames,
    * keep every 2nd frame. Real byte slicing on the Spark side; the
    * oracle reproduces the arithmetic. */
  def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(_.media_type == "video")
      .map(b => MediaCodec.sampleFrames(b, stride = 2))
      .toDF()
  }

  val mmFrameSampleSql: String =
    s"""SELECT doc_id, CAST($FramesSql AS INTEGER) AS n_frames,
       |  length(text) // $FramesSql AS frame_len,
       |  CAST(($FramesSql + 1) // 2 AS INTEGER) AS n_sampled,
       |  (($FramesSql + 1) // 2) * (length(text) // $FramesSql) AS sampled_bytes
       |FROM documents WHERE doc_id % 3 = 2""".stripMargin

  // ---------------------------------------------------- mm_dup_groups
  /** Duplicate screening over OPAQUE BINARY payloads by HEAD-BLOCK
    * fingerprint: fold the first [[HeadBytes]] payload bytes into a
    * portable int64 hash on the executor (bytes never leave it), then
    * group — collision groups report copy count and canonical (min)
    * doc. This is the standard cheap first pass of binary dedup (file
    * stores and image pipelines screen on a head block before any
    * full-content compare); identical-prefix payloads collide
    * regardless of metadata, catching both exact copies and
    * truncated/re-encoded-tail variants.
    *
    * The byte fold is the same recurrence as `char_fold_hash`
    * (h·131 + byte mod HashFunctions.P); payloads here are ASCII, so
    * the oracle reuses the char-level SQL fold on the same prefix —
    * bit-identical.
    *
    * Scale shape: per-row map over a CONSTANT 64-byte prefix (a scan
    * that never touches the payload tail), then a hash-keyed count —
    * the shuffle carries (hash, id) pairs only, never payload bytes. */
  private val HeadBytes = 64

  def mmDupGroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .map(b => (b.doc_id,
        b.data.take(HeadBytes)
          .foldLeft(0L)((h, x) => (h * 131 + (x & 0xff)) % graft.functions.HashFunctions.P)))
      .toDF("doc_id", "payload_h")
      .groupBy(col("payload_h"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_copies") >= 2)
  }

  val mmDupGroupsSql: String =
    s"""SELECT ${graft.functions.HashFunctions.charFoldHashSql(s"substr(text, 1, $HeadBytes)")} AS payload_h,
       |  CAST(count(*) AS BIGINT) AS n_copies,
       |  min(doc_id) AS canonical_doc
       |FROM documents
       |GROUP BY 1 HAVING count(*) >= 2""".stripMargin

  // ----------------------------------------------------- mm_shard_layout
  /** Training-shard layout: pack media payloads into fixed-byte-budget
    * shards — the step that turns a row-per-blob table into the
    * sequential shard files a training loader streams. Packing is
    * BLOCK-LOCAL by design: docs are first cut into fixed doc_id blocks,
    * and the running-byte-sum window that assigns shard numbers runs
    * within (media_type, block) — thousands of independent bounded
    * groups, so no global sort exists anywhere. (A corpus-wide running
    * sum would serialize the layout through one partition at 100 TB;
    * block-local packing is what real shard writers do, at the cost of
    * one under-filled trailing shard per block.)
    *
    * Shard id = exclusive-prefix bytes div budget: integral arithmetic
    * on both engines, so boundaries are bit-portable. */
  def mmShardLayout(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = mediaTable(s, d).select(
      col("doc_id"), col("media_type"),
      expr(s"doc_id div $ShardBlockDocs").as("block"),
      length(col("data")).cast("long").as("nbytes"))
    val w = Window.partitionBy(col("media_type"), col("block"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    m.withColumn("prefix", coalesce(sum(col("nbytes")).over(w), lit(0L)))
      .withColumn("shard", expr(s"prefix div $ShardBytes"))
      .groupBy(col("media_type"), col("block"), col("shard"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("nbytes")).as("total_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  private val ShardBlockDocs = 1024
  private val ShardBytes = 4096

  val mmShardLayoutSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, $TypeSql AS media_type,
       |    doc_id // $ShardBlockDocs AS block,
       |    CAST(strlen(text) AS BIGINT) AS nbytes
       |  FROM documents),
       |x AS (
       |  SELECT media_type, block, doc_id, nbytes,
       |    CAST(coalesce(sum(nbytes) OVER (
       |      PARTITION BY media_type, block ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      // $ShardBytes AS shard
       |  FROM m)
       |SELECT media_type, block, shard,
       |  CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum(nbytes) AS BIGINT) AS total_bytes,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM x GROUP BY media_type, block, shard""".stripMargin

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features"     -> (mmFeatures _),
    "mm_resize"       -> (mmResize _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_dup_groups"   -> (mmDupGroups _),
    "mm_shard_layout" -> (mmShardLayout _),
  )

  val oracleSql: Map[String, String] = Map(
    "mm_features"     -> mmFeaturesSql,
    "mm_resize"       -> mmResizeSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_dup_groups"   -> mmDupGroupsSql,
    "mm_shard_layout" -> mmShardLayoutSql,
  )
}
