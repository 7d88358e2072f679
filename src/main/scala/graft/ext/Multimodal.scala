package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, with decode / feature-extract / frame-sample as
  * partition-batched transforms (north-star extension; the reference is
  * JSON-only).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (`fakeDecode`) over the payload bytes
  * — but everything Spark-side is real and tested: the binary column, the
  * metadata struct schema, the `mapPartitions` batch shape (the Scala
  * equivalent of `mapInPandas`: one iterator per partition, never one
  * driver round-trip per row), and the downstream joins/aggregations.
  * Payloads here are the utf-8 bytes of `documents.text`, so the DuckDB
  * oracle can recompute every derived value from the same bytes.
  *
  * Scale shape: media rows are processed partition-local (narrow map, no
  * shuffle); metadata-only queries prune the payload column at the parquet
  * scan, so "count frames per format" never reads the bytes.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Output row of the feature-extract stub. */
  case class MediaFeatures(
    doc_id: Long, n_bytes: Long, fmt: String,
    f0: Double, f1: Double, f2: Double, f3: Double)

  /** Media table: (doc_id, payload binary, meta struct). */
  def media(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        // STUB: a real pipeline stores the container format sniffed from
        // magic bytes; the corpus is text, so tag it deterministically.
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("wav").as("fmt"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("checksum")).as("meta"))

  /** DECODE STUB — deterministic fake for the codec step (no image/audio
    * libs in this container). Real shape: per-partition batch iterator,
    * byte-level access, fixed-width feature vector out. The four features
    * are chunk-mean byte values over payload quarters — reproducible from
    * the bytes by any engine, standing in for pixel/sample statistics. */
  def fakeDecode(it: Iterator[Row]): Iterator[MediaFeatures] =
    it.map { r =>
      val id = r.getLong(0)
      val payload = r.getAs[Array[Byte]](1)
      val fmt = r.getStruct(2).getString(0)
      val n = payload.length
      val q = n / 4
      def chunkMean(c: Int): Double =
        if (q == 0) 0.0
        else {
          var sum = 0L
          var i = c * q
          while (i < (c + 1) * q) { sum += payload(i) & 0xff; i += 1 }
          sum.toDouble / q
        }
      MediaFeatures(id, n.toLong, fmt, chunkMean(0), chunkMean(1), chunkMean(2), chunkMean(3))
    }

  // ---------------------------------------------------------------- m1
  /** Metadata extraction: payload-free scan of the media table (column
    * pruning keeps the bytes out of the plan). */
  private def m1(s: SparkSession, d: String): DataFrame =
    media(s, d).select(
      col("doc_id"), col("meta.fmt").as("fmt"),
      col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
      .orderBy(col("doc_id"))

  private val m1Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
      |  strlen(text) AS n_bytes, md5(text) AS checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m2
  /** Feature extraction through the partition-batched decode stub, then a
    * normal relational aggregation over the typed result. */
  private def m2(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    media(s, d).mapPartitions(fakeDecode).toDF()
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("f0")).as("min_f0"),
        max(col("f3")).as("max_f3"))
      .orderBy(col("fmt"))
  }

  private val m2Sql =
    """WITH feats AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'png'
      |         WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
      |    strlen(text) AS n_bytes,
      |    strlen(text) // 4 AS q, text
      |  FROM documents),
      |chunked AS (
      |  SELECT doc_id, fmt, n_bytes,
      |    CASE WHEN q = 0 THEN 0.0 ELSE
      |      CAST(list_sum(list_transform(regexp_split_to_array(substr(text, 1, CAST(q AS INTEGER)), ''), c -> ascii(c))) AS DOUBLE) / q END AS f0,
      |    CASE WHEN q = 0 THEN 0.0 ELSE
      |      CAST(list_sum(list_transform(regexp_split_to_array(substr(text, CAST(3*q+1 AS INTEGER), CAST(q AS INTEGER)), ''), c -> ascii(c))) AS DOUBLE) / q END AS f3
      |  FROM feats)
      |SELECT fmt, COUNT(*) AS n_media, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  MIN(f0) AS min_f0, MAX(f3) AS max_f3
      |FROM chunked GROUP BY fmt ORDER BY fmt""".stripMargin

  // ---------------------------------------------------------------- m3
  /** Frame sampling: every 50th byte of the payload (the frame stride),
    * reassembled as a sample string + its checksum — pure array expression,
    * partition-local. */
  private def m3(s: SparkSession, d: String): DataFrame = {
    val sampled = concat_ws("",
      transform(sequence(lit(1), greatest(col("meta.n_bytes").cast("int"), lit(1)), lit(50)),
        i => col("payload").cast("string").substr(i, lit(1))))
    media(s, d).select(
      col("doc_id"), sampled.as("sample"), md5(sampled).as("sample_checksum"),
      size(sequence(lit(1), greatest(col("meta.n_bytes").cast("int"), lit(1)), lit(50)))
        .cast("long").as("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val m3Sql =
    """WITH s AS (
      |  SELECT doc_id,
      |    list_aggregate(list_transform(range(1, strlen(text) + 1, 50),
      |      i -> substr(text, CAST(i AS INTEGER), 1)), 'string_agg', '') AS sample,
      |    len(range(1, strlen(text) + 1, 50)) AS n_frames
      |  FROM documents)
      |SELECT doc_id, sample, md5(sample) AS sample_checksum, n_frames
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- registry

  // ---------------------------------------------------------------- m4
  /** Modality budget accounting — what a training-data team actually
    * tracks per modality: document count, raw bytes, ESTIMATED tokens
    * under a declared per-modality cost model (images a flat 256
    * tokens/doc, audio bytes÷1000 — the model is the documented contract,
    * not a decode), and each modality's byte share in exact permille.
    * Metadata-only: one aggregation over the meta struct, payloads never
    * read (column pruning — the m1 property), then a 3-row window for the
    * shares. */
  private def m4(s: SparkSession, d: String): DataFrame = {
    val g = media(s, d)
      .groupBy(col("meta.fmt").as("fmt"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("meta.n_bytes")).as("total_bytes"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    g.withColumn("est_tokens",
        when(col("fmt").isin("png", "jpeg"), lit(256L) * col("n_docs"))
          .otherwise(expr("total_bytes DIV 1000")))
      .withColumn("_tb", sum(col("total_bytes")).over(wAll))
      .withColumn("share_pm", expr("total_bytes * 1000L DIV _tb"))
      .drop("_tb")
      .orderBy(col("fmt"))
  }

  private val m4Sql =
    """WITH m AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'png'
      |              WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |g AS (
      |  SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
      |  FROM m GROUP BY fmt)
      |SELECT fmt, n_docs, total_bytes,
      |  CASE WHEN fmt IN ('png', 'jpeg') THEN 256 * n_docs
      |       ELSE total_bytes // 1000 END AS est_tokens,
      |  total_bytes * 1000 // CAST(SUM(total_bytes) OVER () AS BIGINT) AS share_pm
      |FROM g ORDER BY fmt""".stripMargin

  // ---------------------------------------------------------------- m5
  /** Exact MEDIA dedup by payload checksum — the first pass every
    * multimodal pipeline runs (identical bytes re-crawled under new ids).
    * The corpus has no natural dups, so the query plants them
    * deterministically (every doc_id % 61 == 0 payload re-emitted under
    * id + max(doc_id) + 1 — a union, SQL-replayable), then dedups on the
    * metadata checksum the ingest already computed: one hash-groupBy on
    * the DIGEST (never the payload bytes — the shuffle carries 32-byte
    * hashes, not megabyte blobs, the property that matters at 100 TB),
    * keep-first by id, summary counts. */
  private def m5(s: SparkSession, d: String): DataFrame = {
    val base = media(s, d)
    // Planted ids shift by max(doc_id)+1 — NOT a constant — so they can
    // never collide with a real id at any scale factor (a constant shift
    // silently changes keep-first semantics once the corpus outgrows it,
    // and both engines would share the bug). One 1-row broadcast.
    val shift = broadcast(base.agg((max(col("doc_id")) + 1L).as("_shift")))
    val planted = base.unionByName(
      base.filter(col("doc_id") % 61 === 0).crossJoin(shift)
        .withColumn("doc_id", col("doc_id") + col("_shift")).drop("_shift"))
    planted
      .groupBy(col("meta.checksum").as("checksum"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_unique"),
        sum(col("n_copies")).as("n_total"),
        sum(col("n_copies") - 1).as("n_removed"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        max(col("keep_id")).as("max_keep"))
  }

  private val m5Sql =
    """WITH planted AS (
      |  SELECT doc_id, md5(text) AS checksum FROM documents
      |  UNION ALL
      |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), md5(text)
      |  FROM documents WHERE doc_id % 61 = 0),
      |g AS (SELECT checksum, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |      FROM planted GROUP BY checksum)
      |SELECT COUNT(*) AS n_unique, CAST(SUM(n_copies) AS BIGINT) AS n_total,
      |  CAST(SUM(n_copies - 1) AS BIGINT) AS n_removed,
      |  CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      |  MAX(keep_id) AS max_keep
      |FROM g""".stripMargin

  val queries: Map[String, Q] = Map(
    "m5_media_dedup" -> m5 _,
    "m1_media_meta" -> m1 _,
    "m2_decode_features" -> m2 _,
    "m3_frame_sample" -> m3 _,
    "m4_modality_budget" -> m4 _)

  val oracle: Map[String, String] = Map(
    "m5_media_dedup" -> m5Sql,
    "m1_media_meta" -> m1Sql,
    "m2_decode_features" -> m2Sql,
    "m3_frame_sample" -> m3Sql,
    "m4_modality_budget" -> m4Sql)
}
