package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal binary-column plumbing (SURVEY.md §2 #30).
  *
  * Media payloads are opaque `binary` columns with typed metadata. Here the
  * "payload" is the UTF-8 encoding of the document text (the container has
  * no media libs), and the decode step is a deterministic stub — but the
  * Spark-side plumbing (binary column, byte length, digest, derived
  * dimensions, batched partition-wise processing in BinaryPipeline) is real.
  */
object MultimodalQueries {

  /** #30 Binary metadata projection: encode→bytes→digest→stub-decoded dims. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        octet_length(bin).cast("long").as("byte_len"),
        md5(col("text")).as("digest"),
        col("source"))
      // stubbed deterministic "decode": dimensions derived from payload size
      // and id — stands in for image decode (width/height/frames).
      .withColumn("width", lit(32L) + col("byte_len") % 64)
      .withColumn("height", lit(32L) + col("doc_id") % 48)
      .withColumn("n_frames", lit(1L) + col("doc_id") % 3)
      .withColumn("media_type",
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")))
      .orderBy(col("doc_id"))
  }

  /** #30b Frame sampling: one row per sampled frame of each "video" payload.
    * The payload is chunked into `n_frames` equal character ranges and every
    * `Stride`-th frame is materialized with its range and content digest —
    * the exact row shape a real ffmpeg-backed `mapPartitions` decode would
    * emit (BinaryPipeline holds the batched plumbing). Explode is the only
    * row-multiplier; everything else is map-side arithmetic, so the plan is
    * scan → project → generate with no shuffle. */
  val Stride = 4L

  /** Sampled frames WITHOUT the presentation sort — the shared producer:
    * frameSample adds the global orderBy for its own output contract;
    * frameOverlap consumes the unsorted rows (its distinct/join would
    * destroy the sort anyway, so paying the range-partition Exchange there
    * would be pure waste). */
  private def sampledFrames(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("chars"),
        (lit(8L) + col("doc_id") % 25).as("n_frames"))
    base
      .select(col("doc_id"), col("text"), col("chars"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(Stride))).as("frame_idx"))
      .withColumn("start_pos", expr("1 + (frame_idx * chars) div n_frames"))
      .withColumn("end_pos", expr("((frame_idx + 1) * chars) div n_frames"))
      .withColumn("frame_digest",
        md5(expr("substring(text, int(start_pos), int(greatest(0, end_pos - start_pos + 1)))")))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("start_pos"), col("end_pos"), col("frame_digest"))
  }

  def frameSample(s: SparkSession, dir: String): DataFrame =
    sampledFrames(s, dir).orderBy(col("doc_id"), col("frame_idx"))

  /** #30d Frame-overlap video near-dup: pairs of "videos" sharing at least
    * `MinSharedFrames` sampled-frame content digests (a shared frame is
    * tens of identical content bytes — already strong evidence; the
    * emitted count lets consumers apply a stricter cut) — the frame-level
    * complement to `mm_phash_neardup`'s whole-payload fingerprint (same
    * footage re-cut or re-containered shares frames even when the payload
    * bytes diverge). Per-doc digests are DISTINCT first (a video repeating
    * a frame internally must not inflate the pair count), then the
    * self-join keys on the digest — uniform md5 keys, only genuinely
    * matching frames ever join, no all-pairs scan. With a real decoder the
    * digest becomes a per-frame perceptual hash; the join shape is
    * unchanged. */
  val MinSharedFrames = 1L

  def frameOverlap(s: SparkSession, dir: String): DataFrame = {
    val frames = sampledFrames(s, dir).select(col("doc_id"), col("frame_digest")).distinct()
    val a = frames.select(col("doc_id").as("a_id"), col("frame_digest"))
    val b = frames.select(col("doc_id").as("b_id"), col("frame_digest"))
    a.join(b, "frame_digest")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= MinSharedFrames)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** #30e Media curation gate — the LAION-style keep/drop verdict over the
    * decoded metadata (the `text_gopher_filter` pattern for media): size
    * floors, aspect-ratio bounds, payload floor, and exact-duplicate
    * payloads (digest groupBy, min-id keeper survives — every later copy
    * is a drop reason). Each failed rule lands in an auditable reasons
    * list. Scale: metadata rules are pure map-side projections; the dup
    * check is one map-side-combinable digest aggregate joined back on
    * uniform md5 keys — the only exchange. */
  def qualityGate(s: SparkSession, dir: String): DataFrame = {
    val meta = graft.CacheRegistry.track(
      binaryMeta(s, dir).select(col("doc_id"), col("media_type"),
        col("byte_len"), col("width"), col("height"), col("digest")))
    val dup = meta.groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))
    meta.join(dup, Seq("digest"))
      .withColumn("reasons", concat_ws("|",
        when(col("width") < 64 || col("height") < 40, lit("too_small")),
        when(col("width") > col("height") * 2 || col("height") > col("width") * 2,
          lit("bad_aspect")),
        when(col("byte_len") < 120, lit("payload_too_small")),
        when(col("n_copies") > 1 && col("doc_id") =!= col("keeper_id"),
          lit("duplicate_payload"))))
      .withColumn("keep", col("reasons") === "")
      .select("doc_id", "media_type", "byte_len", "width", "height", "keep", "reasons")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (binaryMeta _),
    "mm_frame_sample" -> (frameSample _),
    "mm_quality_gate" -> (qualityGate _),
    "mm_frame_overlap" -> (frameOverlap _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len, md5(text) AS digest, source,
        | 32 + octet_length(encode(text))::BIGINT % 64 AS width,
        | 32 + doc_id % 48 AS height,
        | 1 + doc_id % 3 AS n_frames,
        | CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_quality_gate" ->
      """WITH m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
        |   ELSE 'video' END AS media_type,
        |  octet_length(encode(text))::BIGINT AS byte_len,
        |  32 + octet_length(encode(text))::BIGINT % 64 AS width,
        |  32 + doc_id % 48 AS height,
        |  md5(text) AS digest
        | FROM documents),
        |d AS (SELECT digest, count(*) AS n_copies, min(doc_id) AS keeper_id
        | FROM m GROUP BY digest),
        |r AS (SELECT m.*, concat_ws('|',
        |  CASE WHEN m.width < 64 OR m.height < 40 THEN 'too_small' END,
        |  CASE WHEN m.width > m.height * 2 OR m.height > m.width * 2 THEN 'bad_aspect' END,
        |  CASE WHEN m.byte_len < 120 THEN 'payload_too_small' END,
        |  CASE WHEN d.n_copies > 1 AND m.doc_id != d.keeper_id THEN 'duplicate_payload' END
        | ) AS reasons
        | FROM m JOIN d USING (digest))
        |SELECT doc_id, media_type, byte_len, width, height,
        | (reasons = '') AS keep, reasons
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH $frameCteSql
         |SELECT doc_id, frame_idx, n_frames, start_pos, end_pos,
         | md5(substr(text, start_pos::INT, greatest(0, end_pos - start_pos + 1)::INT)) AS frame_digest
         |FROM g ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_frame_overlap" ->
      s"""WITH $frameCteSql,
         |fd AS (SELECT DISTINCT doc_id,
         |  md5(substr(text, start_pos::INT, greatest(0, end_pos - start_pos + 1)::INT)) AS digest
         | FROM g)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS shared_frames
         |FROM fd a JOIN fd b ON a.digest = b.digest AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $MinSharedFrames
         |ORDER BY a_id, b_id""".stripMargin)

  /** The sampled-frame CTE (relation `g`: doc_id, frame_idx, n_frames,
    * start/end positions, text) shared by the mm_frame_sample and
    * mm_frame_overlap oracles so the frame geometry cannot drift. */
  private def frameCteSql: String =
    s"""v AS (
       | SELECT doc_id, text, length(text)::BIGINT AS chars, 8 + doc_id % 25 AS n_frames
       | FROM documents WHERE doc_id % 3 = 2),
       |f AS (
       | SELECT doc_id, text, chars, n_frames, unnest(range(0, n_frames, $Stride)) AS frame_idx
       | FROM v),
       |g AS (
       | SELECT doc_id, frame_idx, n_frames, text,
       |  1 + (frame_idx * chars) // n_frames AS start_pos,
       |  ((frame_idx + 1) * chars) // n_frames AS end_pos
       | FROM f)""".stripMargin
}
