package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal

/** Driver-checked multimodal queries (SURVEY §2 #38): the binary-column
  * pipeline under the DuckDB oracle, not just ScalaTest.
  *
  * No media files exist in this environment, so the media table is derived
  * DETERMINISTICALLY from `documents`: payload = real magic header (jpeg /
  * riff-wav / mp4-ftyp, by source doc id mod 3) ++ utf-8 text bytes. Both
  * engines build the identical bytes via unhex(headerhex) || encode(text),
  * so payload-level operations are fully hash-comparable. The duplicate
  * slice mirrors the dedup_exact staging simulation (doc_id % 7 == 0
  * re-ingested under a shifted id, SAME source header).
  *
  * `media_dedup` exercises the two payload-level operators that need no
  * codec: exact payload dedup (fingerprint = md5 of the byte content) and
  * magic-byte modality sniffing ([[Multimodal.sniffModality]], a codegen'd
  * column expression — the oracle mirrors it arithmetically as the
  * header-choice CASE, so a sniff bug would hash-mismatch).
  *
  * Scale posture: one hash shuffle on the uniform 32-hex fingerprint, same
  * as dedup_exact; the fingerprint projection is scan-bound and codegen'd.
  * At 100 TB the md5 runs over payload bytes already in memory from the
  * scan — no extra pass, no collect, no skew (hash keys are uniform).
  */
object MediaOps {

  private val HeaderHex = Map(
    0 -> "FFD8FFE0",                 // jpeg SOI + APP0
    1 -> "524946460000000057415645", // 'RIFF' + size + 'WAVE' form type
    2 -> "0000001866747970"          // mp4 size-24 'ftyp' box
  )

  /** Deterministic staged media: documents ∪ re-ingested slice, binary
    * payload with a per-source-doc magic header. */
  private def stagedMedia(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val staged = d
      .select(col("doc_id").as("media_id"), col("doc_id").as("src_doc"), col("text"))
      .unionAll(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000L).as("media_id"), col("doc_id").as("src_doc"), col("text")))
    val header = when(col("src_doc") % 3 === 0, unhex(lit(HeaderHex(0))))
      .when(col("src_doc") % 3 === 1, unhex(lit(HeaderHex(1))))
      .otherwise(unhex(lit(HeaderHex(2))))
    staged.select(
      col("media_id"),
      concat(header, encode(col("text"), "UTF-8")).as("payload"))
  }

  /** #38: exact media dedup over the binary payload + sniffed modality.
    * Duplicate groups (same bytes) with canonical id and multiplicity. */
  def mediaDedup(s: SparkSession, dir: String): DataFrame =
    stagedMedia(s, dir)
      .select(
        col("media_id"),
        Multimodal.sniffModality(col("payload")).as("modality"),
        // md5 over HEX, not raw bytes: DuckDB's md5 only accepts VARCHAR
        // (no BLOB overload), so the hex image is the cross-engine bridge
        // the oracle hash-compare needs — the 2× hash input is the price
        // of an exact twin, paid identically by both engines
        md5(hex(col("payload"))).as("fingerprint"))
      .groupBy(col("fingerprint"), col("modality"))
      .agg(min(col("media_id")).as("canonical_media_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  val mediaDedupSql: String =
    s"""WITH staged AS (
       |  SELECT doc_id AS media_id, doc_id AS src_doc, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS media_id, doc_id AS src_doc, text
       |  FROM documents WHERE doc_id % 7 = 0),
       | media AS (
       |  SELECT media_id, src_doc,
       |         (CASE src_doc % 3
       |            WHEN 0 THEN unhex('${HeaderHex(0)}')
       |            WHEN 1 THEN unhex('${HeaderHex(1)}')
       |            ELSE unhex('${HeaderHex(2)}') END) || encode(text) AS payload
       |  FROM staged)
       |SELECT md5(hex(payload)) AS fingerprint,
       |       CASE src_doc % 3
       |         WHEN 0 THEN 'image/jpeg'
       |         WHEN 1 THEN 'audio/wav'
       |         ELSE 'video/mp4' END AS modality,
       |       min(media_id) AS canonical_media_id,
       |       count(*) AS n_copies
       |FROM media
       |GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin

  private val NFrames = 4

  /** #38 (frame sampling): the video frame-sample fan-out
    * ([[Multimodal.sampleFrames]] — flatMap, one row per sampled frame, no
    * shuffle) under the driver's oracle. The STUB decode's feature vector is
    * not SQL-expressible, but the sampling GEOMETRY — which frames, which
    * byte windows, how many bytes each — is pure arithmetic on payload
    * length, so the distributed fan-out itself is verified cross-engine. */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    val media = stagedMedia(s, dir)
      .withColumn(
        "modality",
        when(Multimodal.sniffModality(col("payload")) === "video/mp4", "video").otherwise("other"))
    Multimodal.sampleFrames(media, NFrames)
      .select(col("media_id"), col("frame_idx"), col("n_bytes"))
  }

  val mediaFramesSql: String =
    s"""WITH staged AS (
       |  SELECT doc_id AS media_id, doc_id AS src_doc, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS media_id, doc_id AS src_doc, text
       |  FROM documents WHERE doc_id % 7 = 0),
       | video AS (
       |  SELECT media_id,
       |         octet_length(unhex('${HeaderHex(2)}') || encode(text)) AS len
       |  FROM staged WHERE src_doc % 3 = 2),
       | f AS (
       |  SELECT media_id, CAST(i AS INTEGER) AS frame_idx, len,
       |         greatest(1, len // $NFrames) AS w
       |  FROM video, unnest(range(0, $NFrames)) AS t(i)),
       | g AS (
       |  SELECT media_id, frame_idx, len, w,
       |         least(frame_idx * w, greatest(0, len - 1)) AS strt
       |  FROM f)
       |SELECT media_id, frame_idx,
       |       CAST(least(strt + w, len) - strt AS INTEGER) AS n_bytes
       |FROM g""".stripMargin

  private val AudioRate = 8000

  final case class AudioMeta(
      media_id: Long, modality: String, sample_rate: Long, n_samples: Long,
      duration_ms: Long, amp_sum: Long)

  /** #38 (audio decode): REAL `javax.sound.sampled` WAV decode under the
    * DuckDB oracle. Payloads are genuine RIFF/WAVE PCM16 files synthesized
    * deterministically from `documents` (doc_id-seeded sample formula, n =
    * 1 + doc_id % 400 samples at 8 kHz) — the decoder must parse the
    * container for real to recover sample rate, frame count, duration and
    * the exact integer SUM |sample|, while the oracle replays those same
    * values as pure arithmetic on the formula, never touching bytes. A
    * header-parse or sample-extraction bug hash-mismatches. Decode runs
    * iterator-to-iterator per partition; nothing shuffles before the agg. */
  def mediaAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The decode is CPU-bound while the input is a single narrow column —
    // a small parquet can arrive as ONE scan split and serialize the whole
    // codec pass onto one core. Redistribute the 8-byte ids across the
    // cluster before the heavy per-row work (the shuffle is id-sized,
    // the speedup is core-count-sized; at 100 TB the scan is already
    // many-split and this repartition is a near-no-op pass-through).
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val n = (1 + id % 400).toInt
          val samples = Array.tabulate[Short](n)(i => (((id * 31 + i.toLong * 7) % 251) - 125).toShort)
          val wav = Multimodal.wavPcm16(samples, AudioRate)
          val d = Multimodal.decodeAudio(wav).getOrElse(
            sys.error(s"media_audio: WAV for doc $id failed to decode"))
          AudioMeta(id, "audio/wav", d.sampleRate.toLong, d.nSamples, d.durationMs, d.ampSum)
        }
      }
      .toDF()
  }

  val mediaAudioSql: String =
    s"""WITH d AS (SELECT doc_id, 1 + doc_id % 400 AS n FROM documents),
       | s AS (SELECT doc_id, n, i FROM d, unnest(range(0, n)) AS t(i))
       |SELECT doc_id AS media_id, 'audio/wav' AS modality,
       |       CAST($AudioRate AS BIGINT) AS sample_rate,
       |       CAST(n AS BIGINT) AS n_samples,
       |       CAST(n * 1000 // $AudioRate AS BIGINT) AS duration_ms,
       |       CAST(SUM(ABS((doc_id * 31 + i * 7) % 251 - 125)) AS BIGINT) AS amp_sum
       |FROM s GROUP BY doc_id, n""".stripMargin

  private val VideoUsPerFrame = 100000L // 10 fps

  final case class VideoMeta(
      media_id: Long, frame_idx: Long, width: Long, height: Long,
      frame_w: Long, frame_h: Long, n_frames: Long, duration_ms: Long)

  /** #38 (video decode): REAL MJPEG-in-AVI decode under the DuckDB oracle —
    * the video twin of [[mediaAudio]]. Payloads are genuine AVI containers
    * synthesized deterministically from `documents` (doc_id-seeded: 1 +
    * doc_id % 8 frames of a solid-gray JPEG at 8+4·(doc_id%3) ×
    * 8+2·(doc_id%5) pixels, 10 fps), so the decoder must walk the RIFF
    * chunk tree, read avih geometry/timing, demux the movi `00dc` chunks
    * AND decode each JPEG for real to recover per-frame dimensions — while
    * the oracle replays the same values as pure arithmetic on the formula,
    * never touching bytes. A container-walk, header-parse or frame-decode
    * bug hash-mismatches (frame_w/frame_h come from the DECODED JPEG, the
    * header pair from avih — they only agree when both paths work). JPEG
    * luminance round-trip is quantization-lossy, so pixel VALUES are
    * spec-gated with tolerance (MultimodalSpec), not oracled. Decode runs
    * iterator-to-iterator per partition after an id-only repartition —
    * same CPU-bound-codec posture as media_audio. */
  def mediaVideo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.flatMap { id =>
          val n = (1 + id % 8).toInt
          val w = (8 + (id % 3) * 4).toInt
          val h = (8 + (id % 5) * 2).toInt
          val jpegs = (0 until n).map(i => Multimodal.jpegGray(((id * 31 + i * 7) % 251).toInt, w, h))
          val avi = Multimodal.aviMjpeg(jpegs, w, h, VideoUsPerFrame)
          val d = Multimodal.decodeVideo(avi).getOrElse(
            sys.error(s"media_video: AVI for doc $id failed to decode"))
          if (d.headerFrames != d.nFrames)
            sys.error(s"media_video: header/movi frame count mismatch for doc $id")
          d.frames.zipWithIndex.map { case (f, idx) =>
            VideoMeta(id, idx.toLong, d.width.toLong, d.height.toLong,
              f.width.toLong, f.height.toLong, d.nFrames.toLong, d.durationMs)
          }
        }
      }
      .toDF()
  }

  val mediaVideoSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, 1 + doc_id % 8 AS n,
       |         8 + (doc_id % 3) * 4 AS w, 8 + (doc_id % 5) * 2 AS h
       |  FROM documents),
       | f AS (SELECT doc_id, n, w, h, i FROM d, unnest(range(0, n)) AS t(i))
       |SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
       |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |       CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
       |       CAST(n AS BIGINT) AS n_frames,
       |       CAST(n * ${VideoUsPerFrame / 1000} AS BIGINT) AS duration_ms
       |FROM f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_dedup" -> (mediaDedup _),
    "media_frames" -> (mediaFrames _),
    "media_audio" -> (mediaAudio _),
    "media_video" -> (mediaVideo _)
  )

  val oracles: Map[String, String] = Map(
    "media_dedup" -> mediaDedupSql,
    "media_frames" -> mediaFramesSql,
    "media_audio" -> mediaAudioSql,
    "media_video" -> mediaVideoSql
  )
}
