package graft.ops

import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Tables.{table, tableFan}

/** Input row for the media pipeline: an opaque binary payload keyed by
  * doc_id — the carrier shape for image/audio/video bytes at scale.
  */
case class MediaIn(doc_id: Long, payload: Array[Byte])

/** Decoded-media metadata produced by the (stubbed) decoder. */
case class MediaOut(
    doc_id: Long,
    byte_len: Long,
    width: Long,
    height: Long,
    n_frames: Long,
    frame_digest: String)

/** Multimodal-column operator family: media as opaque `binary` columns
  * with typed metadata, decode/feature-extract as a per-partition batch
  * transform, frame sampling as a relational explode.
  *
  * The decode step is a DETERMINISTIC STUB (this container has no image
  * or audio codecs): `fakeDecode` derives metadata arithmetically from
  * the payload bytes where a real pipeline would call the codec. All the
  * Spark-side plumbing is real — binary column carriage, the typed
  * `Dataset.mapPartitions` batch shape (per-partition setup amortized
  * exactly like a model/codec handle would be), the metadata schema, and
  * the downstream relational ops. Swapping in a real decoder changes one
  * function body, not the pipeline.
  *
  * 100 TB posture: payloads never leave their partition (no shuffle
  * before the final presentation sort); per-partition batches keep
  * decoder setup off the per-row path; metadata, not media bytes, flows
  * into joins/aggregations downstream.
  */
object MultimodalQueries {

  /** The decode stub: deterministic pseudo-metadata from the raw bytes.
    * Real deployments replace the body with an actual codec call; the
    * MD5 "frame digest" stands in for extracted features and doubles as
    * an integrity check on the binary round-trip.
    */
  def fakeDecode(m: MediaIn, md: java.security.MessageDigest): MediaOut = {
    md.reset()
    val digest = md.digest(m.payload).map("%02x".format(_)).mkString
    val len = m.payload.length.toLong
    MediaOut(m.doc_id, len, 16 + len % 64, 16 + (len * 7) % 64, 1 + len % 8, digest)
  }

  // ---------------------------------------------------------------------
  // m01 — decode + feature-extract: text bytes stand in for media bytes
  // (`cast(text AS binary)` = the opaque payload). Typed mapPartitions:
  // one digest/codec handle per partition, streamed over the batch.
  // Oracle re-derives the same metadata arithmetically in DuckDB.
  // ---------------------------------------------------------------------
  val m01 = Q("m01_media_decode",
    """WITH dec AS (
      |  SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |    16 + octet_length(encode(text)) % 64 AS width,
      |    16 + (octet_length(encode(text)) * 7) % 64 AS height,
      |    1 + octet_length(encode(text)) % 8 AS n_frames,
      |    md5(text) AS frame_digest
      |  FROM documents)
      |SELECT doc_id, byte_len, width, height, n_frames, frame_digest,
      |  (width * 224) // greatest(width, height) AS resized_w,
      |  (height * 224) // greatest(width, height) AS resized_h
      |FROM dec ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    import spark.implicits._
    val decoded = tableFan(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map(m => fakeDecode(m, md))
      }
      .toDF()
    // "resize": fit the decoded dims into 224×224 preserving aspect —
    // pure metadata arithmetic downstream of the (stubbed) decode, the
    // shape a real pipeline uses to plan the actual pixel resize.
    // Exact integer floor division (`div` / DuckDB `//`): the double
    // route floor(d * (224.0/max)) lands on 223.999... for 4% of dims.
    decoded
      .withColumn("resized_w",
        expr("(width * 224) div greatest(width, height)"))
      .withColumn("resized_h",
        expr("(height * 224) div greatest(width, height)"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // m02 — frame sampling: expand each media item into its (stubbed)
  // frames relationally — sequence + explode, the generator shape — and
  // fingerprint each frame. Pure builtins: the expansion stays inside
  // whole-stage codegen and scales as a map-only op.
  // ---------------------------------------------------------------------
  val m02 = Q("m02_frame_sample",
    """WITH media AS (
      |  SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |    1 + octet_length(encode(text)) % 8 AS n_frames, text
      |  FROM documents)
      |SELECT doc_id, f.frame_id,
      |  md5(text || '#' || CAST(f.frame_id AS VARCHAR)) AS frame_hash
      |FROM media, LATERAL (
      |  SELECT unnest(generate_series(0, n_frames - 1)) AS frame_id) f
      |ORDER BY doc_id, f.frame_id""".stripMargin
  ) { (spark, dir) =>
    // octet_length (UTF-8 BYTE count), matching the oracle's
    // octet_length(encode(text)) — length() counts CHARACTERS and
    // diverges on any multi-byte text (the payload is bytes, so byte
    // count is also the semantically right "media size")
    tableFan(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        (lit(1) + octet_length(col("text")).cast("long") % 8).as("n_frames"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_id"))
      .select(col("doc_id"), col("frame_id"),
        md5(concat(col("text"), lit("#"), col("frame_id").cast("string"))
          .cast("binary")).as("frame_hash"))
      .orderBy("doc_id", "frame_id")
  }

  // ---------------------------------------------------------------------
  // m03 — media-level dedup on DECODED content: two media files with
  // identical frames are duplicates even when their container bytes
  // differ (re-mux, metadata edits), so the dedup key must be a digest
  // of the decoded frame sequence, not of the payload. Per-doc media
  // signature = md5 over the SORTED frame-digest list (order-canonical,
  // so frame storage order is irrelevant) → d01's hash-groupBy dedup on
  // the signature.
  //
  // The frame digests of one media item all derive from that item's own
  // row (a decoder emits the item's frame list in one call), so the
  // signature is computed WITHIN the row — transform over the frame-id
  // sequence, sort, concat, md5 — and the only relation that ever
  // shuffles is (doc_id, 32-byte sig). The previous form expanded
  // frames relationally and collected them back with an
  // explode → groupBy(doc_id) round-trip: a shuffle of every frame hash
  // (~4.5× corpus row count) plus an ObjectHashAggregate, carrying zero
  // information the source row didn't already have. Measured solo at
  // sf1 (adjacent windows, best-of-5): 0.98 s → 0.80-0.91 s,
  // bit-identical.
  // The higher-order ops (transform/array_sort) evaluate per-element
  // outside whole-stage codegen, but frames-per-item is bounded (≤8
  // here; real video sampling is equally bounded per item) so the
  // per-row cost is constant — at 100 TB this is a pure map over the
  // corpus followed by d01's bounded-shuffle dedup.
  // ---------------------------------------------------------------------
  val m03 = Q("m03_media_dedup",
    """WITH media AS (
      |  SELECT doc_id, 1 + octet_length(encode(text)) % 8 AS n_frames, text
      |  FROM documents),
      |frames AS (
      |  SELECT doc_id,
      |    md5(text || '#' || CAST(f.frame_id AS VARCHAR)) AS frame_hash
      |  FROM media, LATERAL (
      |    SELECT unnest(generate_series(0, n_frames - 1)) AS frame_id) f),
      |sigs AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list(frame_hash)), '')) AS media_sig
      |  FROM frames GROUP BY doc_id)
      |SELECT media_sig, min(doc_id) AS keep_doc_id, count(*) AS n_copies
      |FROM sigs GROUP BY media_sig ORDER BY media_sig""".stripMargin
  ) { (spark, dir) =>
    tableFan(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        (lit(1) + octet_length(col("text")).cast("long") % 8).as("n_frames"))
      .select(col("doc_id"),
        md5(concat_ws("",
          array_sort(transform(sequence(lit(0L), col("n_frames") - 1),
            fid => md5(concat(col("text"), lit("#"), fid.cast("string"))
              .cast("binary")))))
          .cast("binary")).as("media_sig"))
      .groupBy("media_sig")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("media_sig")
  }

  val all: Seq[Q] = Seq(m01, m02, m03)
}
