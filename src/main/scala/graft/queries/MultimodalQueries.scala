package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef.q

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata, and decode/feature-extract
  * runs imperatively per partition (the Spark-side pattern for wrapping a
  * native decoder). The container has no image/audio codecs, so the decoder
  * below is a clearly-marked deterministic STUB (md5 fingerprints + fixed
  * 32-byte "frame" sampling over the payload bytes) — the real part is the
  * plumbing: binary encoding, typed Dataset boundary, per-partition
  * stateful decoder instance, exploded frame output.
  */
object MultimodalQueries {

  /** One extracted "frame" of a media payload. */
  final case class FrameFeature(
      doc_id: Long,
      n_bytes: Long,
      fp: String,
      frame_idx: Int,
      frame_fp: String
  )

  /** STUB decoder: stands in for an image/video codec. Deterministic:
    * fingerprint = md5(payload); frames = md5 of consecutive 32-byte
    * slices (up to 4). A real deployment swaps this object for a JNI/FFI
    * codec with the same per-partition lifecycle. */
  private object StubDecoder {
    def decode(docId: Long, payload: Array[Byte], md: MessageDigest): Iterator[FrameFeature] = {
      def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
      md.reset()
      val fp = hex(md.digest(payload))
      (0 until 4).iterator
        .filter(i => i * 32 < payload.length)
        .map { i =>
          val slice = payload.slice(i * 32, math.min((i + 1) * 32, payload.length))
          md.reset()
          FrameFeature(docId, payload.length.toLong, fp, i, hex(md.digest(slice)))
        }
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // Binary ingest → per-partition decode → exploded typed frames.
    q(
      "q_multimodal_frames",
      """SELECT doc_id, length(text)::BIGINT AS n_bytes, md5(text) AS fp,
        |  i AS frame_idx, md5(substr(text, i * 32 + 1, 32)) AS frame_fp
        |FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g
        |WHERE i * 32 < length(text)""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // one decoder instance per partition — the native-codec lifecycle
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (id, payload) => StubDecoder.decode(id, payload, md) }
        }
        .toDF()
    },

    // Media metadata projection: the struct-typed envelope a media table
    // carries alongside the opaque payload (here synthesized
    // deterministically from the document), partition-pruned by format.
    q(
      "q_multimodal_meta",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'jpeg' WHEN doc_id % 3 = 1 THEN 'png' ELSE 'webp' END AS format,
        |  (32 + doc_id % 1920)::BIGINT AS width,
        |  (32 + doc_id % 1080)::BIGINT AS height,
        |  length(text)::BIGINT AS n_bytes
        |FROM documents WHERE doc_id % 3 <> 2""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          when(col("doc_id") % 3 === 0, "jpeg").when(col("doc_id") % 3 === 1, "png").otherwise("webp").as("format"),
          (lit(32) + col("doc_id") % 1920).cast("long").as("width"),
          (lit(32) + col("doc_id") % 1080).cast("long").as("height"),
          length(col("text")).cast("long").as("n_bytes")
        )
        .filter(col("format") =!= "webp")
    }
  )
}
