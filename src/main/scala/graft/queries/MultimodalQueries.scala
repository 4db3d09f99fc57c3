package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.Tables
import graft.media.MediaCodec
import QueryDef.q

/** Multimodal-column lane: media payloads ride through the engine as opaque
  * `binary` columns, and decode runs imperatively per partition (the
  * Spark-side pattern for wrapping a native decoder: one decoder instance
  * per partition, narrow stages, no shuffle).
  *
  * The containers are synthesized deterministically from the documents
  * table (the sandbox ships no media fixtures), but the decode is REAL
  * header parsing — `graft.media.MediaCodec` walks PNG chunks and JPEG
  * marker segments for dimensions/bit-depth/data-section, and the oracle
  * independently recomputes what the parser must find (geometry, container
  * size, frame fingerprints at the parsed data offset). A wrong parser
  * fails the oracle; pixel decoding would need a codec library and is the
  * one thing still out of scope.
  */
object MultimodalQueries {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  val defs: Seq[QueryDef] = Seq(

    // Binary ingest → real PNG header parse → frames sliced from the
    // PARSED IDAT data section → exploded typed rows. The frame offsets
    // come from the chunk walk, so a mis-parse shifts every fingerprint.
    q(
      "q_multimodal_frames",
      """SELECT doc_id, (32 + doc_id % 1920)::BIGINT AS width,
        |  (32 + doc_id % 1080)::BIGINT AS height,
        |  i AS frame_idx, md5(substr(text, (i * 32 + 1)::INT, 32)) AS frame_fp
        |FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g
        |WHERE i * 32 < length(text)""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .map { case (id, data) =>
          (id, MediaCodec.encodePng((32 + id % 1920).toInt, (32 + id % 1080).toInt, 8, data))
        }
        .mapPartitions { it =>
          // one decoder instance per partition — the native-codec lifecycle
          val md = MessageDigest.getInstance("MD5")
          it.flatMap { case (id, payload) =>
            MediaCodec.decode(payload).iterator.flatMap { m =>
              (0 until 4).iterator.filter(i => i * 32 < m.dataLength).map { i =>
                val end = math.min(m.dataOffset + (i + 1) * 32, m.dataOffset + m.dataLength)
                val slice = java.util.Arrays.copyOfRange(payload, m.dataOffset + i * 32, end)
                md.reset()
                (id, m.width.toLong, m.height.toLong, i.toLong, hex(md.digest(slice)))
              }
            }
          }
        }
        .toDF("doc_id", "width", "height", "frame_idx", "frame_fp")
    },

    // Mixed-container metadata extraction: jpeg/png parsed for real
    // (SOF0 scan, IHDR walk — geometry, bit depth, container size),
    // unsupported RIFF/WEBP payloads sniffed and dropped.
    q(
      "q_multimodal_meta",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'jpeg' ELSE 'png' END AS format,
        |  (32 + doc_id % 1920)::BIGINT AS width,
        |  (32 + doc_id % 1080)::BIGINT AS height,
        |  (CASE WHEN doc_id % 3 = 0 THEN 8 WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END)::BIGINT AS bit_depth,
        |  (CASE WHEN doc_id % 3 = 0 THEN 55 ELSE 57 END + length(text))::BIGINT AS n_bytes
        |FROM documents WHERE doc_id % 3 <> 2""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .map { case (id, data) =>
          val w = (32 + id % 1920).toInt
          val h = (32 + id % 1080).toInt
          val payload = id % 3 match {
            case 0 => MediaCodec.encodeJpeg(w, h, data)
            case 1 => MediaCodec.encodePng(w, h, if (id % 2 == 0) 8 else 16, data)
            case _ => MediaCodec.encodeWebp(data)
          }
          (id, payload)
        }
        .mapPartitions { it =>
          it.flatMap { case (id, payload) =>
            MediaCodec.decode(payload).map { m =>
              (id, m.format, m.width.toLong, m.height.toLong, m.bitDepth.toLong, payload.length.toLong)
            }
          }
        }
        .toDF("doc_id", "format", "width", "height", "bit_depth", "n_bytes")
    }
  )
}
