package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media blob row: opaque bytes + typed metadata. */
final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

/** Extracted per-blob features (decode stubbed — see Multimodal). */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    content_sha: String,
    width: Int,
    height: Int,
    n_frames: Int)

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, batch-decoded per partition.
 *
 * The actual codec decode is STUBBED (this container ships no image/audio
 * libraries): `decodeStub` derives deterministic fake dimensions from the
 * bytes. Everything around it — the binary schema, the
 * mapPartitions batch shape (one reusable "decoder" per partition, same
 * pattern a JNI codec handle would need), partition sizing, and the
 * feature schema — is the real Spark-side design and is tested.
 */
object Multimodal {

  /**
   * Replace with a real codec; everything else stays. Derives fake
   * dimensions from the content digest (portable: any engine computing
   * sha256 gets the same values).
   */
  private def decodeStub(kind: String, sha256hex: String): (Int, Int, Int) = {
    val h = java.lang.Integer.parseInt(sha256hex.substring(0, 7), 16) // 28 bits, positive
    val w = 160 + (h % 8) * 80
    kind match {
      case "image" => (w, w * 3 / 4, 1)
      case "video" => (w, w * 9 / 16, 24 + (h >> 3) % 240)
      case _       => (0, 0, h % (1 << 20)) // audio: frames only
    }
  }

  /** Batch feature extraction over binary blobs. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition: real codecs would open one decoder context here
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { m =>
        digest.reset()
        val sha = digest.digest(m.bytes).map("%02x".format(_)).mkString
        val (w, h, f) = decodeStub(m.kind, sha)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, sha, w, h, f)
      }
    }
  }

  /**
   * Deterministic media corpus derived from the documents table (text
   * bytes standing in for encoded media) — keeps the binary path
   * exercised end-to-end without external data.
   */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
