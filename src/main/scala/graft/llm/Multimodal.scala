package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver north star): media payloads as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches — the Scala analog of a Pandas-UDF/mapInPandas stage.
  *
  * The actual byte-level media decode is STUBBED (no image/audio codecs in
  * this container): [[decodeStub]] derives deterministic fake features
  * from the bytes. Everything around it — schema, binary lift,
  * partitioning, typed mapPartitions batch shape, feature schema — is the
  * real production plumbing and is exercised by q_multimodal_features.
  */
object Multimodal {
  /** A typed media record: id + raw bytes + source-side metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String,
      n_bytes: Int)

  /** Extracted features; `width`/`height`/`channels` come from the stub
    * and `checksum` is the payload's md5 hex digest.
    */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, channels: Int, checksum: String)

  private def md5Hex(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map(b => f"$b%02x").mkString

  /** STUB decode ??? — stands in for a real image/audio decoder; derives
    * deterministic pseudo-dimensions from the payload's md5 so the
    * downstream plumbing (schema, joins, aggregations) is fully testable
    * AND the whole feature table is SQL-expressible for the DuckDB oracle
    * (md5 + ascii arithmetic over the hex digest — the same cross-engine
    * trick as q_multimodal_framesample's per-frame md5).
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val hx = md5Hex(payload)
    val w = 64 + (hx(0).toInt * 256 + hx(1).toInt) % 1024
    val ht = 64 + (hx(2).toInt * 256 + hx(3).toInt) % 1024
    (w, ht, 3)
  }

  /** Lift documents into binary media rows (text bytes standing in for an
    * image payload; in production this column is the raw media blob).
    */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        col("source").as("kind"),
        length(col("text").cast("binary")).as("n_bytes"))
      .as[MediaRow]
  }

  /** Per-partition batch feature extraction — the mapInPandas-shaped
    * stage: one JVM-side pass per partition, no per-row driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.n_bytes, w, h, c,
          md5Hex(r.payload))
      }
    }
  }

  /** Resize output record: input geometry → output geometry fitted to a
    * target box, plus the byte size the resized payload would occupy
    * (out_w·out_h·channels).
    */
  case class ResizedMedia(media_id: Long, kind: String, width: Int,
      height: Int, out_w: Int, out_h: Int, downscaled: Boolean,
      out_bytes: Long)

  /** Aspect-preserving resize-to-fit — the third mapInPandas-shaped
    * batch stage (decode → features → RESIZE → frame-sample): scales
    * the longer edge down to `box`, never upscales, and keeps the
    * aspect ratio in pure integer math (floor(d·box/max(w,h)) — exact
    * in Long, so the plan is deterministic and the DuckDB oracle can
    * replay it with `//`). In production the same per-partition pass
    * transforms the payload bytes; the stub stage emits the exact
    * output geometry + byte size that transform would produce.
    */
  def resizePlan(features: Dataset[MediaFeatures], box: Int)
      : Dataset[ResizedMedia] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.mapPartitions { rows =>
      rows.map { f =>
        val mx = math.max(f.width, f.height)
        val (ow, oh) =
          if (mx <= box) (f.width, f.height)
          else ((f.width.toLong * box / mx).toInt,
            (f.height.toLong * box / mx).toInt)
        ResizedMedia(f.media_id, f.kind, f.width, f.height, ow, oh,
          mx > box, ow.toLong * oh * f.channels)
      }
    }
  }
}
