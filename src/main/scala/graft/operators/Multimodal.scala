package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing (mandated extension): media as opaque
  * `binary` columns + typed metadata, with decode/feature-extraction as a
  * per-partition batch stage.
  *
  * The real decoder libraries (image/audio) are not in this environment,
  * so `decodeStub` is a DETERMINISTIC FAKE — it "parses" a header out of
  * the first bytes. What is real and tested is the Spark-side shape that
  * matters at 100 TB:
  *   - media rows as `Dataset[MediaBlob]` (binary payload + id), so the
  *     payload never round-trips through a row copy per op;
  *   - decode as `mapPartitions` with once-per-partition "model init"
  *     (the per-partition cost pattern of a real ONNX/ffmpeg session —
  *     mirrors the reference's batch embed stage,
  *     `app/backend/chat_bot/tools.py:53-60`);
  *   - typed output schema (`MediaMeta`) so downstream is columnar again.
  */
object Multimodal {

  final case class MediaBlob(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, width: Long, height: Long, n_frames: Long)

  /** Stand-in for a decoder session handle (expensive init, reused per
    * partition). Real impl would hold an ONNX runtime / codec context.
    */
  private final class DecoderSession {
    def decode(b: Array[Byte]): (Long, Long, Long) = {
      val b0 = if (b.length > 0) b(0) & 0xff else 0
      val b1 = if (b.length > 1) b(1) & 0xff else 0
      (64L + b0 % 64, 64L + b1 % 64, 1L + b.length % 16)
    }
  }

  /** binary payloads → typed metadata via per-partition decode. */
  def decodeStub(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val session = new DecoderSession // once per partition, not per row
      it.map { blob =>
        val (w, h, f) = session.decode(blob.payload)
        MediaMeta(blob.doc_id, w, h, f)
      }
    }
  }

  /** documents.text reinterpreted as binary payloads (the test harness has
    * no real media files; byte content is still real bytes).
    */
  def blobsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaBlob] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload")).as[MediaBlob]
  }

  final case class Resized(doc_id: Long, out_w: Long, out_h: Long, checksum: Long)

  /** Resize stage (stub): aspect-preserving fit into `maxSide`, plus a
    * deterministic "resampled" checksum (stride-sampled payload bytes) in
    * place of real pixel resampling. Real per-partition decode shape as
    * [[decodeStub]]; arithmetic is integer-exact so the oracle can
    * reproduce it.
    */
  def resizeStub(blobs: Dataset[MediaBlob], maxSide: Long = 32): Dataset[Resized] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val session = new DecoderSession
      it.map { blob =>
        val (w, h, _) = session.decode(blob.payload)
        val longer = math.max(w, h)
        val ow = w * maxSide / longer
        val oh = h * maxSide / longer
        val len = blob.payload.length
        var sum = 0L
        if (len > 0) {
          val stride = math.max(1, len / 16)
          var i = 0
          while (i < len) { sum += (blob.payload(i) & 0xff).toLong; i += stride }
        }
        Resized(blob.doc_id, ow, oh, sum)
      }
    }
  }

  final case class FrameSample(doc_id: Long, frame_idx: Long, luma: Long)

  /** Video-style frame sampling: decode frame count, keep every `every`-th
    * frame, emit one row per sampled frame with a per-frame feature (the
    * "luma" here is a stub byte-read; a real impl would hand the frame to
    * the codec). Shape notes for 100 TB: a flatMap Generator (rows fan OUT
    * inside the task, no shuffle), payload touched once per doc, output
    * columnar-typed.
    */
  def sampleFrames(blobs: Dataset[MediaBlob], every: Int): Dataset[FrameSample] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val session = new DecoderSession
      it.flatMap { blob =>
        val (_, _, nFrames) = session.decode(blob.payload)
        val len = blob.payload.length
        (0L until nFrames by every).map { idx =>
          val luma =
            if (len == 0) 0L
            else (blob.payload(((idx * 7) % len).toInt) & 0xff).toLong
          FrameSample(blob.doc_id, idx, luma)
        }
      }
    }
  }
}
