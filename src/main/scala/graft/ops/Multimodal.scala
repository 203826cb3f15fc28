package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media blob. */
final case class MediaMeta(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float] // extracted feature vector (batched "decode" output)
)

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed in partition-sized batches via
 * `mapPartitions` (the Scala analog of `mapInPandas` batch processing —
 * same batch shape: the iterator hands the whole partition to native code
 * once, not row-at-a-time).
 *
 * The actual codec step is a clearly-marked deterministic STUB (no
 * image/audio libraries ship in this container); everything Spark-side —
 * schema, binary column handling, batch iteration, partitioning — is real
 * and tested. Swap `decodeStub` for a JNI/FFI codec at deployment.
 */
object Multimodal {

  /** Deterministic synthetic media blobs derived from document text bytes —
    * stand-ins for crawl image/audio payloads. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image/png"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("media_type"),
      encode(col("text"), "UTF-8").cast("binary").as("blob"))
  }

  /** STUB codec: a real implementation would decode the container and
    * return pixel/sample planes. This stand-in derives metadata and an
    * 8-dim feature deterministically from the bytes so tests are exact. */
  def decodeStub(mediaType: String, blob: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < blob.length) { h ^= blob(i); h *= 0x100000001b3L; i += 1 }
    val width = 64 + (Math.floorMod(h, 1024L)).toInt
    val height = 64 + (Math.floorMod(h >>> 10, 1024L)).toInt
    val nFrames = if (mediaType.startsWith("video")) 1 + Math.floorMod(h >>> 20, 240L).toInt else 1
    val feat = new Array[Float](8)
    var k = 0
    var s = h
    while (k < 8) {
      s = graft.ner.Embeddings.xorshift(s)
      feat(k) = ((s >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      k += 1
    }
    (width, height, nFrames, feat)
  }

  /** Batched decode/feature-extract over the binary column. Partition-level
    * batching: the per-batch setup cost (codec init) is paid once per
    * partition, as with mapInPandas' Arrow batches. */
  def extract(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // codec init would happen here, once per partition
        batch.map { case (id, mt, blob) =>
          val (w, h, f, feat) = decodeStub(mt, blob)
          MediaMeta(id, mt, blob.length.toLong, w, h, f, feat)
        }
      }
  }

  /** One resized media rendition: dimensions fitted to a bounding box
    * (aspect preserved) plus the rendition bytes (stub: a deterministic
    * 64-byte signature standing in for the re-encoded payload). */
  final case class Resized(
      doc_id: Long,
      media_type: String,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      thumb: Array[Byte]
  )

  /** STUB resize kernel: fits (w, h) into `box` x `box` preserving aspect
    * ratio (never upscales), and derives the rendition bytes
    * deterministically from the source bytes + target dims — a real
    * implementation swaps in the decoder/scaler, the shape stays. */
  def resizeStub(blob: Array[Byte], w: Int, h: Int, box: Int): (Int, Int, Array[Byte]) = {
    val scale = math.min(1.0, box.toDouble / math.max(w, h))
    val ow = math.max(1, math.round(w * scale).toInt)
    val oh = math.max(1, math.round(h * scale).toInt)
    var s = 0xcbf29ce484222325L
    var i = 0
    while (i < blob.length) { s ^= blob(i); s *= 0x100000001b3L; i += 1 }
    s ^= (ow.toLong << 32) | (oh.toLong & 0xffffffffL)
    val out = new Array[Byte](64)
    var k = 0
    while (k < 64) {
      s = graft.ner.Embeddings.xorshift(s)
      out(k) = (s >>> 56).toByte
      k += 1
    }
    (ow, oh, out)
  }

  /** Batched image/video resize over the opaque binary column — the same
    * mapPartitions batch shape as `extract` (codec/scaler init once per
    * partition, whole-partition batches like mapInPandas' Arrow batches).
    * Audio rows pass through untouched (resize is a no-op for them). */
  def resize(media: DataFrame, box: Int = 256): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // scaler init would happen here, once per partition
        batch.flatMap { case (id, mt, blob) =>
          if (!mt.startsWith("image") && !mt.startsWith("video")) Iterator.empty
          else {
            val (w, h, _, _) = decodeStub(mt, blob)
            val (ow, oh, thumb) = resizeStub(blob, w, h, box)
            Iterator.single(Resized(id, mt, w, h, ow, oh, thumb))
          }
        }
      }
  }

  /** Deterministic frame sampling plan for video rows: every `stride`-th
    * frame index — the shuffle-free precursor to a real frame decode. */
  def frameSample(meta: Dataset[MediaMeta], stride: Int = 10): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.toDF()
      .filter(col("media_type").startsWith("video"))
      .select(col("doc_id"), explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }
}
