package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, processed in per-partition batches.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs ship in this environment); everything Spark-side — binary
  * schema, partition-batched iteration, typed output schema — is real.
  * In production the stub body is replaced by a codec call (JNI/FFI),
  * keeping the identical `mapPartitions` batch shape so one decoder
  * instance is amortized across a whole partition.
  */
object Multimodal {

  /** Typed metadata extracted per payload. */
  final case class ImageMeta(doc_id: Long, byte_len: Long, width: Long, height: Long, n_frames: Long)

  /** STUB decode: derives deterministic fake dimensions from the payload
    * size. Replace with a real codec (e.g. libjpeg/ffmpeg via FFI) —
    * signature stays `Array[Byte] => (width, height, frames)`.
    */
  private def decodeStub(bytes: Array[Byte]): (Long, Long, Long) =
    (64L + bytes.length % 256, 64L + (bytes.length.toLong * 7) % 256, 1L + bytes.length % 8)

  /** Extract image metadata from a (doc_id: Long, payload: binary) frame.
    * One decoder "session" per partition (the `mapPartitions` boundary),
    * rows streamed through it — the batch shape a real codec needs.
    */
  def imageMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val decoder = Codec.open(); it.map(... decoder.decode ...)
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeStub(bytes)
          ImageMeta(id, bytes.length.toLong, w, h, f)
        }
      }
      .toDF()
  }

  /** STUB feature extractor: a deterministic pseudo-embedding derived
    * from the payload digest — one encoder "session" per partition (the
    * MessageDigest instance), payloads streamed through it, rows out as
    * (doc_id, feat_idx, feat_value). Replace the digest derivation with a
    * real encoder (CLIP/wav2vec via FFI) — the batch shape, binary-in /
    * vector-out signature, and unnested output (joinable into the
    * Similarity operators) stay identical.
    */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    // the digest stub yields 8 4-hex-digit features (32-char MD5);
    // silently capping a larger request would hand half-length vectors
    // to downstream cosine/dot consumers — fail loudly instead (a real
    // encoder replacing this seam lifts the bound)
    require(dim >= 1 && dim <= 8,
      s"stub feature extractor supports 1..8 dims, got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val encoder = Encoder.open()  (amortized per partition)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          (0 until dim).map { i =>
            val v = Integer.parseInt(hex.substring(i * 4, i * 4 + 4), 16).toDouble / 65535.0
            (id, i.toLong, v)
          }
        }
      }
      .toDF("doc_id", "feat_idx", "feat_value")
  }

  /** Frame-sampling stub for video-like payloads: emits `n` evenly spaced
    * (doc_id, frame_index, frame_bytes) rows per payload — the explode
    * shape of a real frame extractor.
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = (decodeStub(bytes)._3).toInt
        // m emitted samples spread EVENLY across the payload (offset
        // i·len/m) — dividing by `frames` instead would take the FIRST m
        // frames, head-biasing every downstream consumer
        val m = math.max(1, math.min(n, frames))
        (0 until math.min(n, frames)).map { i =>
          val off = if (bytes.isEmpty) 0 else (i.toLong * bytes.length / m).toInt
          (id, i.toLong, bytes.slice(off, math.min(bytes.length, off + 16)))
        }
      }
      .toDF("doc_id", "frame_index", "frame_bytes")
  }
}
