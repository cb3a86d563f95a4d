package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal media operators over opaque binary payload columns — the
  * full set a training-data pipeline needs (decode, feature-extract,
  * resize, frame-sample), engine-side additions beyond the reference
  * (which is text-only; its media surface is just the `media_ref` span
  * field, BASELINE.json input_hint).
  *
  * The CODEC is a declared deterministic stub (no image/audio/video
  * libraries ship in this container): "decode" treats the payload as a
  * flat sample stream, "resize" keeps every k-th byte, "frame-sample"
  * chunks the stream into fixed-stride frames. Everything Spark-side is
  * the real contract a libjpeg/ffmpeg kernel would plug into: binary
  * payload column + typed metadata struct, one kernel init per
  * partition, per-partition batched iteration, fixed-shape scalar/binary
  * outputs (never driver-side loops), media payloads prunable at the
  * scan when untouched (PlanSpec discipline).
  *
  * At 100 TB the operative properties: all three ops are NARROW (no
  * shuffle — payload never moves between executors), output size is
  * bounded by input size, and the frame generator is flatMap-shaped so
  * one oversized video row becomes many bounded frame rows rather than
  * one multi-GB array row.
  */
object MediaKernels {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic stand-in for a media decode: payload bytes as an
    * unsigned sample stream. A real decoder replaces exactly this. */
  @inline def sample(b: Byte): Int = b & 0xff

  /** "Resize" one payload: keep every `factor`-th sample (stub for a
    * pixel/sample-rate downscale). Output length = ceil(len/factor). */
  def resizeBytes(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** "Frame-sample" one payload: fixed-stride chunks (stub for keyframe
    * extraction). Frames concatenate back to the exact payload —
    * the invariant MediaSpec checks. */
  def frames(payload: Array[Byte], stride: Int): Iterator[(Int, Array[Byte])] = {
    val n = (payload.length + stride - 1) / stride
    Iterator.tabulate(n) { i =>
      val from = i * stride
      (i, java.util.Arrays.copyOfRange(payload, from, math.min(from + stride, payload.length)))
    }
  }

  /** Quantized feature fingerprint of a payload (the scalar the driver
    * comparator can hash; the float vector itself is the kernel's real
    * output shape). */
  def featureFp(payload: Array[Byte], bins: Int = 8): Long = {
    val feat = new Array[Float](bins)
    var i = 0
    while (i < payload.length) { feat(i % bins) += sample(payload(i)) / 255.0f; i += 1 }
    val norm = graft.embed.Embedder.l2normalize(feat)
    norm.foldLeft(0L)((acc, f) => acc * 31 + math.round(f * 1000.0f))
  }

  /** Dataset-level resize: one kernel init per partition, batched rows,
    * narrow plan. */
  def resize(ds: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // kernel/codec handle would initialize here, once per partition
      it.grouped(64).flatMap(_.iterator.map(r => MediaRow(r.doc_id, resizeBytes(r.payload, factor))))
    }
  }

  /** Dataset-level frame sampling: generator-shaped (one row → many
    * bounded frame rows), narrow. */
  def frameSample(ds: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(64).flatMap(_.iterator.flatMap(r =>
        frames(r.payload, stride).map { case (i, f) => FrameRow(r.doc_id, i, f) }))
    }
  }

  /** Flagship media surface: every media span of the interleaved docs →
    * one feature row (doc_id, media_ref, offset, feature_fp, n_frames).
    * NARROW — the payload (stub codec: the media_ref bytes; a real
    * fetch+decode plugs in where `payloadOf` is) never crosses a
    * shuffle, one kernel init per partition, generator-shaped flatMap so
    * a many-media doc becomes many bounded rows. [[graft.Pipeline]]
    * commits this as a lineage-tracked side table next to the triples. */
  def docMediaFeatures(spark: SparkSession, docs: Dataset[graft.kg.Doc],
                       frameStride: Int = 16): DataFrame = {
    import spark.implicits._
    docs.mapPartitions { it =>
      // codec handle would initialize here, once per partition
      def payloadOf(ref: String): Array[Byte] =
        ref.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      it.flatMap { d =>
        d.spans.iterator.filter(_.kind == "media").map { s =>
          val p = payloadOf(s.media_ref)
          (d.doc_id, s.media_ref, s.offset, featureFp(p),
            (p.length + frameStride - 1) / frameStride)
        }
      }
    }.toDF("doc_id", "media_ref", "offset", "feature_fp", "n_frames")
  }

  /** The harness media table: documents' text bytes stand in for media
    * payloads (same stand-in as q_media_features). */
  def harnessMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
