package graft

import graft.extract.MediaKernels
import graft.extract.MediaKernels.{FrameRow, MediaRow}

/** Multimodal plumbing gates: the stub codec is deterministic and the
  * Spark-side contract (binary columns, generator-shaped frame
  * sampling, partition-batched kernels) preserves the payload exactly. */
class MediaSpec extends SparkTestBase {
  import spark.implicits._

  private val payloads = Seq(
    MediaRow(1L, Array.tabulate(100)(i => (i * 7 % 251).toByte)),
    MediaRow(2L, Array.tabulate(32)(i => (i + 1).toByte)),   // exactly one stride
    MediaRow(3L, Array.tabulate(33)(i => (255 - i).toByte)), // stride + 1 remainder
    MediaRow(4L, Array[Byte](42)))

  test("frame-sample: frames reassemble byte-identically; chunk arithmetic") {
    val ds = payloads.toDS().repartition(3)
    val frames = MediaKernels.frameSample(ds, 32).collect()
      .groupBy(_.doc_id).map { case (id, fs) => id -> fs.sortBy(_.frame_idx) }
    payloads.foreach { p =>
      val fs = frames(p.doc_id)
      assert(fs.length == (p.payload.length + 31) / 32)
      assert(fs.map(_.frame.length).sum == p.payload.length)
      val reassembled = fs.flatMap(_.frame).toArray
      assert(java.util.Arrays.equals(reassembled, p.payload),
        s"doc ${p.doc_id}: frames must concatenate back to the payload")
    }
  }

  test("resize: every k-th sample kept, output length = ceil(len/k)") {
    val ds = payloads.toDS().repartition(2)
    val out = MediaKernels.resize(ds, 4).collect().map(r => r.doc_id -> r.payload).toMap
    payloads.foreach { p =>
      val o = out(p.doc_id)
      assert(o.length == (p.payload.length + 3) / 4)
      o.zipWithIndex.foreach { case (b, i) => assert(b == p.payload(i * 4)) }
    }
  }

  test("feature fingerprint is deterministic and partition-independent") {
    val a = MediaKernels.featureFp(payloads.head.payload)
    val b = MediaKernels.featureFp(payloads.head.payload.clone())
    assert(a == b && a != 0L)
  }
}
