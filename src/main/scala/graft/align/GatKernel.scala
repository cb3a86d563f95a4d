package graft.align

import graft.kg._
import graft.util.DetHash._

/** Single-head graph-attention kernel over a star neighborhood — the
  * structural twin of the reference encoder (model/layers_LaBSE_neighbor.py
  * :160-178 masked GAT; :85-87,127-131 combine MLP + normalize).
  *
  * Semantics preserved exactly: attention logits = leakyReLU_0.2(
  * src_score(center) + dst_score(neighbor)) over the star adjacency
  * (adj[0,i] — derived from validLen, never materialized), masked softmax,
  * attention-weighted neighbor sum, combined with the center row and
  * L2-normalized.
  *
  * Divergence (documented, SURVEY.md §7.5 item 5): no pretrained weights
  * exist in this sandbox, so the projection W is the identity, the
  * attention vectors are deterministic seeded unit vectors, and the
  * combine MLP [center ∥ gatOut] → dim is parameterized by a single
  * mixing weight alpha (trained by the MoCo loop, MoCoTrainer.scala).
  * The matrices are 20×dim — driver-free, partition-local, no
  * distributed matmul (SURVEY.md §2.7 F5).
  */
final case class GatWeights(attnSrc: Array[Float], attnDst: Array[Float], alpha: Float) {
  def withAlpha(a: Float): GatWeights = copy(alpha = a)
}

object GatKernel {

  def initWeights(dim: Int, seed: Long = Dims.Seed, alpha: Float = 0.3f): GatWeights = {
    def unit(salt: Long): Array[Float] = {
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        // deterministic ~N(0,1) via sum of 4 uniforms (Irwin-Hall, centered)
        var s = 0.0
        var k = 0
        while (k < 4) { s += toUnit(h3(seed, salt, i.toLong, k.toLong)); k += 1 }
        v(i) = ((s - 2.0) * math.sqrt(3.0)).toFloat
        i += 1
      }
      Embedder.l2n(v)
    }
    GatWeights(unit(0xA77A), unit(0xD57D), alpha)
  }

  @inline private def leakyRelu(x: Double): Double = if (x >= 0) x else 0.2 * x

  @inline private def dotf(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Forward pass for one neighbor block → L2-normalized output vector.
    * Operates on the flat row-major block (see NeighborBlock). */
  def forward(w: GatWeights, block: NeighborBlock): Array[Float] = {
    val flat = block.emb
    val n = block.validLen
    val dim = flat.length / n
    if (n <= 1) return Embedder.l2n(java.util.Arrays.copyOf(flat, dim))
    @inline def rowDot(v: Array[Float], r: Int): Double = {
      var s = 0.0; var j = 0; val off = r * dim
      while (j < dim) { s += v(j).toDouble * flat(off + j); j += 1 }
      s
    }
    // attention logits of center(0) → each valid row i (star adjacency row 0)
    val srcScore = rowDot(w.attnSrc, 0)
    val logits = new Array[Double](n)
    var maxL = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      logits(i) = leakyRelu(srcScore + rowDot(w.attnDst, i))
      if (logits(i) > maxL) maxL = logits(i)
      i += 1
    }
    // masked softmax over valid rows (padding rows never exist here)
    var z = 0.0
    i = 0
    while (i < n) { logits(i) = math.exp(logits(i) - maxL); z += logits(i); i += 1 }
    val agg = new Array[Float](dim)
    i = 0
    while (i < n) {
      val a = logits(i) / z
      val off = i * dim
      var j = 0
      while (j < dim) { agg(j) += (a * flat(off + j)).toFloat; j += 1 }
      i += 1
    }
    // combine [center ∥ gatOut] → center + alpha * gatOut, then normalize
    // (model/layers_LaBSE_neighbor.py:85-87,127-131)
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = flat(j) + w.alpha * agg(j); j += 1 }
    Embedder.l2n(out)
  }

  /** Small local alias to avoid a package cycle. */
  private object Embedder {
    def l2n(v: Array[Float]): Array[Float] = graft.embed.Embedder.l2normalize(v)
  }
}
