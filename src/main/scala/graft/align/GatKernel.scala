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
  * Combine MLP (F6, model/layers_LaBSE_neighbor.py:85-87): two forms.
  * The FULL form is a real Linear(2·dim → dim) — `combine` holds the
  * row-major weight matrix, gradient-trained by the MoCo loop
  * (MoCoTrainer.trainCombine) exactly like the reference's
  * `Linear(1536, 768)`. The LIGHT form (combine = null) collapses the
  * matrix to `[I | alpha·I]` — one mixing scalar — which is also the
  * full form's deterministic initialization (initCombine), so the two
  * paths coincide at epoch 0. Divergence retained (SURVEY.md §7.5 item
  * 5): the GAT projection W stays identity and the attention vectors are
  * deterministic seeded unit vectors (no pretrained weights exist in
  * this sandbox). The matrices are ≤ dim×2dim — driver-free,
  * partition-local, no distributed matmul (SURVEY.md §2.7 F5).
  *
  * Regularization surface (model/layers_LaBSE_neighbor.py:39-49):
  *  - `centerNorm` / `neighborNorm` config-gate the reference's
  *    center_norm / neighbor_norm flags (:123-126): L2-normalize the raw
  *    center, resp. the attention output, before the combine. Reference
  *    CLI defaults are (False, True); this engine defaults BOTH to false
  *    — its hash-feature inputs are already unit vectors, so the
  *    attention output's norm (≤1, a convex combination of unit rows)
  *    carries the neighborhood-coherence signal that alpha mixing uses.
  *    Set neighborNorm=true for the reference's exact default shape.
  *  - attention dropout 0.3 (:149,171) is nn.Dropout — active ONLY in
  *    train() mode, identity at eval. This engine's attention path holds
  *    no trainable parameters (identity W, seeded attention vectors), so
  *    training-time dropout would inject nondeterminism with nothing to
  *    regularize, and the emitted embeddings (an eval-mode forward in
  *    the reference too) are identical either way. Omitted by design.
  */
final case class GatWeights(attnSrc: Array[Float], attnDst: Array[Float], alpha: Float,
                            combine: Array[Float] = null,
                            centerNorm: Boolean = false, neighborNorm: Boolean = false) {
  def withAlpha(a: Float): GatWeights = copy(alpha = a)
  def withCombine(w: Array[Float]): GatWeights = copy(combine = w)
  def withNorms(center: Boolean, neighbor: Boolean): GatWeights =
    copy(centerNorm = center, neighborNorm = neighbor)
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

  /** Attention stage only: (center row, attention-weighted neighbor sum).
    * Depends on the (fixed) attention vectors but NOT on the combine
    * weights — so a combine-training loop can precompute it once per row
    * (model/layers_LaBSE_neighbor.py:160-178). agg = 0 for singletons. */
  def attnParts(w: GatWeights, block: NeighborBlock): (Array[Float], Array[Float]) = {
    val flat = block.emb
    val n = block.validLen
    val dim = flat.length / n
    val center = java.util.Arrays.copyOf(flat, dim)
    if (n <= 1) return (center, new Array[Float](dim))
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
    (center, agg)
  }

  /** u = W·[c ∥ g] for row-major W (dim × 2dim), double accumulation. */
  def matvec2(wm: Array[Float], c: Array[Float], g: Array[Float]): Array[Float] = {
    val d = c.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      val off = i * 2 * d
      var s = 0.0
      var j = 0
      while (j < d) { s += wm(off + j).toDouble * c(j); j += 1 }
      j = 0
      while (j < d) { s += wm(off + d + j).toDouble * g(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** `[I | alpha·I]` — the combine matrix that reproduces the light
    * (scalar-alpha) path; the deterministic init of combine training. */
  def initCombine(dim: Int, alpha: Float): Array[Float] = {
    val wm = new Array[Float](dim * 2 * dim)
    var i = 0
    while (i < dim) {
      wm(i * 2 * dim + i) = 1f
      wm(i * 2 * dim + dim + i) = alpha
      i += 1
    }
    wm
  }

  /** Combine MLP: [center ∥ gatOut] → dim, then L2-normalize
    * (model/layers_LaBSE_neighbor.py:85-87,127-131). Full Linear when
    * combine weights are present, scalar-alpha mix otherwise. */
  def combineOut(w: GatWeights, center: Array[Float], agg: Array[Float]): Array[Float] =
    if (w.combine != null) Embedder.l2n(matvec2(w.combine, center, agg))
    else {
      val dim = center.length
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) { out(j) = center(j) + w.alpha * agg(j); j += 1 }
      Embedder.l2n(out)
    }

  /** attnParts with the norm flags applied — the combine's actual input
    * (reference :123-126 normalizes before the concat). Training loops
    * that precompute attention once per row must use THIS, not attnParts,
    * so the flags act identically at train and inference time. */
  def combineInputs(w: GatWeights, block: NeighborBlock): (Array[Float], Array[Float]) = {
    val (center, agg) = attnParts(w, block) // fresh arrays — in-place l2n is safe
    (if (w.centerNorm) Embedder.l2n(center) else center,
     if (w.neighborNorm) Embedder.l2n(agg) else agg)
  }

  /** Forward pass for one neighbor block → L2-normalized output vector.
    * Operates on the flat row-major block (see NeighborBlock). The norm
    * flags apply BEFORE the combine on both the full and the light path,
    * so the `[I | alpha·I]` initialization equivalence holds under any
    * flags. */
  def forward(w: GatWeights, block: NeighborBlock): Array[Float] = {
    val (center, agg) = combineInputs(w, block)
    combineOut(w, center, agg)
  }

  /** Small local alias to avoid a package cycle. */
  private object Embedder {
    def l2n(v: Array[Float]): Array[Float] = graft.embed.Embedder.l2normalize(v)
  }
}
