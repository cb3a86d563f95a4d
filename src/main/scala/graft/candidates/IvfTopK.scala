package graft.candidates

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.kg._
import graft.embed.Embedder
import graft.util.DetHash

/** IVF-blocked cosine top-k — the inverted-file alternative to
  * [[LshTopK]] for approximate-nearest-neighbor candidate generation
  * (the reference's retrieval is an exact flat index,
  * model/layers_LaBSE_neighbor.py:313-315; IVF is the standard coarse
  * quantizer used to scale that index, re-expressed here as a Spark
  * bucket-join).
  *
  * Structure: a spherical k-means coarse quantizer (centroids trained on
  * the driver over a DETERMINISTIC hash-chosen corpus sample reduced in
  * sorted-id order — bit-identical at any parallelism, same discipline
  * as LshTopK's bucket geometry) partitions the corpus into nCells
  * inverted lists; each query probes its nProbe nearest centroids. A
  * (query, corpus) pair meets in AT MOST ONE cell (a corpus row lives in
  * exactly one list), so no cross-probe dedup is needed — unlike LSH
  * banding, where a near pair collides in most bands.
  *
  * vs LSH as the scale path: IVF's cells adapt to the data distribution
  * (k-means), so recall per probed row is higher on clustered corpora;
  * LSH needs no training pass and its geometry is oblivious to drift.
  * Both are exposed; [[graft.Pipeline]] auto-selects LSH by default and
  * either can be forced.
  *
  * Scale mechanics shared with LshTopK: vectors cross the cogroup
  * shuffle 16-bit quantized; per-(cell) groups above bucketCap on either
  * side are 2-D salt-tiled (each side hashes to its own salt, replicates
  * across the other's), bounding per-task work and working set at
  * O(cap²); partial top-ks merge in one narrow streaming pass; scores
  * are RSM z-scores — the same scale as every other candidate path, so
  * the canonicalization threshold is path-independent.
  *
  * Shuffle inventory: one keyed shuffle per side (corpus rows move once,
  * query rows ≤ nProbe times), one narrow (src, dst, cos) merge shuffle,
  * one narrow calibration join. Centroid broadcast is nCells × dim
  * floats; auto nCells is min(√corpus, cellsMax, sample/32) — the
  * sample coupling keeps the quantizer trained (≥32 samples/centroid,
  * see [[autoCells]]) and incidentally keeps the broadcast tiny. The
  * assignment scan is O(nCells × dim) per row — the known IVF tradeoff
  * vs LSH's O(bands × rows × dim).
  */
object IvfTopK {

  final case class IvfConfig(
      /** <= 0 → auto: min(ceil(sqrt(corpus rows)), cellsMax,
        * sample/SamplesPerCell) — see [[autoCells]]. */
      nCells: Int = 0,
      cellsMax: Int = 4096,
      /** inverted lists probed per query (recall/cost dial). */
      nProbe: Int = 4,
      /** Lloyd iterations over the driver sample. */
      lloydIters: Int = 6,
      /** corpus sample size for centroid training + RSM calibration. */
      sampleSize: Int = 4096,
      /** max rows (either side) of one cell before 2-D salt tiling. */
      bucketCap: Int = 512,
      seed: Long = Dims.Seed)

  /** Minimum training samples per centroid for the auto cell count:
    * below ~32 the Lloyd pass memorizes individual sample rows instead
    * of estimating cluster means (round-2 verdict: auto √corpus cells
    * with a fixed 4096-row sample degenerated to 1 sample/centroid at
    * corpus ≥ 16M — arbitrary centroids exactly where IVF must win). */
  val SamplesPerCell = 32

  /** Auto cell count: √corpus selectivity, bounded by the broadcast cap
    * AND by what the driver sample can actually train. Pure — gated in
    * OperatorSpec. At extreme corpora this bounds cells at
    * sampleSize/32 (default 128): cells get larger and salt tiling
    * bounds per-task work; callers wanting finer quantization raise
    * sampleSize explicitly (Lloyd is O(iters × sample × cells × dim) on
    * the driver) or use the LSH path, which needs no training pass. */
  def autoCells(nCorpus: Long, sampleLen: Int, cellsMax: Int): Int =
    math.max(1, math.min(math.min(cellsMax, sampleLen / SamplesPerCell),
      math.ceil(math.sqrt(nCorpus.toDouble)).toInt))

  /** argmax-dot centroid of v; ties break to the smaller cell id (strict
    * `>` while scanning in index order) so assignment is deterministic. */
  def nearestCell(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestS = Embedder.dot(v, cents(0))
    var c = 1
    while (c < cents.length) {
      val s = Embedder.dot(v, cents(c))
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** The nProbe nearest centroids by dot, descending (ties to the
    * smaller cell id) — a primitive insertion buffer like TopKBuf. */
  def probeCells(v: Array[Float], cents: Array[Array[Float]], nProbe: Int): Array[Int] = {
    val p = math.min(nProbe, cents.length)
    val ss = new Array[Double](p)
    val cs = new Array[Int](p)
    var n = 0
    var c = 0
    while (c < cents.length) {
      val s = Embedder.dot(v, cents(c))
      if (n < p || s > ss(n - 1)) {
        var i = if (n < p) n else n - 1
        while (i > 0 && ss(i - 1) < s) { ss(i) = ss(i - 1); cs(i) = cs(i - 1); i -= 1 }
        ss(i) = s; cs(i) = c
        if (n < p) n += 1
      }
      c += 1
    }
    java.util.Arrays.copyOf(cs, n)
  }

  /** Spherical k-means over the (driver-resident, id-sorted) sample:
    * init = evenly spaced sample rows, Lloyd assign/mean/renormalize;
    * an emptied cell keeps its previous centroid. Deterministic. */
  def trainCentroids(sample: Array[Emb], nCells: Int, iters: Int): Array[Array[Float]] = {
    require(sample.nonEmpty, "IvfTopK: empty centroid sample")
    val dim = sample(0).emb.length
    var cents = Array.tabulate(nCells) { c =>
      val row = ((c.toLong * sample.length) / nCells).toInt
      Embedder.l2normalize(sample(row).emb.clone())
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val cnts = new Array[Int](nCells)
      sample.foreach { e =>
        val c = nearestCell(e.emb, cents)
        cnts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += e.emb(i); i += 1 }
      }
      cents = Array.tabulate(nCells) { c =>
        if (cnts(c) == 0) cents(c)
        else Embedder.l2normalize(Array.tabulate(dim)(i => (sums(c)(i) / cnts(c)).toFloat))
      }
      it += 1
    }
    cents
  }

  private val EmptyKeys = Array.empty[Long]

  def topK(spark: SparkSession, queries: Dataset[Emb], corpus: Dataset[Emb], k: Int,
           cfg: IvfConfig = IvfConfig()): Dataset[Candidate] =
    graft.util.JobDesc.withJobDesc(spark, "graft: IVF top-k candidates") {
      topKImpl(spark, queries, corpus, k, cfg)
    }

  private def topKImpl(spark: SparkSession, queries: Dataset[Emb], corpus: Dataset[Emb], k: Int,
           cfg: IvfConfig): Dataset[Candidate] = {
    import spark.implicits._
    val qP = queries.persist(StorageLevel.MEMORY_AND_DISK)
    val cP = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    // count + deterministic smallest-hash sample in ONE corpus pass
    // (LshTopK.countAndSample — partitioning-independent order statistics)
    val (nCorpus, sample) = LshTopK.countAndSample(cP, cfg.sampleSize)
    require(sample.nonEmpty, "IvfTopK: empty corpus")
    val nCells =
      if (cfg.nCells > 0) cfg.nCells // explicit: caller owns sample quality
      else autoCells(nCorpus, sample.length, cfg.cellsMax)
    val centsBc = spark.sparkContext.broadcast(
      trainCentroids(sample, math.min(nCells, sample.length), cfg.lloydIters))
    val negBc = spark.sparkContext.broadcast(
      sample.indices.collect { case i if i % 8 == 0 => sample(i).emb }.toArray)

    // corpus rows land in exactly one inverted list; queries probe nProbe
    val cCells: Dataset[(Int, Long, Array[Short])] = cP.mapPartitions { it =>
      val cents = centsBc.value
      it.map(e => (nearestCell(e.emb, cents), e.id, LshTopK.quantize(e.emb)))
    }
    val qCells: Dataset[(Int, Long, Array[Short])] = qP.mapPartitions { it =>
      val cents = centsBc.value
      it.flatMap { e =>
        val q16 = LshTopK.quantize(e.emb)
        probeCells(e.emb, cents, cfg.nProbe).iterator.map(c => (c, e.id, q16))
      }
    }
    // persist: both feed the fused hot-count job AND the cogroup
    val qPc = qCells.persist(StorageLevel.MEMORY_AND_DISK)
    val cPc = cCells.persist(StorageLevel.MEMORY_AND_DISK)

    // --- 2-D salt tiling from per-side cell counts (one fused job) ---
    val hot = qPc.toDF("cell", "id", "emb").select(lit(0).as("side"), col("cell"))
      .unionByName(cPc.toDF("cell", "id", "emb").select(lit(1).as("side"), col("cell")))
      .groupBy("side", "cell").count()
      .filter(col("count") > cfg.bucketCap)
      .as[(Int, Int, Long)].collect()
    def saltMap(side: Int): Map[Int, Int] = hot.iterator.filter(_._1 == side)
      .map { case (_, cell, n) => (cell, math.ceil(n.toDouble / cfg.bucketCap).toInt) }.toMap
    val saltsQ = saltMap(0)
    val saltsC = saltMap(1)
    val saltsQBc = spark.sparkContext.broadcast(saltsQ)
    val saltsCBc = spark.sparkContext.broadcast(saltsC)
    // derived, never-aliasing cell-id base (see LshTopK: a constant base
    // double-scores pairs once a degenerate cell needs more salts)
    val saltBase = math.max(1, saltsC.valuesIterator.maxOption.getOrElse(1))

    val cbS = cPc.mapPartitions { it =>
      val mC = saltsCBc.value; val mQ = saltsQBc.value
      it.flatMap { case (cell, id, emb) =>
        val sc = (DetHash.h1(7, id) % mC.getOrElse(cell, 1)).toInt.abs
        val sq = mQ.getOrElse(cell, 1)
        Iterator.tabulate(sq)(q => (cell, q * saltBase + sc, id, emb))
      }
    }
    val qbS = qPc.mapPartitions { it =>
      val mC = saltsCBc.value; val mQ = saltsQBc.value
      it.flatMap { case (cell, id, emb) =>
        val sq = (DetHash.h1(11, id) % mQ.getOrElse(cell, 1)).toInt.abs
        val sc = mC.getOrElse(cell, 1)
        Iterator.tabulate(sc)(c => (cell, sq * saltBase + c, id, emb))
      }
    }
    val scored = qbS.groupByKey(r => (r._1, r._2))
      .cogroup(cbS.groupByKey(r => (r._1, r._2))) { case (_, qs, cs) =>
        val rows = cs.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val cell = new LshTopK.Cell(rows.map(_._3), rows.map(_._4),
            Array.fill(rows.length)(EmptyKeys))
          qs.flatMap { case (_, _, src, qe) =>
            LshTopK.topkCell(k, EmptyKeys, qe, cell).map { case (s, dst) => (src, dst, s) }
          }
        }
      }

    // merge partial top-ks: each (src, dst) pair arrives at most once;
    // LshTopK.mergeTopK aggregates MAP-SIDE (≤ one k-row partial per
    // source per map partition crosses the merge shuffle)
    val ranked = LshTopK.mergeTopK(scored, k)

    val calib = LshTopK.rsmCalib(qP, negBc)
    val result = ranked.toDF("srcId", "dstId", "cos", "rank")
      .join(calib.toDF("srcId", "mu", "sigma"), "srcId")
      .as[(Long, Long, Double, Int, Double, Double)]
      .map { case (src, dst, cos, r, mu, sigma) =>
        Candidate(src, dst, graft.align.MoCoTrainer.rsmScore(cos, mu, sigma), r) }
      // the candidate table (≤ queries × k narrow rows) is the smallest
      // artifact of this operator and is re-consumed by several
      // downstream actions — persist IT, then drop the four heavy
      // intermediates so repeated calls in one session (the 42-query
      // battery, spec suites) don't accumulate cached blocks (ADVICE r2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count() // materialize before releasing what it was built from
    Seq(qPc, cPc, qP, cP).foreach(_.unpersist(blocking = false))
    result
  }
}
