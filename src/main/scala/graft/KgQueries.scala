package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/** KG-pipeline and multimodal operators surfaced as driver queries.
  * These are rows-only checks (no ANSI-SQL twin exists): the pipeline's
  * correctness is gated by the ScalaTest suite (extraction P/R,
  * span-sequence equality, Hit@k, LSH-vs-exact recall) and by the
  * oracle-checked building blocks above. */
object KgQueries {

  /** Run `f` with AQE disabled, restoring the session's setting after.
    *
    * Battery-fixture scope ONLY (guide §1.2: right algorithm for the
    * job size). The fixture pipelines here are tiny by construction
    * (≤80 entities/KG) — AQE has nothing to re-plan on them, but it
    * materializes every exchange as its own driver-scheduled query-stage
    * job: measured same-session on the battery shapes, the incremental
    * family runs 57/66/31 jobs with AQE vs 41/42/22 without, and each
    * scheduled job costs 0.1–5 s of driver latency depending on the
    * host window (BENCH.md) — 49→14 s (q_kg_incremental) and 109→22 s
    * (q_kg_indexed) in the A/B window. The operators themselves
    * (IncrementalAlign, LshTopK, IvfTopK) never touch this conf: at
    * scale AQE's runtime re-planning is wanted, and the bench session
    * keeps it ON (Bench.scala session conf, frozen). Row-identity is
    * guaranteed by the suite's conf/partitioning-independence laws
    * (IncrementalSpec epoch equality across shuffle confs; deterministic
    * candidate geometry + total-order tie-breaks). */
  private def withFixtureConf[T](spark: SparkSession, interpreted: Boolean = true)(f: => T): T = {
    // partitions sized to the FIXTURE (≤80 entities/KG → 8 covers every
    // shuffle with room), not to the machine: without AQE's coalescing
    // the session's battery-scale partition count would schedule 64
    // near-empty tasks per exchange on 40-row data
    val confs = Seq("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") ++ (if (interpreted) Seq(
      // janino compilation of per-plan generated classes is the other
      // fixed driver cost of the tiny fixtures (codegen frames ~70
      // CPU-s over the two incremental builds, tools/CpuProfile);
      // interpreted evaluation is semantically identical (it is
      // Spark's own codegen fallback) and instant on ≤80-row frames.
      // NOT applied to the LSH/IVF candidate queries (interpreted =
      // false): their sf-scale Dataset-encoder hot loops are exactly
      // where codegen pays (measured 16 → 336 CPU-s interpreted)
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") else Nil)
    val prev = confs.map { case (k, v) => (k, spark.conf.getOption(k)) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private lazy val tinyCfg = PipelineConfig(
    synth = graft.ingest.SynthConfig(entitiesPerKg = 80),
    embed = graft.embed.EmbedderConfig(dim = 48))

  /** One shared fixture pipeline per session: the three q_kg_* queries
    * each used to re-run the whole tiny pipeline (~60 s of the round-1
    * battery was pure recomputation). Query-facing frames are persisted
    * so each query's action reuses the materialized stages. */
  private val resultCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, PipelineResult]()
  private def tinyResult(spark: SparkSession): PipelineResult =
    resultCache.computeIfAbsent(spark, s => withFixtureConf(s) {
      val r = Pipeline.runSynthetic(s, tinyCfg)
      r.idTriples.persist(); r.entities.persist()
      r.alignment.persist(); r.canonicalTriples.persist()
      // materialize each cache by a SINGLE-branch count now: a cold
      // cache whose first materialization happens inside a later
      // query's multi-branch join (canonicalTriples reads entities
      // twice) is the measured mmap-storm shape on this host — see
      // TextQueries.qNgramJaccard / BENCH.md "Battery-context cache
      // pathology"
      r.idTriples.count(); r.entities.count()
      r.alignment.count(); r.canonicalTriples.count()
      r
    })

  /** Full pipeline → canonical (subj, pred, obj) triples. */
  def qKgCanonicalTriples(spark: SparkSession, dir: String): DataFrame =
    tinyResult(spark).canonicalTriples
      .select("subj", "pred", "obj", "subjId", "objId")

  /** RSM-scored top-k alignment candidates (exact path). */
  def qKgAlignment(spark: SparkSession, dir: String): DataFrame =
    tinyResult(spark).alignment.toDF()
      .select(col("srcId"), col("dstId"), col("rank"), round(col("score"), 4).as("rsm_score"))

  /** LSH-blocked salted top-k over the harness embeddings table —
    * the 10^12-scale candidate-generation path on real vectors. */
  def qLshCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb")).as[Emb]
    val q = e.filter(_.id < 50)
    withFixtureConf(spark, interpreted = false) {
      graft.candidates.LshTopK.topK(spark, q, e.filter(_.id >= 50), 5).toDF()
        .select(col("srcId"), col("dstId"), col("rank"))
    }
  }

  /** IVF-blocked (inverted-file) top-k over the harness embeddings —
    * the coarse-quantizer ANN scale path (recall gated vs exact in
    * OperatorSpec; see candidates/IvfTopK for the LSH-vs-IVF tradeoff). */
  def qIvfCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("emb")).as[Emb]
    val q = e.filter(_.id < 50)
    withFixtureConf(spark, interpreted = false) {
      graft.candidates.IvfTopK.topK(spark, q, e.filter(_.id >= 50), 5).toDF()
        .select(col("srcId"), col("dstId"), col("rank"))
    }
  }

  /** SSL ablation alignment (align/SslPath — the reference's
    * neighbor-free variant, model/layers_LaBSE_SSL.py): raw-embedding
    * singleton blocks, MoCo-trained Linear(dim→dim) adapter with
    * self-negatives, exact top-k + RSM. Rows-only (the adapter training
    * has no ANSI-SQL twin); quality/determinism gated in SslSpec. */
  def qKgSslAlignment(spark: SparkSession, dir: String): DataFrame = {
    val cfg = tinyCfg.copy(useSsl = true, useMoco = true,
      moco = graft.align.MoCoConfig(batchSize = 8, queueLen = 4, epochs = 1,
        lr0 = 0.02, combineShards = 8))
    withFixtureConf(spark) {
      Pipeline.runSynthetic(spark, cfg).alignment.toDF()
        .select(col("srcId"), col("dstId"), col("rank"), round(col("score"), 4).as("rsm_score"))
    }
  }

  /** One shared continuous-construction fixture per session (the same
    * compute-once discipline as [[tinyResult]]): bootstrap state s1 from
    * batch 1, delta-merge batch 2 into s2 — q_kg_incremental reads s2,
    * q_kg_retract undoes batch 2 from it. */
  /** ONE config literal for the whole continuous fixture family —
    * q_kg_incremental/retract/indexed/rebootstrap must all score under
    * the exact parameters the cached state was built with. */
  private def incFixtureCfg(useIndex: Boolean = false): IncrementalConfig =
    IncrementalConfig(embed = graft.embed.EmbedderConfig(dim = 32), topK = 5,
      useIndex = useIndex)
  private val incCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Boolean), (AlignState, Set[String])]()
  private def incFixture(spark: SparkSession, useIndex: Boolean = false): (AlignState, Set[String]) =
    incCache.computeIfAbsent((spark, useIndex), { case (s, idxMode) => withFixtureConf(s) {
      val icfg = incFixtureCfg(idxMode)
      val e1 = 30; val e = 40
      val cfg1 = graft.ingest.SynthConfig(entitiesPerKg = e1)
      val cfgU = graft.ingest.SynthConfig(entitiesPerKg = e)
      def idx(docId: String): Long = docId.substring(docId.lastIndexOf('_') + 1).toLong
      val s1 = IncrementalAlign.initial(s,
        graft.ingest.DocSynthesizer.docs(s, cfg1),
        graft.ingest.DocSynthesizer.entities(s, cfg1), icfg)
      val docs2 = graft.ingest.DocSynthesizer.docs(s, cfgU).filter(d => idx(d.doc_id) >= e1)
      val s2 = IncrementalAlign.delta(s, s1, docs2,
        graft.ingest.DocSynthesizer.entities(s, cfgU)
          .filter(en => (en.id % graft.ingest.DocSynthesizer.Kg2Base) >= e1), icfg)
      (s2, docs2.collect().map(_.doc_id).toSet)
    } })

  /** Continuous-construction mode (IncrementalAlign): bootstrap a
    * committed state from batch 1, then merge a delta batch with
    * delta-sized maintenance work and emit the maintained canonical
    * triples. Rows-only here; the binding gate is IncrementalSpec's
    * bit-exact `delta(initial(b1), b2) == initial(b1 ∪ b2)` equality. */
  def qKgIncremental(spark: SparkSession, dir: String): DataFrame =
    incFixture(spark)._1.canonical
      .select("head", "rel", "tail", "subj", "pred", "obj", "subjId", "objId")

  /** Retraction (takedown) over the continuous state: remove batch 2's
    * documents by per-row docId lineage and emit the repaired canonical
    * triples. Rows-only; the binding gate is IncrementalSpec's bit-exact
    * `retract(delta(initial(b1), b2), docs(b2)) == initial(b1, dictU)`. */
  def qKgRetract(spark: SparkSession, dir: String): DataFrame = {
    val (s2, docIds2) = incFixture(spark)
    withFixtureConf(spark) {
      IncrementalAlign.retract(spark, s2, docIds2, incFixtureCfg()).canonical
        .select("head", "rel", "tail", "subj", "pred", "obj", "subjId", "objId")
    }
  }

  /** INDEXED continuous mode: the same two-batch chain under the frozen
    * bucket-index candidate rule ([[graft.candidates.BucketIndex]]) —
    * phase-B rescoring probes the maintained index table instead of
    * scanning the corpus. Rows-only; the binding gates are
    * IncrementalSpec's bit-exact indexed delta/retract/save-load
    * equalities plus the ≥0.9 accepted-edge recall vs the exact mode. */
  def qKgIndexed(spark: SparkSession, dir: String): DataFrame =
    incFixture(spark, useIndex = true)._1.canonical
      .select("head", "rel", "tail", "subj", "pred", "obj", "subjId", "objId")

  /** Geometry RE-FIT over the maintained indexed state
    * ([[IncrementalAlign.rebootstrap]], round 4): re-fits the bucket
    * geometry from the CURRENT corpus sample, rebuilds index +
    * candidate lists through the same distributed cogroup scorer as the
    * bootstrap, and emits the rebuilt canonical triples — the recovery
    * operation for bootstrap-sample drift (recall evidence in BENCH.md,
    * tools/DriftProbe). Rows-only; the binding gate is IncrementalSpec's
    * component-for-component equality with a fresh initial over the
    * grown corpus, including the freshly fit geometry. */
  def qKgRebootstrap(spark: SparkSession, dir: String): DataFrame = {
    val fixture = incFixture(spark, useIndex = true)._1
    withFixtureConf(spark) {
      IncrementalAlign.rebootstrap(spark, fixture, incFixtureCfg(useIndex = true))
        .canonical
        .select("head", "rel", "tail", "subj", "pred", "obj", "subjId", "objId")
    }
  }

  /** Neighbor blocks built from the synthetic KG: id, kg, validLen. */
  def qKgNeighborBlocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = tinyResult(spark)
    val ents = r.entities
    val withSeq = r.idTriples.map(t => (t, (t.head << 20) ^ t.tail ^ (t.rel << 40)))
    val edges = graft.graph.NeighborAgg.undirectedEdges(spark, withSeq, ents)
    val ordered = graft.graph.NeighborAgg.orderedNeighbors(spark, edges, ents)
    graft.graph.NeighborAgg.blocks(spark, ordered, graft.embed.Embedder.embedEntities(spark, ents, tinyCfg.embed), ents, tinyCfg.embed.dim)
      .map(b => (b.id, b.kg, b.validLen))
      .toDF("id", "kg", "valid_len")
  }

  /** Multimodal column plumbing: media payloads as opaque binary with
    * typed metadata, batched per-partition feature extraction.
    *
    * The decode step is a DETERMINISTIC STUB (no image/audio libs ship
    * in this container): bytes → 8 per-stride group sums, L2-normalized
    * and quantized into one fingerprint column (the driver comparator
    * can't hash arrays). The Spark-side contract — binary column,
    * metadata struct, partition-batched extraction kernel, fixed-length
    * feature output — is real and is exactly what a libjpeg/ffmpeg
    * kernel would plug into. The per-row arithmetic is kept
    * INTEGER-EXACT until one sqrt/divide/round (group sums are integer,
    * the norm is `sqrt` of an integer — correctly-rounded IEEE on both
    * engines), so since round 5 this query is ORACLE-CHECKED: the
    * DuckDB twin recovers the UTF-8 payload bytes through
    * `hex(encode(text))` digit arithmetic and replays the same
    * fold (VERDICT r4 next #6; the earlier float32 accumulator was the
    * one part SQL could not replicate bit-for-bit). */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"), // stand-in media bytes
        struct(col("lang").as("codec"), col("n_chars").as("n_bytes")).as("meta"))
    val ds = media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      // one "decoder init" per partition; rows processed in batches
      it.grouped(64).flatMap(_.iterator.map { case (id, bytes) =>
        val s = new Array[Long](8)
        var i = 0
        while (i < bytes.length) {
          s(i % 8) += (bytes(i) & 0xff) // ??? real decode goes here
          i += 1
        }
        // ss accumulates EXACT in Long like the twin's HUGEINT sum with
        // one cast at the sqrt (ADVICE r5): a double accumulator loses
        // ULPs once a group sum exceeds ~9.4e7 (multi-MB payloads) and
        // could diverge from the oracle; Long is exact to ~94 MB/group
        var ss = 0L
        var j = 0
        while (j < 8) { ss += s(j) * s(j); j += 1 }
        val norm = math.sqrt(ss.toDouble)
        var fp = 0L
        j = 0
        while (j < 8) {
          // floor(x + 0.5) EXPLICITLY on both engines: Java's
          // Math.round special-cases the 0.49999999999999994 class
          // while SQL round() is half-away-from-zero — two spellings
          // that agree almost everywhere is exactly the bug class the
          // type-strict harness exists to keep out
          fp = fp * 31 + (if (norm == 0.0) 0L
                          else math.floor(1000.0 * s(j) / norm + 0.5).toLong)
          j += 1
        }
        (id, bytes.length.toLong, fp)
      })
    }.toDF("doc_id", "n_bytes", "feat_fp")
  }

  /** DuckDB twin of [[qMediaFeatures]]: UTF-8 payload bytes recovered
    * from hex digits, the same 8-group integer sums (a 8-row spine keeps
    * empty groups at 0), and the same ordered fold — integer arithmetic
    * plus one sqrt/divide/round shared op-for-op with the kernel. */
  val qMediaFeaturesSql =
    """WITH d AS (SELECT doc_id, strlen(text) AS n_bytes, hex(encode(text)) AS h FROM documents),
       bytes AS (
         SELECT doc_id, i % 8 AS grp,
           (strpos('0123456789ABCDEF', substring(h, CAST(2*i+1 AS INT), 1)) - 1) * 16
         + (strpos('0123456789ABCDEF', substring(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte
         FROM (SELECT doc_id, h, unnest(range(0, n_bytes)) AS i FROM d)),
       gs AS (
         SELECT d.doc_id, j.grp, coalesce(s.s, 0) AS s
         FROM d CROSS JOIN (SELECT unnest(range(0, 8)) AS grp) j
         LEFT JOIN (SELECT doc_id, grp, sum(byte) AS s FROM bytes GROUP BY 1, 2) s
           ON s.doc_id = d.doc_id AND s.grp = j.grp),
       vec AS (
         SELECT doc_id, list(s ORDER BY grp) AS ss,
                sqrt(CAST(sum(s*s) AS DOUBLE)) AS nn
         FROM gs GROUP BY doc_id)
       SELECT v.doc_id, CAST(d.n_bytes AS BIGINT) AS n_bytes,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(ss, s -> CAST(CASE WHEN nn = 0 THEN 0
             ELSE floor(1000.0 * s / nn + 0.5) END AS BIGINT))),
           (acc, v) -> acc * 31 + v) AS feat_fp
       FROM vec v JOIN d ON v.doc_id = d.doc_id"""

  /** Frame-sample the stand-in media payloads (stride 32) and emit the
    * per-doc frame inventory. The DuckDB twin derives the same counts
    * arithmetically from the byte length — so the oracle checks the
    * generator's chunk arithmetic AND the reassembly invariant
    * (sum of frame bytes = payload bytes) per row. */
  def qMediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.extract.MediaKernels.harnessMedia(spark, dir)
      .filter(r => r.payload.nonEmpty)
    graft.extract.MediaKernels.frameSample(media, 32).toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(length(col("frame"))).cast("long").as("sum_frame_bytes"),
        max(length(col("frame"))).cast("long").as("max_frame_bytes"))
  }

  val qMediaFramesSql =
    """SELECT doc_id,
       CAST((strlen(text) + 31) // 32 AS BIGINT) AS n_frames,
       CAST(strlen(text) AS BIGINT) AS sum_frame_bytes,
       CAST(least(strlen(text), 32) AS BIGINT) AS max_frame_bytes
       FROM documents WHERE strlen(text) > 0"""

  /** Resize (sample-decimate by 4) the stand-in media payloads; the twin
    * checks the output-size arithmetic per row. */
  def qMediaResize(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.extract.MediaKernels.harnessMedia(spark, dir)
      .filter(r => r.payload.nonEmpty)
    graft.extract.MediaKernels.resize(media, 4).toDF()
      .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes_out"))
  }

  val qMediaResizeSql =
    """SELECT doc_id, CAST((strlen(text) + 3) // 4 AS BIGINT) AS n_bytes_out
       FROM documents WHERE strlen(text) > 0"""

  val sqlChecked: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_media_frames" -> (qMediaFrames _, qMediaFramesSql),
    "q_media_resize" -> (qMediaResize _, qMediaResizeSql),
    "q_media_features" -> (qMediaFeatures _, qMediaFeaturesSql))

  val rowsOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kg_canonical_triples" -> (qKgCanonicalTriples _),
    "q_kg_alignment" -> (qKgAlignment _),
    "q_lsh_candidates" -> (qLshCandidates _),
    "q_ivf_candidates" -> (qIvfCandidates _),
    "q_kg_neighbor_blocks" -> (qKgNeighborBlocks _),
    "q_kg_ssl_alignment" -> (qKgSslAlignment _),
    "q_kg_incremental" -> (qKgIncremental _),
    "q_kg_retract" -> (qKgRetract _),
    "q_kg_indexed" -> (qKgIndexed _),
    "q_kg_rebootstrap" -> (qKgRebootstrap _))
}
