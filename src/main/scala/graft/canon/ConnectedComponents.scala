package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Iterative connected components over accepted alignment edges —
  * large-star / small-star alternation (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14), expressed as pure
  * DataFrame window-min propagation so Catalyst + AQE handle
  * partitioning (north star: canonicalization via iterative
  * connected-components large-star/small-star joins; no GraphX,
  * Dataset/Catalyst only).
  *
  * Each star is MIN-PROPAGATION over a partition-only window — never a
  * collect_set: a hub node of degree 10^8 streams through the window
  * operator's spillable sort instead of materializing one multi-GB
  * array row (the canonicalization primitive must survive hubs at the
  * 10^12-doc design point). One shuffle per star, narrow (long, long)
  * rows throughout.
  *
  * Converges in O(log^2 n) rounds; alignment components are near-pairs
  * (diameter ≤ 3) so 2–4 rounds in practice. Convergence is detected by
  * an order-independent checksum aggregate (xor/sum of edge hashes) —
  * no driver-side edge materialization.
  *
  * Per-round lineage cut: each round's edge set is checkpointed so the
  * DAG doesn't grow by two window stages per round. When the session has
  * a RELIABLE checkpoint dir (`sc.setCheckpointDir`, e.g. HDFS/object
  * store on a real cluster), rounds use `checkpoint()` — a lost executor
  * mid-iteration recovers from the checkpoint files. Without one (this
  * sandbox's local[N], where executor loss ≡ JVM loss anyway) rounds
  * fall back to `localCheckpoint()`, whose executor-local blocks have no
  * lineage to recover from — the documented single-box trade-off. At the
  * 10^12-doc design point, set a checkpoint dir.
  */
object ConnectedComponents {

  /** Round lineage cut: reliable checkpoint when the session has a
    * checkpoint dir, executor-local otherwise (see class doc). The local
    * form is LAZY — the checksum that immediately follows every cut
    * materializes the blocks inside its own job, so each round costs ONE
    * job instead of two (driver job-scheduling latency is the serial
    * floor that Amdahl-caps small-corpus scaling; measured ~0.2-5 s per
    * job gap on this VM). The reliable form stays eager: a lazy reliable
    * checkpoint recomputes its lineage once more when writing the
    * checkpoint files, which costs more than the job it saves. */
  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(eager = false)

  private def largeStar(edges: DataFrame): DataFrame = {
    // symmetrize; per node u: m = min(N(u) ∪ {u}); emit (v, m) for v > u.
    // NO distinct here: the output feeds smallStar's window-min, which
    // streams duplicates harmlessly, and each input edge emits at most
    // one row so the round's row count stays ≤ 2|E| — dropping the
    // dedup saves one full shuffle per round (smallStar's closing
    // distinct re-bounds the edge set before the next round).
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    val m = least(min(col("b")).over(Window.partitionBy(col("a"))), col("a"))
    sym.withColumn("m", m)
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    // orient u > v; per u: m = min(N(u) ∪ {u}) = min(v); emit (v, m) ∀ v ≠ m
    // plus (u, m) — u > v ≥ m so u ≠ m always holds
    val oriented = edges.select(
      greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
    val withM = oriented.withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
    withM.filter(col("v") =!= col("m"))
      .select(col("v").as("a"), col("m").as("b"))
      .unionByName(withM.select(col("u").as("a"), col("m").as("b")))
      .distinct()
  }

  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges.select(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** edges: DataFrame(a LONG, b LONG) undirected.
    * Returns DataFrame(node LONG, component LONG) where component is the
    * minimum node id reachable — for every node appearing in any edge. */
  def run(spark: SparkSession, edges0: DataFrame, maxIter: Int = 20,
          verbose: Boolean = false): DataFrame = {
    var edges = cut(edges0.select(col("a").cast("long"), col("b").cast("long"))
      .filter(col("a") =!= col("b")).distinct())
    var prev = checksum(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val t0 = System.nanoTime()
      val next = cut(smallStar(largeStar(edges)))
      val cur = checksum(next)
      converged = cur == prev
      prev = cur
      edges = next
      it += 1
      if (verbose) println(f"[cc] round $it: edges=${cur._1} ${(System.nanoTime() - t0) / 1e9}%.2f s converged=$converged")
    }
    // at convergence every edge is (node > root, root = component min)
    val nodes = edges.select(col("a").as("node"), col("b").as("component"))
    val roots = edges.select(col("b").as("node")).distinct()
      .withColumn("component", col("node"))
    nodes.unionByName(roots).groupBy("node").agg(min("component").as("component"))
  }

  /** Incremental merge — the continuous-construction operating mode: a
    * COMMITTED assignment (node, component) plus a DELTA batch of new
    * edges, recomputing only the components the delta touches.
    *
    * At the 10^12-doc design point a full [[run]] re-shuffles the whole
    * edge set for every arriving batch; here the prior assignment is
    * scanned narrowly instead — `touchedComps` (≤ 2·|delta| rows) rides
    * BROADCAST joins, so untouched components stream through a
    * broadcast anti-join with no shuffle and no star rounds. Only the
    * touched components' members re-enter the large/small-star loop,
    * folded in as star edges (node → component), which preserve exactly
    * their connectivity.
    *
    * EXACT equivalence, labels included:
    * `incremental(run(E1), E2) == run(E1 ∪ E2)` — star edges keep each
    * prior component's node set intact, so the merged component's
    * min-id label is the min over the identical node set either way
    * (gated by OperatorSpec equality tests). Brand-new nodes appear in
    * the delta and are labeled by the same merge. The delta is assumed
    * small relative to the corpus (the continuous-ingest shape); a
    * delta comparable to the corpus should just re-[[run]].
    */
  def incremental(spark: SparkSession, priorAssign: DataFrame,
                  newEdges0: DataFrame, maxIter: Int = 20,
                  driverCap: Int = 2000000): DataFrame = {
    val prior = priorAssign
      .select(col("node").cast("long"), col("component").cast("long"))
    val newEdges = newEdges0
      .select(col("a").cast("long"), col("b").cast("long"))
      .filter(col("a") =!= col("b")).distinct()
    val endpoints = newEdges.select(col("a").as("node"))
      .unionByName(newEdges.select(col("b").as("node"))).distinct()
    // components owning a delta endpoint; delta-sized by construction
    val touchedComps = broadcast(
      prior.join(broadcast(endpoints), "node").select("component").distinct())
    // every member of a touched component re-enters the merge as a star
    // edge; singleton roots carry no star edge but are delta endpoints
    // by definition of touched, so run() still covers them
    val starEdges = prior.join(touchedComps, "component")
      .filter(col("node") =!= col("component"))
      .select(col("node").as("a"), col("component").as("b"))
    val merged = runSmall(spark, starEdges.unionByName(newEdges), maxIter, driverCap)
    // USING-join moves the join column first — re-fix (node, component)
    prior.join(touchedComps, Seq("component"), "left_anti")
      .select(col("node"), col("component"))
      .unionByName(merged)
  }

  /** Min-label connected components of a small edge array — the driver
    * fast path of [[incremental]]/[[maintain]]. Union-find with
    * union-by-min-id (the root IS the component label) + path
    * compression. Exact twin of [[run]]'s output on the same edges. */
  private[canon] def localCC(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
    }
    val nodes = scala.collection.mutable.LongMap.empty[Long]
    edges.foreach { case (a, b) => if (a != b) { nodes(a) = 0L; nodes(b) = 0L } }
    nodes.keys.iterator.map(n => (n, find(n))).toArray
  }

  /** CC of an edge set KNOWN to be delta-sized (the incremental rebuild
    * sets): collect up to `driverCap` edges and solve with a driver
    * union-find — ZERO distributed jobs per star round, which is the
    * measured cost of small rebuilds (the star loop's per-round shuffles
    * are pure scheduling latency on delta-sized data). Larger sets fall
    * back to the distributed loop. */
  private def runSmall(spark: SparkSession, edges: DataFrame, maxIter: Int,
                       driverCap: Int): DataFrame = {
    import spark.implicits._
    val normed = edges.select(col("a").cast("long"), col("b").cast("long"))
      .filter(col("a") =!= col("b"))
    val local = normed.limit(driverCap + 1).as[(Long, Long)].collect()
    if (local.length > driverCap) run(spark, edges, maxIter)
    else if (local.isEmpty) spark.emptyDataset[(Long, Long)].toDF("node", "component")
    else spark.createDataFrame(localCC(local).toSeq).toDF("node", "component")
  }

  private def norm(edges: DataFrame): DataFrame =
    edges.select(col("a").cast("long"), col("b").cast("long"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()

  /** Full maintenance — additions AND removals. A removed alignment edge
    * (a committed query whose rank-1 target changed under a grown corpus)
    * can SPLIT a component, which [[incremental]]'s addition-only merge
    * cannot express — so touched components are REBUILT from their
    * original edges: `edgesTable` is the committed accepted-edge set the
    * prior assignment was computed from (the continuous pipeline keeps it
    * as an append/tombstone table next to the assignment).
    *
    * Cost shape at the 10^12 design point: touched components and their
    * members are delta-sized (alignment components are near-pairs,
    * diameter ≤ 3); the committed edge table is scanned ONCE, filtered by
    * a semi-join against the touched-member set — no star rounds run over
    * untouched components, which stream through the same broadcast
    * anti-join as [[incremental]].
    *
    * Contract (gated by OperatorSpec): nodes never disappear —
    * `maintain(run(E), E, add, rem)` equals
    * `run((E ∖ rem) ∪ add)` plus `(n, n)` for every prior node left
    * edgeless by the removals. Edge identity is undirected: (a,b) and
    * (b,a) are the same edge on every input. */
  def maintain(spark: SparkSession, priorAssign: DataFrame, edgesTable: DataFrame,
               added0: DataFrame, removed0: DataFrame, maxIter: Int = 20,
               driverCap: Int = 2000000): DataFrame =
    maintainDetailed(spark, priorAssign, edgesTable, added0, removed0, maxIter, driverCap)._1

  /** [[maintain]] plus the CHANGE SET: (new assignment, the (node,
    * component) rows whose label differs from the prior assignment —
    * including brand-new nodes). The change set is what downstream
    * maintenance needs (relabel only the canonical triples touching a
    * changed node) and is bounded by the touched components' member
    * count, so the caller never diffs two corpus-sized assignments. */
  def maintainDetailed(spark: SparkSession, priorAssign: DataFrame, edgesTable: DataFrame,
                       added0: DataFrame, removed0: DataFrame,
                       maxIter: Int = 20, driverCap: Int = 2000000): (DataFrame, DataFrame) = {
    val prior = priorAssign
      .select(col("node").cast("long"), col("component").cast("long"))
    val committed = norm(edgesTable)
    val added = norm(added0)
    val removed = norm(removed0)
    val newEdges = committed.join(removed, Seq("a", "b"), "left_anti").unionByName(added)
    // delta endpoints — components owning any touch re-enter the rebuild
    val deltaNodes = added.unionByName(removed)
    val endpoints = deltaNodes.select(col("a").as("node"))
      .unionByName(deltaNodes.select(col("b").as("node"))).distinct()
    val touchedComps = broadcast(
      prior.join(broadcast(endpoints), "node").select("component").distinct())
    // touched members + brand-new nodes; closure ⇒ every edge with one
    // endpoint here has BOTH endpoints here, so one semi-join suffices
    val members = prior.join(touchedComps, "component").select("node")
      .unionByName(endpoints).distinct()
    val rebuildEdges = newEdges.join(broadcast(members),
      newEdges("a") === members("node"), "left_semi")
    val rebuilt = runSmall(spark, rebuildEdges, maxIter, driverCap)
    // PRIOR members left edgeless by removals still exist — as singletons
    // (endpoints seen only in no-op removals never existed and stay out;
    // added endpoints always carry their added edge into the rebuild)
    val isolated = prior.join(touchedComps, "component").select("node")
      .join(rebuilt.select(col("node")), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    val assignment = prior.join(touchedComps, Seq("component"), "left_anti")
      .select(col("node"), col("component"))
      .unionByName(rebuilt).unionByName(isolated)
    // only rebuilt/isolated rows can differ from prior; new nodes have
    // no prior row (left join null) and always count as changed
    val touchedRows = rebuilt.unionByName(isolated)
    val changed = touchedRows
      .join(prior.withColumnRenamed("component", "prior_component"), Seq("node"), "left")
      .filter(col("prior_component").isNull || col("prior_component") =!= col("component"))
      .select(col("node"), col("component"))
    (assignment, changed)
  }
}
