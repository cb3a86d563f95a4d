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
}
