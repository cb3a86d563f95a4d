package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search + graph/window operators with DuckDB oracle twins:
  * brute-force cosine top-k (the J4 exact path on the harness embeddings
  * table), Hit@k eval (J5/A4), ordered-dedup neighbor aggregation (A1 via
  * the typed Aggregator), connected components (recursive-CTE oracle),
  * and event-time windows/sessionization. */
object EmbedQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Cosine via the native codegen expression (functions/VectorKernels):
    * identical operation order to DuckDB's list_cosine_similarity double
    * math (widen → sequential accumulate → divide by each norm), so
    * cross-engine rank agreement holds, and the N×M scoring loop stays
    * inside whole-stage codegen (VectorKernelsSpec asserts both). */
  private def cosCol(spark: SparkSession) =
    graft.functions.VectorKernels.cosineSim(spark, col("qe"), col("ce"))

  // ---------- J4 exact path: brute-force cosine top-k ----------

  def qCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 50).select(col("vec_id").as("src"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("dst"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
    q.join(broadcast(c), col("src") =!= col("dst"))
      .withColumn("cos", cosCol(spark))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("src"), col("rank"), col("dst"))
  }

  val qCosineTopKSql =
    """SELECT src, rank, dst FROM (
         SELECT q.vec_id AS src, c.vec_id AS dst,
                row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id ASC) AS rank
         FROM embeddings q JOIN embeddings c ON q.vec_id < 50 AND q.vec_id <> c.vec_id)
       WHERE rank <= 5"""

  // ---------- J5/A4: Hit@k eval (label-match proxy for gold links) ----------

  def qHitAtK(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val labels = e.select(col("vec_id"), col("label"))
    val topk = qCosineTopK(spark, dir)
    topk
      .join(labels.toDF("src", "src_label"), Seq("src"))
      .join(labels.toDF("dst", "dst_label"), Seq("dst"))
      .groupBy(col("src"))
      .agg(
        max(when(col("rank") === 1 && col("src_label") === col("dst_label"), 1).otherwise(0)).as("h1"),
        max(when(col("src_label") === col("dst_label"), 1).otherwise(0)).as("h5"))
      .agg(sum(col("h1")).as("n_hit1"), sum(col("h5")).as("n_hit5"), count(lit(1)).as("n_queries"))
  }

  val qHitAtKSql =
    s"""WITH topk AS ($qCosineTopKSql),
       lab AS (SELECT vec_id, label FROM embeddings),
       per AS (SELECT src,
                max(CASE WHEN rank = 1 AND ls.label = ld.label THEN 1 ELSE 0 END) AS h1,
                max(CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END) AS h5
               FROM topk JOIN lab ls ON topk.src = ls.vec_id JOIN lab ld ON topk.dst = ld.vec_id
               GROUP BY src)
       SELECT CAST(sum(h1) AS BIGINT) AS n_hit1, CAST(sum(h5) AS BIGINT) AS n_hit5,
              count(*) AS n_queries FROM per"""

  // ---------- A1: ordered-dedup neighbor agg (the typed Aggregator) ----------

  def qNeighborAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // l_linenumber is not unique per order: derive a unique seq with a
    // deterministic partkey tiebreak (mirrored in the oracle SQL).
    // Output is EXPLODED (center, pos, neighbor) rows — scalar columns so
    // the driver comparator can hash them (its pandas sort dies on arrays).
    val edges = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("center"),
        col("l_partkey").cast("string").as("neighbor"),
        col("l_partkey").as("neighborId"),
        (col("l_linenumber").cast("long") * 100000 + col("l_partkey")).as("seq"))
      .as[graft.graph.Edge]
    edges.groupByKey(_.center)
      .agg(new graft.graph.OrderedDedupAgg(5).toColumn.name("ns"))
      .flatMap { case (c, ns) =>
        ns.iterator.zipWithIndex.map { case ((_, nid), i) => (c, (i + 1).toLong, nid) } }
      .toDF("center", "pos", "neighbor")
  }

  val qNeighborAggSql =
    """WITH e AS (
         SELECT l_orderkey AS center, l_partkey AS nb,
                CAST(l_linenumber AS BIGINT) * 100000 + l_partkey AS seq,
                row_number() OVER (PARTITION BY l_orderkey, l_partkey ORDER BY l_linenumber) AS rn
         FROM lineitem),
       d AS (SELECT center, nb, seq FROM e WHERE rn = 1),
       r AS (SELECT center, nb, row_number() OVER (PARTITION BY center ORDER BY seq) AS pos FROM d)
       SELECT center, pos, nb AS neighbor FROM r WHERE pos <= 5"""

  // ---------- embedding-cosine near-dup (brute-force baseline) ----------

  /** Embedding-cosine near-duplicate pairs — the brute-force baseline of
    * the training-data dedup family (the scale path is the LSH-bucketed
    * q_lsh_candidates). Threshold 0.3's nearest pair margin on the
    * harness data is 7e-5, far above cross-engine double noise, so the
    * pair SET is oracle-exact; only integer columns are emitted. */
  def qCosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("d1"), col("embedding").as("qe"), col("label").as("l1"))
    val b = e.select(col("vec_id").as("d2"), col("embedding").as("ce"), col("label").as("l2"))
    a.join(broadcast(b), col("d1") < col("d2"))
      .withColumn("cos", cosCol(spark))
      .filter(col("cos") >= 0.3)
      .select(col("d1"), col("d2"),
        when(col("l1") === col("l2"), 1L).otherwise(0L).as("same_label"))
  }

  val qCosineNearDupSql =
    """SELECT a.vec_id AS d1, b.vec_id AS d2,
       CAST(CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS BIGINT) AS same_label
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3"""

  // ---------- A1 variant: per-relation neighbor grouping (Neighbors.py:18-28) ----------

  def qNeighborAggRel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = t(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long").as("center"),
        pmod(col("l_partkey"), lit(4)).cast("long").as("rel"),
        col("l_suppkey").cast("string").as("neighbor"),
        col("l_suppkey").cast("long").as("neighborId"),
        (col("l_linenumber").cast("long") * 100000 + col("l_suppkey")).as("seq"))
      .as[graft.graph.RelEdge]
    graft.graph.NeighborAgg.orderedNeighborsByRel(spark, edges, 3)
      .flatMap { case ((c, r), ns) =>
        ns.iterator.zipWithIndex.map { case ((_, nid), i) => (c, r, (i + 1).toLong, nid) } }
      .toDF("center", "rel", "pos", "neighbor")
  }

  val qNeighborAggRelSql =
    """WITH e AS (
         SELECT l_orderkey AS center, l_partkey % 4 AS rel, l_suppkey AS nb,
                CAST(l_linenumber AS BIGINT) * 100000 + l_suppkey AS seq,
                row_number() OVER (PARTITION BY l_orderkey, l_partkey % 4, l_suppkey ORDER BY l_linenumber) AS rn
         FROM lineitem),
       d AS (SELECT center, rel, nb, seq FROM e WHERE rn = 1),
       r AS (SELECT center, rel, nb, row_number() OVER (PARTITION BY center, rel ORDER BY seq) AS pos FROM d)
       SELECT CAST(center AS BIGINT) AS center, CAST(rel AS BIGINT) AS rel, pos,
              CAST(nb AS BIGINT) AS neighbor FROM r WHERE pos <= 3"""

  // ---------- J5/A4 full scope: valid/test two-set eval with sentinel ----------

  /** Reference two-set eval (model/layers_LaBSE_neighbor.py:304-331):
    * valid and test link sets scored separately; a source whose gold
    * target is missing maps to sentinel 99999 and counts as a miss.
    * Gold here: min same-label other vector (null → sentinel). */
  def qEvalTwoSet(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val others = e.select(col("vec_id").as("cid"), col("label").as("clabel"))
    val gold = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("e1"), col("label"))
      .join(others, col("label") === col("clabel") && col("cid") =!= col("e1"), "left")
      .groupBy(col("e1")).agg(min(col("cid")).as("e2"))
    val valid = gold.filter(col("e1") < 25)
    val test = gold.filter(col("e1") >= 25)
    val cands = qCosineTopK(spark, dir)
      .select(col("src").as("srcId"), col("dst").as("dstId"), col("rank"))
    graft.eval.Metrics.evalTwoSet(spark, cands, valid, test, k = 5)
  }

  val qEvalTwoSetSql =
    s"""WITH topk AS ($qCosineTopKSql),
       gold AS (SELECT s.vec_id AS e1, min(c.vec_id) AS e2
                FROM embeddings s LEFT JOIN embeddings c
                  ON s.label = c.label AND c.vec_id <> s.vec_id
                WHERE s.vec_id < 50 GROUP BY s.vec_id),
       g2 AS (SELECT CASE WHEN e1 < 25 THEN 'valid' ELSE 'test' END AS split,
                     e1, coalesce(e2, 99999) AS e2 FROM gold),
       per AS (SELECT split, e1,
                 max(CASE WHEN dst = e2 AND rank = 1 THEN 1 ELSE 0 END) AS h1,
                 max(CASE WHEN dst = e2 AND rank <= 5 THEN 1 ELSE 0 END) AS hk
               FROM g2 LEFT JOIN topk ON topk.src = g2.e1
               GROUP BY split, e1)
       SELECT split, count(*) AS n_sources, CAST(sum(h1) AS BIGINT) AS n_hit1,
              CAST(sum(hk) AS BIGINT) AS n_hitk
       FROM per GROUP BY split"""

  // ---------- F3 quantized variant: 16-bit embedding quantization ----------

  /** The 16-bit quantization the candidate cogroups ship vectors in
    * (LshTopK.quantize — scale 32767, round half-up), oracle-checked
    * ELEMENT-WISE: the real kernel runs row-by-row and its exploded
    * (vec_id, pos, q16) output must match DuckDB's
    * floor(x·32767 + 0.5) in double — the exact arithmetic the kernel
    * performs (f32×32767 is exact in f64). Same call-the-kernel
    * discipline as q_token_features. */
  def qEmbedQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        graft.candidates.LshTopK.quantize(emb).iterator.zipWithIndex.map {
          case (q, i) => (id, (i + 1).toLong, q.toLong) }
      }.toDF("vec_id", "pos", "q16")
  }

  val qEmbedQuantizeSql =
    """SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) AS pos,
       CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 32767 + 0.5) AS BIGINT) AS q16
       FROM embeddings"""

  // ---------- connected components vs recursive-CTE oracle ----------

  def qConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val edges = t(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("a"), (col("n_regionkey") + 100).cast("long").as("b"))
    // size-gated auto path (round 6): the engine's production CC entry —
    // driver union-find under the cap, the distributed star loop above
    // it (runAuto == run row-for-row, equality-gated in OperatorSpec);
    // the distributed loop's ~18 scheduled jobs on this 25-edge input
    // were pure driver scheduling latency, the cost degraded host
    // windows multiply
    graft.canon.ConnectedComponents.runAuto(spark, edges)
  }

  val qConnectedComponentsSql =
    """WITH RECURSIVE e AS (SELECT CAST(n_nationkey AS BIGINT) AS a, CAST(n_regionkey + 100 AS BIGINT) AS b FROM nation),
       sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
       reach AS (SELECT a AS node, b AS r FROM sym
                 UNION SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a)
       SELECT node, min(r) AS component FROM (
         SELECT node, r FROM reach UNION SELECT node, node FROM reach) GROUP BY node"""

  // ---------- incremental CC: committed assignment + delta batch ----------

  /** Continuous-construction mode: batch 1 (nation→region hubs) is
    * committed via [[graft.canon.ConnectedComponents.run]], then a
    * supplier-derived delta batch merges hubs and introduces unseen
    * nodes via [[graft.canon.ConnectedComponents.incremental]]. The
    * oracle is the full recursive-CTE closure over BOTH batches — the
    * exactness invariant `incremental(run(E1), E2) == run(E1 ∪ E2)`,
    * labels included. */
  def qCcIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e1 = t(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("a"), (col("n_regionkey") + 100).cast("long").as("b"))
    val e2 = t(spark, dir, "supplier")
      .select((col("s_suppkey") % 25).cast("long").as("a"), ((col("s_suppkey") % 7) + 100).cast("long").as("b"))
    // prior via the size-gated auto path (round 6; same rows as run —
    // OperatorSpec equality) — the committed assignment a real stream
    // would hold, without the star loop's per-round scheduled jobs
    val prior = graft.canon.ConnectedComponents.runAuto(spark, e1)
    graft.canon.ConnectedComponents.incremental(spark, prior, e2)
  }

  val qCcIncrementalSql =
    """WITH RECURSIVE e AS (
         SELECT CAST(n_nationkey AS BIGINT) AS a, CAST(n_regionkey + 100 AS BIGINT) AS b FROM nation
         UNION
         SELECT CAST(s_suppkey % 25 AS BIGINT) AS a, CAST(s_suppkey % 7 + 100 AS BIGINT) AS b FROM supplier),
       sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
       reach AS (SELECT a AS node, b AS r FROM sym
                 UNION SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a)
       SELECT node, min(r) AS component FROM (
         SELECT node, r FROM reach UNION SELECT node, node FROM reach) GROUP BY node"""

  // ---------- CC maintenance with removals (splits + singletons) ----------

  /** CC maintenance under additions AND removals: removals split the
    * nation star components (every n_nationkey % 3 == 0 edge retracted),
    * a sparse supplier batch re-links part of the hole, and prior nodes
    * left edgeless must survive as explicit singletons — the full
    * [[graft.canon.ConnectedComponents.maintain]] contract through the
    * driver's oracle gate (DuckDB recursive-CTE CC over the final edge
    * set plus the singleton rule). */
  def qCcMaintain(spark: SparkSession, dir: String): DataFrame = {
    val e1 = t(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("a"), (col("n_regionkey") + 100).cast("long").as("b"))
    val rem = e1.filter(col("a") % 3 === 0)
    val add = t(spark, dir, "supplier").filter(col("s_suppkey") % 5 === 1)
      .select((col("s_suppkey") % 25).cast("long").as("a"), ((col("s_suppkey") % 7) + 100).cast("long").as("b"))
    // prior via the size-gated auto path (round 6; rows identical — see
    // qCcIncremental)
    val prior = graft.canon.ConnectedComponents.runAuto(spark, e1)
    graft.canon.ConnectedComponents.maintain(spark, prior, e1, add, rem)
  }

  val qCcMaintainSql =
    """WITH RECURSIVE e1 AS (
         SELECT CAST(n_nationkey AS BIGINT) AS a, CAST(n_regionkey + 100 AS BIGINT) AS b FROM nation),
       rems AS (SELECT a, b FROM e1 WHERE a % 3 = 0),
       adds AS (SELECT CAST(s_suppkey % 25 AS BIGINT) AS a, CAST(s_suppkey % 7 + 100 AS BIGINT) AS b
                FROM supplier WHERE s_suppkey % 5 = 1),
       f AS (SELECT a, b FROM (SELECT a, b FROM e1 EXCEPT SELECT a, b FROM rems)
             UNION SELECT a, b FROM adds),
       sym AS (SELECT a, b FROM f UNION SELECT b, a FROM f),
       reach AS (SELECT a AS node, b AS r FROM sym
                 UNION SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a),
       cc AS (SELECT node, min(r) AS component FROM (
                SELECT node, r FROM reach UNION SELECT node, node FROM reach) GROUP BY node),
       priornodes AS (SELECT a AS node FROM e1 UNION SELECT b AS node FROM e1)
       SELECT node, component FROM cc
       UNION ALL
       SELECT node, node AS component FROM priornodes
       WHERE node NOT IN (SELECT node FROM cc)"""

  // ---------- event-time tumbling window ----------

  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        countDistinct(col("user_id")).as("n_users"))

  val qEventsWindowSql =
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
       min(value) AS min_v, max(value) AS max_v, count(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1, 2"""

  // ---------- sessionization (lag + conditional cumulative sum) ----------

  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("gap", unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  val qSessionizeSql =
    """WITH g AS (
         SELECT user_id,
                epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS gap
         FROM events)
       SELECT user_id,
              CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
              count(*) AS n_events
       FROM g GROUP BY user_id"""

  val sqlChecked: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_cosine_topk" -> (qCosineTopK _, qCosineTopKSql),
    "q_cosine_neardup" -> (qCosineNearDup _, qCosineNearDupSql),
    "q_hit_at_k" -> (qHitAtK _, qHitAtKSql),
    "q_neighbor_agg" -> (qNeighborAgg _, qNeighborAggSql),
    "q_neighbor_agg_rel" -> (qNeighborAggRel _, qNeighborAggRelSql),
    "q_eval_two_set" -> (qEvalTwoSet _, qEvalTwoSetSql),
    "q_embed_quantize" -> (qEmbedQuantize _, qEmbedQuantizeSql),
    "q_connected_components" -> (qConnectedComponents _, qConnectedComponentsSql),
    "q_cc_incremental" -> (qCcIncremental _, qCcIncrementalSql),
    "q_cc_maintain" -> (qCcMaintain _, qCcMaintainSql),
    "q_events_window" -> (qEventsWindow _, qEventsWindowSql),
    "q_sessionize" -> (qSessionize _, qSessionizeSql))
}
