package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver-checked operator battery (SURVEY.md §2 inventory), expressed
  * over the driver's testdata tables with exact DuckDB oracle twins.
  *
  * Naming maps each query to the reference operator(s) it exercises.
  * Output discipline for oracle parity: integer/string/timestamp columns
  * wherever possible; any computed double is rounded identically on both
  * sides; every aggregate aliased identically in Spark and SQL (the
  * driver sorts columns by name before hashing).
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session-lifetime cache for the TableIO demo tables the battery
    * commits into temp dirs (`q_table_time_travel`/`q_table_range_scan`):
    * repeated invocations in one JVM reuse the first commit (so the
    * benched cost converges on the READ path the query name advertises,
    * not the setup write), and a shutdown hook removes the temp roots —
    * repeated bench/correctness runs no longer accumulate orphan dirs
    * (ADVICE r3). Keying/staleness/lifecycle live in
    * [[graft.util.SessionTemp]] (shared with TextQueries' staged
    * signature frames): source-listing digest key — a regenerated
    * documents.parquet can never serve the previous generation's commit
    * while the DuckDB twin reads the new rows (ADVICE r4) — and a
    * missing source fails fast. */
  private def cachedTmpTable(kind: String, dir: String)(setup: String => Long): (String, Long) =
    graft.util.SessionTemp.keyed(s"tbl-$kind", new java.io.File(s"$dir/documents.parquet")) {
      root =>
        val base = root + "/docs"
        (base, setup(base))
    }

  // ---------- S1/P1/P2: scan, projection, filter pushdown ----------

  def qScanFilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val qScanFilterProjectSql =
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity >= 45"

  // ---------- A4/A6: grouped aggregation ----------

  def qGroupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))

  val qGroupAggSql =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
       count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
       FROM lineitem GROUP BY l_returnflag, l_linestatus"""

  // ---------- P3: URL→label projection (extract_rel.py:43) ----------

  def qLabelProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(element_at(split(concat(lit("type/"), col("p_type"), lit("/"), col("p_brand")), "/"), -1).as("label"))
      .groupBy(col("label")).agg(count(lit(1)).as("n"))

  val qLabelProjectSql =
    """SELECT list_extract(string_split('type/' || p_type || '/' || p_brand, '/'), -1) AS label,
       count(*) AS n FROM part GROUP BY 1"""

  // ---------- P4/P5: membership semi-join filter ----------

  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").filter(col("l_quantity") > 49)
    t(spark, dir, "orders")
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
  }

  val qSemiJoinSql =
    """SELECT o_orderpriority, count(*) AS n FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)
       GROUP BY o_orderpriority"""

  // ---------- anti join (engine-added; Catalyst built-in) ----------

  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without_big_order"))

  val qAntiJoinSql =
    """SELECT c_nationkey, count(*) AS n_without_big_order FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
       GROUP BY c_nationkey"""

  // ---------- P6: null guard / sentinel after outer join ----------

  def qNullGuard(spark: SparkSession, dir: String): DataFrame = {
    val bigCust = t(spark, dir, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_nationkey"))
    t(spark, dir, "orders")
      .join(bigCust, col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), coalesce(col("c_nationkey"), lit(-1)).as("nation_or_sentinel"))
  }

  val qNullGuardSql =
    """SELECT o_orderkey, coalesce(c.c_nationkey, -1) AS nation_or_sentinel
       FROM orders o LEFT JOIN (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 9000) c
       ON o.o_custkey = c.c_custkey"""

  // ---------- J1: broadcast dict-lookup join ----------

  def qDictJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  val qDictJoinSql =
    """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n
       FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand"""

  // ---------- J2: two-key equi join ----------

  def qTwoKeyJoin(spark: SparkSession, dir: String): DataFrame = {
    // Round-6 plan (guide §2.3/§2.4 — aggregate before the shuffle,
    // remove the self-join): the original two-scan self-join on
    // (k, ln)=(k, ln-1) shuffled the full table twice and re-shuffled
    // the join output for the final groupBy. (k, ln) is NOT unique in
    // this data, so the join is a per-(ln, ln+1) cross product; the
    // same result is exact integer arithmetic over per-(k, ln) partial
    // aggregates: with c = count, s = sum(partkey) per (k, ln),
    //   n_adjacent = Σ_ln c(ln)·c(ln+1)
    //   key_sum    = Σ_ln [c(ln+1)·s(ln) + c(ln)·s(ln+1)]
    // One scan; the first exchange moves map-side-combined (k, ln, c, s)
    // rows, the adjacent pairing is a lead() window on the now-unique
    // (k, ln), and the final groupBy(k) reuses the window's partitioning
    // — bit-identical rows to the join form (same oracle, same hash).
    val w = Window.partitionBy(col("k")).orderBy(col("ln").asc)
    t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"), col("l_partkey").as("p"))
      .groupBy(col("k"), col("ln"))
      .agg(count(lit(1)).as("c"), sum(col("p")).as("s"))
      .withColumn("ln2", lead(col("ln"), 1).over(w))
      .withColumn("c2", lead(col("c"), 1).over(w))
      .withColumn("s2", lead(col("s"), 1).over(w))
      .filter(col("ln2") === col("ln") + 1)
      .groupBy(col("k")).agg(
        sum(col("c") * col("c2")).as("n_adjacent"),
        sum(col("c2") * col("s") + col("c") * col("s2")).as("key_sum"))
  }

  val qTwoKeyJoinSql =
    """SELECT a.l_orderkey AS k, count(*) AS n_adjacent,
       CAST(sum(a.l_partkey + b.l_partkey) AS BIGINT) AS key_sum
       FROM lineitem a JOIN lineitem b
       ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber - 1
       GROUP BY a.l_orderkey"""

  // ---------- J3/U2: symmetric link union (bidirectional dict) ----------

  def qSymmetricUnion(spark: SparkSession, dir: String): DataFrame = {
    val links = t(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("a"), (col("n_regionkey") + 100).cast("long").as("b"))
    links.unionByName(links.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a")).agg(count(lit(1)).as("degree"), min(col("b")).as("min_peer"))
  }

  val qSymmetricUnionSql =
    """WITH links AS (SELECT CAST(n_nationkey AS BIGINT) AS a, CAST(n_regionkey + 100 AS BIGINT) AS b FROM nation),
       sym AS (SELECT a, b FROM links UNION ALL SELECT b, a FROM links)
       SELECT a, count(*) AS degree, min(b) AS min_peer FROM sym GROUP BY a"""

  // ---------- U1: union of two tables ----------

  def qUnionTables(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_name").as("name"), lit(1).as("src"))
    val s = t(spark, dir, "supplier").select(col("s_name").as("name"), lit(2).as("src"))
    c.unionByName(s).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), countDistinct(col("name")).as("n_distinct"))
  }

  val qUnionTablesSql =
    """WITH u AS (SELECT c_name AS name, 1 AS src FROM customer
                  UNION ALL SELECT s_name AS name, 2 AS src FROM supplier)
       SELECT src, count(*) AS n, count(DISTINCT name) AS n_distinct FROM u GROUP BY src"""

  // ---------- W1: per-group top-k (window rank) ----------

  def qWindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    t(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_orderkey"), col("rn"), col("l_linenumber"), col("l_extendedprice"))
  }

  val qWindowTopKSql =
    """SELECT l_orderkey, rn, l_linenumber, l_extendedprice FROM (
         SELECT l_orderkey, l_linenumber, l_extendedprice,
                row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
         FROM lineitem) WHERE rn <= 3"""

  // ---------- W2/S6: sorted dictionary sink ----------

  def qSortedDict(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation").orderBy(col("n_nationkey"))
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))

  val qSortedDictSql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  // ---------- F1: char-codepoint tokenizer (get_token.py:25-41) ----------

  def qCodepointTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        length(col("c_name")).as("name_len"),
        ascii(col("c_name")).as("first_cp"),
        rpad(col("c_name"), 20, " ").as("padded"))

  val qCodepointTokensSql =
    """SELECT c_custkey, length(c_name) AS name_len, ascii(c_name) AS first_cp,
       rpad(c_name, 20, ' ') AS padded FROM customer"""

  // ---------- U3: deterministic batch interleave (content-derived) ----------

  /** Batch interleave + seeded shuffle (U3 — model/layers_LaBSE_neighbor
    * .py:355-359): the reference shuffles both KGs' batches with seed 37.
    * Under distributed execution a global RNG is not reproducible, so
    * the engine assigns batches by a content-derived Knuth hash
    * (MoCoTrainer uses the same discipline) — expressible identically in
    * ANSI SQL, so the interleave itself is oracle-checked: every batch
    * mixes rows from both sources deterministically at any parallelism. */
  def qSeededInterleave(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_custkey").cast("long").as("id"), lit(1).as("src"))
    val s = t(spark, dir, "supplier").select((col("s_suppkey") + 1000000).cast("long").as("id"), lit(2).as("src"))
    c.unionByName(s)
      .withColumn("batch", pmod(col("id") * 2654435761L, lit(64L)))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("src") === 1, 1L).otherwise(0L)).as("n_kg1"),
        sum(when(col("src") === 2, 1L).otherwise(0L)).as("n_kg2"),
        min(col("id")).as("first_id"))
  }

  val qSeededInterleaveSql =
    """WITH u AS (SELECT CAST(c_custkey AS BIGINT) AS id, 1 AS src FROM customer
                  UNION ALL SELECT CAST(s_suppkey + 1000000 AS BIGINT), 2 FROM supplier)
       SELECT (id * 2654435761) % 64 AS batch, count(*) AS n,
              CAST(sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kg1,
              CAST(sum(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kg2,
              min(id) AS first_id
       FROM u GROUP BY 1"""

  // ---------- F1/W4 full scope: codepoint token features (get_token.py:25-41) ----------

  /** Full char-ordinal token vector per name — len 50, pad ord(' ')=32,
    * FULL Unicode codepoints (reference `ord`) via the typed
    * TokenFeatures kernel — exploded to (id, pos, cp) scalar rows for
    * the driver comparator. */
  def qTokenFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)]
      .flatMap { case (id, name) =>
        graft.functions.TokenFeatures.codepoints(name).iterator.zipWithIndex.map {
          case (cp, i) => (id, (i + 1).toLong, cp.toLong) }
      }.toDF("c_custkey", "pos", "cp")
  }

  val qTokenFeaturesSql =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       unnest(range(1, 51)) AS pos,
       unnest(list_transform(range(1, 51), i ->
         CASE WHEN i <= length(c_name)
              THEN CAST(ascii(substring(c_name, CAST(i AS INT), 1)) AS BIGINT)
              ELSE CAST(32 AS BIGINT) END)) AS cp
       FROM customer"""

  // ---------- TableIO range-clustered commit + manifest data skipping ----------

  /** S-layer surface, driver-visible: commit the documents table
    * range-clustered on doc_id (TableIO writes per-file [min,max]
    * column stats into the manifest), then answer a range scan through
    * [[graft.tableio.TableIO.readRange]] — file pruning happens on the
    * DRIVER from the manifest alone (no footer reads, no listing job),
    * the Iceberg manifest-stats planning step; the oracle proves the
    * skipped files contained nothing the predicate wanted. */
  def qTableRangeScan(spark: SparkSession, dir: String): DataFrame = {
    val (base, _) = cachedTmpTable("rangescan", dir) { base =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.tableio.TableIO.commit(spark, d, base, "docs",
        rangeClusterBy = Seq("doc_id"), rangeClusterParts = 8).id
    }
    graft.tableio.TableIO.readRange(spark, base, "doc_id", BigDecimal(100), BigDecimal(300))
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val qTableRangeScanSql =
    """SELECT doc_id, lang, n_chars FROM documents
       WHERE doc_id BETWEEN 100 AND 300"""

  /** TableIO TIME TRAVEL through the driver battery: commit a filtered
    * snapshot, supersede it with a second commit of different rows, then
    * read the FIRST snapshot back by id (`readAt` — metadata-only
    * resolution, Iceberg-style reproducibility: an experiment re-reads
    * the exact table version it trained on even after later commits).
    * The oracle twin is the first commit's defining predicate — the
    * query only matches if the superseded snapshot is still readable
    * as-committed, byte for byte. */
  def qTableTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val (base, firstId) = cachedTmpTable("timetravel", dir) { base =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val first = graft.tableio.TableIO.commit(spark, d.filter(col("doc_id") < 250), base, "docs")
      graft.tableio.TableIO.commit(spark, d.filter(col("doc_id") >= 250), base, "docs")
      first.id
    }
    graft.tableio.TableIO.readAt(spark, base, firstId)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val qTableTimeTravelSql =
    """SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 250"""

  // ---------- composed extract_rel pipeline (extract_rel.py:14-67) ----------

  /** The reference's only purely relational pipeline, composed end-to-end
    * (round-2 verdict "missing" item 3): triple scan → membership filter
    * against the entity dict → TWO dict joins (head + tail label lookup,
    * both broadcast) → URL→label projection on both sides → dedup → sort
    * — the template for triple-label materialization. Every stage was
    * already individually green (q_semi_join, q_two_key_join,
    * q_label_project, q_sorted_dict); this is the single-oracle
    * composition. lineitem rows play the triple store (head=l_suppkey,
    * rel=l_linenumber, tail=l_partkey); supplier/part are the entity
    * dictionaries; the acctbal filter is the membership gate. */
  def qExtractRel(spark: SparkSession, dir: String): DataFrame = {
    val triples = t(spark, dir, "lineitem")
      .select(col("l_suppkey").as("head"), col("l_linenumber").as("rel"), col("l_partkey").as("tail"))
    val headDict = t(spark, dir, "supplier").filter(col("s_acctbal") > 1000)
      .select(col("s_suppkey"), col("s_name"))
    val tailDict = t(spark, dir, "part").select(col("p_partkey"), col("p_name"))
    triples
      .join(broadcast(headDict), col("head") === col("s_suppkey"))
      .join(broadcast(tailDict), col("tail") === col("p_partkey"))
      .select(
        element_at(split(col("s_name"), "#"), -1).as("subj"),
        concat(lit("rel_"), col("rel").cast("string")).as("pred"),
        element_at(split(col("p_name"), " "), -1).as("obj"))
      .distinct()
      .orderBy(col("subj"), col("pred"), col("obj"))
  }

  val qExtractRelSql =
    """SELECT DISTINCT list_extract(string_split(s_name, '#'), -1) AS subj,
       'rel_' || CAST(l_linenumber AS VARCHAR) AS pred,
       list_extract(string_split(p_name, ' '), -1) AS obj
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey AND s_acctbal > 1000
       JOIN part ON l_partkey = p_partkey
       ORDER BY subj, pred, obj"""

  // ---------- registry ----------

  val sqlChecked: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_scan_filter_project" -> (qScanFilterProject _, qScanFilterProjectSql),
    "q_group_agg" -> (qGroupAgg _, qGroupAggSql),
    "q_label_project" -> (qLabelProject _, qLabelProjectSql),
    "q_semi_join" -> (qSemiJoin _, qSemiJoinSql),
    "q_anti_join" -> (qAntiJoin _, qAntiJoinSql),
    "q_null_guard" -> (qNullGuard _, qNullGuardSql),
    "q_dict_join" -> (qDictJoin _, qDictJoinSql),
    "q_two_key_join" -> (qTwoKeyJoin _, qTwoKeyJoinSql),
    "q_symmetric_union" -> (qSymmetricUnion _, qSymmetricUnionSql),
    "q_union_tables" -> (qUnionTables _, qUnionTablesSql),
    "q_window_topk" -> (qWindowTopK _, qWindowTopKSql),
    "q_sorted_dict" -> (qSortedDict _, qSortedDictSql),
    "q_codepoint_tokens" -> (qCodepointTokens _, qCodepointTokensSql),
    "q_token_features" -> (qTokenFeatures _, qTokenFeaturesSql),
    "q_extract_rel" -> (qExtractRel _, qExtractRelSql),
    "q_table_range_scan" -> (qTableRangeScan _, qTableRangeScanSql),
    "q_table_time_travel" -> (qTableTimeTravel _, qTableTimeTravelSql),
    "q_seeded_interleave" -> (qSeededInterleave _, qSeededInterleaveSql)) ++
    TextQueries.sqlChecked ++ EmbedQueries.sqlChecked ++ KgQueries.sqlChecked

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlChecked.map { case (k, (f, _)) => k -> f } ++ KgQueries.rowsOnly

  def oracleSql: Map[String, String] =
    sqlChecked.map { case (k, (_, s)) => k -> s.linesIterator.map(_.trim).mkString(" ") }
}
