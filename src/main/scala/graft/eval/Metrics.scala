package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/** Quality metrics (SURVEY.md §2.3 J5, §2.4 A4; BASELINE.md gates). */
object Metrics {

  /** Hit@1 / Hit@10 of candidate rankings vs gold links — the join-based
    * twin of the reference eval (model/layers_LaBSE_neighbor.py:304-317).
    * Links are applied symmetrically (J3). Sources with no gold target
    * are excluded, mirroring the linked-subset eval (:307-310). GOLD
    * DRIVES the join (left): a linked source for which the candidate
    * generator returned no rows (an LSH recall miss) counts as a miss —
    * an inner join would silently inflate Hit@k under low recall. */
  def hitAtK(spark: SparkSession, cands: Dataset[Candidate], gold: Dataset[Link], k: Int = Dims.TopK): DataFrame = {
    val g = gold.toDF("e1", "e2")
    val hits = g
      .join(cands.toDF(), col("srcId") === col("e1"), "left")
      .groupBy(col("e1"))
      .agg(
        max(when(col("dstId") === col("e2") && col("rank") === 1, 1).otherwise(0)).as("hit1"),
        max(when(col("dstId") === col("e2") && col("rank") <= k, 1).otherwise(0)).as("hitk"))
    hits.agg(
      avg(col("hit1")).as("hit_at_1"),
      avg(col("hitk")).as(s"hit_at_$k"),
      count(lit(1)).as("n_sources"))
  }

  /** Valid/test two-set evaluation with missing-target sentinel — the
    * reference evaluates the valid and test link sets separately every
    * epoch and maps a source whose gold target is absent to sentinel
    * 99999 (model/layers_LaBSE_neighbor.py:304-331): the sentinel can
    * never be retrieved, so such sources count as misses in the
    * denominator rather than vanishing from it. Inputs are (e1, e2)
    * frames where e2 may be null (missing target). Output: one row per
    * split — (split, n_sources, n_hit1, n_hitk), integer counts. */
  def evalTwoSet(spark: SparkSession, cands: DataFrame,
                 valid: DataFrame, test: DataFrame,
                 k: Int = Dims.TopK, sentinel: Long = 99999L): DataFrame = {
    val gold = valid.select(lit("valid").as("split"), col("e1"), col("e2"))
      .unionByName(test.select(lit("test").as("split"), col("e1"), col("e2")))
      .select(col("split"), col("e1"), coalesce(col("e2"), lit(sentinel)).as("e2"))
    gold
      .join(cands, col("srcId") === col("e1"), "left")
      .groupBy(col("split"), col("e1"))
      .agg(
        max(when(col("dstId") === col("e2") && col("rank") === 1, 1).otherwise(0)).as("h1"),
        max(when(col("dstId") === col("e2") && col("rank") <= k, 1).otherwise(0)).as("hk"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("h1")).cast("long").as("n_hit1"),
        sum(col("hk")).cast("long").as("n_hitk"))
  }

  /** Precision/recall of emitted triples vs the gold triple set (binding
    * gate: P/R ≥ 0.95, BASELINE.json). Exact set semantics on
    * (head, rel, tail). */
  def triplePR(spark: SparkSession, got: Dataset[Triple], gold: Dataset[Triple]): (Double, Double) = {
    val g = got.toDF().distinct()
    val o = gold.toDF().distinct()
    val inter = g.join(o, Seq("head", "rel", "tail"), "left_semi").count().toDouble
    val nG = g.count().toDouble
    val nO = o.count().toDouble
    (if (nG == 0) 0 else inter / nG, if (nO == 0) 0 else inter / nO)
  }

  /** Per-row span-sequence equality (BASELINE.json input_hint): fraction
    * of docs whose (kind, text, media_ref, order) sequence round-trips
    * exactly. Must be 1.0. */
  def spanSequenceEquality(spark: SparkSession, original: Dataset[Doc], roundTripped: Dataset[Doc]): Double = {
    import spark.implicits._
    def proj(d: Dataset[Doc]): DataFrame = d.toDF()
      .select(col("doc_id"), transform(col("spans"),
        s => struct(s.getField("kind"), s.getField("text"), s.getField("media_ref"))).as("sig"))
    val a = proj(original).withColumnRenamed("sig", "sig_a")
    val b = proj(roundTripped).withColumnRenamed("sig", "sig_b")
    val joined = a.join(b, Seq("doc_id"), "left")
    val r = joined.agg(
      avg(when(col("sig_a") === col("sig_b"), 1.0).otherwise(0.0)).as("eq")).head()
    r.getDouble(0)
  }
}
