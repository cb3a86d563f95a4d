package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Gates for the native cosine_sim Catalyst expression: numeric parity
  * with the SQL higher-order formulation it replaced, null semantics,
  * registration via BOTH deployment paths (spark.sql.extensions at
  * session build — SparkTestBase sets it — and runtime ensureRegistered
  * reflection for harness-provided sessions), and the plan-hygiene gate:
  * the brute-force scoring join must stay inside whole-stage codegen. */
class VectorKernelsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // the exact SQL formula cosine_sim replaced — kept here as the oracle
  private val hofCos =
    """aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a, x) -> a + x)
       / sqrt(aggregate(qe, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       / sqrt(aggregate(ce, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"""

  test("cosine_sim is registered by GraftExtensions at session build") {
    // SparkTestBase sets spark.sql.extensions=graft.functions.GraftExtensions;
    // no ensureRegistered call has to run first for SQL to resolve it.
    assert(spark.catalog.functionExists("cosine_sim"))
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("bit-identical to the higher-order-function formula on real embeddings") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("qe"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("ce")), col("a") < col("b"))
    val diff = pairs
      .withColumn("c1", graft.functions.VectorKernels.cosineSim(spark, col("qe"), col("ce")))
      .withColumn("c2", expr(hofCos))
      .agg(max(abs(col("c1") - col("c2"))).as("d"), count(lit(1)).as("n"))
      .head
    assert(diff.getLong(1) > 0)
    // same widening + accumulation order → exactly equal, not just close
    assert(diff.getDouble(0) == 0.0, s"max |native - HOF| = ${diff.getDouble(0)}")
  }

  test("null inputs and interpreted (non-codegen) eval path") {
    val rows = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1 AS FLOAT))) AS n1,
                cosine_sim(array(CAST(1 AS FLOAT)), CAST(NULL AS ARRAY<FLOAT>)) AS n2""").head
    assert(rows.isNullAt(0) && rows.isNullAt(1))
    // interpreted path: evaluate the expression directly, no codegen
    val ex = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0f, 3.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val v = ex.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 24.0 / 25.0) < 1e-12)
  }

  test("near-dup threshold is pushed into the join condition (no pair materialization)") {
    // The scale property of the brute-force near-dup: the cosine filter
    // must reach the BroadcastNestedLoopJoin condition so non-duplicate
    // pairs are dropped inside the join loop (GeneratePredicate codegen),
    // never materialized as rows.
    val plan = EmbedQueries.qCosineNearDup(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected broadcast NL join:\n$plan")
    val joinLine = plan.linesIterator.find(_.contains("BroadcastNestedLoopJoin")).get
    assert(joinLine.contains("cosine_sim"),
      s"cosine threshold not pushed into the join condition:\n$plan")
  }

  test("cosine scoring projection participates in whole-stage codegen") {
    // A conditionless cross join + projection is the codegen-able shape
    // (BNLJ supports whole-stage codegen only with an empty condition);
    // assert the native expression rides inside the span rather than
    // forcing interpreted fallback the way the HOF formulation did.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val pairs = e.filter(col("vec_id") < 10).select(col("embedding").as("qe"))
        .crossJoin(e.select(col("embedding").as("ce")))
        .select(graft.functions.VectorKernels.cosineSim(spark, col("qe"), col("ce")).as("cos"))
      val plan = pairs.queryExecution.executedPlan
      val codegenWithCosine = plan.collect {
        case w: WholeStageCodegenExec if w.toString.contains("cosine_sim") => w
      }
      assert(codegenWithCosine.nonEmpty,
        s"cosine_sim not inside a WholeStageCodegen span:\n$plan")
      // and the span actually executes (janino compiles the fused loop)
      assert(pairs.agg(max(col("cos"))).head.getDouble(0) <= 1.0 + 1e-9)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
