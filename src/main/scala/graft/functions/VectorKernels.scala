package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over `array<float>`
  * columns — the hot scalar of the similarity-search family (J4 exact
  * top-k, embedding-cosine near-dup), where the brute-force paths
  * evaluate it once per (query, corpus) pair.
  *
  * Why an Expression and not SQL higher-order functions: the previous
  * formulation (`aggregate(zip_with(...))`) allocates an intermediate
  * array per row pair and is evaluated interpretively (higher-order
  * functions don't participate in whole-stage codegen), so the N×M
  * scoring loop boxed three lambda frames per element. This expression
  * generates a single fused primitive loop via `doGenCode`, keeping the
  * cross join + score + filter inside one WholeStageCodegen span
  * (asserted in VectorKernelsSpec).
  *
  * Numeric contract: identical operation order to the old SQL formula —
  * floats widened to double, sequential accumulation, `dot / sqrt(nx) /
  * sqrt(ny)` — so results are bit-identical and the DuckDB
  * `list_cosine_similarity` oracle agreement is unchanged.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] overrides covariantly
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var n = x.numElements()
    val m = y.numElements()
    if (m < n) n = m
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / math.sqrt(nx) / math.sqrt(ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() < $n) $n = $y.numElements();
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($nx) / java.lang.Math.sqrt($ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {

  val CosineSimName = "cosine_sim"

  private val cosineInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, CosineSimName)

  private val cosineBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$CosineSimName expects exactly 2 arguments, got ${args.length}")
    CosineSimilarity(args(0), args(1))
  }

  /** FunctionDescription consumed by SparkSessionExtensions.injectFunction. */
  val cosineDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(CosineSimName), cosineInfo, cosineBuilder)

  /** Register into an ALREADY-BUILT session (the harness hands queries a
    * session we didn't construct). `SparkSession.sessionState` is
    * `private[sql]` at the Scala level but public in bytecode, so the
    * one-time registration goes through reflection; cluster deployments
    * should instead set `spark.sql.extensions=graft.functions.GraftExtensions`
    * at session build (see GraftExtensions / SparkTestBase). Idempotent. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists(CosineSimName)) {
      val ss = spark.getClass.getMethod("sessionState").invoke(spark)
      val fr = ss.getClass.getMethod("functionRegistry").invoke(ss)
      // match the FULL parameter list: FunctionRegistry also has a
      // 3-arg (FunctionIdentifier, FunctionBuilder, String) overload and
      // getMethods order is unspecified, so arity-only selection picked
      // a different overload run-to-run ("argument type mismatch")
      val reg = fr.getClass.getMethods.find { m =>
        m.getName == "registerFunction" && m.getParameterCount == 3 &&
          m.getParameterTypes()(0) == classOf[FunctionIdentifier] &&
          m.getParameterTypes()(1) == classOf[ExpressionInfo]
      }.getOrElse(sys.error("FunctionRegistry.registerFunction(id, info, builder) not found"))
      reg.invoke(fr, FunctionIdentifier(CosineSimName), cosineInfo, cosineBuilder)
    }

  /** Column-API entry: cosine similarity of two array<float> columns. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(CosineSimName, a, b)
  }
}

/** `spark.sql.extensions` entry point — registers graft's native
  * expressions at session build, the deployment path for a real cluster
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(VectorKernels.cosineDescription)
}
