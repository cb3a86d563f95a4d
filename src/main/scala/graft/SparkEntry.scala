package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full KG-construction pipeline (docs → extraction →
    * embed → neighbor-aware alignment → CC canonicalization) on a tiny
    * deterministic fixture — returns the canonical (subj, pred, obj)
    * triple table. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = PipelineConfig(
      synth = graft.ingest.SynthConfig(entitiesPerKg = 100),
      embed = graft.embed.EmbedderConfig(dim = 48),
      // flagship runs the FULL training form: gradient-trained combine
      // Linear(2d→d) under the MoCo queue + EMA key encoder (gated at
      // this config by PipelineSpec's hit@1 >= 0.85 test), with the
      // eval-every-epoch valid-Hit@1 model selection (validFraction)
      useMoco = true,
      validFraction = 0.3,
      moco = align.MoCoConfig(batchSize = 8, queueLen = 4, epochs = 2,
        trainCombine = true, combineShards = 8))
    Pipeline.runSynthetic(spark, cfg).canonicalTriples
      .select("subj", "pred", "obj", "subjId", "objId")
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
