package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract: ONE JSON line on stdout — this main
  * prints a COMPLETE, parseable line after every milestone and the
  * driver keeps the tail, so a timeout can never again erase already-
  * computed measurements the way round 2's single end-of-run print did
  * (BENCH_r02.json: rc 124, parsed null, battery lost).
  *
  * Two measurements:
  *  1. Operator battery timings on SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS.
  *  2. KG-pipeline throughput (docs/sec, the north-rule metric) for the
  *     SAME synthetic input at two parallelism levels — local[N] and
  *     local[4N] — as the sandbox stand-in for N vs 4N executors
  *     (BASELINE.md: no real cluster here). Reports both throughputs and
  *     scaling efficiency = (docs/sec@4N) / (4 × docs/sec@N).
  *
  * The scaling pair defaults to N=2 vs 4N=8 CORES (not 8 vs 32): this
  * sandbox is one NUMA socket inside a shared VM — at 32 threads the
  * memory-bandwidth-bound scoring saturates DRAM (pure-compute spin
  * scales 0.88 to 32 threads; the pipeline does not) and host vCPU
  * contention adds 2-3× run-to-run noise, both artifacts a real
  * 4N-executor cluster does not have (each executor brings its own
  * memory channels). 2 vs 8 measures the engine's scaling, not the
  * box's ceiling; BENCH.md carries the saturated 8-vs-32 numbers and
  * the saturation evidence alongside. Override with
  * SPARK_GRAFT_BENCH_N / SPARK_GRAFT_BENCH_4N.
  *
  * Noise protocol, now TIME-BUDGETED: BOTH levels are measured best-of-
  * up-to-2, INTERLEAVED (N, 4N, N, 4N) with a full GC between sessions
  * (all levels share this JVM). On a shared-host VM the noise is
  * strictly additive — a neighbor can only make a run slower, never
  * faster — so the minimum over samples is the consistent estimator of
  * the true wall time at EITHER level; applying it to both sides is
  * symmetric. The second interleaved pair runs ONLY if measured cost of
  * the first pair fits inside the remaining SPARK_GRAFT_BENCH_BUDGET_SEC
  * (default 780 s — round 1's whole bench took 791 s and passed; round
  * 2's fixed 4-run protocol took ~1900 s and was killed). A warmup
  * pipeline runs first so JIT/codegen compilation does not bias the
  * first sample. Default E halved to 50k for the same reason: the
  * scaling-efficiency estimate at 50k matched 100k within noise in
  * round-2 profiling (BENCH.md) at half the wall cost.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      // 8× cpus: the LSH cogroup's ~10^4 salt cells need enough hash
      // partitions that no task collects a straggler clump; AQE
      // coalesces the small stages back down
      .config("spark.sql.shuffle.partitions", (cpus * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full pipeline run; returns (docs, wall seconds). */
  private def pipelineRun(spark: SparkSession, entities: Int, dim: Int): (Long, Double) = {
    val cfg = PipelineConfig(
      synth = graft.ingest.SynthConfig(entitiesPerKg = entities),
      embed = graft.embed.EmbedderConfig(dim = dim),
      useLsh = Some(true))
    val t0 = System.nanoTime()
    val r = Pipeline.runSynthetic(spark, cfg)
    val triples = r.canonicalTriples.count()
    val docs = 2L * entities
    require(triples > 0)
    (docs, (System.nanoTime() - t0) / 1e9)
  }

  final case class KgBench(docs: Long, dim: Int, nLow: Int, nHigh: Int,
                           secN: Double, sec4N: Double,
                           samplesN: Int, samples4N: Int)

  /** One complete JSON line in the driver's schema. `kg` present only
    * once both scaling levels have at least one sample. Pure function —
    * unit-tested in BenchSpec. */
  def renderJson(results: Seq[(String, Double, Boolean)], sfDir: String,
                 kg: Option[KgBench]): String = {
    val failed = results.filterNot(_._3).map(_._1)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val kgJson = kg.map { b =>
      val thN = b.docs / b.secN
      val th4N = b.docs / b.sec4N
      val eff = th4N / ((b.nHigh.toDouble / b.nLow) * thN)
      s""","kg_bench":{"docs":${b.docs},"dim":${b.dim},"cores_n":${b.nLow},"cores_4n":${b.nHigh},""" +
        f""""sec_n":${b.secN}%.2f,"sec_4n":${b.sec4N}%.2f,"docs_per_sec_n":$thN%.1f,""" +
        f""""docs_per_sec_4n":$th4N%.1f,"samples_n":${b.samplesN},"samples_4n":${b.samples4N},""" +
        f""""scaling_efficiency":$eff%.3f}"""
    }.getOrElse("")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"$kgJson}"""
  }

  def main(args: Array[String]): Unit = {
    val tMain = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - tMain) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchE = sys.env.getOrElse("SPARK_GRAFT_BENCH_E", "50000").toInt
    val dim = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIM", "256").toInt
    val nLow = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "2").toInt
    val nHigh = sys.env.getOrElse("SPARK_GRAFT_BENCH_4N", (nLow * 4).toString).toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "780").toDouble

    def emit(line: String): Unit = { println(line); System.out.flush() }

    // ---- operator battery at the driver-requested parallelism ----
    var spark = session(cpus)
    // JIT/codegen/parquet-reader warmup so the alphabetically-first
    // battery entry isn't billed the session's compilation cost (the
    // smoke battery showed it absorbing ~45 s of warm-up)
    try SparkEntry.queries.get("q_sorted_dict").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a broken query must be VISIBLE in the bench JSON, not a silent
      // green timing — failures are logged and counted below
      val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // battery timings are safe from any later timeout from this point on
    emit(renderJson(results, sfDir, None))

    // warmup for the scaling runs (JIT + codegen caches)
    pipelineRun(spark, math.max(200, benchE / 10), dim)
    spark.stop()

    def level(c: Int): (Long, Double) = {
      System.gc()
      val s = session(c)
      val r = pipelineRun(s, benchE, dim)
      s.stop()
      r
    }

    var samplesN = List.empty[(Long, Double)]
    var samples4N = List.empty[(Long, Double)]
    def emitKg(): Unit =
      if (samplesN.nonEmpty && samples4N.nonEmpty) {
        val (docs, secN) = samplesN.minBy(_._2)
        val sec4N = samples4N.map(_._2).min
        emit(renderJson(results, sfDir,
          Some(KgBench(docs, dim, nLow, nHigh, secN, sec4N, samplesN.size, samples4N.size))))
      }

    // pair 1 is unconditional; pair 2 runs only if its measured cost fits
    samplesN ::= level(nLow)
    samples4N ::= level(nHigh)
    emitKg()
    val pairCost = samplesN.head._2 + samples4N.head._2
    if (elapsed + 1.2 * pairCost < budgetSec) {
      samplesN ::= level(nLow)
      emitKg()
      if (elapsed + 1.2 * samples4N.head._2 < budgetSec) {
        samples4N ::= level(nHigh)
        emitKg()
      } else System.err.println(f"[bench] budget: skipping 4N sample 2 (elapsed $elapsed%.0f s)")
    } else System.err.println(
      f"[bench] budget: best-of-1 (pair cost $pairCost%.0f s, elapsed $elapsed%.0f s, budget $budgetSec%.0f s)")
  }
}
