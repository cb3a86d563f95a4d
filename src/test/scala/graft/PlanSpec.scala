package graft

/** Physical-plan hygiene gates: filters and projections must reach the
  * parquet scan (PushedFilters / ReadSchema), small dims must broadcast
  * — the plans we'd want at 100 TB, asserted so regressions fail CI. */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan+filter+project: predicate and column pruning reach parquet") {
    val plan = planOf(Queries.qScanFilterProject(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("dict join broadcasts the small side") {
    val plan = planOf(Queries.qDictJoin(spark, dir))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join:\n$plan")
  }

  test("semi join is planned as a (broadcast) semi join, not inner+distinct") {
    val plan = planOf(Queries.qSemiJoin(spark, dir))
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
  }

  test("media resize/frame-sample are narrow: payload bytes never shuffle") {
    // at 100 TB the media payloads are most of the bytes — the decode/
    // resize/frame-sample kernels must be exchange-free so payloads stay
    // on the executor that scanned them
    val media = graft.extract.MediaKernels.harnessMedia(spark, dir)
    val resized = graft.extract.MediaKernels.resize(media, 4)
    val frames = graft.extract.MediaKernels.frameSample(media, 32)
    Seq("resize" -> planOf(resized.toDF()), "frames" -> planOf(frames.toDF())).foreach {
      case (name, plan) =>
        assert(!plan.contains("Exchange"), s"$name plan shuffles payloads:\n$plan")
    }
  }

  test("stratified sample is map-only: per-row filter at the scan, zero exchanges") {
    val plan = planOf(TextQueries.qStratifiedSample(spark, dir))
    assert(!plan.contains("Exchange"), s"sampling plan shuffles:\n$plan")
    // only the consumed columns are read (text feeds the sampling key)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      s"columns not pruned:\n$plan")
  }

  test("minhash/simhash pair plans read the staged signature table, never the corpus") {
    // the staged signature frame (TextQueries.stagedFrame) replaces the
    // scan→explode→aggregate chain for every family consumer: the pair
    // plans must scan the session's staged parquet and must NOT rescan
    // documents.parquet — at 100 TB that is the difference between a
    // short per-doc table and the whole corpus, paid per consumer
    for ((name, df) <- Seq(
        "minhash" -> TextQueries.qMinhashPairs(spark, dir),
        "simhash" -> TextQueries.qSimhashPairs(spark, dir))) {
      val plan = planOf(df)
      assert(plan.contains("graft_tmp"), s"$name does not read the staged table:\n$plan")
      assert(!plan.contains("documents.parquet"), s"$name rescans the corpus:\n$plan")
    }
  }

  test("vocab top-k plans as TakeOrderedAndProject, never a full sort") {
    val plan = planOf(TextQueries.qVocabTopk(spark, dir))
    // per-partition bounded heaps merged on the driver — a global
    // Sort+Limit materializes the whole token-frequency table at 100 TB
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"columns not pruned:\n$plan")
  }

  test("bm25 broadcasts the df/stats dims and prunes the doc scan") {
    val plan = planOf(TextQueries.qBm25(spark, dir))
    // the term-df and global-avgdl frames are tiny: BOTH must broadcast
    // (a shuffle join on either would shuffle the corpus-sized tf side
    // twice); the scan reads only the two consumed columns
    assert("BroadcastExchange|BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 2,
      s"expected both dims broadcast:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"columns not pruned:\n$plan")
  }

  test("chunking is map-only: tokenize+window+explode fuse into the scan stage") {
    val plan = planOf(TextQueries.qChunk(spark, dir))
    assert(!plan.contains("Exchange"), s"chunking plan shuffles:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"columns not pruned:\n$plan")
  }

  test("corpus-prep composition pays exactly one shuffle (the dedup aggregate)") {
    val plan = planOf(TextQueries.qCorpusPrep(spark, dir))
    // lang/quality gates fuse into the scan stage; the only exchange is
    // the exact dedup's hash-aggregate on text
    val exchanges = "(?m)^[^\\n]*ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected hash aggregate dedup:\n$plan")
  }

  test("SessionTemp digest law: a regenerated source re-materializes the staged value") {
    // the staged-signature frames (TextQueries.stagedFrame) and the
    // TableIO demo tables key their session caches on the source's
    // recursive listing digest — this gates the law directly (VERDICT
    // r5 next #4): an in-place regeneration, even name-stable and
    // same-size, must rebuild rather than serve the previous generation
    val src = java.nio.file.Files.createTempDirectory("graft_sess_src").toFile
    val f = new java.io.File(src, "part-0")
    java.nio.file.Files.write(f.toPath, "alpha".getBytes)
    var builds = 0
    def get(): String =
      graft.util.SessionTemp.keyed("spec-stage", src) { root => builds += 1; root }
    val first = get()
    assert(get() == first && builds == 1, "same generation must serve the cached value")
    java.nio.file.Files.write(f.toPath, "bravo".getBytes) // same size, new content
    assert(f.setLastModified(f.lastModified() + 2000))    // force past mtime granularity
    val second = get()
    assert(builds == 2, "regenerated source must re-materialize")
    assert(second != first, "a new generation gets a fresh temp root")
    assert(get() == second && builds == 2, "the new generation is itself cached")
  }

  test("span explode over a parquet doc table: codegen'd, nested schema pruned") {
    import spark.implicits._
    val docs = graft.ingest.DocSynthesizer.docs(spark, graft.ingest.SynthConfig(entitiesPerKg = 10))
    val path = java.nio.file.Files.createTempDirectory("graft_docs").toString + "/docs"
    docs.write.mode("overwrite").parquet(path)
    val fromTable = spark.read.parquet(path).as[graft.kg.Doc]
    val textOnly = graft.extract.Extraction.textSpans(fromTable)
      .select("doc_id", "text")
    val plan = planOf(textOnly)
    // whole-stage codegen covers the explode+filter+project chain
    // (the simpleString marks codegen'd operators with "*(n)")
    assert(plan.contains("*("), s"explode chain not codegen'd:\n$plan")
    // media payloads never read from parquet
    assert(!plan.contains("media_ref"), s"media payload not pruned from scan:\n$plan")
  }
}
