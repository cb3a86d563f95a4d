package graft

import graft.kg._
import graft.align.{GatKernel, MoCoConfig, MoCoTrainer, SslPath}
import graft.embed.{Embedder, EmbedderConfig}
import graft.ingest.{DocSynthesizer, SynthConfig}
import graft.eval.Metrics

/** SSL ablation gates (align/SslPath — the reference's neighbor-free
  * fine-tune variant, model/layers_LaBSE_SSL.py): singleton-block
  * reduction is exact, adapter training touches ONLY the adapter half of
  * the combine matrix, training lowers the self-negative NCE loss, and
  * the end-to-end SSL pipeline holds its alignment gate while skipping
  * the neighbor-aggregation shuffles entirely. */
class SslSpec extends SparkTestBase {
  import spark.implicits._

  private val synth = SynthConfig(entitiesPerKg = 100)
  private val embedCfg = EmbedderConfig(dim = 32)

  private def singles(parts: Int) = {
    val ents = DocSynthesizer.entities(spark, synth)
    SslPath.singletonBlocks(spark,
      Embedder.embedEntities(spark, ents, embedCfg), ents).repartition(parts)
  }

  test("singleton blocks: attention stage is (emb, 0); zero-shot forward = raw embedding") {
    val bs = singles(3).collect()
    assert(bs.nonEmpty && bs.forall(_.validLen == 1))
    val w = GatKernel.initWeights(32) // light path, any alpha
    bs.take(20).foreach { b =>
      val (c, g) = GatKernel.combineInputs(w, b)
      assert(c.sameElements(b.emb) && g.forall(_ == 0f))
      // emb is already L2-normalized → forward must return it unchanged
      GatKernel.forward(w, b).zip(b.emb).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6f)
      }
    }
  }

  test("adapter training: neighbor half frozen at alpha*I bit-for-bit, adapter half moves, loss falls") {
    val cfg = MoCoConfig(batchSize = 8, queueLen = 4, epochs = 2, lr0 = 0.05,
      trainCombine = true, combineShards = 4)
    val base = GatKernel.initWeights(32)
    val w0 = GatKernel.initCombine(32, base.alpha)
    val (_, _, lossBefore) = MoCoTrainer.combineEpoch(spark, singles(4), base, w0, w0.clone(), 0.0, cfg)
    val trained = SslPath.train(spark, singles(4), 32, cfg.copy(trainCombine = false))
    assert(trained.combine != null, "SslPath.train must force the full-combine form")
    val (_, _, lossAfter) = MoCoTrainer.combineEpoch(
      spark, singles(4), base, trained.combine, trained.combine.clone(), 0.0, cfg)
    assert(lossAfter < lossBefore,
      s"adapter SGD on self-negative NCE must reduce it: before $lossBefore after $lossAfter")
    // x = [emb ∥ 0] ⇒ dL/dW's right half is identically zero: the
    // neighbor half must still BE the alpha*I init, bit-for-bit, while
    // the adapter (left) half moved away from I
    val d = 32
    var leftMoved = false
    for (r <- 0 until d; j <- 0 until d) {
      val left = trained.combine(r * 2 * d + j)
      val right = trained.combine(r * 2 * d + d + j)
      assert(right == w0(r * 2 * d + d + j),
        s"neighbor half must stay frozen at init, moved at ($r,$j)")
      if (left != w0(r * 2 * d + j)) leftMoved = true
    }
    assert(leftMoved, "adapter half received no gradient — training was a no-op")
    // determinism across partitionings, inherited from the combine path
    val trained2 = SslPath.train(spark, singles(11), 32, cfg)
    assert(trained.combine.sameElements(trained2.combine),
      "SSL adapter training must be bit-identical across partitionings")
  }

  test("SSL pipeline end-to-end: zero-shot and adapter-trained paths hold the alignment gate") {
    val cfg = PipelineConfig(
      synth = SynthConfig(entitiesPerKg = 80),
      embed = EmbedderConfig(dim = 48),
      useSsl = true)
    val gold = DocSynthesizer.goldLinks(spark, cfg.synth)
    // zero-shot (LaBSE-no-training ablation): raw-embedding cosine
    val r0 = Pipeline.runSynthetic(spark, cfg)
    val m0 = Metrics.hitAtK(spark, r0.alignment, gold).head()
    assert(m0.getDouble(0) >= 0.5, s"zero-shot SSL hit@1 ${m0.getDouble(0)}")
    assert(r0.canonicalTriples.count() > 0)
    // adapter-trained (the reference's SSL fine-tune analog)
    val rT = Pipeline.runSynthetic(spark, cfg.copy(useMoco = true,
      moco = MoCoConfig(batchSize = 8, queueLen = 4, epochs = 2, lr0 = 0.02, combineShards = 8)))
    val mT = Metrics.hitAtK(spark, rT.alignment, gold).head()
    assert(mT.getDouble(0) >= 0.5, s"adapter-trained SSL hit@1 ${mT.getDouble(0)}")
  }

  test("SSL blocks plan is narrow: no shuffle exchange (the neighbor stage's 2 shuffles are gone)") {
    val plan = singles(1).queryExecution.executedPlan.toString
    // the only repartition here is the test's own; build the real thing
    val ents = DocSynthesizer.entities(spark, synth)
    val real = SslPath.singletonBlocks(spark,
      Embedder.embedEntities(spark, ents, embedCfg), ents)
    val realPlan = real.queryExecution.executedPlan.toString
    assert(!realPlan.contains("ShuffleExchange") && !realPlan.contains("Exchange hashpartitioning"),
      s"singleton-block build must be broadcast-joined, narrow:\n$realPlan")
    assert(realPlan.contains("BroadcastHashJoin") || realPlan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast join in:\n$realPlan")
    assert(plan.nonEmpty)
  }
}
