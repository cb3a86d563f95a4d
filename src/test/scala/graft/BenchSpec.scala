package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates on the bench JSON contract (the round-2 failure mode: a timeout
  * erased every measurement because the one JSON line printed last).
  * renderJson must produce a complete, driver-parseable line at every
  * milestone — with and without the kg_bench section. */
class BenchSpec extends AnyFunSuite {

  private val battery = Seq(("q_a", 1.25, true), ("q_b", 0.5, true), ("q_fail", 2.0, false))

  test("battery-only line is complete JSON with failed[] populated") {
    val s = Bench.renderJson(battery, "/tmp/sf", None)
    assert(s.startsWith("{") && s.endsWith("}"))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.contains("\"queries\":{\"q_a\":1.250,\"q_b\":0.500,\"q_fail\":2.000}"))
    assert(s.contains("\"failed\":[\"q_fail\"]"))
    assert(!s.contains("kg_bench"))
  }

  test("nextExtra: balance to 2+2 first (N leads), then de-noise — budget-gated, caps respected") {
    // plenty of budget: N balance sample first, then 4N, then N, then
    // the 4N/N de-noising tail up to the 4-extra-N + 6-extra-4N caps
    assert(Bench.nextExtra(0, 0, 100, 2000, 400, 100).contains(false))
    assert(Bench.nextExtra(1, 0, 200, 2000, 400, 100).contains(true))
    assert(Bench.nextExtra(1, 1, 600, 2000, 400, 100).contains(false))
    assert(Bench.nextExtra(2, 1, 700, 2000, 400, 100).contains(true))
    assert(Bench.nextExtra(2, 2, 900, 2000, 400, 100).contains(true))
    assert(Bench.nextExtra(2, 3, 1000, 2000, 400, 100).contains(false))
    assert(Bench.nextExtra(3, 3, 1000, 2000, 400, 100).contains(false))
    assert(Bench.nextExtra(4, 3, 1000, 2000, 400, 100).contains(true))
    assert(Bench.nextExtra(4, 5, 1000, 2000, 400, 100).contains(true))
    assert(Bench.nextExtra(4, 6, 1000, 2000, 400, 100).isEmpty)
    // stranded-budget regression (rehearsal 10): at the old 3+2 caps the
    // run stopped with 221 s left; now the leftover buys N samples
    assert(Bench.nextExtra(2, 3, 559, 780, 50, 16).contains(false))
    // tight budget: the expensive N is skipped but the cheap 4N still runs
    assert(Bench.nextExtra(0, 1, 600, 800, 400, 100).contains(true))
    // no budget at all: stop immediately
    assert(Bench.nextExtra(0, 0, 790, 800, 400, 100).isEmpty)
    // 4N gate uses 1.3 × last observed cost
    assert(Bench.nextExtra(1, 0, 669, 800, 400, 100).contains(true))  // 669+130 < 800
    assert(Bench.nextExtra(1, 0, 671, 800, 400, 100).isEmpty)         // 671+130 > 800
    // N gate is robust to one inflated observation: 1.15 × min(cost,
    // predN). Round-4 rehearsal regression: first E-rung N sample 265 s
    // (repeat cost ~171 s, E/2 extrapolation ~155 s), elapsed 520 of
    // 780 — the old 1.3×265 gate refused the balance sample and six 4N
    // extras burned the leftover (tail samples_n=1, eff 1.455)
    assert(Bench.nextExtra(0, 0, 520, 780, 265, 45, predN = 155).contains(false)) // 520+178 < 780
    assert(Bench.nextExtra(0, 0, 520, 780, 265, 45).contains(true))               // without predN: N refused, 4N runs
    // the prediction never makes an N sample MORE expensive
    assert(Bench.nextExtra(0, 0, 520, 780, 100, 45, predN = 400).contains(false))
    // symmetric 4N regression (rehearsal 18): single inflated 4N draw
    // 108.8 s where the E/2 extrapolation said ~45 s; at elapsed 662 of
    // 780 the observed-cost gate refused the balance re-sample
    // (662+1.3·108.8 ≈ 803) with 118 s stranded — the prediction takes
    // it (662+1.3·45 ≈ 720)
    assert(Bench.nextExtra(1, 0, 662, 780, 166.6, 108.8, predN = 155).isEmpty)
    assert(Bench.nextExtra(1, 0, 662, 780, 166.6, 108.8, predN = 155, pred4N = 45).contains(true))
  }

  test("nextRung: escalates on E^1.6 extrapolation with 1.2 margin; stops at top") {
    val rungs = Seq(6250, 12500, 25000, 50000)
    // doubling E predicts 2^1.6 ≈ 3.03× the pair cost, ×1.2 margin ≈ 3.64×
    assert(Bench.nextRung(rungs, 0, elapsed = 100, budget = 720, pairCost = 100))  // 100+364 < 720
    assert(!Bench.nextRung(rungs, 0, elapsed = 360, budget = 720, pairCost = 100)) // 360+364 > 720
    // round-3 driver-window regression: with ~470 s elapsed and the E/2
    // pair minima at 38.6+12.5 = 51.1 s, the 2.0 margin refused the full
    // rung (470 + 2.0·51.1·3.03 ≈ 780.7 > 780 — over by a hair) and the
    // remaining ~310 s bought eleven E/2 samples instead; the 1.2 margin
    // takes the attempt (470 + 1.2·51.1·3.03 ≈ 656 < 780)
    assert(!Bench.nextRung(Seq(25000, 50000), 0, elapsed = 471, budget = 780, pairCost = 51.1 * 2.0 / 1.2))
    assert(Bench.nextRung(Seq(25000, 50000), 0, elapsed = 470, budget = 780, pairCost = 51.1))
    // at the top rung there is nowhere to go regardless of budget
    assert(!Bench.nextRung(rungs, 3, elapsed = 0, budget = 1e9, pairCost = 1))
    // non-doubling step uses the actual ratio
    assert(Bench.nextRung(Seq(10000, 15000), 0, 0, 500, pairCost = 80))    // 80×1.91×1.2 ≈ 184 < 500
    assert(!Bench.nextRung(Seq(10000, 15000), 0, 330, 500, pairCost = 80)) // 514 > 500
  }

  test("bestEvidence: samples per level win up to 2; larger rung wins from 2+2") {
    // a de-noised E/2 rung beats a samples_n=1 escalation
    assert(Bench.bestEvidence(Seq((50000L, 3, 4), (100000L, 1, 2))) == 0)
    // equal evidence → the larger rung ships
    assert(Bench.bestEvidence(Seq((50000L, 1, 1), (100000L, 1, 1))) == 1)
    assert(Bench.bestEvidence(Seq((50000L, 3, 4), (100000L, 3, 3))) == 1)
    // a fully de-noised top rung always wins
    assert(Bench.bestEvidence(Seq((50000L, 1, 1), (100000L, 3, 4))) == 1)
    // EVIDENCE SATURATES AT 2 PER LEVEL: a 2+2 full rung outranks any
    // amount of E/2 de-noising (round 3's 5+6 E/2 rung — Amdahl-capped
    // at ~0.77 — outranked the representative rung outright)
    assert(Bench.bestEvidence(Seq((50000L, 5, 6), (100000L, 2, 2))) == 1)
    assert(Bench.bestEvidence(Seq((50000L, 4, 6), (100000L, 2, 3))) == 1)
    // ...but a 1+2 full rung still loses to a de-noised E/2
    assert(Bench.bestEvidence(Seq((50000L, 2, 2), (100000L, 1, 2))) == 0)
    // single rung
    assert(Bench.bestEvidence(Seq((50000L, 1, 1))) == 0)
  }

  test("kg_bench line carries both throughputs and the efficiency") {
    val kg = Bench.KgBench(docs = 100000L, dim = 256, nLow = 2, nHigh = 8,
      secN = 704.1, sec4N = 196.0, samplesN = 2, samples4N = 1)
    val s = Bench.renderJson(battery, "/tmp/sf", Some(kg))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.contains("\"cores_n\":2") && s.contains("\"cores_4n\":8"))
    assert(s.contains("\"samples_n\":2") && s.contains("\"samples_4n\":1"))
    // eff = (100000/196.0) / (4 * 100000/704.1) = 704.1 / (4*196.0) = 0.898
    assert(s.contains("\"scaling_efficiency\":0.898"), s)
  }

  test("kg_bench_768 secondary object rides the tail line when supplied (VERDICT r4 #5)") {
    val kg = Bench.KgBench(100000L, 256, 2, 8, 704.1, 196.0, 2, 2)
    val b768 = Bench.KgBench(100000L, 768, 2, 8, 2100.0, 620.0, 1, 1)
    val s = Bench.renderJson(battery, "/tmp/sf", Some(kg), kg768 = Some(b768))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    // the primary kg_bench stays intact, the secondary rides alongside
    assert(s.contains("\"kg_bench\":{\"docs\":100000,\"dim\":256"), s)
    assert(s.contains("\"kg_bench_768\":{\"docs\":100000,\"dim\":768"), s)
    // eff = (100000/620) / (4 * 100000/2100) = 2100 / (4*620) = 0.847
    assert(s.indexOf("\"scaling_efficiency\":0.847") > s.indexOf("kg_bench_768"), s)
    // absent by default — the driver ladder's tail is unchanged
    assert(!Bench.renderJson(battery, "/tmp/sf", Some(kg)).contains("kg_bench_768"))
  }

  test("768 reservation never starves the balance-to-2+2 samples (live-rehearsal regression)") {
    // the live failure: full-rung first pair N=200/4N=50, flag on — the
    // all-extras reservation left ~30 s visible to EVERY extra and the
    // run died at samples 1+1 (not the driver's evidence shape). The
    // split is now inside nextExtra: BALANCE branches gate on the full
    // budget, DE-NOISING branches on the reserved one.
    val reserved = Bench.extrasBudgetFor(780, want768 = true, minN = 200, min4N = 50)
    assert(reserved == 780.0 - 885.0) // 3·(1.3·50 + 1.15·200) = 885
    // rehearsal-23 state (1+1 at 453 s elapsed): the N balance sample
    // must still be offered under the FULL budget even though the
    // reserved budget is long gone
    assert(Bench.nextExtra(extraN = 0, extra4N = 0, elapsed = 453, budget = 780,
      costN = 200, cost4N = 50, denoiseBudget = reserved) == Some(false))
    // balanced at 2+2: de-noising defers to the reservation — with the
    // reserved budget exhausted, no extra is offered (the leftover buys
    // the 768 pair instead)
    assert(Bench.nextExtra(extraN = 1, extra4N = 1, elapsed = 453, budget = 780,
      costN = 200, cost4N = 50, denoiseBudget = reserved).isEmpty)
    // same state WITHOUT the flag: de-noising proceeds on the full
    // budget (N re-sample first — the expensive, artifact-binding level)
    assert(Bench.nextExtra(extraN = 1, extra4N = 1, elapsed = 453, budget = 780,
      costN = 200, cost4N = 50,
      denoiseBudget = Bench.extrasBudgetFor(780, want768 = false, 200, 50)) == Some(false))
    // and when N NEVER fits, cheap 4N de-noising cannot burn the
    // reserve's room (the second live pathology): balance-4N is offered,
    // beyond-2+2 4N extras are not
    assert(Bench.nextExtra(extraN = 0, extra4N = 0, elapsed = 700, budget = 780,
      costN = 2000, cost4N = 50, denoiseBudget = reserved) == Some(true))
    assert(Bench.nextExtra(extraN = 0, extra4N = 1, elapsed = 700, budget = 780,
      costN = 2000, cost4N = 50, denoiseBudget = reserved).isEmpty)
  }

  test("host calibration section renders and stays complete JSON") {
    val kg = Bench.KgBench(100000L, 256, 2, 8, 704.1, 196.0, 1, 1)
    val s = Bench.renderJson(battery, "/tmp/sf", Some(kg), Some((1412.3, 87.9)))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.contains("\"host_page_alloc_mb_s\":{\"t1\":1412,\"tn\":88}"), s)
    // absent when not measured
    assert(!Bench.renderJson(battery, "/tmp/sf", None).contains("host_page_alloc"))
  }

  test("cpu_sys_share section renders and stays complete JSON") {
    val kg = Bench.KgBench(100000L, 256, 2, 8, 704.1, 196.0, 1, 1)
    val s = Bench.renderJson(battery, "/tmp/sf", Some(kg), Some((1412.3, 87.9)),
      sys = Some((0.07, 0.643)))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.contains("\"cpu_sys_share\":{\"n\":0.07,\"4n\":0.64}"), s)
    assert(!Bench.renderJson(battery, "/tmp/sf", Some(kg)).contains("cpu_sys_share"))
  }

  test("sysShare: kernel fraction of busy time; None when idle or unmeasurable") {
    assert(Bench.sysShare(Some((100L, 10L)), Some((180L, 30L))) == Some(0.2))
    assert(Bench.sysShare(Some((100L, 10L)), Some((100L, 10L))).isEmpty) // idle
    assert(Bench.sysShare(None, Some((1L, 1L))).isEmpty)
    // this sandbox is Linux: the live probe must read something
    val j0 = Bench.cpuJiffies()
    assert(j0.exists { case (u, s) => u > 0 && s >= 0 })
  }

  test("allocProbe measures a positive rate and cleans up its files") {
    val dir = java.nio.file.Files.createTempDirectory("alloc-probe").toFile
    val r = Bench.allocProbe(2, dir.getAbsolutePath)
    assert(r > 0)
    assert(dir.listFiles((_, n) => n.startsWith("alloc-probe")).isEmpty)
  }
}
