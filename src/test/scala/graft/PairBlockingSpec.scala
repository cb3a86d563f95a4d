package graft

import org.apache.spark.sql.functions._

/** PairBlocking exactness: the tiled skew-safe enumeration must produce
  * the same pair SET as the naive bucket self-join, while splitting hot
  * buckets into bounded tile tasks. */
class PairBlockingSpec extends SparkTestBase {
  import spark.implicits._

  private def naivePairs(bands: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    bands.toDF("d1", "band", "key")
      .join(bands.toDF("d2", "band", "key"), Seq("band", "key"))
      .filter($"d1" < $"d2").select("d1", "d2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("tiled enumeration equals the naive self-join on a skewed fixture") {
    // one 400-doc hot bucket (cap 16 → 25 tiles), a 40-doc warm bucket
    // (3 tiles), and scattered cold buckets incl. singletons
    // disjoint id ranges per band so the expected-size arithmetic is exact
    val rows = (0L until 400L).map(d => (d, 0, 7L)) ++
      (0L until 40L).map(d => (d + 1000, 2, 5L)) ++
      (0L until 200L).map(d => (d + 2000, 1, d % 37))
    val bands = rows.toDF("doc_id", "band", "key")
    val got = graft.candidates.PairBlocking.pairs(bands, cap = 16).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = naivePairs(bands)
    assert(got.nonEmpty && naive.size == 400 * 399 / 2 + 40 * 39 / 2 + naivePairs(
      (0L until 200L).map(d => (d + 2000, 1, d % 37)).toDF("doc_id", "band", "key")).size)
    assert(got == naive,
      s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
  }

  test("hot-bucket tiles are balanced enough to bound per-task pair work") {
    // mirror the operator's tile assignment for the 400-doc bucket at
    // cap=16 (T=25) and check no tile-pair task sees >> cap² pairs
    val cap = 16
    val t = (400 + cap - 1) / cap
    val tileSizes = (0L until 400L).toDF("doc_id")
      .select(pmod(xxhash64($"doc_id"), lit(t)).as("tile"))
      .groupBy("tile").count().collect().map(_.getLong(1))
    assert(tileSizes.length == t)
    val maxTile = tileSizes.max
    assert(maxTile * maxTile <= 4L * cap * cap,
      s"worst tile-pair task ${maxTile * maxTile} pairs vs cap²=${cap * cap}")
  }

  test("cap larger than every bucket degenerates to the naive plan's result") {
    val rows = (0L until 60L).map(d => (d, 0, (d % 5).toLong))
    val bands = rows.toDF("doc_id", "band", "key")
    val got = graft.candidates.PairBlocking.pairs(bands, cap = 4096).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naivePairs(bands))
  }

  test("signature-value-level SimHash pairs equal the naive all-pairs Hamming scan") {
    // near-dup clusters (identical + one-token-edited texts) so distinct
    // signatures << docs — the regime the value-level plan exploits —
    // plus unique-text docs for the no-pair case
    val dir = java.nio.file.Files.createTempDirectory("simhash-docs").toString
    val texts =
      (0 until 12).map(i => (i.toLong, "alpha beta gamma delta epsilon")) ++
      (0 until 9).map(i => (100L + i, "alpha beta gamma delta zeta")) ++
      (0 until 7).map(i => (200L + i, s"unique${i} words entirely different text $i")) ++
      Seq((300L, "zz qq"), (301L, "zz qq rr"))
    texts.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val got = TextQueries.qSimhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // naive oracle: all-pairs bit_count over the oracle-checked signatures
    val sig = TextQueries.qSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = (for {
      (d1, s1) <- sig; (d2, s2) <- sig
      if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2).toLong
      if h <= 2
    } yield (d1, d2, h)).toSet

    assert(got.size == naive.size, s"got ${got.size} vs naive ${naive.size}")
    assert(got == naive,
      s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
    // the dedup premise holds on this fixture: far fewer values than docs
    assert(sig.map(_._2).distinct.length < sig.length / 2)
  }
}
