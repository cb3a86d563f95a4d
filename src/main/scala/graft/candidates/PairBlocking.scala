package graft.candidates

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact skew-safe candidate-pair enumeration for LSH-style blocking
  * (MinHash bands, SimHash bands, any bucket-join dedup stage).
  *
  * The naive plan — self-join the (doc_id, band, key) table on
  * (band, key) — puts an entire bucket's n² pair loop into ONE task: a
  * hot band key (boilerplate text, empty docs) at 100 TB stalls the
  * stage on a single straggler. This operator keeps the output pair SET
  * exact while bounding per-task work at ~cap²:
  *
  *  - buckets with n ≤ cap take the naive join (no overhead);
  *  - larger buckets are split into T = ceil(n/cap) deterministic hash
  *    tiles, and each of the T(T+1)/2 tile pairs becomes its own join
  *    key — the bucket's pair loop spreads over T(T+1)/2 tasks of ≤cap²
  *    pairs each. Replication is ~T rows per input row, i.e. total work
  *    stays O(n²/cap) per bucket — the same pair count, just
  *    partitioned.
  *
  * Output may contain duplicate (d1, d2) rows (same-tile pairs arrive in
  * both orientations; multi-band callers already dedup across bands) —
  * callers apply .distinct(), after which the set equals the naive
  * self-join's exactly (PairBlockingSpec property-checks this on a
  * skewed fixture).
  */
object PairBlocking {

  /** @param bands columns (doc_id, band, key); doc_id unique within a
    *              (band, key) bucket.
    * @param cap   max bucket size joined naively; hot buckets tile at
    *              ~cap members per tile. */
  def pairs(bands: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val counts = bands.groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
    val withN = bands.join(counts, Seq("band", "key"))

    val cold = withN.filter(col("n") <= cap).select(col("doc_id"), col("band"), col("key"))
    val coldPairs = cold.toDF("d1", "band", "key")
      .join(cold.toDF("d2", "band", "key"), Seq("band", "key"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"))

    val hot = withN.filter(col("n") > cap)
      .withColumn("nt", ((col("n") + cap - 1) / cap).cast("int"))
      .withColumn("tile", pmod(xxhash64(col("doc_id")), col("nt")).cast("int"))
    // each unordered tile pair (ti ≤ tj) is one join key: the left row
    // fans out over tj ≥ its tile, the right row over ti ≤ its tile
    val hotL = hot.select(col("doc_id").as("d1"), col("band"), col("key"),
      col("tile").as("ti"), explode(expr("sequence(tile, nt - 1)")).as("tj"))
    val hotR = hot.select(col("doc_id").as("d2"), col("band"), col("key"),
      explode(expr("sequence(0, tile)")).as("ti"), col("tile").as("tj"))
    // cross-tile pairs arrive in one orientation only → normalize with
    // least/greatest rather than filtering on d1 < d2
    val hotPairs = hotL.join(hotR, Seq("band", "key", "ti", "tj"))
      .filter(col("d1") =!= col("d2"))
      .select(least(col("d1"), col("d2")).as("d1"), greatest(col("d1"), col("d2")).as("d2"))

    coldPairs.unionByName(hotPairs)
  }
}
