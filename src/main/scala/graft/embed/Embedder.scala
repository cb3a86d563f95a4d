package graft.embed

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.kg._
import graft.util.DetHash._

/** Deterministic stand-in sentence embedder with the exact pooling
  * semantics of the reference's LaBSE dump (script/preprocess/
  * labse_dump.py:53-61): tokenize → per-token embedding → sum-pool over
  * interior tokens (reference drops [CLS]/[SEP]; here the raw string has
  * no sentinels so all tokens are interior) → L2 normalize.
  *
  * "Tokens" are character 3-grams; each token embedding is a deterministic
  * pseudo-random R^dim vector derived by feature hashing (4 signed buckets
  * per gram). No model weights or network are available in this sandbox
  * (SURVEY.md §7.0) — this featurizer is used by BOTH the engine and the
  * test oracle, so parity gates are well-defined.
  *
  * Execution idiom (north star): broadcast-model `mapPartitions` batched
  * inference — the "model" (here the hash config) is initialized once per
  * partition, rows are processed in batches. The reference embeds one
  * string per forward pass (labse_dump.py:76); we batch within partitions.
  */
final case class EmbedderConfig(dim: Int = Dims.DefaultDim, seed: Long = Dims.Seed, gram: Int = 3)

object Embedder {

  /** Embed one string. Pure; used by engine, tests and oracle alike. */
  def embedOne(cfg: EmbedderConfig, name: String): Array[Float] = {
    val v = new Array[Float](cfg.dim)
    val n = name.length
    if (n >= cfg.gram) {
      var i = 0
      while (i <= n - cfg.gram) {
        // token = char n-gram [i, i+gram); hash to 4 signed buckets
        var gh = 0xcbf29ce484222325L ^ cfg.seed
        var j = i
        while (j < i + cfg.gram) { gh ^= name.charAt(j).toLong; gh *= 0x100000001b3L; j += 1 }
        var b = 0
        while (b < 4) {
          val hb = mix64(gh + b * 0x9e3779b97f4a7c15L)
          val idx = (nonNeg(hb) % cfg.dim).toInt
          val sign = if ((hb & 1L) == 0L) 1f else -1f
          v(idx) += sign // sum-pool across tokens (labse_dump.py:61)
          b += 1
        }
        i += 1
      }
    } else {
      v((nonNeg(strHash(name, cfg.seed)) % cfg.dim).toInt) = 1f
    }
    l2normalize(v)
  }

  def l2normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
    i = 0
    while (i < v.length) { v(i) = (v(i) * inv).toFloat; i += 1 }
    v
  }

  /** 4-way unrolled dot — the hot kernel of LSH scoring and exact top-k
    * (billions of calls per candidate stage). Independent accumulators
    * break the add dependency chain (~2-3× ILP on this loop); double
    * accumulation keeps ranking precision. Summation order is fixed, so
    * results stay parallelism-independent. */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n - 3) {
      s0 += a(i).toDouble * b(i)
      s1 += a(i + 1).toDouble * b(i + 1)
      s2 += a(i + 2).toDouble * b(i + 2)
      s3 += a(i + 3).toDouble * b(i + 3)
      i += 4
    }
    while (i < n) { s0 += a(i).toDouble * b(i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  /** Entities → embeddings table (reference S4/S5 as Parquet-able rows).
    * Broadcast-model mapPartitions: config broadcast once, batched loop. */
  def embedEntities(spark: SparkSession, ents: Dataset[Entity], cfg: EmbedderConfig): Dataset[Emb] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cfg)
    ents.mapPartitions { it =>
      val c = bc.value // one "model init" per partition (labse_dump.py:50-51)
      it.grouped(256).flatMap(_.iterator.map(e => Emb(e.id, embedOne(c, e.name))))
    }
  }
}
