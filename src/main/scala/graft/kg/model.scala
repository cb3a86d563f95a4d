package graft.kg

/** Core data model for the KG-construction engine.
  *
  * Mirrors the semantic inventory of the reference (SURVEY.md §1):
  *   - entity dictionaries  (reference: loader/DBP15kRawLoader.py:11-19)
  *   - relation triples     (reference: loader/DBP15KRawNeighbors.py:26-27)
  *   - alignment links      (reference: model/layers_LaBSE_neighbor.py:237-250)
  *   - embeddings           (reference: script/preprocess/labse_dump.py:74-86)
  * plus the engine-side input from BASELINE.json input_hint:
  *   (doc_id string, spans array<struct<kind,text,media_ref,offset>>).
  */

/** One span of an interleaved text+media document (BASELINE.json input_hint).
  * `kind` is "text" or "media"; exactly one of text/mediaRef is non-empty.
  * `offset` is strictly increasing within a doc — span order is semantic
  * (per-row span-sequence equality is a binding invariant). */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An interleaved document. Column names match input_hint exactly so the
  * Dataset encoder round-trips the required schema. */
case class Doc(doc_id: String, spans: Seq[Span])

/** CDC-shaped document event for continuous ingestion: `op` is "add"
  * (spans carried) or "retract" (a takedown tombstone — spans empty,
  * only doc_id meaningful). Within a micro-batch retractions apply
  * BEFORE additions (see graft.streaming.StreamingKg). */
case class DocEvent(op: String, doc_id: String, spans: Seq[Span]) {
  def doc: Doc = Doc(doc_id, spans)
}
object DocEvent {
  def add(d: Doc): DocEvent = DocEvent("add", d.doc_id, d.spans)
  def retract(docId: String): DocEvent = DocEvent("retract", docId, Seq.empty)
}

/** An entity mention detected in a text span. `seq` is the global
  * first-seen order (doc order × span order × position in span) — the
  * reference's neighbor semantics are file-line-order sensitive
  * (loader/DBP15KRawNeighbors.py:25-45), so we carry an explicit sequence
  * number from the scan onward instead of relying on partition order. */
case class Mention(docId: String, kg: Int, surface: String, spanOffset: Int, seq: Long)

/** A raw extracted triple, pre-linking: surface forms + predicate label. */
case class RawTriple(docId: String, kg: Int, subj: String, pred: String, obj: String, seq: Long)

/** Entity dictionary row (reference ent_ids_* TSV). */
case class Entity(id: Long, name: String, kg: Int)

/** Id-space triple (reference triples_* TSV). */
case class Triple(head: Long, rel: Long, tail: Long)

/** Id-space triple with document provenance — the committed form in the
  * continuous-construction state: per-row doc lineage is what makes
  * retraction (takedown of a committed document) a delta-sized filter
  * instead of a multiset subtraction over the whole table. */
case class DocTriple(docId: String, head: Long, rel: Long, tail: Long) {
  def triple: Triple = Triple(head, rel, tail)
}

/** Final materialized triple with canonical entity ids + label strings. */
case class CanonTriple(subj: String, pred: String, obj: String, subjId: Long, objId: Long)

/** Alignment link (reference ref_ent_ids / test.ref). */
case class Link(e1: Long, e2: Long)

/** Entity embedding (reference raw_LaBSE_emb_*.pkl → parquet). */
case class Emb(id: Long, emb: Array[Float])

/** A neighbor block: the unit of work of the alignment model
  * (reference loader/DBP15KRawNeighbors.py:66-82): row 0 = center
  * embedding, rows 1..validLen-1 = distinct 1-hop neighbor embeddings in
  * first-seen order, truncated to `NeighborSize`. The star adjacency is
  * fully derived from validLen, so it is never materialized.
  *
  * `emb` is ROW-MAJOR FLAT (validLen × dim floats, no padding rows):
  * a flat primitive array encodes ~10× faster than nested arrays under
  * Tungsten and shrinks shuffle bytes by the padding fraction. */
case class NeighborBlock(id: Long, kg: Int, emb: Array[Float], validLen: Int) {
  def dim: Int = emb.length / validLen
  /** row i as a view-copy (kernels index flat; this is for tests). */
  def row(i: Int): Array[Float] = java.util.Arrays.copyOfRange(emb, i * dim, (i + 1) * dim)
}

/** Scored alignment candidate (after top-k similarity join). */
case class Candidate(srcId: Long, dstId: Long, score: Double, rank: Int)

object Dims {
  /** Embedding dimension — reference settings.py:35 (LaBSE_DIM = 768).
    * Configurable; 64 for fixtures keeps tests fast, 768 available. */
  val DefaultDim = 64
  /** Neighborhood size incl. center — reference settings.py:39. */
  val NeighborSize = 20
  /** Token length for the char-ordinal ablation — reference settings.py:33. */
  val TokenLen = 50
  /** Global seed — reference settings.py:13-18 / run_LaBSE_neighbor.py:5. */
  val Seed = 37L
  /** Top-k retrieval — reference model/layers_LaBSE_neighbor.py:315. */
  val TopK = 10
}
