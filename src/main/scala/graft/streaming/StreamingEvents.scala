package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Streaming analytics over the events stream — engine-side additions
  * (the reference is batch-only): the two canonical stateful patterns a
  * continuous pipeline needs, expressed so state stays bounded at scale.
  *
  *  - Watermarked tumbling-window aggregation: the streaming twin of the
  *    batch q_events_window. The watermark bounds window state — without
  *    it a 100 TB/day stream accretes state forever. Distinct users are
  *    HLL-sketched (approx_count_distinct): exact distinct is not
  *    mergeable incrementally and HLL register-max merges are
  *    order-insensitive, so batch/stream parity is exact on the sketch.
  *
  *  - Sessionization via flatMapGroupsWithState with EVENT-TIME timeout:
  *    the streaming twin of the batch q_sessionize (same 1800 s gap
  *    rule). Per-user state is O(1) — only the OPEN session (start,
  *    last, count); closed sessions are emitted as soon as the gap rule
  *    closes them within a batch, and the final open session is emitted
  *    by the event-time timeout once the watermark passes last+gap.
  *    Shuffles once, on user_id.
  *
  * Both run over a file source here (the sandbox has no Kafka); the plan
  * is source-agnostic.
  */
object StreamingEvents {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly tumbling-window aggregates with a 1 h watermark. */
  def windowedCounts(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(inputDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n"), col("min_v"), col("max_v"), col("n_users_approx"))

  /** The same aggregation over a static frame — the parity oracle for
    * windowedCounts (identical plan minus the watermark). */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n"), col("min_v"), col("max_v"), col("n_users_approx"))

  /** `ts` carries the watermark metadata (event-time timeout needs the
    * event-time column present in the grouped Dataset); `tsMs` is the
    * integer form the gap rule computes on. */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, tsMs: Long, event_id: Long)
  /** Open-session state: O(1) per user. Times in epoch millis. */
  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start_ms: Long, session_end_ms: Long, n_events: Long)

  /** Gap-rule sessionization (gap > gapSec starts a new session — the
    * batch q_sessionize rule, applied at millisecond precision).
    * Emits CLOSED sessions in Append mode;
    * the trailing open session per user is closed by the event-time
    * timeout when the watermark passes last+gap.
    *
    * Within a batch the group's events are sorted by (ts, event_id);
    * events late across batches (older than the open session's last
    * event) would be gap-evaluated in arrival order — the watermark
    * (delayThreshold) is the bound on that reordering window. */
  def sessions(spark: SparkSession, inputDir: String, gapSec: Long = 1800,
               delayThreshold: String = "10 seconds",
               maxFilesPerTrigger: Option[Int] = None): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L
    val reader0 = spark.readStream.schema(eventSchema)
    val reader = maxFilesPerTrigger.fold(reader0)(n => reader0.option("maxFilesPerTrigger", n))
    reader.parquet(inputDir)
      .withWatermark("ts", delayThreshold)
      .select(col("user_id"), col("ts"),
        (col("ts").cast("double") * 1000).cast("long").as("tsMs"), col("event_id"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (!it.hasNext) {
            // event-time timeout: watermark passed last+gap → close the open session
            val out = state.getOption.map(s => SessionOut(uid, s.startMs, s.lastMs, s.nEvents))
            state.remove()
            out.iterator
          } else {
            val evs = it.toArray.sortBy(e => (e.tsMs, e.event_id))
            val closed = new ArrayBuffer[SessionOut]()
            var cur = state.getOption
            evs.foreach { e =>
              cur = cur match {
                case Some(s) if e.tsMs - s.lastMs <= gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.lastMs, e.tsMs), s.nEvents + 1))
                case Some(s) =>
                  closed += SessionOut(uid, s.startMs, s.lastMs, s.nEvents)
                  Some(OpenSession(e.tsMs, e.tsMs, 1))
                case None =>
                  Some(OpenSession(e.tsMs, e.tsMs, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a timeout timestamp at or below the watermark throws; if the
              // open session is already expired, fire at the next possible tick
              state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }
}
