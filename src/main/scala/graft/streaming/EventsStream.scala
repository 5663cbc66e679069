package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
case class SessionState(nEvents: Long, totalValue: Double, lastTs: Long)
case class SessionSummary(user_id: Long, n_events: Long, total_value: Double, closed: Boolean)

/** Structured Streaming surface over the events table — extension beyond
  * the reference (which has no streaming, SURVEY §2.11): event-time
  * windowed aggregation with watermarking, and custom sessionization
  * state via mapGroupsWithState. The batch twin of the windowed agg
  * ([[windowedAggBatch]]) is DuckDB-oracle-checked; stream/batch
  * equivalence is asserted in StreamingSpec (same input ⇒ same result is
  * exactly what Structured Streaming's incremental model promises).
  */
object EventsStream {

  /** File-source read of an events parquet directory. readStream requires
    * a user-supplied schema, and the fixture's `ts` physical encoding has
    * varied across driver regenerations (TIMESTAMP(NANOS)→long under the
    * nanosAsLong flag, then timestamp[us] NTZ) — so peek at the actual
    * on-disk schema with a batch read (metadata-only, no scan) and apply
    * the same encoding-agnostic normalization as the batch path
    * ([[graft.Tables.normalizeTs]]). Batch and stream can then never
    * diverge on fixture encoding. */
  private def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    graft.Tables.normalizeTs(reader.parquet(dir))
  }

  /** 5-minute tumbling event-time windows per event_type. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))

  /** Batch twin on the same frame (identical plan minus the watermark). */
  def windowedAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))

  /** Start the windowed agg from a parquet directory as a file stream into
    * an in-memory sink (local smoke; swap source/sink for Kafka/Delta in
    * production — the transform is source-agnostic). */
  def startWindowedQuery(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    windowedAgg(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
  }

  /** Windowed exact ingestion-dedup: one row per (5-minute window,
    * user_id, event_type) key — the standard at-least-once source dedup.
    * Output is the KEY (deterministic under any arrival order), not an
    * arbitrary first payload. `dropDuplicatesWithinWatermark` bounds the
    * seen-key state by event time, which is what makes this pattern hold
    * at 10⁹ keys: duplicates of a window key arrive within the window
    * span, so the 10-minute horizon covers them and state is dropped
    * after. */
  def dedupWindowed(events: DataFrame): DataFrame =
    events
      .withColumn("w_start", window(col("ts"), "5 minutes").getField("start"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("w_start", "user_id", "event_type")
      .select(col("w_start"), col("user_id"), col("event_type"))

  /** Batch twin: the same key set as a plain distinct. */
  def dedupWindowedBatch(events: DataFrame): DataFrame =
    events
      .select(window(col("ts"), "5 minutes").getField("start").as("w_start"),
        col("user_id"), col("event_type"))
      .distinct()

  /** Start the windowed dedup from a parquet directory file stream into a
    * memory sink (same local-smoke shape as [[startWindowedQuery]]). */
  def startDedupQuery(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    dedupWindowed(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
  }

  /** The purchase side / follow side of the stream-stream range join
    * ([[followPairsStream]]); factored so the batch twin is the SAME
    * join over the same projections, minus only the watermarks. */
  private def purchaseSide(events: DataFrame): DataFrame =
    events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))

  private def followSide(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("ts"), col("event_id").as("follow_id"))

  private def followJoin(p: DataFrame, e: DataFrame): DataFrame =
    p.join(e,
        col("p_user") === col("user_id")
          && col("ts") > col("p_ts")
          && col("ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("follow_id"))

  /** STREAM-STREAM range join: every (purchase, event) pair where the
    * event follows the purchase by ≤ 1 hour for the same user — the
    * incremental form of the q16 batch range join. Both sides carry a
    * watermark and the join predicate bounds event time on both sides,
    * which is exactly what lets Structured Streaming evict state: a
    * buffered purchase can stop waiting once the event-side watermark
    * passes p_ts + 1 h, so state is bounded by (watermark + 1 h) of
    * traffic at any input scale, not by stream history. Equi-key
    * user_id keeps the join hash-partitioned (state sharded by user),
    * the same scale shape as the batch twin. */
  def followPairsStream(events: DataFrame): DataFrame = {
    val p = purchaseSide(events.withWatermark("ts", "2 hours"))
    val e = followSide(events.withWatermark("ts", "2 hours"))
    followJoin(p, e)
  }

  /** Batch twin: the identical join without watermarks. */
  def followPairsBatch(events: DataFrame): DataFrame =
    followJoin(purchaseSide(events), followSide(events))

  private def followJoinOuter(p: DataFrame, e: DataFrame): DataFrame =
    p.join(e,
        col("p_user") === col("user_id")
          && col("ts") > col("p_ts")
          && col("ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("p_id"), col("follow_id"))

  /** LEFT OUTER stream-stream join: like [[followPairsStream]] but a
    * purchase with NO follower inside its hour still emits — with a
    * null follow_id — once the event-side watermark passes p_ts + 1 h
    * and the engine can PROVE no matching event is still coming. That
    * proof is the whole semantics: outer results are necessarily
    * watermark-delayed (a purchase near the head of the stream
    * null-extends only after a later trigger advances the watermark
    * past its horizon), which StreamingSpec exercises with a two-file
    * staged feed. State bounds are the inner join's. */
  def followPairsOuterStream(events: DataFrame): DataFrame = {
    val p = purchaseSide(events.withWatermark("ts", "2 hours"))
    val e = followSide(events.withWatermark("ts", "2 hours"))
    followJoinOuter(p, e)
  }

  /** Batch twin of the outer variant (no watermark, so every
    * unmatched purchase null-extends immediately). */
  def followPairsOuterBatch(events: DataFrame): DataFrame =
    followJoinOuter(purchaseSide(events), followSide(events))

  /** Start the outer follow join as a file stream, one file per
    * trigger, so staged multi-file directories replay as multiple
    * batches and the watermark actually advances between them (outer
    * null-extension needs that — a single mega-batch would emit no
    * outer rows at all). */
  def startFollowPairsOuterQuery(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    followPairsOuterStream(readEvents(spark, dir, maxFilesPerTrigger = Some(1)))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
  }

  /** Start the stream-stream follow join from a parquet directory file
    * stream into a memory sink (StreamingSpec asserts multiset equality
    * with [[followPairsBatch]] on the same fixture). */
  def startFollowPairsQuery(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    followPairsStream(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
  }

  /** Exactly-once streaming ingestion into a date-partitioned parquet
    * layout: the file sink + checkpoint pair. The sink commits each
    * micro-batch atomically into the `_spark_metadata` manifest;
    * readers of the output path resolve files THROUGH the manifest, so
    * a torn write, a speculative duplicate task file, or any stray file
    * in the directory is invisible — and a restart from the checkpoint
    * re-emits nothing (offsets + committed batches are both durable).
    * This is how the [[graft.io.Layout]] batch maintenance operators
    * (compaction, rollup, delete) get their input at a streaming
    * boundary without a dedup pass. StreamingSpec pins all three
    * properties: ingest ≡ batch, restart adds nothing, stray files are
    * ignored. */
  def startParquetIngest(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    readEvents(spark, srcDir)
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("event_date")
      .outputMode(OutputMode.Append())
      .start()

  /** Sessionization via Spark's BUILT-IN session_window — the
    * declarative twin of both [[sessionize]] (custom
    * flatMapGroupsWithState) and the batch gaps-and-islands form (q29):
    * `session_window(ts, gap)` merges a user's events whose gaps are
    * under the threshold into one window at the AGGREGATION layer, no
    * window functions, no hand-rolled state. This is the form to prefer
    * when the per-session aggregate is expressible as standard
    * aggregates: Catalyst plans it as one merging aggregation keyed on
    * (user, session), streaming gets watermark-evicted session state
    * for free, and the same expression runs batch and stream. DECIMAL
    * value sums keep the result hash order-free. The q29-shaped oracle
    * (lag → island numbering → group) must agree exactly — that
    * equivalence is this query's point. */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("n_events"), col("total_value"),
        col("session_start"), col("session_end"))

  /** Per-user sessionization via flatMapGroupsWithState: a session closes
    * after `gapMinutes` of event-time silence. Emits one summary per
    * CLOSED session (closed=true) plus the still-open session's running
    * totals (closed=false) — every event is accounted for in exactly one
    * emitted session per batch. Demonstrates the KeyValueGroupedDataset
    * custom-state path (the scalable pattern for sessionization at 10⁹
    * users: state partitioned by key, checkpointed incrementally). */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMinutes: Int = 30): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // SCALE NOTE: the sort buffers ONE user's events from ONE
          // trigger in memory — bounded by per-user per-trigger arrival
          // volume (human-scale: thousands of events at worst), never by
          // corpus or user-count size. A user hot enough to break this
          // (a bot firehose) needs pre-aggregation upstream, not a bigger
          // buffer here. Spark does not order the group iterator, so the
          // sort is what makes gap detection correct under shuffled
          // arrival; (ts, event_type) keys make it deterministic.
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[SessionSummary]()
          sorted.foreach { e =>
            if (st.lastTs != Long.MinValue &&
                e.ts.getTime - st.lastTs > gapMinutes * 60000L) {
              // gap: the previous session is complete — emit it
              out += SessionSummary(userId, st.nEvents, st.totalValue, closed = true)
              st = SessionState(0L, 0.0, Long.MinValue)
            }
            st = SessionState(st.nEvents + 1, st.totalValue + e.value, e.ts.getTime)
          }
          state.update(st)
          if (st.nEvents > 0) {
            out += SessionSummary(userId, st.nEvents, st.totalValue, closed = false)
          }
          out.iterator
      }
      .toDF()
  }
}
