package graft.streaming

import graft.{Gate, Q, Tables}
import org.apache.spark.sql.functions._

object StreamingQueries {

  /** Batch twin of the streaming 5-minute windowed aggregation (the
    * streaming query itself runs in StreamingSpec with a memory sink;
    * stream ≡ batch on the same input is asserted there). */
  val windowed: Q = Q(
    "events_windowed",
    """SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 * 1000000 AS BIGINT)) AS w_start,
      |  event_type, count(*) AS n, sum(value) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    EventsStream.windowedAggBatch(Tables.events(s, d))
  }

  /** Batch twin of the streaming windowed ingestion-dedup (stream ≡ batch
    * key-set equivalence is asserted in StreamingSpec). */
  val dedupWindowed: Q = Q(
    "events_dedup_windowed",
    """SELECT DISTINCT
      |  make_timestamp(CAST(floor(epoch(ts) / 300) * 300 * 1000000 AS BIGINT)) AS w_start,
      |  user_id, event_type
      |FROM events""".stripMargin
  ) { (s, d) =>
    EventsStream.dedupWindowedBatch(Tables.events(s, d))
  }

  /** Batch run of the stream-shaped decontamination pass (the SAME
    * `DocsStream.decontaminate` code runs in StreamingSpec as an actual
    * file stream; stream ≡ batch is asserted there). Gated against the
    * exact broadcast-join contamination twin: no contaminated doc may
    * survive (bloom no-false-negatives is structural), and ≥ 99% of the
    * exactly-clean docs must be kept (false positives wrongly drop a
    * borderline doc with probability ≈ fpp). */
  val decontaminate: Q = Q.gated("text_decontaminate") { (s, d) =>
    val docs = Tables.documents(s, d)
    val isBench = col("doc_id") % 100 === 7
    val bloom = DocsStream.benchBloom(docs.where(isBench),
      fpp = 1e-4, expectedItems = Some(8192L))
    DocsStream.decontaminate(docs.where(!isBench), bloom, threshold = 0.05)
  } { (s, d, res) =>
    import graft.text.TextQueries
    val docs = Tables.documents(s, d)
    val isBench = col("doc_id") % 100 === 7
    val flagged = TextQueries.contaminationVs(docs, isBench, threshold = 0.05)
      .select("doc_id").cache()
    try {
      val nFlagged = flagged.count()
      val nCorpus = docs.where(!isBench && col("text").isNotNull).count()
      val leaks = res.join(flagged, "doc_id").count()
      // a fully-flagged corpus is vacuously correct, not 0/0=NaN
      val keptRecall = if (nCorpus == nFlagged) 1.0
        else res.count().toDouble / (nCorpus - nFlagged)
      Seq(
        Gate("contaminated_leaks", leaks.toDouble, leaks == 0),
        Gate("kept_recall", keptRecall, keptRecall >= 0.99))
    } finally flagged.unpersist()
  }

  /** Batch twin of the stream-stream follow join
    * ([[EventsStream.followPairsStream]]): the full (purchase, follower)
    * pair set, oracle-checked; StreamingSpec asserts the watermarked
    * streaming run produces the identical multiset. */
  val followPairs: Q = Q(
    "events_follow_pairs",
    """SELECT p.event_id AS p_id, e.event_id AS follow_id
      |FROM events p
      |JOIN events e ON e.user_id = p.user_id
      |  AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
      |WHERE p.event_type = 'purchase'""".stripMargin
  ) { (s, d) =>
    EventsStream.followPairsBatch(Tables.events(s, d))
  }

  /** Batch twin of the LEFT OUTER stream-stream follow join
    * ([[EventsStream.followPairsOuterStream]]): followerless purchases
    * surface with a null follow_id. StreamingSpec's two-file staged
    * replay asserts the watermark-delayed outer semantics. */
  val followPairsOuter: Q = Q(
    "events_follow_pairs_outer",
    """SELECT p.event_id AS p_id, e.event_id AS follow_id
      |FROM events p
      |LEFT JOIN events e ON e.user_id = p.user_id
      |  AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
      |WHERE p.event_type = 'purchase'""".stripMargin
  ) { (s, d) =>
    EventsStream.followPairsOuterBatch(Tables.events(s, d))
  }

  /** Built-in session_window sessionization
    * ([[EventsStream.sessionWindowAgg]]) against the gaps-and-islands
    * oracle (q29's shape). Boundary semantics differ subtly from q29
    * itself: session_window merges iff the gap is STRICTLY under the
    * threshold, so the oracle's island rule is `>= gap ⇒ new session`
    * in MICROSECONDS (epoch_us — an epoch_ms rule would misclassify
    * sub-millisecond boundary gaps that the engine resolves at full
    * precision). */
  val sessionWindow: Q = Q(
    "events_session_window",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |s AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sn
      |  FROM o
      |)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM s GROUP BY user_id, sn""".stripMargin
  ) { (s, d) =>
    EventsStream.sessionWindowAgg(Tables.events(s, d))
  }

  def all: Seq[Q] = Seq(windowed, dedupWindowed, decontaminate, followPairs,
    followPairsOuter, sessionWindow)
}
