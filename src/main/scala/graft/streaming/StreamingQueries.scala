package graft.streaming

import graft.{Q, Tables}

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

  def all: Seq[Q] = Seq(windowed, dedupWindowed)
}
