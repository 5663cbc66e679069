package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural plan guards shared across operator families — see
  * SCALING.md "Catalyst cost pitfalls" for the measurements behind
  * them. */
object PlanGuards {

  private val barrierN = new java.util.concurrent.atomic.AtomicLong

  /** Wrap the KEPT side of a survivors semi/anti join. Catalyst's
    * PushDownLeftSemiAntiJoin pushes such a join through a Union left
    * side — and an ingest frame is routinely a union (multiple sources,
    * planted fixtures) — duplicating the matched-side subtree into
    * EVERY branch; when the matched side is the expensive candidate
    * pipeline (payload decodes, shingle/minhash sketches), that
    * multiplies the dominant cost per branch (measured 2–3× on the
    * media novelty operators; exchange reuse recovers only part).
    * `observe`'s CollectMetrics node is not a push-through pattern for
    * that rule, so it acts as a zero-cost barrier — and yields a free
    * input-row-count metric. The counter keeps metric names unique
    * when one query composes several barrier-wrapped operators
    * (duplicate observe names are an analysis error). */
  def survivorsBarrier(df: DataFrame, tag: String): DataFrame =
    df.observe(s"graft_${tag}_${barrierN.incrementAndGet()}", count(lit(1)))
}
