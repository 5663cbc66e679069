package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Shared construction for the broadcast-BloomFilter pattern the sketch
  * operators use (doc/span contamination, streaming decontamination,
  * frozen-history novelty). One place owns the three fiddly details:
  *
  *  - the SENTINEL row: Spark's `bloomFilter` aggregate returns null
  *    over zero input rows, so an empty benchmark/history branch would
  *    NPE — one impossible-valued insertion (a string real keys can
  *    never equal, `Long.MinValue` for hash columns) is fpp-invisible
  *    and makes the empty case well-defined;
  *  - `expectedItems` sizing: a production caller KNOWS its suite/corpus
  *    size and passes it to skip the counting pass; the count fallback
  *    exists for exploratory use. Over-estimating only LOWERS the
  *    realized fpp; under-estimating raises it above spec, so round up;
  *  - the membership UDF: a driver-built sketch has no Column encoding,
  *    so a UDF is the honest form — callers place it pre-aggregation so
  *    shuffles carry only surviving rows.
  */
object Sketches {

  /** Real shingles are lowercase alnum+space and content hashes are md5
    * hex, so a padded sentinel can never collide with either. */
  val StringSentinel = " graft-bloom-sentinel "

  /** Broadcast bloom over a STRING column of `df`. */
  def stringBloom(df: DataFrame, column: String, fpp: Double,
      expectedItems: Option[Long] = None): Broadcast[BloomFilter] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val items = df.select(col(column).as("v"))
      .union(df.sparkSession.range(1).select(lit(StringSentinel).as("v")))
    val n = expectedItems.getOrElse(math.max(1L, items.count()))
    df.sparkSession.sparkContext.broadcast(items.stat.bloomFilter("v", n, fpp))
  }

  /** Broadcast bloom over a LONG (hash) column of `df`. */
  def longBloom(df: DataFrame, column: String, fpp: Double,
      expectedItems: Option[Long] = None): Broadcast[BloomFilter] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val items = df.select(col(column).as("v"))
      .union(df.sparkSession.range(1).select(lit(Long.MinValue).as("v")))
    val n = expectedItems.getOrElse(math.max(1L, items.count()))
    df.sparkSession.sparkContext.broadcast(items.stat.bloomFilter("v", n, fpp))
  }

  def mightContainString(b: Broadcast[BloomFilter]): UserDefinedFunction =
    udf((s: String) => b.value.mightContainString(s))

  def mightContainLong(b: Broadcast[BloomFilter]): UserDefinedFunction =
    udf((h: Long) => b.value.mightContainLong(h))
}
