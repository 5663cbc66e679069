package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All engine queries take the scale-factor directory as a parameter so the
  * same code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) —
  * and, at production scale, any parquet layout with these schemas. Reads
  * are plain `spark.read.parquet`, so Catalyst handles column pruning and
  * predicate pushdown into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events fixture's `ts` encoding has varied across driver
    * regenerations; normalize every observed encoding to a micros
    * TIMESTAMP so downstream `unix_millis`/`unix_micros`/typed-encoder
    * paths see one stable type:
    *
    *  - TIMESTAMP(NANOS): Spark only reads those as LONG
    *    (spark.sql.legacy.parquet.nanosAsLong=true, set by every session
    *    builder in this repo). Convert with integer FLOOR division (pmod
    *    makes `div` floor instead of truncate, matching DuckDB's native
    *    nanos→micros conversion for pre-1970 instants) so epoch-nanos
    *    (~1.7e18, beyond double's 53-bit mantissa) never round-trip
    *    through a double.
    *  - timestamp[us] without timezone: Spark 4 reads TIMESTAMP_NTZ,
    *    which `unix_millis`/`unix_micros` reject at analysis time. Cast
    *    to TIMESTAMP — the session zone is pinned UTC in both the build
    *    and the driver, so wall-clock values are preserved bit-exactly
    *    and DuckDB (which reads the same parquet naively) stays
    *    hash-compatible.
    *  - timestamp[us] with UTC timezone: already TimestampType; pass
    *    through. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))

  /** The encoding-agnostic `ts` normalization (see [[events]]); shared
    * with the streaming file-source entry points so batch and stream
    * reads of the same fixture can never diverge on encoding. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Physical-layout helpers shared by the pair-compute operators. */
object Partitioning {
  /** Spread an under-partitioned frame to the session's parallelism.
    *
    * The streamed side of a cartesian pair-compute bounds its parallelism
    * by its partition count — and a small parquet table arrives as ONE
    * split, which silently serializes the entire O(n²) work onto a single
    * task (measured: the 2000-vector kNN ran 1-threaded regardless of
    * core count). Repartitioning n rows is negligible next to n² work;
    * large scans (≥ parallelism splits) pass through untouched, so the
    * 100 TB path never pays a gratuitous full-table shuffle. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

/** One quantified correctness gate: a named metric with its pass verdict.
  * Gates make the sketch/iterative queries (no SQL oracle possible)
  * self-checking on the driver surface: Verify evaluates them per round,
  * writes them to gates.json, and deletes the dump of a failing query so
  * the round's correctness artifact goes red instead of silently passing
  * a rows-only count. */
final case class Gate(metric: String, value: Double, pass: Boolean)

/** One verifiable engine query: a DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/aliases must match between the two — the driver's compare
  * sorts columns by name before hashing. Queries without an oracle should
  * carry a [[Gate]] function instead: (session, sfDir, dumped result) →
  * quantified invariants (recall vs the exact twin, Σp≈1, …).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    gate: Option[(SparkSession, String, DataFrame) => Seq[Gate]] = None)

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
  def gated(name: String)(fn: (SparkSession, String) => DataFrame)(
      gate: (SparkSession, String, DataFrame) => Seq[Gate]): Q =
    Q(name, fn, None, Some(gate))
}
