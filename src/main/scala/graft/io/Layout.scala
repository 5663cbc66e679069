package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout management — the storage-side half of the 100 TB design.
  *
  * The reference reads one flat gzip CSV (`MNIST.scala:46`); a production
  * corpus lives as partitioned + bucketed parquet, and the layout IS the
  * optimization: hive-style date partitions turn a time-scoped query into
  * an O(day) directory prune (no file of another day is even listed into
  * the scan), and bucketed tables pre-shuffle a join key at WRITE time so
  * every subsequent join on that key is exchange-free at READ time — at
  * 100 TB that converts the single most expensive runtime shuffle into a
  * one-time layout cost amortized over every downstream query.
  *
  * Everything here is plain public Spark API (`partitionBy`, `bucketBy` +
  * `saveAsTable`); the queries over these layouts are pinned in PlanSpec
  * (scan shows `PartitionFilters`; bucketed join plans no Exchange).
  */
object Layout {

  /** Write events as hive-style date-partitioned parquet
    * (`event_date=YYYY-MM-DD/` directories). The partition column is
    * derived, kept alongside the original `ts` so intra-day predicates
    * still work. Writer-side: `maxRecordsPerFile` would bound file sizes
    * at real scale; at fixture scale the defaults are fine. */
  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Read one day back from a date-partitioned layout. The equality
    * predicate on the partition column resolves at PLANNING time
    * (PartitionFilters, not PushedFilters): files of other days are never
    * opened — the scan's `inputFiles` all live under the day's
    * directory, which is what the layout_partition_prune gate asserts. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).where(col("event_date") === lit(day))

  /** Small-file compaction of a hive-partitioned layout — the standard
    * maintenance pass after incremental appends (a daily crawl writing a
    * few files per trigger leaves each date directory fragmented into
    * dozens of small files, and small files are the classic 100 TB
    * scan-throughput killer: per-file open/footer costs dominate and
    * task counts explode). Reads the layout, re-clusters rows by the
    * partition column (hash repartition ⇒ each partition value lands
    * wholly in one task ⇒ exactly one output file per partition
    * directory), rewrites under the same partitioning. Row-preserving by
    * construction — one shuffle, no aggregation, no filter. */
  def compactDatePartitioned(spark: SparkSession, path: String,
      outPath: String, partCol: String = "event_date"): Unit =
    spark.read.parquet(path)
      .repartition(col(partCol))
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(outPath)

  /** Per-partition-directory parquet file counts of a hive layout —
    * driver-side listing, bounded by the number of partition values
    * (dates), never by file or row counts within them. Uses the Hadoop
    * FileSystem API so the same call works on HDFS/object stores. */
  def partitionFileCounts(spark: SparkSession, path: String,
      partCol: String = "event_date"): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map { s =>
        val n = fs.listStatus(s.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        s.getPath.getName.stripPrefix(partCol + "=") -> n
      }.toMap
  }

  /** Write a frame as a bucketed external table: `buckets` hash buckets
    * on `key`, sorted within buckets, files at `path`, metadata in the
    * session catalog (bucketing is catalog metadata — a plain
    * `read.parquet` of the same files would NOT know the layout). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }
}
