package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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
    * task counts explode). Reads the layout, re-clusters rows by
    * (partition column, content salt) and rewrites under the same
    * partitioning. Row-preserving by construction — one shuffle, no
    * aggregation, no filter.
    *
    * Why the salt: repartitioning on the partition column ALONE funnels
    * each partition value into ONE task and one output file — fine at
    * fixture scale, but at 100 TB a hot day is terabytes and the
    * compaction job single-threads it (and a single multi-TB file is its
    * own problem). The salt spreads each partition value across up to
    * `saltBuckets` tasks (content-hash, so deterministic for a given
    * input), and `maxRecordsPerFile` caps any one file regardless —
    * post-compaction file count per directory is bounded by
    * saltBuckets · ⌈rows-per-task / maxRecordsPerFile⌉, not 1. */
  def compactDatePartitioned(spark: SparkSession, path: String,
      outPath: String, partCol: String = "event_date",
      saltBuckets: Int = 4, maxRecordsPerFile: Long = 5000000L): Unit = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val df = spark.read.parquet(path)
    val dataCols = df.columns.filter(_ != partCol).map(col)
    df.withColumn("_salt", pmod(hash(dataCols: _*), lit(saltBuckets)))
      .repartition(col(partCol), col("_salt"))
      .drop("_salt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol)
      .parquet(outPath)
  }

  /** Per-partition-directory parquet file counts of a hive layout —
    * driver-side listing, bounded by the number of partition values
    * (dates), never by file or row counts within them. Uses the Hadoop
    * FileSystem API so the same call works on HDFS/object stores. */
  def partitionFileCounts(spark: SparkSession, path: String,
      partCol: String = "event_date"): Map[String, Int] =
    partitionFileListing(spark, path, partCol).view
      .mapValues(_.count(_._1.endsWith(".parquet"))).toMap

  /** Per-partition-directory (fileName, length) listing of a hive
    * layout — the byte-identity snapshot the delete/retention gates
    * diff before/after a maintenance operation. Same bounds as
    * [[partitionFileCounts]]. */
  def partitionFileListing(spark: SparkSession, path: String,
      partCol: String = "event_date"): Map[String, Seq[(String, Long)]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map { s =>
        s.getPath.getName.stripPrefix(partCol + "=") ->
          fs.listStatus(s.getPath).toSeq.filter(_.isFile)
            .map(f => (f.getPath.getName, f.getLen)).sortBy(_._1)
      }.toMap
  }

  /** Total COMPRESSED column-chunk bytes across every parquet file
    * under `path` (recursive) — the scan-cost measure of a dataset:
    * what a reader actually pulls per row group, excluding the
    * once-per-file footer/metadata that dominates raw directory sizes
    * at fixture scale (a ~900-byte file holding 30 rows is ~90% footer,
    * so a directory-size ratio between a compressed index and its raw
    * twin reads ~0.5 when the data ratio is ~0.05). Driver-side footer
    * reads only — no data pages are opened. */
  def parquetDataBytes(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    def files(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) files(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Nil
      }
    // footer opens are independent driver-side IO — read them in
    // parallel (measured r19: ~4.6 s sequential over the two PQ-store
    // sides in ann_ivf_pq_lifecycle; the sum is order-free)
    files(root).toArray.par("parquetDataBytes") { st =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(st, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala
          .map(_.getColumns.asScala.map(_.getTotalSize).sum).sum
      } finally reader.close()
    }.sum
  }

  /** Map `f` over `xs` on a bounded driver thread pool — the shared
    * helper for independent per-file metadata operations (footer reads,
    * per-partition listings) whose sequential form serializes on IO
    * latency. Results keep input order; exceptions propagate. */
  private[graft] implicit final class ParOps[A](private val xs: Array[A])
      extends AnyVal {
    def par[B](tag: String, threads: Int = 16)(f: A => B)(
        implicit ct: scala.reflect.ClassTag[B]): Array[B] = {
      if (xs.length <= 1) return xs.map(f)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(threads, xs.length),
        r => { val t = new Thread(r, s"layout-par-$tag"); t.setDaemon(true); t })
      try {
        val futures = xs.map(a => pool.submit(
          new java.util.concurrent.Callable[B] { def call(): B = f(a) }))
        // rethrow the worker's own exception, not the ExecutionException
        // wrapper — "exceptions propagate" means a caller matching on
        // the sequential form's exception type keeps working
        futures.map(fu =>
          try fu.get()
          catch {
            case e: java.util.concurrent.ExecutionException
                if e.getCause != null => throw e.getCause
          })
      } finally pool.shutdown()
    }
  }

  /** Recursive delete of a layout path (missing path is a no-op) —
    * the reset the gated layout queries run so a stale prior run can
    * never leak partitions into a fresh verification. */
  def resetPath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Tmp+rename atomic small-file write — THE marker/header discipline
    * (ledger day markers, takedown staging/completion, rebuild
    * in-progress, quantizer headers): a marker's existence must imply
    * a COMPLETE record, so a crash mid-write may leave only a tmp file
    * no reader consults, never a truncated marker that short-circuits
    * its operation and then fails (or silently corrupts) the read.
    * `tmpTag` disambiguates concurrent writers' tmp files (callers
    * pass the applicationId or equivalent). One shared implementation:
    * a fix here (e.g. rename-over-existing semantics on an object
    * store) must not fork across the stores. */
  def writeFileAtomic(hfs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, content: String,
      tmpTag: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(
      path.getParent, path.getName + s".tmp_$tmpTag")
    val out = hfs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (hfs.exists(path) && !hfs.delete(path, false))
      throw new java.io.IOException(s"delete of stale $path failed")
    if (!hfs.rename(tmp, path))
      throw new java.io.IOException(s"rename $tmp -> $path failed")
  }

  /** Incremental rollup maintenance: merge `days` of a date-partitioned
    * events layout into a date-partitioned daily aggregate table WITHOUT
    * touching any other day — the pattern that keeps a 100 TB history
    * from being rescanned for every daily refresh. The source read is
    * partition-pruned to the new days; the write uses DYNAMIC partition
    * overwrite, so only the new days' directories of the rollup are
    * replaced (no read-modify-write of the aggregate, no tmp-and-swap).
    * Re-merging a day is idempotent by construction: its partition is
    * simply rewritten with the same content. */
  def mergeDailyAgg(spark: SparkSession, layoutPath: String, aggPath: String,
      days: Seq[String]): Unit =
    spark.read.parquet(layoutPath)
      .where(col("event_date").isin(days: _*))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date")
      .parquet(aggPath)

  /** Targeted row deletion from a date-partitioned layout (the
    * right-to-be-forgotten / takedown primitive): remove `ids` while
    * rewriting ONLY the partitions that contain them. At 100 TB a
    * deletion request touches a handful of days; rewriting the whole
    * layout for it is the naive failure mode. Three steps, all bounded
    * by the affected slice: (1) find affected partition values with a
    * semi join (driver list bounded by partition count, never rows);
    * (2) anti-join ONLY those partitions against the victim ids into a
    * staging dir (suffixed with the Spark application id, so two
    * concurrent deletes on one layout cannot collide on staging paths);
    * (3) swap each affected partition directory via a trash-ordered
    * rename pair — live→trash, fresh→live, then drop trash. The real
    * guarantee: readers NEVER see a torn/mixed directory (renames are
    * atomic per directory on HDFS; object stores substitute their own
    * atomic-commit layer), but a crash in the window between the two
    * renames leaves the partition temporarily ABSENT — old data intact
    * in `.trash_delete_*`, new data in staging, recoverable by restoring
    * either; it is never silently lost. Every rename return value is
    * CHECKED and a failure throws: this is a takedown /
    * right-to-be-forgotten primitive, and a silently-lost rename here
    * means silently-lost surviving rows. Post-swap, a failed TRASH
    * delete also throws — the trash directory still contains the victim
    * rows, so "success" with trash left behind would mean the data
    * subject's rows silently persist on disk. Only the STAGING cleanup
    * (surviving-row copies, no victim data) downgrades to a warning.
    * Untouched
    * partitions' files are never opened, listed into a job, or
    * rewritten — the query's gate checks their file listing is
    * byte-identical. Returns the affected partition values. */
  def deleteRows(spark: SparkSession, layoutPath: String, ids: DataFrame,
      idCol: String, partCol: String = "event_date"): Seq[String] = {
    val layout = spark.read.parquet(layoutPath)
    val affected = layout.join(ids, Seq(idCol), "left_semi")
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (affected.nonEmpty) {
      val token = spark.sparkContext.applicationId
      val staging = s"$layoutPath.staging_delete_$token"
      layout.where(col(partCol).cast("string").isin(affected: _*))
        .join(ids, Seq(idCol), "left_anti")
        .write.mode("overwrite").partitionBy(partCol).parquet(staging)
      val root = new org.apache.hadoop.fs.Path(layoutPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def move(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"deleteRows: rename $src -> $dst failed")
      affected.foreach { v =>
        val live = new org.apache.hadoop.fs.Path(root, s"$partCol=$v")
        val fresh = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(staging), s"$partCol=$v")
        val trash = new org.apache.hadoop.fs.Path(root,
          s".trash_delete_${token}_$partCol=$v")
        move(live, trash)
        // a partition whose EVERY row was a victim stages no directory
        // at all (partitionBy emits nothing for zero rows): the correct
        // end-state is the partition REMOVED, not a thrown half-swap
        // that strands the old data in trash while later retries see
        // nothing left to delete
        if (fs.exists(fresh)) move(fresh, live)
        else System.err.println(s"[layout] NOTE deleteRows: every row of " +
          s"$partCol=$v was deleted — partition removed")
        // trash still CONTAINS the victim rows — for a takedown /
        // right-to-be-forgotten primitive a failed trash delete means
        // the data subject's rows persist on disk, so it throws (unlike
        // IvfIndex.compactPostings, whose trash holds only redundant
        // copies and warns). The swap itself is complete at this point:
        // the thrown path leaves live data correct and the leftover
        // trash path named in the error for the operator to remove.
        if (!fs.delete(trash, true))
          throw new java.io.IOException(
            s"deleteRows: swap complete but cleanup of $trash FAILED — deleted rows still on disk at that path; remove it manually")
      }
      if (!fs.delete(new org.apache.hadoop.fs.Path(staging), true))
        System.err.println(s"[layout] WARN deleteRows: cleanup of $staging failed (swap complete; leftover staging only)")
      // the swap bypassed Spark's write path, so the session's file-
      // status cache may still hold the replaced partitions' listings —
      // a later same-session read of an affected path would die on the
      // renamed-away files (normal writes refresh this themselves)
      spark.catalog.refreshByPath(layoutPath)
    }
    affected
  }

  /** Retention expiry: drop every partition directory strictly OLDER
    * than `cutoff` (ISO date string compare — hive partition names sort
    * lexically = chronologically for ISO dates). Pure metadata + file
    * ops: no partition is ever scanned, no surviving file is touched —
    * the O(expired-days) complement of [[deleteRows]]' O(affected-days)
    * row surgery. Every delete's return value is CHECKED and a failure
    * throws (same checked-FS-ops discipline as [[deleteRows]]):
    * retention is a data-destroying primitive, and a silently-failed
    * delete means a partition this call reported expired is still live.
    * Returns the expired partition values. */
  def expirePartitions(spark: SparkSession, layoutPath: String,
      cutoff: String, partCol: String = "event_date"): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(layoutPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expired = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map(_.getPath)
      .filter(_.getName.stripPrefix(partCol + "=") < cutoff)
      .sortBy(_.getName)
    expired.foreach { p =>
      if (!fs.delete(p, true))
        throw new java.io.IOException(s"expirePartitions: delete of $p failed")
    }
    expired.map(_.getName.stripPrefix(partCol + "="))
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
