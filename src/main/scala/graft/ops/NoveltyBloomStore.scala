package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persistent incremental novelty bloom — the TEXT-side frozen-history
  * store, completing the family symmetry with the media
  * [[graft.multimodal.SignatureStore]]: [[Dedup.novelAgainst]] rebuilds
  * its history bloom from the corpus on EVERY call, which re-scans
  * yesterday's 100 TB per daily batch; here the bloom is built once,
  * persisted, and each ingest day merges ONLY its batch's keys in —
  * history text is never read again.
  *
  * Mergeability contract: the bloom's geometry (bit count, hash count)
  * is fixed by (capacity, fpp) at [[build]] time and recorded in the
  * store header; [[append]] builds the batch's bloom with the SAME
  * geometry, so `merge(bloom(A), bloom(B)) == bloom(A ∪ B)` BIT-EXACTLY
  * (positions are deterministic per key; merge is bit-or) — the gated
  * query pins the byte equality. Capacity is therefore a build-time
  * commitment sized for the anticipated corpus; exceeding it degrades
  * the false-positive rate (novel docs wrongly dropped — bounded by the
  * novel-recall gate at the committed size), never the zero-false-
  * negative guarantee (a true duplicate is ALWAYS caught).
  *
  * Store layout: one `bloom.bin` (header: prefixChars, fpp, capacity;
  * body: Spark BloomFilter serialization), replaced via tmp + checked
  * delete/rename. The bloom is always rebuildable from the corpus, so
  * the tiny crash window between delete and rename risks an
  * operator-visible missing file, never silent data loss. */
object NoveltyBloomStore {

  /** Store key. `prefixChars >= 1` is the document-content form
    * (md5 of the lowercased first-N-chars prefix — robust to trailing
    * boilerplate drift). `prefixChars == 0` is the RAW-KEY form: md5 of
    * the column value verbatim — no lowercase, no prefix cut — for
    * columns that are ALREADY canonical keys, e.g. a canonicalized URL
    * ([[graft.text.TextFunctions.canonicalizeUrl]]): the crawl
    * frontier's seen-URL set. The mode is recorded in the store header
    * (prefixChars), so probes can never mix key forms. */
  private[graft] def docKey(textCol: String, prefixChars: Int) =
    if (prefixChars == 0) md5(col(textCol))
    else md5(substring(lower(col(textCol)), 1, prefixChars))

  /** The key mode recorded in the store header — callers that derive
    * their OWN keys from the same column (e.g. a within-batch
    * keep-first that must agree with the store probe) validate their
    * configured mode against this instead of trusting call-site
    * discipline. */
  def recordedPrefixChars(spark: SparkSession, dir: String): Int =
    readParams(spark, dir)._1

  /** The full recorded store parameters (prefixChars, fpp, capacity) —
    * what a REBUILD must reuse to stay geometry-compatible with the
    * store it replaces (a bloom cannot delete: takedown rebuilds from
    * the corpus minus the victims, under the same commitments).
    * Header-only read, no bloom deserialization. */
  def readParams(spark: SparkSession, dir: String): (Int, Double, Long) = {
    val live = new org.apache.hadoop.fs.Path(dir, "bloom.bin")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new java.io.DataInputStream(fs.open(live))
    try (in.readInt(), in.readDouble(), in.readLong()) finally in.close()
  }

  private def keyBloom(df: DataFrame, textCol: String, prefixChars: Int,
      fpp: Double, capacity: Long): BloomFilter =
    graft.functions.Sketches.stringBloom(
      df.where(col(textCol).isNotNull)
        .select(docKey(textCol, prefixChars).as("h")),
      "h", fpp, Some(capacity)).value

  def build(history: DataFrame, dir: String, textCol: String = "text",
      prefixChars: Int = 80, fpp: Double = 1e-4,
      capacity: Long = 10000000L): Unit = {
    require(prefixChars >= 0 && fpp > 0 && fpp < 1 && capacity >= 1,
      s"bad params ($prefixChars, $fpp, $capacity)")
    writeStore(history.sparkSession, dir,
      keyBloom(history, textCol, prefixChars, fpp, capacity),
      prefixChars, fpp, capacity)
  }

  /** Merge an ingest batch's keys into the persisted bloom — O(batch):
    * only the batch's text is read; the history side is the bloom
    * bytes.
    *
    * SINGLE-WRITER contract (hard requirement): append is a
    * read-modify-write of `bloom.bin`, so two CONCURRENT appenders
    * would each merge into their own copy and the last writer would
    * silently drop the other batch's keys — breaking the
    * zero-false-negative guarantee (lost keys let true duplicates
    * re-enter undetected). A lock file makes the second appender fail
    * LOUDLY instead: `append.lock` is created exclusively for the
    * duration of the call and removed on exit (including failure). A
    * crashed appender leaves a stale lock — by design, since its merge
    * may not have landed; the recovery is to remove the lock and re-run
    * that batch's append (re-merging already-merged keys is idempotent:
    * merge is bit-or).
    *
    * The lock is ADVISORY, only as strong as the filesystem's
    * exclusive-create: atomic on HDFS, best-effort check-then-create on
    * the local filesystem, and NOT atomic on object stores (S3A has no
    * exclusive create) — on shared object storage, serialize appenders
    * externally (one scheduler slot / one driver) rather than trusting
    * this file. */
  def append(batch: DataFrame, dir: String, textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(root, "append.lock")
    // only "already exists" means a concurrent/crashed appender; any
    // other IOException (permissions, transient FS failure) is a real
    // error and must not masquerade as the held-lock diagnosis
    try fs.create(lock, false).close() catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        throw new java.io.IOException(
          s"NoveltyBloomStore.append: $lock exists — another appender is active " +
            "(single-writer store). If it crashed, remove the lock and re-run its " +
            "batch: re-merging is idempotent (bit-or).")
    }
    try {
      val (bloom, prefixChars, fpp, capacity) = readStore(spark, dir)
      bloom.mergeInPlace(keyBloom(batch, textCol, prefixChars, fpp, capacity))
      writeStore(spark, dir, bloom, prefixChars, fpp, capacity)
    } finally fs.delete(lock, false)
  }

  /** Keep the batch rows whose key the frozen history has NEVER seen —
    * identical decision function to [[Dedup.novelAgainst]] run with
    * this store's capacity (gated bit-exact), at O(batch) cost. */
  def novelAgainst(batch: DataFrame, dir: String,
      textCol: String = "text"): DataFrame = {
    val spark = batch.sparkSession
    val (bloom, prefixChars, _, _) = readStore(spark, dir)
    val b = spark.sparkContext.broadcast(bloom)
    val mightContain = graft.functions.Sketches.mightContainString(b)
    batch.where(col(textCol).isNotNull)
      .withColumn("h", docKey(textCol, prefixChars))
      .where(!mightContain(col("h")))
  }

  private def writeStore(spark: SparkSession, dir: String, bloom: BloomFilter,
      prefixChars: Int, fpp: Double, capacity: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"bloom.bin.tmp_${spark.sparkContext.applicationId}")
    val out = new java.io.DataOutputStream(fs.create(tmp, true))
    try {
      out.writeInt(prefixChars); out.writeDouble(fpp); out.writeLong(capacity)
      bloom.writeTo(out)
      out.flush()
    } finally out.close()
    val live = new org.apache.hadoop.fs.Path(root, "bloom.bin")
    if (fs.exists(live) && !fs.delete(live, false))
      throw new java.io.IOException(s"NoveltyBloomStore: delete of $live failed")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"NoveltyBloomStore: rename $tmp -> $live failed")
  }

  private def readStore(spark: SparkSession, dir: String)
      : (BloomFilter, Int, Double, Long) = {
    val live = new org.apache.hadoop.fs.Path(dir, "bloom.bin")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new java.io.DataInputStream(fs.open(live))
    try {
      val prefixChars = in.readInt()
      val fpp = in.readDouble()
      val capacity = in.readLong()
      (BloomFilter.readFrom(in), prefixChars, fpp, capacity)
    } finally in.close()
  }
}
