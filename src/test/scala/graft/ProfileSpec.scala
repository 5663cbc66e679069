package graft

import graft.text.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ad-hoc stage profiler (not a correctness gate). Run explicitly:
  * testOnly graft.ProfileSpec */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.1"

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  test("minhash stage timing") {
    assume(sys.env.contains("GRAFT_PROFILE"), "profiling is opt-in: GRAFT_PROFILE=1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("scan count")(docs.count())
    time("tokenize")(docs.select(tokens(col("text")).as("t")).agg(sum(size(col("t")))).collect())
    time("shingles")(docs.select(shingles(col("text"), 3).as("s")).agg(sum(size(col("s")))).collect())
    time("shingle md5")(docs.select(
      transform(shingles(col("text"), 3), s => pmod(md5Hash64(s), lit(HashMod))).as("hs"))
      .agg(sum(size(col("hs")))).collect())
    val full = time("full minhashLshPairs")(
      ops.Dedup.minhashLshPairs(docs, threshold = 0.8).count())
    println(s"[profile] pairs=$full")
    val cands = time("jaccard full")(
      ops.Dedup.jaccardPairs(docs, threshold = 0.8).count())
    println(s"[profile] jaccard pairs=$cands")
  }
}
