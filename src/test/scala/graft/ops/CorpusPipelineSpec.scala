package graft.ops

import graft.TestSpark
import graft.examples.CorpusPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Smoke test for the end-to-end corpus-assembly example: runs the full
  * gopherRules → bloom-decontaminate → (jaccardPairs ∪ semanticDupPairs)
  * → retain → dupSpans-filter → split → mixture → stratified →
  * packShards composition on the sf0.001 fixtures and asserts the
  * cross-stage invariants that individual operator specs can't see. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeline composes end-to-end with consistent stage counts") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val r = CorpusPipeline.run(spark, dir)
    val c = r.counts
    assert(c.docs > 0)
    // hygiene stages only shrink the corpus, and each must keep SOME of
    // it (a filter that empties the fixture is a bug, not hygiene)
    assert(c.qualityPass <= c.docs && c.qualityPass > 0)
    assert(c.contaminated >= 0)
    assert(c.clean <= c.qualityPass && c.clean > 0)
    // dedup never grows the corpus, and a PAIR relation implies at least
    // one removal when nonempty
    assert(c.retained <= c.clean)
    assert(c.dupPairs == 0 || c.retained < c.clean)
    // the detector union can only add pairs beyond the lexical ones
    assert(c.semPairs >= 0 && c.dupPairs >= c.semPairs)
    // the boilerplate filter drops from the retained set, never below it
    assert(c.boilerplateDropped >= 0 && c.boilerplateDropped <= c.retained)
    // split partitions the filtered corpus exactly
    assert(c.train + c.valN + c.test == c.retained - c.boilerplateDropped)
    // mixing only filters the train split
    assert(c.mixed <= c.train && c.mixed > 0)
    // the mix is TEMPERATURE-DERIVED (α=0.5, budget = train/2): rates
    // exist for every train source, live in (0, 1], and the mixed count
    // matches applying them through an INDEPENDENT reimplementation of
    // the unitBucket decision (jvm md5, not the Spark expression) to the
    // train rows — the derived rates and the kept rows must agree exactly
    assert(r.rates.nonEmpty && r.rates.values.forall(v => v > 0.0 && v <= 1.0),
      s"derived rates out of range: ${r.rates}")
    def bucket(key: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:mix".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16)
    }
    val expectedMixed = r.train.select("doc_id", "source").collect().count { row =>
      val cut = math.round(r.rates(row.getString(1)) * 65536).toInt
      bucket(row.getLong(0).toString) < cut
    }
    assert(c.mixed == expectedMixed.toLong,
      s"mixed count ${c.mixed} must equal the hash-oracle expectation $expectedMixed")
    // α=0.5 upweights low-resource sources: among train sources, smaller
    // n_s may never get a LOWER rate than a larger n_s
    val bySource = r.train.groupBy("source").count()
      .collect().map(row => row.getString(0) -> row.getLong(1))
    for ((sa, na) <- bySource; (sb, nb) <- bySource if na < nb)
      assert(r.rates(sa) >= r.rates(sb),
        s"temperature inversion: $sa(n=$na) rate ${r.rates(sa)} < $sb(n=$nb) rate ${r.rates(sb)}")
    // LEAKAGE GUARD: no residual near-dup cluster (J >= 0.3 band among
    // the split corpus — the band the pipeline splits on) may straddle
    // splits; memorization-adjacent pairs stay co-located
    import org.apache.spark.sql.functions.{col, countDistinct}
    val residualClusters = Dedup.canonicalize(
      Dedup.jaccardPairs(r.split, threshold = 0.3))
    val straddling = r.split.join(residualClusters,
        r.split("doc_id") === residualClusters("id"))
      .groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(straddling == 0, s"$straddling near-dup clusters straddle splits")
    // stratified sample is capped at k per (source, lang)
    val strata = r.packed.sparkSession.read
      .parquet(s"$dir/documents.parquet")
      .select("source", "lang").distinct().count()
    assert(c.evalSample <= 3 * strata)
    // every mixed doc lands in exactly one shard row
    assert(r.packed.count() == c.mixed)
    assert(c.shards > 0 && c.shards <= c.mixed)
    // shard ids are contiguous from 0 within each source (prefix-sum div)
    import org.apache.spark.sql.functions._
    val bad = r.packed.groupBy("source")
      .agg(min("shard").as("mn"), max("shard").as("mx"),
        countDistinct("shard").as("n"))
      .where(col("mn") =!= 0 || col("n") =!= col("mx") + 1)
      .count()
    assert(bad == 0, "shard ids must be contiguous 0..max per source")
  }
}
