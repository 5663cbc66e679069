package graft.tsne

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TSNESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def embeddings(limit: Int) =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id") < limit)

  test("SimpleTSNE: KL loss decreases and output is finite") {
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    val params = TSNEParams(maxIterations = 25, perplexity = 10, seed = 42)
    val out = SimpleTSNE.tsne(embeddings(100), "vec_id", "embedding", params,
      callback = (_, _, l) => l.foreach(losses += _))
    val rows = out.collect()
    assert(rows.length == 100)
    assert(rows.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN))
    assert(losses.length == 25)
    // early-exaggerated KL decreases over the run
    assert(losses.takeRight(3).min < losses.take(3).max,
      s"loss did not decrease: ${losses.take(3)} ... ${losses.takeRight(3)}")
  }

  test("SimpleTSNE is deterministic under a fixed seed") {
    val params = TSNEParams(maxIterations = 8, perplexity = 10, seed = 123)
    def run() = SimpleTSNE.tsne(embeddings(60), "vec_id", "embedding", params)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val a = run()
    val b = run()
    assert(a.sameElements(b), "two runs with the same seed must be bit-identical")
  }

  test("BHTSNE with approximate kNN affinities optimizes like exact") {
    // the 100 TB affinity path: LSH candidate generation (auto bucket
    // width) instead of the O(n²) crossJoin; the embedding must still
    // be sane and the KL must still fall
    val losses = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    val params = TSNEParams(maxIterations = 60, perplexity = 20, seed = 42,
      earlyExaggeration = 30, reportLoss = 10,
      approxKnn = true)
    val out = BHTSNE.tsne(embeddings(500), "vec_id", "embedding", params,
      callback = (it, _, l) => l.foreach(v => losses += ((it, v))))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN))
    val ls = losses.toMap
    assert(ls(60) < ls(40), s"approx-affinity BH loss did not decrease: $losses")
  }

  test("BHTSNE: loss decreases on the 500-row embeddings fixture") {
    val losses = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    val params = TSNEParams(maxIterations = 60, perplexity = 20, seed = 42,
      earlyExaggeration = 30, reportLoss = 10)
    val out = BHTSNE.tsne(embeddings(500), "vec_id", "embedding", params,
      callback = (it, _, l) => l.foreach(v => losses += ((it, v))))
    assert(out.count() == 500)
    val ls = losses.toMap
    // compare after exaggeration ends (loss scale changes at iter 30)
    assert(ls(60) < ls(40), s"BH loss did not decrease: $losses")
    assert(losses.forall(!_._2.isNaN))
  }
}
