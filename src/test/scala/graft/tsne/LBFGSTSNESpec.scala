package graft.tsne

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reimplemented (working) LBFGS driver — upstream's is broken, so
  * there is no behavior to port; these assert the optimizer contract. */
class LBFGSTSNESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb(n: Int) =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < n)

  test("plain-phase LBFGS monotonically decreases the KL") {
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    LBFGSTSNE.tsne(emb(120), "vec_id", "embedding",
      TSNEParams(maxIterations = 30, earlyExaggeration = 0, perplexity = 15, seed = 42),
      callback = (_, _, l) => l.foreach(losses += _))
    assert(losses.size > 3, s"expected several accepted LBFGS states, got ${losses.size}")
    assert(losses.forall(l => !l.isNaN && !l.isInfinite))
    // accepted LBFGS states never increase the objective
    losses.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"$a -> $b")
      case _         => ()
    }
    assert(losses.last < losses.head * 0.9,
      s"KL must drop materially: ${losses.head} -> ${losses.last}")
  }

  test("two-phase (consistent exaggeration) run yields a sane embedding") {
    val out = LBFGSTSNE.tsne(emb(120), "vec_id", "embedding",
      TSNEParams(maxIterations = 20, earlyExaggeration = 6, perplexity = 15, seed = 42))
      .cache()
    assert(out.count() == 120)
    val r = out.agg(
      avg(when(!isnan(col("x")) && !isnan(col("y")) &&
        abs(col("x")) < Double.MaxValue && abs(col("y")) < Double.MaxValue, 1.0)
        .otherwise(0.0)).as("ff"),
      stddev_pop(col("x")).as("sd")).head
    assert(r.getDouble(0) == 1.0, "all coordinates finite")
    assert(r.getDouble(1) > 0.0, "non-degenerate layout")
    out.unpersist()
  }
}
