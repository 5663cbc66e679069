package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the corpus-assembly operators: seeded random
  * inputs (deterministic reruns, no scalatestplus bridge needed offline)
  * checked against simple reference implementations and structural
  * invariants. Fixture tests pin known outputs; these catch boundary
  * bugs the fixtures never hit (weights straddling budget multiples,
  * empty strata, rates at the bucket edges). */
class CorpusPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(20260813L)

  test("packShards matches a sequential reference on random weights and budgets") {
    import spark.implicits._
    (1 to 10).foreach { _ =>
      val nKeys = 1 + rng.nextInt(3)
      val rows = (0 until (1 + rng.nextInt(60))).map { i =>
        (i.toLong, s"k${rng.nextInt(nKeys)}", rng.nextInt(300).toLong)
      }
      val budget = 50L + rng.nextInt(450)
      val df = rows.toDF("doc_id", "source", "w")
      val got = Corpus.packShards(df, col("source"), col("doc_id"), col("w"), budget)
        .select("doc_id", "source", "shard")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      // reference: walk each key's rows in order, shard = floor of the
      // cumulative weight BEFORE the row divided by the budget
      val want = rows.groupBy(_._2).flatMap { case (src, rs) =>
        var cum = 0L
        rs.sortBy(_._1).map { case (id, _, w) =>
          val shard = cum / budget
          cum += w
          (id, src) -> shard
        }
      }.toMap
      assert(got == want, s"budget=$budget rows=${rows.take(8)}…")
    }
  }

  test("mixtureSample: rate endpoints and monotonicity in the rate") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, "s")).toDF("doc_id", "source")
    def kept(rate: Double): Set[Long] =
      Corpus.mixtureSample(df, col("doc_id"), lit(rate))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept(0.0).isEmpty, "rate 0 keeps nothing")
    assert(kept(1.0).size == 200, "rate 1 keeps everything")
    // monotone: raising the rate never evicts a previously kept doc —
    // the property that makes re-mixing at a higher rate incremental
    val rates = Seq.fill(5)(rng.nextDouble()).sorted
    rates.sliding(2).foreach { case Seq(lo, hi) =>
      assert(kept(lo).subsetOf(kept(hi)), s"rate $lo ⊄ $hi")
    }
  }

  test("hashSplit: partitions exactly, and membership is stable under corpus growth") {
    import spark.implicits._
    val big = (0L until 300L).map(i => (i, "x")).toDF("doc_id", "source")
    val small = (0L until 100L).map(i => (i, "x")).toDF("doc_id", "source")
    def splits(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Corpus.hashSplit(df, col("doc_id")).select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sBig = splits(big)
    val sSmall = splits(small)
    assert(sBig.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(sBig.size == 300)
    // the documented anti-property of modulo-on-count schemes: growing
    // the corpus must never move an existing doc across splits
    assert(sSmall.forall { case (id, sp) => sBig(id) == sp })
  }

  test("stratifiedSample: never more than k per stratum, deterministic across runs") {
    import spark.implicits._
    val rows = (0 until 150).map { i =>
      (i.toLong, s"src${rng.nextInt(4)}", s"l${rng.nextInt(3)}")
    }
    val df = rows.toDF("doc_id", "source", "lang")
    def sample() = Corpus.stratifiedSample(df, Seq("source", "lang"), k = 3,
        key = col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = sample()
    assert(s1 == sample(), "hash-ordered sampling is run-stable")
    val perStratum = Corpus.stratifiedSample(df, Seq("source", "lang"), k = 3,
        key = col("doc_id"))
      .groupBy("source", "lang").count().collect().map(_.getLong(2))
    assert(perStratum.forall(_ <= 3))
  }

  test("temperatureRates: alpha=1 collapses to the uniform budget/N rate") {
    import spark.implicits._
    val rows = (0 until 120).map(i => (i.toLong, s"s${rng.nextInt(5)}"))
    val df = rows.toDF("doc_id", "src")
    val budget = 60L
    val rates = Corpus.temperatureRates(df, col("src"), alpha = 1.0, budget)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = math.min(1.0,
      budget.toDouble / rows.size)
    rates.values.foreach(r =>
      assert(math.abs(r - BigDecimal(expect).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"alpha=1 must be proportional: $r vs $expect"))
  }
}
