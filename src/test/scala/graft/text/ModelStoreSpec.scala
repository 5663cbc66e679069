package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for the learned-model lifecycle store: generation
  * stamping, artifact roundtrip, the pending-retrain marker fence with
  * roll-forward recovery, per-day scoring idempotency + ledger, and the
  * drift monitor's silent/tripped verdicts on a planted shift. The
  * driver-surface composition (4-day drill with staged verdicts) is
  * `text_model_lifecycle`. */
class ModelStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val words = Array("the", "cat", "sat", "on", "a", "mat", "with",
    "tea", "and", "it", "was", "warm", "rain", "fell", "by", "night",
    "trees", "grew", "tall", "river", "ran", "to", "sea", "birds", "sang")

  /** Deterministic English-ish docs with length/stopword variance so the
    * teacher quality score has a real distribution to distill. */
  private def mkDocs(ids: Range, shift: Boolean = false) = {
    import spark.implicits._
    val rot = (s: String) => s.map {
      case c if c >= 'a' && c <= 'z' => (((c - 'a') + 13) % 26 + 'a').toChar
      case c => c
    }
    ids.map { i =>
      val rnd = new scala.util.Random(i * 7919L)
      val n = 8 + rnd.nextInt(40)
      val text = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
      (i.toLong, if (shift) rot(text) else text)
    }.toDF("doc_id", "text")
  }

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("modelstore").toString

  private val (dim, epochs, merges) = (256, 30, 12)

  test("retrain from empty: generation 1, header refs, artifact roundtrip") {
    val dir = freshDir()
    val docs = mkDocs(0 until 60)
    assert(ModelStore.generation(spark, dir) == 0)
    assert(ModelStore.retrain(spark, dir, docs, dim, epochs, merges) == 1)
    val h = ModelStore.header(spark, dir)
    assert(h.generation == 1 && h.dim == dim && h.trainedN == 60)
    assert(h.refPosFrac > 0.2 && h.refPosFrac < 0.8,
      s"median-threshold teacher should be roughly balanced, got ${h.refPosFrac}")
    assert(h.refTokensPerWord >= 1.0)
    // roundtrip: stored model scores identically to a freshly trained one
    val loaded = ModelStore.loadClassifier(spark, dir)
    val direct = QualityClassifier.train(docs, dim = dim, epochs = epochs)
    assert(loaded.threshold == direct.threshold)
    // treeAggregate's combine order varies run-to-run, so two trains on
    // identical data agree only up to floating-point reassociation (the
    // same epsilon the dist-vs-driver gate bounds) — the roundtrip bar
    // is a tight tolerance, not bit equality
    val wDiff = loaded.weights.zip(direct.weights)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(wDiff <= 1e-8, s"stored-vs-retrained max weight diff $wDiff")
    val lm = ModelStore.loadMerges(spark, dir)
    assert(lm == BpeTrainer.train(docs, numMerges = merges))
  }

  test("marker fence: stageRetrain blocks scoring/drift; retrain rolls forward") {
    val dir = freshDir()
    val docs = mkDocs(0 until 50)
    ModelStore.retrain(spark, dir, docs, dim, epochs, merges)
    ModelStore.stageRetrain(spark, dir, mkDocs(50 until 100), dim, epochs, merges)
    intercept[java.io.IOException](ModelStore.scoreDay(spark, dir, 0, docs))
    intercept[java.io.IOException](ModelStore.drift(spark, dir, docs))
    intercept[java.io.IOException](ModelStore.loadClassifier(spark, dir))
    // a second stage attempt must refuse (single pending migration)
    intercept[java.io.IOException](
      ModelStore.stageRetrain(spark, dir, docs, dim, epochs, merges))
    // roll-forward: retrain completes the PENDING swap (ignores its docs arg)
    assert(ModelStore.retrain(spark, dir, mkDocs(0 until 10), dim, epochs, merges) == 2)
    // recovered store equals a clean retrain on the staged window
    val recovered = ModelStore.loadClassifier(spark, dir)
    val clean = QualityClassifier.train(mkDocs(50 until 100), dim = dim, epochs = epochs)
    val rDiff = recovered.weights.zip(clean.weights)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(rDiff <= 1e-8, s"recovered-vs-clean max weight diff $rDiff")
  }

  test("scoreDay: generation-stamped, ledgered, idempotent across a retrain") {
    val dir = freshDir()
    val day0 = mkDocs(0 until 40)
    val day1 = mkDocs(40 until 80)
    ModelStore.retrain(spark, dir, day0, dim, epochs, merges)
    val s0 = ModelStore.scoreDay(spark, dir, 0, day0)
    assert(s0.count() == 40)
    assert(s0.agg(min(col("generation")), max(col("generation"))).head ==
      org.apache.spark.sql.Row(1, 1))
    ModelStore.retrain(spark, dir, day1, dim, epochs, merges)
    // day 0 re-scored under the NEWER live generation returns stored history
    val re = ModelStore.scoreDay(spark, dir, 0, day0)
    assert(re.agg(max(col("generation"))).head.getInt(0) == 1)
    ModelStore.scoreDay(spark, dir, 1, day1)
    val led = ModelStore.ledger(spark, dir).orderBy("day").collect()
    assert(led.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((0, 1), (1, 2)))
    assert(led.forall(_.getLong(2) == 40))
  }

  test("drift: silent on the training distribution, trips on a planted shift") {
    val dir = freshDir()
    // train wide enough that the distilled fit GENERALIZES: the
    // agreement signal compares a held-out day to the training-time
    // reference, so an overfit tiny fixture would trip it on
    // in-distribution data (the signal working — wrong fixture)
    ModelStore.retrain(spark, dir, mkDocs(0 until 400), dim, epochs, merges)
    val same = ModelStore.drift(spark, dir, mkDocs(1000 until 1080))
    assert(!same.bpeDrift,
      s"in-distribution tokens/word ${same.tokensPerWord} vs ref ${same.refTokensPerWord}")
    val shifted = ModelStore.drift(spark, dir, mkDocs(1000 until 1080, shift = true))
    assert(shifted.bpeDrift && shifted.classifierDrift,
      s"rot13 day should trip both: $shifted")
    val adv = ModelStore.retrainAdvice(spark, dir, mkDocs(1000 until 1080, shift = true))
    assert(adv.act && adv.reason == "classifier_drift+bpe_drift")
    val silent = ModelStore.retrainAdvice(spark, dir, mkDocs(1000 until 1080))
    assert(!silent.act && silent.reason == "none")
  }
}
