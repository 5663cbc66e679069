package graft.text

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Trained document-quality classifier: logistic regression over
  * hashing-trick n-gram features, distilled from the repo's heuristic
  * quality score — the fastText-style pattern production corpus pipelines
  * use (a cheap linear model distilled from expensive/heuristic labels,
  * then applied to every document at corpus scale).
  *
  * Architecture, Spark-first:
  *
  *  - LABELS: teacher = [[TextFunctions.qualityScore]] ≥ its corpus
  *    median (`percentile_approx`, one aggregation — the median keeps the
  *    classes balanced whatever the corpus distribution). Distillation is
  *    the honest framing: the classifier learns to reproduce the teacher
  *    from RAW text features, and the held-out AUC gate measures exactly
  *    that.
  *  - FEATURES: hashing trick (MurmurHash3, `dim` buckets) over token
  *    unigrams + bigrams, tf-normalized, plus dense statistics (log token
  *    count, distinct-token ratio, alnum ratio, stopword ratio — each as
  *    a raw value AND a fixed-grid one-hot bucket, see [[DenseStats]]) at
  *    fixed tail indices. No vocabulary object exists — the feature map
  *    is a pure function, so executors need zero shipped state and two
  *    corpora featurize identically (the property that makes the model
  *    portable to the 100 TB apply pass).
  *  - TRAINING: full-batch gradient descent. Each epoch is ONE
  *    `treeAggregate` over the cached feature RDD accumulating the dense
  *    gradient + log-loss into a (dim+DenseStats+2)-double buffer with map-side
  *    combine — the same shape as the t-SNE matrix-buffer kernels and
  *    [[graft.ml.KMeans]]: no shuffle, O(dim) reduce state, O(1) plan per
  *    epoch. Full-batch (not SGD) keeps the result independent of row
  *    order up to floating-point reassociation, which is what lets the
  *    sequential driver twin ([[trainLocal]]) pin distributed correctness
  *    to ≤1e-9 relative loss difference.
  *  - INFERENCE: weights ship in the task closure (dim+DenseStats+1 doubles, ~33 KB)
  *    and scoring is a narrow map — no shuffle, no state, linear scan.
  *    At 100 TB this is the entire apply cost.
  */
object QualityClassifier {

  /** Hashed feature dimension + the dense stat slots + bias live in one
    * weight vector: [0, dim) n-grams, [dim, dim+DenseStats) stats,
    * dim+DenseStats bias. The stats are 4 raw document statistics plus a
    * fixed one-hot binning of each (StatBuckets buckets on the uniform [0,1)
    * grid — binning gives the linear model a piecewise-constant basis, so
    * it can fit NON-MONOTONE quality shapes like "stopword ratio should
    * be moderate, not 0 and not 1" that no linear term in the raw ratio
    * can represent). */
  val StatBuckets = 16
  val DenseStats = 4 + 4 * StatBuckets

  /** `threshold` is the teacher-median computed on the TRAINING split —
    * held-out evaluation labels must reuse it (recomputing a median on
    * the holdout would leak its distribution into the labels). */
  final case class Model(weights: Array[Double], dim: Int,
      lossHistory: Array[Double], threshold: Double)

  private[text] def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private val Stopwords: Set[String] = Set(
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "was", "as", "with", "at", "by", "be", "this", "are", "or")

  /** Sparse tf features + dense stats for one document. Deterministic
    * pure function of the text (MurmurHash3 over the n-gram string). */
  private[text] def featurize(text: String, dim: Int): (Array[Int], Array[Double]) = {
    val toks = tokenize(text)
    val counts = scala.collection.mutable.HashMap.empty[Int, Double]
    var i = 0
    while (i < toks.length) {
      val u = scala.util.hashing.MurmurHash3.stringHash(toks(i), 41)
      counts(math.floorMod(u, dim)) = counts.getOrElse(math.floorMod(u, dim), 0.0) + 1.0
      if (i + 1 < toks.length) {
        val b = scala.util.hashing.MurmurHash3.stringHash(toks(i) + " " + toks(i + 1), 43)
        counts(math.floorMod(b, dim)) = counts.getOrElse(math.floorMod(b, dim), 0.0) + 1.0
      }
      i += 1
    }
    val n = math.max(toks.length, 1).toDouble
    val idx = counts.keys.toArray.sorted
    val vals = idx.map(counts(_) / n)
    val nAlnum = if (text == null) 0 else text.count(_.isLetterOrDigit)
    val raw = Array(
      math.log1p(toks.length.toDouble) / 8.0,
      toks.distinct.length / n,
      if (text == null || text.isEmpty) 0.0 else nAlnum.toDouble / text.length,
      toks.count(Stopwords) / n)
    // one active bucket per stat: indices are (stat s, bucket b) slots
    // after the 4 raw values
    val bucketIdx = raw.indices.map { s =>
      val b = math.min(StatBuckets - 1, math.max(0, (raw(s) * StatBuckets).toInt))
      dim + 4 + s * StatBuckets + b
    }
    (idx ++ Array.tabulate(4)(dim + _) ++ bucketIdx,
      vals ++ raw ++ Array.fill(4)(1.0))
  }

  private def dot(w: Array[Double], idx: Array[Int], vals: Array[Double]): Double = {
    var s = w(w.length - 1) // bias
    var i = 0
    while (i < idx.length) { s += w(idx(i)) * vals(i); i += 1 }
    s
  }

  private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  /** Approx median of the heuristic quality score over `docs` — the
    * teacher threshold (one scalable aggregation, no sort). */
  def teacherThreshold(docs: DataFrame): Double = {
    val row = docs.agg(percentile_approx(
        coalesce(TextFunctions.qualityScore(col("text")), lit(0.0)),
        lit(0.5), lit(1000)))
      .head
    require(!row.isNullAt(0), "quality classifier: empty corpus")
    row.getDouble(0)
  }

  /** (doc_id, label) teacher labels under a FIXED threshold. Null text
    * scores null in the heuristic — coalesced to 0.0 so every document
    * gets a defined label (a null label would NPE the gradient rows). */
  def teacherLabels(docs: DataFrame, threshold: Double): DataFrame =
    docs.select(col("doc_id").cast("long"),
      (coalesce(TextFunctions.qualityScore(col("text")), lit(0.0)) >= threshold)
        .cast("int").as("label"))

  /** Teacher-labeled feature rows: (label, idx, vals). */
  private def labeled(docs: DataFrame, dim: Int,
      thr: Double): RDD[(Double, Array[Int], Array[Double])] =
    docs.select(col("text"),
        (coalesce(TextFunctions.qualityScore(col("text")), lit(0.0)) >= thr)
          .cast("double").as("label"))
      .rdd.map { r =>
        val (idx, vals) = featurize(r.getString(0), dim)
        (r.getDouble(1), idx, vals)
      }

  /** One epoch's (gradient ++ [loss]) over any collection of rows —
    * shared verbatim by the distributed seqOp and the driver twin so the
    * two paths cannot diverge algorithmically, only in summation order. */
  private def accumulate(buf: Array[Double], w: Array[Double],
      row: (Double, Array[Int], Array[Double])): Array[Double] = {
    val (y, idx, vals) = row
    val p = sigmoid(dot(w, idx, vals))
    val g = p - y
    var i = 0
    while (i < idx.length) { buf(idx(i)) += g * vals(i); i += 1 }
    buf(w.length - 1) += g // bias gradient
    val eps = 1e-12
    buf(w.length) += -(y * math.log(p + eps) + (1 - y) * math.log(1 - p + eps))
    buf
  }

  /** AdaGrad step on the summed full-batch gradient. Plain GD stalls here
    * — the Hessian is badly conditioned (dense stats ~O(1) vs hashed tf
    * entries ~O(1/len)) so any single step size either crawls on the
    * n-grams or oscillates on the stats; per-coordinate accumulated
    * scaling fixes both with a state array that is itself a pure function
    * of the epoch-gradient sequence, keeping the update deterministic and
    * row-order independent (the dist≡driver gate property). */
  private def applyUpdate(w: Array[Double], cache: Array[Double],
      grad: Array[Double], n: Long, lr: Double, l2: Double): Unit = {
    var i = 0
    while (i < w.length) {
      val g = grad(i) / n + l2 * w(i)
      cache(i) += g * g
      w(i) -= lr * g / (math.sqrt(cache(i)) + 1e-10)
      i += 1
    }
  }

  def train(docs: DataFrame, dim: Int = 4096, epochs: Int = 100,
      lr: Double = 2.0, l2: Double = 1e-4): Model = {
    val thr = teacherThreshold(docs)
    val data = labeled(docs, dim, thr).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = data.count()
      require(n > 0, "quality classifier: empty corpus")
      val w = new Array[Double](dim + DenseStats + 1)
      val cache = new Array[Double](w.length)
      val loss = new Array[Double](epochs)
      var e = 0
      while (e < epochs) {
        val agg = data.treeAggregate(new Array[Double](w.length + 1))(
          seqOp = (buf, row) => accumulate(buf, w, row),
          combOp = { (a, b) =>
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          })
        loss(e) = agg(w.length) / n
        applyUpdate(w, cache, agg, n, lr, l2)
        e += 1
      }
      Model(w, dim, loss, thr)
    } finally data.unpersist(blocking = false)
  }

  /** Sequential driver twin: identical labels, features, update rule;
    * summation in doc_id order. The gate bounds |Δloss| ≤ 1e-9 relative. */
  def trainLocal(docs: DataFrame, dim: Int = 4096, epochs: Int = 100,
      lr: Double = 2.0, l2: Double = 1e-4): Model = {
    val thr = teacherThreshold(docs)
    val rows = docs.orderBy(col("doc_id"))
      .select(col("text"),
        (coalesce(TextFunctions.qualityScore(col("text")), lit(0.0)) >= thr)
          .cast("double").as("label"))
      .collect().map { r =>
        val (idx, vals) = featurize(r.getString(0), dim)
        (r.getDouble(1), idx, vals)
      }
    require(rows.nonEmpty, "quality classifier: empty corpus")
    val n = rows.length.toLong
    val w = new Array[Double](dim + DenseStats + 1)
    val cache = new Array[Double](w.length)
    val loss = new Array[Double](epochs)
    var e = 0
    while (e < epochs) {
      val agg = new Array[Double](w.length + 1)
      rows.foreach(row => accumulate(agg, w, row))
      loss(e) = agg(w.length) / n
      applyUpdate(w, cache, agg, n, lr, l2)
      e += 1
    }
    Model(w, dim, loss, thr)
  }

  /** Score every document: (doc_id, prob, pred). Narrow map, weights in
    * the closure — the corpus-scale apply pass. */
  def score(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = model.weights
    val dim = model.dim
    docs.select(col("doc_id").cast("long"), col("text"))
      .map { r =>
        val (idx, vals) = featurize(r.getString(1), dim)
        val p = sigmoid(dot(w, idx, vals))
        (r.getLong(0), p, if (p >= 0.5) 1 else 0)
      }
      .toDF("doc_id", "prob", "pred")
  }

  /** Exact AUC from (score, label) pairs via the rank formula —
    * Wilcoxon–Mann–Whitney with the standard tie correction (average
    * ranks). Driver-side over a BOUNDED holdout sample: gate-only code. */
  private[text] def auc(pairs: Array[(Double, Double)]): Double = {
    val n = pairs.length
    val pos = pairs.count(_._2 > 0.5).toDouble
    val neg = n - pos
    if (pos == 0 || neg == 0) return 0.5
    val sorted = pairs.sortBy(_._1)
    // average ranks over tie groups
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && sorted(j + 1)._1 == sorted(i)._1) j += 1
      val avg = (i + j + 2) / 2.0 // ranks are 1-based
      var k = i
      while (k <= j) { ranks(k) = avg; k += 1 }
      i = j + 1
    }
    val sumPos = sorted.indices.collect { case i if sorted(i)._2 > 0.5 => ranks(i) }.sum
    (sumPos - pos * (pos + 1) / 2.0) / (pos * neg)
  }

  private[text] def aucOf(scored: DataFrame, labels: DataFrame): Double = {
    val pairs = scored.join(labels, "doc_id")
      .select(col("prob"), col("label").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    auc(pairs)
  }
}
