package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" §3.2)
  * over the corpus — the step that turns the engine's token-count
  * heuristics into a learned subword vocabulary.
  *
  * The key scale property of BPE training is that it never iterates over
  * the corpus: it iterates over the WORD-FREQUENCY VOCABULARY, which is
  * bounded by the language (a few million types at any corpus size), not
  * by the data. The corpus is touched exactly once — one tokenize +
  * explode + count aggregation with map-side partials — and every merge
  * iteration runs on the vocab frame. This is the same
  * aggregate-then-iterate shape as the t-SNE drivers (one heavy
  * extraction, bounded iteration state).
  *
  * Hybrid like [[graft.ops.Dedup.canonicalize]]: a vocab at or under
  * `maxDriverVocab` types collects to the driver and runs the classic
  * in-memory loop (exact, microseconds per merge); a larger vocab runs
  * each merge iteration distributed — pair counting is a flatMap +
  * reduceByKey over the symbolized vocab RDD (map-side combine, so the
  * shuffle per round is |distinct pairs|, not |vocab|), the arg-max pair
  * is a `takeOrdered(1)` under a total order, and the merge application
  * is a narrow map. Both branches share the same merge-application
  * primitive and the same deterministic tie-break — highest count, then
  * lexicographically smallest (left, right) — and are pinned equal by
  * the per-round gate.
  *
  * Reference surface note: the reference engine has no tokenizer
  * training; this extends the text stack the same way the dedup/ANN
  * operators extend its data model (SURVEY §2 extensions).
  */
object BpeTrainer {

  /** Word-frequency vocabulary: one row per word type with its corpus
    * count — the bounded frame every merge iteration runs on. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right single-merge application (the standard BPE
    * rule: overlapping occurrences resolve leftmost-first). */
  private[text] def applyMerge(syms: Array[String], l: String, r: String)
      : Array[String] = {
    if (syms.length < 2) return syms
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  private def bestOrdering: Ordering[((String, String), Long)] =
    Ordering.by { case ((a, b), c) => (-c, a, b) }

  /** Classic in-memory BPE loop — the driver branch AND the independent
    * reference the distributed branch is gated against. */
  private[text] def trainLocal(vocab: Seq[(String, Long)], numMerges: Int,
      minPairCount: Long): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((l, r), c) = counts.toSeq.min(bestOrdering)
        if (c < minPairCount) go = false
        else {
          merges += ((l, r))
          words = words.map { case (syms, wc) => (applyMerge(syms, l, r), wc) }
        }
      }
    }
    merges.toSeq
  }

  /** Distributed merge loop for vocabularies past the driver bound. The
    * iteration state is a plain cached RDD of (symbols, count) — 50
    * narrow `map` steps build a cheap RDD lineage, not a Catalyst plan
    * (the §7.4.3 hazard the canonicalize rounds hit does not apply);
    * each round's state is materialized before the previous round's
    * cache is dropped. */
  private def trainDistributed(wc: DataFrame, numMerges: Int,
      minPairCount: Long): Seq[(String, String)] = {
    val spark = wc.sparkSession
    import spark.implicits._
    var state = wc.select(col("word"), col("cnt")).as[(String, Long)]
      .rdd.map { case (w, c) => (w.map(_.toString).toArray, c) }.cache()
    state.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.length < numMerges) {
      val best = state.flatMap { case (syms, c) =>
        (0 until syms.length - 1).iterator.map(i => ((syms(i), syms(i + 1)), c))
      }.reduceByKey(_ + _).takeOrdered(1)(bestOrdering)
      if (best.isEmpty || best.head._2 < minPairCount) go = false
      else {
        val (l, r) = best.head._1
        merges += ((l, r))
        val next = state.map { case (syms, c) => (applyMerge(syms, l, r), c) }.cache()
        next.count()
        state.unpersist(blocking = false)
        state = next
      }
    }
    state.unpersist(blocking = false)
    merges.toSeq
  }

  /** Learn up to `numMerges` merges; stops early when no pair reaches
    * `minPairCount`. Returns the ranked merge list (the tokenizer). */
  def train(docs: DataFrame, numMerges: Int = 50, minPairCount: Long = 2,
      maxDriverVocab: Long = 1000000L, textCol: String = "text")
      : Seq[(String, String)] = {
    require(numMerges >= 1 && numMerges <= 100000,
      s"numMerges in [1, 100000], got $numMerges")
    require(minPairCount >= 1, s"minPairCount >= 1, got $minPairCount")
    val wc = wordCounts(docs, textCol).cache()
    try {
      if (wc.count() <= maxDriverVocab)
        trainLocal(wc.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq,
          numMerges, minPairCount)
      else trainDistributed(wc, numMerges, minPairCount)
    } finally wc.unpersist()
  }

  /** Encode a word with a learned merge list: merges applied in RANK
    * order (the BPE encode rule — training order IS application order). */
  private[text] def encodeWord(word: String,
      merges: Seq[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
    syms
  }

  /** Per-document token counts under the LEARNED tokenizer: characters
    * before merging, subword tokens after. The merge list broadcasts
    * inside the UDF closure (it is numMerges pairs — bounded by the
    * training budget, never by data); per-word encoding is cached per
    * partition via a local memo, so the per-row cost is bounded by the
    * doc's DISTINCT words after the first occurrence. */
  def segmentCounts(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val enc = udf { (words: Seq[String]) =>
      if (words == null) (0, 0)
      else {
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        var chars = 0
        var toks = 0
        words.foreach { w =>
          chars += w.length
          toks += memo.getOrElseUpdate(w, encodeWord(w, merges).length)
        }
        (chars, toks)
      }
    }
    docs.select(col(idCol), enc(TextFunctions.tokens(col(textCol))).as("c"))
      .select(col(idCol), col("c._1").as("n_symbols"), col("c._2").as("n_bpe_learned"))
  }
}
