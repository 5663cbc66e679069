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
  * the BATCHED distributed loop — pair counting is a flatMap +
  * reduceByKey over the symbolized vocab RDD (map-side combine, so the
  * shuffle per round is |distinct pairs|, not |vocab|), the top pairs
  * come from a `takeOrdered` under a total order, and each round applies
  * the provably-sequential-exact prefix of them in one narrow map (see
  * [[trainDistributed]] — up to 64 merges per vocab pass, so realistic
  * 32k-merge vocabularies cost hundreds of rounds, not 32k job
  * barriers). Both branches share the same merge-application primitive
  * and the same deterministic tie-break — highest count, then
  * lexicographically smallest (left, right) — and are pinned equal by
  * the per-round gate and the 1000-merge ProfileSpec probe.
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

  /** Distributed merge loop for vocabularies past the driver bound,
    * BATCHED: each round fetches the top-`fetchSize` pairs under the
    * total order and applies the longest prefix that is provably
    * identical to running the sequential greedy loop — so one vocab
    * pass buys many merges instead of one, and the job count is
    * sublinear in `numMerges` (measured on the 100k-doc probe,
    * SCALING.md r8).
    *
    * Exactness argument for the accepted prefix: merging (l, r) only
    * changes counts of pairs CONTAINING l, r, or the new symbol l+r
    * ("touched" pairs) — a pair disjoint from every earlier accepted
    * pair keeps its freshly-counted value. A merge can create or grow
    * only pairs of the form (x, l+r) / (l+r, y), and each such
    * occurrence consumes an occurrence of a source pair (x, l) / (r, y)
    * that existed in THIS round's counts — so every changed pair is
    * bounded by the count of some touched pair in this round's full
    * ranking. Scanning the fetched list in rank order: `cap` is the
    * highest count at which a touched pair could live — the first
    * touched item seen, or the truncation horizon (count of the last
    * fetched item) when the fetch came back full. Untouched items with
    * count STRICTLY above `cap` therefore still win their sequential
    * step against every unchanged pair (rank order) and every changed
    * pair (≤ cap < count), tie-breaks included. If the provable prefix
    * is empty (e.g. a tie straddles the cap), the round falls back to
    * applying the single arg-max — plain sequential, always exact —
    * so each round makes progress. Bit-exactness vs the driver loop is
    * gate-pinned per round (text_bpe_train) and probed at
    * numMerges=1000 on 100k docs (ProfileSpec).
    *
    * The iteration state is a plain cached RDD of (symbols, count);
    * one narrow `map` per ROUND (not per merge) builds the lineage, and
    * `localCheckpoint()` every `checkpointEvery` rounds truncates it so
    * task-closure serialization stays O(1) at vocabulary-scale merge
    * budgets (32k merges ≈ 500 rounds would otherwise serialize a
    * 500-deep lineage per task). */
  /** Vocab passes the last [[trainDistributed]] call took (0 when the
    * driver branch ran) — instrumentation for the opt-in ProfileSpec
    * jobs-sublinear-in-merges probe, not operator contract. */
  @volatile private[graft] var lastDistributedRounds: Int = 0

  private def trainDistributed(wc: DataFrame, numMerges: Int,
      minPairCount: Long, fetchSize: Int = 4096,
      checkpointEvery: Int = 50): Seq[(String, String)] = {
    val spark = wc.sparkSession
    import spark.implicits._
    var state = wc.select(col("word"), col("cnt")).as[(String, Long)]
      .rdd.map { case (w, c) => (w.map(_.toString).toArray, c) }.cache()
    state.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var roundsSinceCheckpoint = 0
    var go = true
    while (go && merges.length < numMerges) {
      rounds += 1
      // fetch far DEEPER than we expect to accept: the truncation
      // horizon (count of the last fetched pair) is part of `cap`, and
      // in a zipf tail the counts 64 ranks apart are nearly equal — a
      // shallow fetch caps acceptance at ~1 merge/round. 4096 rows
      // through takeOrdered's per-partition heaps is driver-trivial.
      val fetch = fetchSize
      val top = state.flatMap { case (syms, c) =>
        (0 until syms.length - 1).iterator.map(i => ((syms(i), syms(i + 1)), c))
      }.reduceByKey(_ + _).takeOrdered(fetch)(bestOrdering)
      if (top.isEmpty || top.head._2 < minPairCount) go = false
      else {
        // `cap` starts at the truncation horizon: when the fetch came
        // back full, unseen pairs (some touched) can hold any count up
        // to the last fetched item's
        var cap = if (top.length == fetch) top.last._2 else 0L
        val touched = scala.collection.mutable.HashSet.empty[String]
        val scanned = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
        var i = 0
        var stop = false
        while (i < top.length && !stop) {
          val item @ ((l, r), c) = top(i)
          if (touched(l) || touched(r)) { cap = math.max(cap, c); stop = true }
          else if (c < minPairCount) stop = true
          else { scanned += item; touched += l; touched += r; touched += (l + r) }
          i += 1
        }
        val accepted = scanned.takeWhile(_._2 > cap).map(_._1)
          .take(numMerges - merges.length)
        val batch: Seq[(String, String)] =
          if (accepted.nonEmpty) accepted.toSeq else Seq(top.head._1)
        merges ++= batch
        val next = state.map { case (syms, c) =>
          (batch.foldLeft(syms) { case (s, (l, r)) => applyMerge(s, l, r) }, c)
        }.cache()
        roundsSinceCheckpoint += 1
        if (roundsSinceCheckpoint >= checkpointEvery) {
          next.localCheckpoint() // truncate lineage (trade: recompute-on-
          // failure is lost for these blocks — acceptable for a bounded
          // training loop whose restart is the cheap recovery anyway)
          roundsSinceCheckpoint = 0
        }
        next.count()
        state.unpersist(blocking = false)
        state = next
      }
    }
    state.unpersist(blocking = false)
    lastDistributedRounds = rounds
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
      if (wc.count() <= maxDriverVocab) {
        lastDistributedRounds = 0
        trainLocal(wc.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq,
          numMerges, minPairCount)
      } else trainDistributed(wc, numMerges, minPairCount)
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
    * training budget, never by data); per-word encoding is memoized PER
    * DOCUMENT (the map is allocated per UDF invocation), so a doc's
    * repeated words encode once — cross-row reuse would need a
    * transient per-executor cache, not worth the synchronization for a
    * memo that is cheap to rebuild. */
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
