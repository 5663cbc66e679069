package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded property tests for the shared pigeonhole banding key
  * ([[Dedup.bandChunkVal]]) — the single definition every Hamming
  * candidacy join uses, and whose driver-side JVM twin backs the
  * streaming broadcast index. Deterministic random inputs (no
  * scalatestplus bridge needed offline). */
class BandingPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(20260814L)

  /** JVM reference of the chunk key — the semantics
    * MediaStream.PhashBandIndex buckets by. */
  private def jvmKey(sig: Long, chunk: Int, chunks: Int, bitsPer: Int): Long =
    if (chunk == chunks - 1) sig >>> ((chunks - 1) * bitsPer)
    else (sig >>> (chunk * bitsPer)) & ((1L << bitsPer) - 1)

  test("SQL chunk value equals the JVM bucket key on random signatures") {
    import spark.implicits._
    for (bits <- Seq(32, 64); maxHamming <- Seq(1, 3, 7, 13, 29)) {
      if (bits >= maxHamming + 1) {
        val chunks = maxHamming + 1
        val bitsPer = bits / chunks
        val mask = if (bits == 64) -1L else (1L << bits) - 1
        val sigs = Seq.fill(200)(rng.nextLong() & mask)
        val got = sigs.toDF("sim")
          .select(col("sim"),
            explode(sequence(lit(0), lit(chunks - 1))).as("chunk_id"))
          .withColumn("chunk_val",
            Dedup.bandChunkVal("sim", "chunk_id", chunks, bitsPer))
          .collect()
          .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
        for (s <- sigs; c <- 0 until chunks)
          assert(got((s, c)) == jvmKey(s, c, chunks, bitsPer),
            s"bits=$bits maxHamming=$maxHamming sig=$s chunk=$c")
      }
    }
  }

  // ------------------------------------------------ hot-bucket semantics
  //
  // The r14 rewrite traded completeness-under-adversarial-skew for
  // boundedness: identical signatures pair latch-free (class /
  // sentinel-ident paths), near pairs pair unless EVERY chunk they
  // agree on is over-cap, and a giant exact-duplicate class emits its
  // star instead of C(n,2). These tests PLANT the adversarial
  // populations and pin each documented over-cap semantic.

  private val Bits60Mask = (1L << 60) - 1

  /** ≥`n` distinct 60-bit sims whose chunk `c` agrees with sim 0 (all
    * zeros there) and whose other bits keep them ≥ `minHamming` from 0
    * and from each other's relevant probes — the planted hot-bucket
    * filler population (near-constant signatures: think solid-black
    * frames with sensor noise). */
  private def hotFillers(n: Int, c: Int, chunks: Int, bitsPer: Int): Seq[Long] = {
    val chunkMask =
      if (c == chunks - 1) Bits60Mask >>> (c * bitsPer) << (c * bitsPer)
      else ((1L << bitsPer) - 1) << (c * bitsPer)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 1
    while (out.size < n) {
      val v = (i * 2654435761L) & Bits60Mask & ~chunkMask
      if (java.lang.Long.bitCount(v) > 6) out += v
      i += 1
    }
    out.toSeq
  }

  test("hammingPairs: planted 10^4 identical-sig mass emits the star, not C(n,2)") {
    import spark.implicits._
    val n = 10000
    val sig = 0x5a5a5a5a5aL
    val near = sig ^ 3L // hamming 2
    val rows = (0L until n.toLong).map(i => (i, sig)) :+ (n.toLong, near)
    val pairs = Dedup.hammingPairs(rows.toDF("id", "sim"), maxHamming = 3,
      bits = 60, maxBucket = 64, maxClassExpand = 64).cache()
    // over-cap class (10^4 > maxClassExpand) = star on the min-id rep
    // (n-1 within pairs), plus the near sig pairing with the REP alone
    assert(pairs.count() == (n - 1) + 1)
    assert(pairs.where(col("id_a") =!= 0L).count() == 0,
      "every emitted pair must involve the representative id 0")
    assert(pairs.where(col("hamming") === 2 && col("id_b") === n.toLong).count() == 1,
      "the near sig must still pair with the over-cap class via its representative")
    // the star carries identical component information: one component
    // holding all n+1 ids, canonical = 0
    val canon = Dedup.canonicalize(pairs)
    assert(canon.where(col("canonical_id") === 0L).count() == n + 1)
    pairs.unpersist()
  }

  test("hammingPairs: over-cap band buckets never drop a Hamming-0 duplicate") {
    import spark.implicits._
    val maxHamming = 3
    val chunks = maxHamming + 1
    val bitsPer = 60 / chunks
    val t = 0L // target sig: every chunk value 0
    val nearProbe = 3L // hamming 2 from t; agrees with t on chunks 1..3
    // >maxBucket distinct sims agreeing with t on EVERY chunk — all of
    // t's band buckets go over cap
    val fillers = (0 until chunks).flatMap(c => hotFillers(12, c, chunks, bitsPer))
    val rows = fillers.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++
      Seq((900001L, t), (900002L, t), (900003L, nearProbe))
    val pairs = Dedup.hammingPairs(rows.toDF("id", "sim"), maxHamming,
      bits = 60, maxBucket = 8, maxClassExpand = 64).cache()
    // Hamming-0 twins pair through the CLASS path — immune to bucket heat
    assert(pairs.where(col("id_a") === 900001L && col("id_b") === 900002L &&
      col("hamming") === 0).count() == 1,
      "identical signatures must pair no matter how hot their band buckets are")
    // the near probe agrees with t ONLY on over-cap chunks: candidacy
    // drops it — the documented over-cap miss semantic, pinned
    assert(pairs.where(col("id_b") === 900003L || col("id_a") === 900003L)
      .count() == 0,
      "a near pair whose every agreeing chunk is over-cap leaves candidacy")
    pairs.unpersist()
    // positive control: same population with the cap lifted finds the
    // near pair (it is genuinely within budget)
    val unCapped = Dedup.hammingPairs(rows.toDF("id", "sim"), maxHamming,
      bits = 60, maxBucket = 4096, maxClassExpand = 64)
    assert(unCapped.where((col("id_a") === 900003L || col("id_b") === 900003L) &&
      col("hamming") === 2).count() >= 1)
  }

  test("hammingPairs: canonicalize components identical with and without caps") {
    import spark.implicits._
    // 200-member identical class + a near chain + unrelated singletons:
    // big enough that maxClassExpand=16 stars the class, small enough
    // that the uncapped form's full enumeration stays cheap
    val sig = 0x123456789aL
    val rows = (0L until 200L).map(i => (i, sig)) ++
      Seq((300L, sig ^ 1L), (301L, sig ^ 6L), (400L, 0x7070707070L)) ++
      (500L until 520L).map(i => (i, i * 0x9e3779b97fL & Bits60Mask))
    val df = rows.toDF("id", "sim")
    def canon(maxBucket: Int, maxClassExpand: Int) =
      Dedup.canonicalize(Dedup.hammingPairs(df, maxHamming = 3, bits = 60,
          maxBucket = maxBucket, maxClassExpand = maxClassExpand))
        .select("id", "canonical_id")
    val capped = canon(8, 16)
    val unCapped = canon(100000, 100000)
    assert(capped.exceptAll(unCapped).count() == 0 &&
      unCapped.exceptAll(capped).count() == 0,
      "caps may reshape the pair set but not the connected components")
  }

  test("nearSimPairsCross: sentinel ident chunk matches latch-free under hot history") {
    import spark.implicits._
    val maxHamming = 3
    val chunks = maxHamming + 1
    val bitsPer = 60 / chunks
    val t = 0L
    val nearProbe = 3L // hamming 2 from t, agreeing chunks 1..3 only
    val isolated = 1L << 50
    val hist = ((0 until chunks).flatMap(c => hotFillers(12, c, chunks, bitsPer)) ++
      Seq(t, isolated)).toDF("sim")
    val left = Seq((1L, t, "pt"), (2L, nearProbe, "pn"), (3L, isolated ^ 1L, "pu"))
      .toDF("in_id", "sim", "payload")
    val out = Dedup.nearSimPairsCross(left, hist, maxHamming, bits = 60,
      maxBucket = 8).cache()
    // 1. identical sim matches through the sentinel even though every
    //    band bucket of t is over-cap
    val ident = out.where(col("in_id") === 1L && col("sim_r") === t)
    assert(ident.count() >= 1 && ident.where(col("hamming") =!= 0).count() == 0)
    assert(ident.select("payload").head.getString(0) == "pt",
      "left payload columns must travel through the candidacy join")
    // 2. the near probe's agreeing chunks are all over-cap: dropped
    assert(out.where(col("in_id") === 2L).count() == 0)
    // 3. under-cap near match is found with its exact hamming
    assert(out.where(col("in_id") === 3L && col("sim_r") === isolated &&
      col("hamming") === 1).count() >= 1)
    // 4. per-left-row candidate mass is bounded by the documented cap
    val maxPerRow = out.groupBy("in_id").count().agg(max("count")).head.getLong(0)
    assert(maxPerRow <= (chunks.toLong * 8 + 1) * chunks,
      s"per-row candidates must stay bounded, got $maxPerRow")
    out.unpersist()
  }

  test("nearSimPairsCross: empty sides, duplicate left sims, bad params") {
    import spark.implicits._
    val some = Seq(5L).toDF("sim")
    val someRows = Seq((1L, 5L), (2L, 5L)).toDF("in_id", "sim")
    val empty = spark.emptyDataset[Long].toDF("sim")
    assert(Dedup.nearSimPairsCross(someRows, empty, 3, 60, 8).count() == 0)
    assert(Dedup.nearSimPairsCross(empty.select(col("sim")), some, 3, 60, 8).count() == 0)
    // ownership semantics: every left ROW meets the index — two assets
    // carrying the same sim both surface (each once via the sentinel,
    // once per agreeing band; callers dedupe at their aggregation key)
    val out = Dedup.nearSimPairsCross(someRows, some, 3, 60, 8)
      .select("in_id", "sim_r", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 5L, 0), (2L, 5L, 0)), s"$out")
    intercept[IllegalArgumentException](Dedup.nearSimPairsCross(someRows, some, 0, 60, 8))
    intercept[IllegalArgumentException](Dedup.nearSimPairsCross(someRows, some, 3, 2, 8))
    intercept[IllegalArgumentException](Dedup.nearSimPairsCross(someRows, some, 3, 60, 1))
  }

  test("nearSimPairsCross: equals brute force when no bucket is over-cap") {
    import spark.implicits._
    val maxHamming = 5
    val mask = Bits60Mask
    val histSims = Seq.fill(300)(rng.nextLong() & mask).distinct
    // half the probes are perturbed history sims (planted matches),
    // half fresh randoms
    val probes = histSims.take(80).map(s =>
      (0 until rng.nextInt(maxHamming + 2)).foldLeft(s)((v, _) =>
        v ^ (1L << rng.nextInt(60)))) ++ Seq.fill(80)(rng.nextLong() & mask)
    val got = Dedup.nearSimPairsCross(
        probes.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("in_id", "sim"),
        histSims.toDF("sim"), maxHamming, bits = 60, maxBucket = 100000)
      .select("in_id", "sim_r", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (p, i) <- probes.zipWithIndex
      h <- histSims
      d = java.lang.Long.bitCount(p ^ h)
      if d <= maxHamming
    } yield (i.toLong, h, d)).toSet
    assert(got == want)
  }

  test("pigeonhole guarantee: pairs within maxHamming bits share a chunk") {
    // flip up to maxHamming random bits of a random signature: the pair
    // MUST agree on at least one of the maxHamming+1 disjoint chunks —
    // the property that makes banding candidacy lossless within budget
    for (_ <- 1 to 500) {
      val bits = if (rng.nextBoolean()) 64 else 32
      val maxHamming = 1 + rng.nextInt(math.min(29, bits - 2))
      val chunks = maxHamming + 1
      val bitsPer = bits / chunks
      val mask = if (bits == 64) -1L else (1L << bits) - 1
      val a = rng.nextLong() & mask
      val nFlips = rng.nextInt(maxHamming + 1)
      val b = (0 until nFlips).foldLeft(a)((v, _) => v ^ (1L << rng.nextInt(bits)))
      // (re-flipped bits only lower the distance — still within budget)
      val agrees = (0 until chunks).exists(c =>
        jvmKey(a, c, chunks, bitsPer) == jvmKey(b, c, chunks, bitsPer))
      assert(agrees,
        s"no shared chunk for bits=$bits maxHamming=$maxHamming a=$a b=$b " +
          s"hamming=${java.lang.Long.bitCount(a ^ b)}")
    }
  }
}
