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
