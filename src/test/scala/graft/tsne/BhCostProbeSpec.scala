package graft.tsne

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in probe (GRAFT_PROFILE=1): decompose the BH per-iteration cost at
  * 16k points into driver tree build, broadcast (serialize+store), and
  * the aggregate job, to target optimization where it pays. */
class BhCostProbeSpec extends AnyFunSuite {

  test("BH per-iteration cost decomposition at 16k") {
    assume(sys.env.get("GRAFT_PROFILE").contains("1"), "opt-in probe")
    val spark = TestSpark.spark
    val sc = spark.sparkContext
    val n = 16000
    val d = 2
    val rng = new java.util.Random(42)
    val y = Array.fill(n * d)(rng.nextGaussian() * 5)

    def time[A](label: String, reps: Int)(f: => A): Double = {
      f // warm
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { f; r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[probe] $label%-28s ${sec * 1000}%8.2f ms")
      sec
    }

    time("SPTree.build", 20)(SPTree.build(y, n, d))
    time("FlatSPTree.build", 20)(FlatSPTree.build(y, n, d))
    val tree = SPTree.build(y, n, d)
    val flat = FlatSPTree.from(tree)
    time("broadcast(tree)+destroy", 20) {
      val b = sc.broadcast(tree); b.destroy()
    }
    time("broadcast(flat)+destroy", 20) {
      val b = sc.broadcast(flat); b.destroy()
    }
    time("broadcast(y)+destroy", 20) {
      val b = sc.broadcast(y); b.destroy()
    }
    // serialize-only cost of the object graph (what broadcast pays per chunk)
    val ser = new org.apache.spark.serializer.KryoSerializer(sc.getConf).newInstance()
    time("kryo serialize tree", 20)(ser.serialize(tree))
    time("kryo serialize flat", 20)(ser.serialize(flat))
  }
}
