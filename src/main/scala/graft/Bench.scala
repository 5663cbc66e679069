package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup (codegen/JIT/scan setup) so the first timed query
    // isn't charged for it: one representative of each hot code family
    // (agg scan, pair-compute + top-k aggregate, shingle/tokenize) at the
    // smallest SF — a few seconds that make single-rep timings reflect
    // steady state rather than JIT order
    // warm against the smallest local SF if present, else the bench dir
    // itself; a failed warmup is LOGGED (a silently-cold bench would be
    // compared against steady-state baselines)
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    // the BH family warms at sf0.01, not sf0.001: its hot loops (SPTree
    // walk, edge-force kernels) need ~500 points × 30 iterations of
    // invocations before C2 JIT kicks in — a 50-point warmup left the
    // driver's single timed run 1.4× over the pinned steady state (r2)
    val warmDir2 =
      if (new java.io.File("/root/testdata/sf0.01").isDirectory) "/root/testdata/sf0.01"
      else warmDir
    (Seq("q1_agg", "knn_embeddings", "dedup_exact_prefix", "text_stats",
        "ann_ivf_topk", "ml_pca", "dedup_ngram_jaccard",
        "tsne_trustworthiness").map(_ -> warmDir)
      :+ ("tsne_bh_embedding" -> warmDir2)).foreach { case (w, dir) =>
      try SparkEntry.queries(w)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $w failed (timings may run cold): ${e.getMessage}")
      }
    }
    // profiling knobs (unset in driver runs): SPARK_GRAFT_ONLY=q1,q2
    // restricts the surface; SPARK_GRAFT_REPS=n times each query n times
    // and reports the minimum (steady-state cost, JIT/cache-warm excluded)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt)
    // queries this fast are dominated by scheduler/GC noise in a single
    // run (r3→r4 showed 2-4x swings on UNTOUCHED sub-second queries):
    // auto-rerun them min-of-3 so the reported number is steady-state,
    // not a draw from the noise floor. Slow queries stay single-run —
    // their signal already dwarfs the noise and reps would triple bench
    // wall-clock for nothing.
    val autoRepBelow = sys.env.getOrElse("SPARK_GRAFT_AUTOREP_BELOW", "1.5").toDouble
    val surface = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = surface.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink forces FULL evaluation of every output column — a bare
        // count() lets Catalyst prune expensive final projections and would
        // under-time projection-heavy queries
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      var times = (1 to reps).map(_ => once())
      if (reps == 1 && times.head >= 0 && times.head < autoRepBelow)
        times ++= Seq(once(), once())
      // drop caches the query left behind (sketch operators pin frames
      // with storage-LRU lifetime): every query builds its own caches
      // inside its timed window, so leaked blocks from earlier queries
      // only add GC pressure to later ones — measured 4.98 s vs 3.80 s on
      // tsne_bh_embedding run 59th vs run alone at identical warmup
      spark.catalog.clearCache()
      name -> (if (times.exists(_ < 0)) Seq(-1.0) else times)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // per-query rep count so a bench reader can tell min-of-3 steady
    // state from a single-shot measurement
    val repsJson = results.map { case (k, v) => s"\"" + k + "\":" + v.length }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2.head < 0).keys.toSeq.sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.map(_.min).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repsJson,"protocol":"min_of_3_under_${autoRepBelow}s","failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
