package graft.examples

import graft.tsne.{BHTSNE, TSNEParams}
import org.apache.spark.sql.SparkSession

/** BASELINE.md protocol runner: BHTSNE 500 iterations on the 500-row
  * embeddings fixture — prints sec/iteration and the seed-42 final KL
  * (the golden the protocol pins future rounds against). */
object TsneBaseline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = args.lift(1).map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var lastLoss = Double.NaN
    val t0 = System.nanoTime()
    val result = BHTSNE.tsne(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding",
      TSNEParams(maxIterations = iters, seed = 42),
      callback = (_, _, l) => l.foreach(lastLoss = _))
    val n = result.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // loss reports every 10 iterations (reportLoss default); "final_kl" is
    // the last REPORTED loss — null (valid JSON) when iters < 10
    val kl = if (lastLoss.isNaN) "null" else f"$lastLoss%.6f"
    println(f"""{"workload":"bhtsne_${iters}","n":$n,"sec":$secs%.1f,"sec_per_iter":${secs / iters}%.4f,"final_kl":$kl}""")
    spark.stop()
  }
}
