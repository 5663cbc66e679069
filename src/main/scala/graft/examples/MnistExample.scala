package graft.examples

import graft.io.MnistIO
import graft.ml.Preprocess
import graft.tsne.{BHTSNE, TSNEParams}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's flagship end-to-end pipeline (MNIST.scala:17-74),
  * Spark-native: gzip CSV → standardize → PCA → Barnes-Hut t-SNE →
  * per-iteration CSVs + loss stream + d3-player JSON (no R step).
  *
  * Usage: runMain graft.examples.MnistExample [outDir] [nRows] [iters]
  */
object MnistExample {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/mnist_tsne")
    val nRows = args.lift(1).map(_.toInt).getOrElse(1000)
    val iters = args.lift(2).map(_.toInt).getOrElse(200)
    val nPix = 64

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-mnist")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    new java.io.File(outDir).mkdirs()
    val csv = s"$outDir/mnist_like.csv.gz"
    MnistIO.synthesizeCsv(csv, nRows, nPix)

    val data = MnistIO.readCsv(spark, csv, nPix).cache()
    val labels = data.orderBy("id").select("label").collect().map(_.getInt(0))

    val std = Preprocess.standardize(data, "id", "features")
    val reduced = Preprocess.pca(std, "id", "features", k = 16).cache()

    val sink = new MnistIO.IterationSink(outDir, labels)
    val result = BHTSNE.tsne(reduced, "id", "features",
      TSNEParams(maxIterations = iters, perplexity = 20, earlyExaggeration = 50,
        reportLoss = 10, seed = 42),
      callback = (it, y, loss) => if (it % 10 == 0) sink.callback(it, y, loss))
    sink.writePlayerJson()
    sink.close()

    result.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/final_embedding")
    println(s"wrote ${result.count()} embedded points to $outDir")
    spark.stop()
  }
}
