package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MNIST-style CSV ingest/egress (reference MNIST.scala:25-31, 55-69, and
  * the tsne.R → d3-player JSON conversion, S-1/S-2/S-4/S-5/S-6).
  *
  * The upstream mnist.csv.gz is a git-LFS pointer (not materialized), so
  * [[synthesizeCsv]] writes a deterministic lookalike: headerless
  * `label,pix1..pixD` gzip CSV (FIXTURES.md §B).
  */
object MnistIO {

  /** Deterministic gzip CSV fixture: `nRows` rows, `label ∈ [0,10)`,
    * D pixel ints in [0,256). Plain driver-side write — it's a fixture
    * generator, not a pipeline stage. */
  def synthesizeCsv(path: String, nRows: Int, nPix: Int, seed: Long = 42): Unit = {
    val rng = new java.util.Random(seed)
    val out = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(path)))
    try {
      (0 until nRows).foreach { _ =>
        val label = rng.nextInt(10)
        val pix = Array.fill(nPix)(rng.nextInt(256))
        out.println((label +: pix.toSeq).mkString(","))
      }
    } finally out.close()
  }

  /** Schema'd CSV read (codec auto-detected from .gz) → (id, label,
    * features ARRAY<DOUBLE>). The reference derives row identity from
    * `zipWithIndex` partition order (SURVEY hazard §4.3.2); here ids
    * follow a deterministic content-hash sort, so the same file yields
    * the same ids under any input partitioning. Realized as a range-sorted
    * `zipWithIndex` (ids are contiguous across the range-ordered
    * partitions), NOT a global `row_number()` window — the window form
    * funnels every pixel array through one task; this one never holds
    * more than a partition's sorted range. */
  def readCsv(spark: SparkSession, path: String, nPix: Int): DataFrame = {
    import spark.implicits._
    val pixCols = (1 to nPix).map(i => StructField(s"pix$i", DoubleType))
    val schema = StructType(StructField("label", IntegerType) +: pixCols)
    val raw = spark.read.schema(schema).csv(path)
    val features = array((1 to nPix).map(i => col(s"pix$i")): _*)
    raw
      .select(col("label"), features.as("features"))
      .orderBy(xxhash64(col("label"), col("features").cast("string")))
      .as[(Int, Array[Double])]
      .rdd.zipWithIndex()
      .map { case ((label, feats), i) => (i, label, feats) }
      .toDF("id", "label", "features")
  }

  /** Per-iteration embedding sink (reference callback, MNIST.scala:55-69):
    * one CSV `label,x,y` per reported iteration + a loss stream file.
    * Driver-side writes — Y is driver state by design (SURVEY §1.4). */
  final class IterationSink(outDir: String, labels: Array[Int]) {
    new java.io.File(outDir).mkdirs()
    private val costWriter = new java.io.PrintWriter(
      new java.io.FileWriter(s"$outDir/cost.txt"))
    private val kept = scala.collection.mutable.ArrayBuffer[(Int, Array[Double])]()

    def callback(iteration: Int, y: Array[Double], loss: Option[Double]): Unit = {
      kept += ((iteration, y))
      val w = new java.io.PrintWriter(
        new java.io.FileWriter(f"$outDir/result$iteration%05d.csv"))
      try {
        labels.indices.foreach { i =>
          w.println(s"${labels(i)},${y(i * 2)},${y(i * 2 + 1)}")
        }
      } finally w.close()
      loss.foreach(l => { costWriter.println(s"$iteration,$l"); costWriter.flush() })
    }

    /** d3-player artifact (the tsne.R output format, data/mnist/tsne.R):
      * {"iterations":[...],"data":[{"key":i,"label":l,"pos":[{"x":..,"y":..}…]}]}
      * — folded into the engine so the R post-processing step disappears. */
    def writePlayerJson(): Unit = {
      val iters = kept.map(_._1)
      val sb = new StringBuilder
      sb.append("{\"iterations\":[").append(iters.mkString(",")).append("],\"data\":[")
      labels.indices.foreach { i =>
        if (i > 0) sb.append(',')
        sb.append(s"""{"key":$i,"label":${labels(i)},"pos":[""")
        kept.indices.foreach { t =>
          if (t > 0) sb.append(',')
          val y = kept(t)._2
          sb.append(s"""{"x":${y(i * 2)},"y":${y(i * 2 + 1)}}""")
        }
        sb.append("]}")
      }
      sb.append("]}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/player.json"), sb.toString)
      // ship the dependency-free viewer next to the data (replaces the
      // reference's separate spark-tsne-player module + R step)
      val html = getClass.getResourceAsStream("/player/player.html")
      if (html != null) {
        try java.nio.file.Files.copy(html,
          java.nio.file.Paths.get(s"$outDir/player.html"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally html.close()
      }
    }

    def close(): Unit = { costWriter.close() }
  }
}
