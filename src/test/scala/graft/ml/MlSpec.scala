package graft.ml

import graft.TestSpark
import graft.io.MnistIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PreprocessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("standardize yields per-dimension mean 0 / pop-std 1") {
    val std = Preprocess.standardize(emb, "vec_id", "embedding")
    val stats = std
      .select(posexplode(col("embedding")).as(Seq("pos", "z")))
      .groupBy("pos")
      .agg(avg("z").as("mu"), stddev_pop(col("z")).as("sd"))
      .collect()
    assert(stats.length == 64)
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-9, s"mean ${r.getDouble(1)} at pos ${r.getInt(0)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"std ${r.getDouble(2)}")
    }
  }

  test("pca: k dims, components ordered by explained variance") {
    val out = Preprocess.pca(emb, "vec_id", "embedding", k = 8)
    val dims = out.select(size(col("embedding"))).distinct().collect()
    assert(dims.length == 1 && dims(0).getInt(0) == 8)
    val vars = out
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(var_pop(col("x")).as("v"))
      .orderBy("pos").collect().map(_.getDouble(1))
    assert(vars.zip(vars.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"variance not descending: ${vars.toSeq}")
  }
}

class MnistIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("synthesize → read roundtrip with stable content-hash ids") {
    val dir = java.nio.file.Files.createTempDirectory("mnist").toString
    val path = s"$dir/m.csv.gz"
    MnistIO.synthesizeCsv(path, 100, 16)
    val a = MnistIO.readCsv(spark, path, 16)
    assert(a.count() == 100)
    assert(a.select("id").distinct().count() == 100)
    val ids = a.select(min("id"), max("id")).collect()(0)
    assert(ids.getLong(0) == 0L && ids.getLong(1) == 99L, "ids must be dense 0..n-1")
    // re-read gives identical (id, label) mapping under a different partitioning
    val b = MnistIO.readCsv(spark, path, 16).repartition(7)
    val ma = a.select("id", "label").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mb = b.select("id", "label").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ma == mb)
  }

  test("iteration sink writes csv, cost stream, and player json") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val sink = new MnistIO.IterationSink(dir, Array(1, 2))
    sink.callback(1, Array(0.1, 0.2, 0.3, 0.4), Some(5.0))
    sink.callback(2, Array(0.5, 0.6, 0.7, 0.8), None)
    sink.writePlayerJson()
    sink.close()
    val csv = scala.io.Source.fromFile(s"$dir/result00001.csv").getLines().toSeq
    assert(csv == Seq("1,0.1,0.2", "2,0.3,0.4"))
    assert(scala.io.Source.fromFile(s"$dir/cost.txt").getLines().toSeq == Seq("1,5.0"))
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/player.json"))
    assert(json.contains(""""iterations":[1,2]"""))
    assert(json.contains(""""key":0,"label":1"""))
    // valid JSON (parse with a strict-ish check: balanced + jackson-free)
    assert(json.count(_ == '{') == json.count(_ == '}'))
    // the self-contained viewer ships next to the data
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/player.html"))
    assert(html.contains("player.json") && html.contains("<canvas"))
  }

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
}
