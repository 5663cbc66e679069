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

  test("int8 quantization: codes in [0,255], extremes exact, constant dims zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0, 5.0, -1.0)),
      (2L, Array(10.0, 5.0, 3.0)),
      (3L, Array(2.5, 5.0, 1.0))).toDF("vec_id", "embedding")
    val q = Preprocess.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim 0: min 0, max 10 -> codes 0, 255, round(2.5/10*255+...)=64
    assert(q(1)(0) == 0 && q(2)(0) == 255)
    assert(q(3)(0) == math.floor(2.5 / (10.0 / 255) + 0.5).toInt)
    // dim 1 constant -> scale pinned to 1, all codes 0
    assert(Seq(1L, 2L, 3L).forall(id => q(id)(1) == 0))
    // dim 2: min -1 max 3 -> extremes exact
    assert(q(1)(2) == 0 && q(2)(2) == 255)
    // dequantization error bounded by scale/2 on the fixture
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = Preprocess.quantizeInt8(emb, "vec_id", "embedding")
    val all = codes.select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).head
    assert(all.getInt(0) >= 0 && all.getInt(1) <= 255)
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

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("distributed Lloyd's: SSE non-increasing, matches the driver twin") {
    val dist = KMeans.train(emb, k = 5, iters = 8)
    val local = KMeans.trainLocal(emb, k = 5, iters = 8)
    dist.sse.indices.drop(1).foreach { i =>
      assert(dist.sse(i) <= dist.sse(i - 1) * (1 + 1e-12) + 1e-9,
        s"SSE increased at iter $i: ${dist.sse.toSeq}")
    }
    val rel = math.abs(dist.sse.last - local.sse.last) / local.sse.last
    assert(rel <= 1e-9, s"dist ${dist.sse.last} vs driver ${local.sse.last} (rel $rel)")
    // centers agree to reassociation-level precision
    dist.centers.zip(local.centers).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= 1e-9) }
    }
  }

  test("assign: complete, deterministic, consistent with centers") {
    val m = KMeans.train(emb, k = 5, iters = 4)
    val a = KMeans.assign(emb, m).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == emb.count())
    assert(a.values.toSet.subsetOf((0 until 5).toSet))
    // repartitioned input gives the identical assignment map
    val b = KMeans.assign(emb.repartition(7), m)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("k-means|| init: deterministic, bounded, and beats hash init on planted modes") {
    import spark.implicits._
    // 12 well-separated modes x 50 points, tiny within-mode jitter: a
    // hash-sample init lands ~proportional to mass and typically misses
    // modes Lloyd's can never recover (a center cannot cross an empty
    // gap); the d2-spread parallel init must find every mode
    val pts = (0 until 600).map { i =>
      val mode = i % 12
      (i.toLong, Array.tabulate(4)(j =>
        mode * 100.0 + j + 0.01 * ((i * 31 + j * 7) % 10)))
    }.toDF("vec_id", "embedding")
    val k = 12
    val init1 = KMeans.parallelInit(pts, k = k, rounds = 5)
    val init2 = KMeans.parallelInit(pts, k = k, rounds = 5)
    assert(init1.length == k)
    assert(init1.zip(init2).forall { case (a, b) => a.sameElements(b) },
      "parallel init must be deterministic")
    val par = KMeans.trainFrom(pts, init1, iters = 5)
    val hash = KMeans.train(pts, k = k, iters = 5)
    assert(par.sse.last <= hash.sse.last + 1e-9,
      s"parallel init ${par.sse.last} vs hash init ${hash.sse.last}")
    // every mode discovered: with all 12 modes seeded, within-mode
    // variance is ~0.01-scale, so SSE collapses by orders of magnitude
    assert(par.sse.last < 1000.0,
      s"modes missed by parallel init: SSE ${par.sse.last}")
  }

  test("empty cluster keeps its previous center (k > distinct points)") {
    import spark.implicits._
    // 3 identical points, k=2: one cluster must stay empty and survive
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0)), (3L, Seq(1.0, 2.0)))
      .toDF("vec_id", "embedding")
    val m = KMeans.train(df, k = 2, iters = 3)
    assert(m.k == 2)
    assert(m.sse.last <= 1e-18)
    assert(m.centers.exists(c => c.sameElements(Array(1.0, 2.0))))
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
    // STRICT parse through Spark's JSON reader (failFast surfaces any
    // malformation as an error row/exception): the viewer consumes
    // exactly {iterations:[...], data:[{key,label,pos:[{x,y}...]}]}
    val parsed = spark.read.option("mode", "FAILFAST")
      .json(spark.createDataset(Seq(json))(org.apache.spark.sql.Encoders.STRING))
    val row = parsed.selectExpr(
      "size(iterations) AS ni", "size(data) AS nd",
      "size(data[0].pos) AS np", "data[0].key AS k0", "data[1].label AS l1").head
    assert(row.getInt(0) == 2 && row.getInt(1) == 2 && row.getInt(2) == 2)
    assert(row.getLong(3) == 0L && row.getLong(4) == 2L)
    // the self-contained viewer ships next to the data
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/player.html"))
    assert(html.contains("player.json") && html.contains("<canvas"))
  }

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
}
