package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("native expressions usable from SQL via GraftExtensions") {
    // getOrCreate would return the suite-shared session (no extensions);
    // clear defaults so a fresh session (same context) picks them up
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
          |       array_sq_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS d2,
          |       array_sq_norm(array(3.0d, 4.0d)) AS n2""".stripMargin)
        .collect()(0)
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 25.0)
      assert(r.getDouble(2) == 25.0)
      // implicit coercion: int-literal arrays and the fixture's float
      // arrays must work through SQL (ImplicitCastInputTypes)
      assert(spark.sql("SELECT array_dot(array(1, 2), array(3, 4)) AS d")
        .collect()(0).getDouble(0) == 11.0)
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .createOrReplaceTempView("emb_ext_test")
      val norms = spark.sql(
        "SELECT sqrt(array_dot(embedding, embedding)) AS n FROM emb_ext_test LIMIT 5")
        .collect()
      assert(norms.forall(r2 => math.abs(r2.getDouble(0) - 1.0) < 1e-3))
      // PQ asymmetric distance: lut is 2 subspaces × 3 codewords flat;
      // codes (1, 2) pick lut[0·3+1]=1.5 and lut[1·3+2]=30.0
      val adc = spark.sql(
        """SELECT pq_adc_sum(array(0.5d, 1.5d, 2.5d, 10.0d, 20.0d, 30.0d),
          |                  array(CAST(1 AS TINYINT), CAST(2 AS TINYINT))) AS s""".stripMargin)
        .collect()(0).getDouble(0)
      assert(adc == 31.5, s"got $adc")
      // arity errors are clear, not IndexOutOfBounds
      val e = intercept[Exception](spark.sql("SELECT array_dot(array(1.0d))"))
      assert(e.getMessage.contains("expects 2 argument"), e.getMessage)
      // native aggregates from SQL: bounded top-k and bounded posting list
      val agg = spark.sql(
        """SELECT g, topk_neighbors(2, j, d) AS top, bounded_id_list(3, j) AS ids
          |FROM VALUES (1, 10L, 3.0d), (1, 11L, 1.0d), (1, 12L, 2.0d),
          |            (2, 20L, 1.0d), (2, 21L, 2.0d), (2, 22L, 3.0d), (2, 23L, 4.0d)
          |  AS t(g, j, d)
          |GROUP BY g ORDER BY g""".stripMargin).collect()
      val top1 = agg(0).getSeq[org.apache.spark.sql.Row](1).map(r2 => r2.getLong(0))
      assert(top1 == Seq(11L, 12L), s"got $top1")
      assert(agg(0).getSeq[Long](2).sorted == Seq(10L, 11L, 12L))
      assert(agg(1).isNullAt(2), "over-cap group must evaluate to NULL")
      // keep_first: earliest (doc, p) occurrence wins, payload rides along
      val kf = spark.sql(
        """SELECT h, keep_first(doc, p, s) AS w
          |FROM VALUES ('a', 2L, 1, 'late doc'), ('a', 1L, 5, 'winner'),
          |            ('a', 1L, 9, 'same doc later'), ('b', 3L, 0, 'solo')
          |  AS t(h, doc, p, s)
          |GROUP BY h ORDER BY h""".stripMargin).collect()
      assert(kf(0).getStruct(1).getString(2) == "winner", s"got ${kf(0)}")
      assert(kf(1).getStruct(1).getString(2) == "solo")
    } finally {
      // don't stop(): the SparkContext is shared with TestSpark sessions
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("repeated native expressions in one projection stay codegen-compilable") {
    // two instances of EACH custom expression inside a single
    // whole-stage-codegen scope: a doGenCode that declares fixed Java
    // local names (n/acc/i) redeclares them on the second instance and
    // Janino silently drops the stage to interpreted mode — this pins
    // ctx.freshName usage by turning the fallback into a hard failure
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      val r = df.select(
        arrayDot(col("a"), col("b")).as("d1"),
        arrayDot(col("b"), col("a")).as("d2"),
        arraySqDist(col("a"), col("b")).as("s1"),
        arraySqDist(col("b"), col("a")).as("s2"),
        arraySqNorm(col("a")).as("n1"),
        arraySqNorm(col("b")).as("n2")).head
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 11.0)
      assert(r.getDouble(2) == 8.0 && r.getDouble(3) == 8.0)
      assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 25.0)
      val lut = array((0 until 6).map(i => lit(i * 1.0)): _*)
      val codes = array(lit(1), lit(2)).cast("array<tinyint>")
      val adc = Seq(1).toDF("x")
        .select(pqAdcSum(lut, codes).as("p1"), pqAdcSum(lut, codes).as("p2")).head
      assert(adc.getDouble(0) == 6.0 && adc.getDouble(1) == 6.0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}

class TrustworthinessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("t-SNE embedding preserves neighborhoods better than random") {
    import graft.tsne._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id") < 150).cache()
    val result = BHTSNE.tsne(emb, "vec_id", "embedding",
      TSNEParams(maxIterations = 300, perplexity = 15, earlyExaggeration = 60, seed = 42))
      .withColumn("pos", org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")))
      .cache()

    val t = Trustworthiness.compute(emb, "vec_id", "embedding", result, "id", "pos", k = 10)

    // random-embedding baseline on the same points
    import org.apache.spark.sql.functions._
    val rnd = emb.select(col("vec_id"),
      array(rand(7), rand(13)).as("pos"))
    val tRand = Trustworthiness.compute(emb, "vec_id", "embedding", rnd, "vec_id", "pos", k = 10)

    // ≈0.71 measured on these synthetic near-uniform vectors (weak
    // neighborhood structure is the hard case; clustered data scores 0.9+)
    assert(t > 0.65, s"trustworthiness $t too low")
    assert(t > tRand + 0.1, s"t-SNE $t must beat random $tRand by a clear margin")
  }

  test("intruder-rank trustworthiness equals the full-rank-window form") {
    import graft.tsne._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 60).cache()
    // a deliberately lossy "embedding" (first two coordinates) so the
    // intruder set is large — the interesting regime for rank agreement
    val proj = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 2).cast("array<double>").as("pos"))
    val k = 7
    val t = Trustworthiness.compute(emb, "vec_id", "embedding", proj, "vec_id", "pos", k)

    // reference form: materialized full (n−1)-rank window (the shape the
    // production path avoids)
    val n = emb.count()
    val origRanks = KNN.knnWindow(emb, "vec_id", "embedding", (n - 1).toInt)
      .select(col("i"), col("j"), col("rank").as("orig_rank"))
    val embTop = KNN.knn(proj, "vec_id", "pos", k).select(col("i"), col("j"))
    val origTop = origRanks.where(col("orig_rank") <= k).select(col("i"), col("j"))
    val penalty = embTop
      .join(origTop.withColumn("o", lit(1)), Seq("i", "j"), "left")
      .where(col("o").isNull)
      .join(origRanks, Seq("i", "j"))
      .agg(coalesce(sum(col("orig_rank") - k), lit(0L))).collect()(0).getLong(0)
    val tRef = 1.0 - 2.0 * penalty / (n.toDouble * k * (2 * n - 3 * k - 1))
    assert(math.abs(t - tRef) < 1e-12, s"intruder-rank $t != window form $tRef")
  }
}
