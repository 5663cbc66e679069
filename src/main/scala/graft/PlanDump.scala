package graft

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named queries to text files — the
  * optimization rounds' plan-evidence tool (plans/r19/<query>_before.txt
  * etc.). Usage:
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <query1,query2,...>"
  *
  * Reads the same env contract as [[Bench]] (SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS). Queries whose fn collects to a local relation
  * (the driver-composed lifecycle queries) still dump — the file then
  * records the final frame's plan plus a note; their evidence lives in
  * the stage-level numbers in OPTIMIZATION_r*.md. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
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
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pw = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try pw.println(plan) finally pw.close()
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
