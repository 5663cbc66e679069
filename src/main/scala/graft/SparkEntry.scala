package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered by module (relational surface, t-SNE pipeline,
  * dedup, similarity, text analysis); each module returns `Seq[Q]` pairing
  * the DataFrame program with its DuckDB oracle SQL where expressible.
  */
object SparkEntry {

  /** All registered queries with their oracles and gates (Verify needs
    * the gate functions, not just the name→fn map). Names must be unique
    * — a duplicate would silently drop a query in the `toMap` below and
    * shrink the correctness surface without any failure. */
  def qs: Seq[Q] = {
    val m = modules
    val dups = m.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names registered: ${dups.mkString(", ")}")
    m
  }

  private def modules: Seq[Q] =
    rel.RelationalQueries.all ++ tsne.TsneQueries.all ++
      text.TextQueries.all ++ ops.OpsQueries.all ++
      ops.CorpusQueries.all ++
      multimodal.MultimodalQueries.all ++ streaming.StreamingQueries.all ++
      ml.MlQueries.all ++ io.LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    rel.RelationalQueries.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
