package graft.streaming

import graft.text.{TextFunctions, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Streaming document-ingestion hygiene: the Gopher rule filter plus the
  * PII scrub as ONE stateless projection+filter — no watermark, no
  * state store, no shuffle — so a crawler feed is cleaned at ingestion
  * time by exactly the code the batch pipeline runs. This is the
  * streaming-side complement of [[graft.examples.CorpusPipeline]]'s
  * front half: stateless text ops compose into Structured Streaming for
  * free, while the stateful stages (dedup, canonicalize) stay batch
  * (their cross-document evidence is unbounded by design).
  *
  * StreamingSpec asserts the stream output equals the batch twin on the
  * same fixture — the incremental-execution guarantee Structured
  * Streaming makes for stateless plans.
  */
object DocsStream {

  /** File-source schema of the documents fixture parquet. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The hygiene transform (source-agnostic: batch or streaming frame in,
    * same semantics out): Gopher prose-band filter, then PII redaction on
    * the survivors. Returns the scrubbed text plus the rule metrics. */
  def hygiene(docs: DataFrame,
      minStopHits: Int = 2): DataFrame =
    TextQueries.gopherMetrics(docs)
      .where(TextQueries.gopherPass(minStopHits = minStopHits))
      .select(col("doc_id"),
        TextFunctions.scrubPii(col("text")).as("clean_text"),
        col("lang"), col("source"),
        col("n_tokens"), col("repetition"))

  /** Start the hygiene pass over a parquet directory as a file stream
    * into an in-memory sink (local smoke; swap source/sink for
    * Kafka/Delta in production — the transform is source-agnostic). */
  def startHygieneQuery(spark: SparkSession, dir: String,
      name: String): StreamingQuery =
    hygiene(spark.readStream.schema(docSchema).parquet(dir))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .start()
}
