package graft.streaming

import graft.ops.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming ANN-index ingestion: new embedding batches flow from a file
  * stream into the persistent [[IvfIndex]] via `foreachBatch` →
  * [[IvfIndex.append]] — each micro-batch is one frozen-quantizer assign
  * + parquet append touching only the affected cell directories. This is
  * the right coupling for index maintenance: the SEARCH path stays a
  * batch scan (readers see whole parquet files, never partial state),
  * while ingestion is continuous; exactly-once comes from the streaming
  * checkpoint (a replayed batch re-appends — pair with batch-id dedup or
  * idempotent file naming in a production sink; the fixture-scale spec
  * pins the happy path stream ≡ batch). */
object IndexStream {

  /** File-source schema of the embeddings fixture parquet. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Watch `watchDir` for new embedding parquet files and append each
    * micro-batch to the index at `indexDir` (which must already have
    * centers — [[IvfIndex.build]] runs once, offline, like the quality
    * classifier's model fit). */
  def startIndexAppendQuery(spark: SparkSession, watchDir: String,
      indexDir: String, name: String, checkpoint: String): StreamingQuery =
    spark.readStream.schema(embSchema).parquet(watchDir)
      .writeStream
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IvfIndex.append(batch, indexDir): Unit // drift stats land in drift_log.parquet
      }
      .start()
}
