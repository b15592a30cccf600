package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface — the streaming re-expression of the
  * reference's chunked CSV → append-sink loop (challenge2.py:295-298,
  * SURVEY.md §2 A4/A7): a file source drained micro-batch by micro-batch
  * into an append sink, plus watermarked window aggregation for the
  * events-shaped stream.
  */
object EventsStream {

  /** The events fixture schema with ts normalized to TimestampType.
    * (The parquet stores TIMESTAMP(NANOS); under nanosAsLong it reads as
    * LongType nanos.) */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** readStream over the events parquet, `maxFilesPerTrigger` bounding each
    * micro-batch — the streaming analog of the 1M-row chunk loop (A4).
    * Streaming file sources take a DIRECTORY; the fixture dir holds other
    * tables too, so a glob filter selects just the events file(s). */
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling-window count/sum per event_type with a watermark: late data
    * beyond `lateness` is dropped, state is bounded — the only design that
    * survives an unbounded stream. */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
                  lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).alias("n"), sum(col("value")).alias("total_value"))
      .select(col("window.start").alias("w_start"), col("window.end").alias("w_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Sessionization-lite: per-user running event count via
    * flatMapGroupsWithState would be the stateful path; the declarative
    * variant (per-user windowed counts) covers the fixture semantics. */
  def perUserActivity(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), window_), col("user_id"))
      .agg(count(lit(1)).alias("n_events"))
      .select(col("window.start").alias("w_start"), col("user_id"), col("n_events"))

  /** Append-mode memory sink, drained synchronously — the local smoke path
    * (batch parquet drives the stream; processAllAvailable = "run the whole
    * backlog"). Returns the started query; caller stops it. */
  def startMemorySink(df: DataFrame, name: String): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()

  /** A7 streaming analog — append each micro-batch to a parquet dir. */
  def startParquetAppend(df: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append)
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
