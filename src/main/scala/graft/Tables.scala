package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver parquet fixtures (TESTDATA.md). All queries read
  * through here so scan options stay in one place. */
object Tables {
  /** Fixture generations have shipped timestamp columns both as
    * TIMESTAMP(isAdjustedToUTC=true) and as naive TIMESTAMP_NTZ. The whole
    * engine (window/watermark ops, TIMESTAMP literals, unix_micros) works
    * on TimestampType, and every session pins spark.sql.session.timeZone
    * to UTC, so casting NTZ→TIMESTAMP here is epoch-preserving and keeps
    * the oracle (DuckDB reads the same column as naive) in agreement. The
    * cast is a metadata-only reinterpretation under UTC — it does not
    * break column pruning or predicate pushdown on other columns. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, d.col(f.name).cast(TimestampType))
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** events.parquet has shipped `ts` both as TIMESTAMP(MICROS) (reads
    * natively as TimestampType) and as TIMESTAMP(NANOS), which Spark has
    * no native type for. Sessions set spark.sql.legacy.parquet.nanosAsLong,
    * so a nanos fixture reads as long; normalize that to TimestampType
    * (µs) here so the rest of the engine sees a real timestamp column
    * either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
