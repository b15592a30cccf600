package graft
import org.apache.spark.sql.SparkSession
/** Driver-contract smoke: what the harness does first — call entry() and
  * check rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY rows=${df.count()} cols=${df.columns.mkString(",")}")
    df.show(3)
    spark.stop()
  }
}
