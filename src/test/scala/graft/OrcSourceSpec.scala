package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IO

/** ORC source/sink: the format must ride the SAME scan machinery the
  * parquet path is audited on — vectorized read, predicate pushdown,
  * column pruning — or an ORC-backed lake would silently lose the scale
  * properties every plan audit assumes. */
class OrcSourceSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {

  test("ORC round-trips values and schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = (1 to 1000).map(i => (i.toLong, s"name$i", i % 7))
      .toDF("id", "name", "grp")
    IO.writeOrc(df, s"$dir/t")
    val back = IO.readOrc(spark, s"$dir/t")
    // files read back nullable — names and types must survive exactly
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === 1000)
    assert(back.agg(sum("id")).head().getLong(0) === 500500L)
  }

  test("JSON-lines and CSV sinks round-trip against their scans") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "a,b \"quoted\"", 1.5), (2L, "plain", -2.25))
      .toDF("id", "s", "v")
    IO.writeJsonLines(df, s"$dir/j")
    val j = IO.readJsonLines(spark, s"$dir/j")
      .select("id", "s", "v").orderBy("id")
    assert(j.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).toSeq ===
      Seq((1L, "a,b \"quoted\"", 1.5), (2L, "plain", -2.25)))
    IO.writeCsv(df, s"$dir/c")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val c = spark.read.option("header", true).schema(schema)
      .csv(s"$dir/c").orderBy("id")
    assert(c.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).toSeq ===
      Seq((1L, "a,b \"quoted\"", 1.5), (2L, "plain", -2.25)),
      "quote/escape round-trip broke")
  }

  test("ORC scan takes predicate pushdown and column pruning") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc2").toString
    val df = (1 to 1000).map(i => (i.toLong, s"name$i", i % 7))
      .toDF("id", "name", "grp")
    IO.writeOrc(df, s"$dir/t")
    val q = IO.readOrc(spark, s"$dir/t")
      .filter(col("id") > 900).select("id", "grp")
    q.write.format("noop").mode("overwrite").save()
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.size === 1)
    val scan = scans.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThan(id,900)"),
      s"no id pushdown into the ORC scan: $pushed")
    // only the two referenced columns are read, `name` never decodes
    assert(scan.schema.fieldNames.toSet === Set("id", "grp"))
    assert(q.count() === 100)
  }
}
