package graft

import org.apache.spark.sql.SparkSession

/** Scaling-stress timer: run the named queries against a fixture dir
  * (e.g. tools/gen_stress.py's ~10x replica of sf0.1) with Bench's
  * session config and noop sink, one warm pass + min-of-2 timed passes,
  * and print one JSON line per query. Compared against the same run on
  * sf0.1, the ratio answers the question the plan audits cannot: does
  * the wall-time of the heavy composites actually grow ~linearly with
  * input size (see BASELINE.md "Stress scaling").
  *
  * Usage: runMain graft.StressBench <dir> <query...>
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "StressBench: pass at least one query name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write
        .format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      once(name) // warm: codegen + JIT
      val best = math.min(once(name), once(name))
      println(f"""{"query":"$name","dir":"$dir","sec":$best%.3f}""")
    }
    spark.stop()
  }
}
