package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: run named queries N times each, print per-run
  * wall seconds — separates codegen/JIT warm-up from steady-state cost.
  * Usage: runMain graft.ProfileQ <sfDir> <reps> <name...>
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
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
    names.foreach { name =>
      // per-rep scheduled-job count alongside wall seconds: for iterative
      // ops (CC fixpoints, Newton chains) the DRIVER ROUND-TRIP count is
      // the genuine cluster-scale cost that local[32] wall time hides —
      // local job scheduling is ~ms while a 1000-executor barrier is not.
      // Counting protocol (settled max-job-id diff, reads outside the
      // timed window) shared with Bench via graft.JobCount — round 18:
      // the two tools' tables must stay comparable, and the settled
      // read closes the listener-bus misattribution race.
      val sc = spark.sparkContext
      val runs = (1 to reps).map { _ =>
        val j0 = JobCount.settledMaxJobId(sc)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write
          .format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, JobCount.settledMaxJobId(sc) - j0)
      }
      println(f"PROFILE $name: ${runs.map(r => f"${r._1}%.3f").mkString(" ")}" +
        s" | jobs: ${runs.map(_._2).mkString(" ")}")
    }
    spark.stop()
  }
}
