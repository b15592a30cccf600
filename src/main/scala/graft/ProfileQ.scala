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
      // Job ids are globally monotonic, so diffing the MAX observed id
      // (round-16 ADVICE) stays correct when the status store evicts
      // past spark.ui.retainedJobs in a long multi-query session — a
      // list-length diff silently undercounts (or goes negative) there.
      val tracker = spark.sparkContext.statusTracker
      def maxJobId(): Int = {
        val ids = tracker.getJobIdsForGroup(null)
        if (ids.isEmpty) -1 else ids.max
      }
      val runs = (1 to reps).map { _ =>
        val j0 = maxJobId()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write
          .format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, maxJobId() - j0)
      }
      println(f"PROFILE $name: ${runs.map(r => f"${r._1}%.3f").mkString(" ")}" +
        s" | jobs: ${runs.map(_._2).mkString(" ")}")
    }
    spark.stop()
  }
}
