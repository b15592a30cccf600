package graft

import org.apache.spark.SparkContext

/** Shared scheduled-job counting protocol for Bench and ProfileQ — the
  * drift-immune perf metric's single implementation, so the two tools'
  * numbers stay comparable (and a protocol fix lands in both at once).
  *
  * Job ids are globally monotonic, so diffing the MAX observed id stays
  * correct when the status store evicts past spark.ui.retainedJobs in a
  * long multi-query session — a list-length diff silently undercounts
  * (or goes negative) there.
  *
  * The status tracker is fed by the ASYNCHRONOUS listener bus: a
  * just-finished action's last JobStart can still be queued when the
  * action returns, which would misattribute that job to the NEXT query
  * (a phantom ±1 "plan change" in a metric BASELINE.md diffs as
  * plan-change evidence). [[settledMaxJobId]] therefore polls until the
  * max id is stable across two consecutive samples before reading it —
  * Spark's own tests drain the bus before asserting tracker state for
  * the same reason. */
/** Per-session finished-TASK counter (round 19): the second drift-immune
  * parallelism metric next to [[JobCount]]'s scheduled jobs. Task counts
  * prove the configured core count reaches EXECUTION — with
  * `spark.sql.shuffle.partitions` = `$SPARK_GRAFT_CPUS`, the same query
  * schedules a different task total at 8 vs 32 cores, so the 8-core and
  * 32-core bench artifacts carry direct evidence that the engine honors
  * the driver's core knob even when sf0.1 wall-clock is too
  * overhead-bound for the 8-vs-32 wall RATIO to show it (VERDICT r18
  * item 2). Same settled-read protocol as JobCount: the listener bus is
  * asynchronous, so reads poll outside the timed window until stable. */
object TaskCount {
  private val n = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var registered = false

  def ensureRegistered(sc: SparkContext): Unit = synchronized {
    if (!registered) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          n.incrementAndGet(); ()
        }
      })
      registered = true
    }
  }

  /** Finished-task count after two consecutive 50 ms samples agree
    * (bounded at ~1 s — the JobCount.settledMaxJobId stance). */
  def settledTaskCount: Long = {
    var prev = n.get()
    var tries = 0
    while (tries < 20) {
      Thread.sleep(50)
      val cur = n.get()
      if (cur == prev) return cur
      prev = cur
      tries += 1
    }
    prev
  }
}

object JobCount {
  def maxJobId(sc: SparkContext): Int = {
    val ids = sc.statusTracker.getJobIdsForGroup(null)
    if (ids.isEmpty) -1 else ids.max
  }

  /** Max job id after the listener bus has gone quiet: two consecutive
    * 50 ms samples agreeing (bounded at ~1 s so a busy background
    * listener can never hang a bench run). */
  def settledMaxJobId(sc: SparkContext): Int = {
    var prev = maxJobId(sc)
    var tries = 0
    while (tries < 20) {
      Thread.sleep(50)
      val cur = maxJobId(sc)
      if (cur == prev) return cur
      prev = cur
      tries += 1
    }
    prev
  }
}
