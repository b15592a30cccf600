package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Structured Streaming smoke: the events parquet drives a watermarked
  * windowed aggregation through a memory sink (SURVEY.md §2 A4 / §7.2.8).
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  test("windowed event counts drain through a memory sink") {
    val stream = EventsStream.readEvents(spark, sf0)
    val agg = EventsStream.windowedAgg(stream, "1 hour", "30 minutes")
    val q = EventsStream.startMemorySink(agg, "ev_window")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ev_window")
    assert(out.columns.toSeq ==
      Seq("w_start", "w_end", "event_type", "n", "total_value"))
    val total = out.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    // watermark in AvailableNow drains everything ≤ max(ts) − lateness;
    // with append mode the final (open) windows are withheld, so the count
    // is positive but ≤ 1000
    assert(total > 0 && total <= 1000)
  }

  test("per-user activity stream produces rows for active users") {
    val stream = EventsStream.readEvents(spark, sf0)
    val q = EventsStream.startMemorySink(
      EventsStream.perUserActivity(stream), "ev_user")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("ev_user").count() > 0)
  }

  test("streaming dedup drops repeated ids within the watermark") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionEvent
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val deduped = EventsStream.dedupStream(input.toDF(), "user_id", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_s").start()
    def ev(uid: Long, minute: Long) =
      SessionEvent(uid, new Timestamp((1000 + minute) * 60000L), 1.0)
    input.addData(ev(1, 0), ev(1, 1), ev(2, 0), ev(1, 2), ev(2, 3))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_s").select("user_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted === Seq(1L, 2L), s"got $ids")
  }

  test("streaming debounce matches the batch operator's raw-gap semantics") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DebEvent
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DebEvent]
    val out = EventsStream.debounceStream(input.toDF(), minGapMs = 60000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("deb_s").start()
    def ev(id: Long, uid: Long, sec: Long) =
      DebEvent(id, uid, new Timestamp(1000000000L + sec * 1000L))
    // u1: 0s, 30s, 120s, 150s → keep 1 and 3 (raw-predecessor gaps
    // 30/90/30); second batch continues against stored state: 260s is
    // 110s after the raw last (150s) → kept; 300s is 40s after → dropped
    input.addData(ev(1, 1, 0), ev(2, 1, 30), ev(3, 1, 120), ev(4, 1, 150),
      ev(5, 2, 10))
    input.addData(ev(6, 1, 260), ev(7, 1, 300))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("deb_s").select("event_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L, 6L), s"got $kept")
    // cross-check the batch twin on the same replayed input
    val batchKept = graft.ops.Sessionize.debounce(
      Seq(ev(1, 1, 0), ev(2, 1, 30), ev(3, 1, 120), ev(4, 1, 150),
        ev(5, 2, 10), ev(6, 1, 260), ev(7, 1, 300)).toDF(),
      "user_id", "ts", "event_id", 60000L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == kept, s"batch $batchKept != stream $kept")
  }

  test("textPrepStream: quality gate + lang filter + fingerprint dedup on a stream") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = EventsStream.textPrepStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("prep_s").start()
    // longest 2-gram ("red hats" = 8 chars) over 48 chars = 0.167, safely
    // under the 0.2 top-2-gram gate
    val good = "the cat and the dog sat in a box of red hats now"
    def t(m: Long) = new Timestamp((1000 + m) * 60000L)
    input.addData(
      (1L, t(0), good),                     // keeps
      (2L, t(1), good),                     // exact dup of 1 -> dropped
      (3L, t(2), "der hund und die katze ist nicht hier gewesen heute morgen"), // German -> dropped
      (4L, t(3), "too short"),              // fails min tokens -> dropped
      (5L, t(4), good + " extra tail here"), // different fingerprint -> keeps
      // ZWSP-poisoned, double-spaced copy of 1: only the normalize stage
      // lets the fingerprint state catch it -> dropped
      (6L, t(5), good.replace(" ", "  ") + "\u200B "))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("prep_s").select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 5L), s"got $kept")
    val nTok = spark.table("prep_s")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1)
      .select("n_tokens").as[Long].head()
    assert(nTok == 13L)
  }

  test("textPrepStream decontaminates against a static eval set") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val leaked = "the cat and the dog sat in a box of red hats now"
    // one token differs -> no shared 13-gram -> must SURVIVE
    val nearMiss = "the cat and the dog sat in a box of red hats today"
    val evalSet = Seq(leaked).toDF("text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = EventsStream.textPrepStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      evalSet = Some(evalSet))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("prep_decon").start()
    def t(m: Long) = new Timestamp((1000 + m) * 60000L)
    input.addData(
      (1L, t(0), leaked),   // verbatim eval leak -> dropped
      (2L, t(1), nearMiss)) // near-miss -> survives
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("prep_decon").select("doc_id").as[Long]
      .collect().toSeq.sorted
    assert(kept == Seq(2L), s"got $kept")
  }

  test("stream-stream interval join pairs events within the time bound only") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Long) = new Timestamp((1000 + minute) * 60000L)
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = EventsStream.streamStreamJoin(
      views.toDF().toDF("event_id", "user_id", "ts"),
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      lateness = "10 minutes", withinMinutes = 10)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    views.addData((10L, 1L, ts(0)), (11L, 2L, ts(0)))
    // user 1: one click inside the 10-min bound, one outside; user 2: inside
    clicks.addData((20L, 1L, ts(5)), (21L, 1L, ts(20)), (22L, 2L, ts(3)))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ss_join").select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 20L), (11L, 22L)), s"got $pairs")
  }

  test("left-outer stream-stream join emits unmatched views after the horizon") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Long) = new Timestamp((5000 + minute) * 60000L)
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = EventsStream.streamStreamJoinOuter(
      views.toDF().toDF("event_id", "user_id", "ts"),
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      lateness = "10 minutes", withinMinutes = 10)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_outer").start()
    views.addData((10L, 1L, ts(0)), (11L, 2L, ts(0)))
    clicks.addData((20L, 1L, ts(5)))            // user 1 converts; user 2 never
    q.processAllAvailable()
    // push both watermarks far past view 11's [t0, t0+10] horizon so the
    // unmatched row must be emitted with null click columns
    views.addData((90L, 9L, ts(120)))
    clicks.addData((91L, 9L, ts(120)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join_outer")
      .filter(org.apache.spark.sql.functions.col("l_id").isin(10L, 11L))
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows == Set((10L, 20L), (11L, -1L)), s"got $rows")
  }

  test("streaming upsert sink merges batches by key into the parquet target") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-upsink-ckpt").toString
    try {
      def ts(m: Long) = new Timestamp((1000 + m) * 60000L)
      val input = MemoryStream[(Long, String, Timestamp)]
      // batch 1: keys 1, 2
      input.addData((1L, "a", ts(0)), (2L, "b", ts(1)))
      val q1 = EventsStream.startUpsertSink(
        input.toDF().toDF("k", "v", "ts"), dir + "/t", ckpt, Seq("k"))
      q1.processAllAvailable(); q1.stop()
      // batch 2: key 2 replaced, key 3 new
      input.addData((2L, "B2", ts(5)), (3L, "c", ts(6)))
      val q2 = EventsStream.startUpsertSink(
        input.toDF().toDF("k", "v", "ts"), dir + "/t", ckpt, Seq("k"))
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(dir + "/t").select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c")), s"got $got")
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("streaming incremental aggregate equals the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-incagg").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-incagg-ckpt").toString
    try {
      val b1 = Seq(("a", 1.25), ("a", 2.50), ("b", 10.00))
      val b2 = Seq(("b", 0.75), ("c", 3.00), ("a", 4.00))
      val input = MemoryStream[(String, Double)]
      input.addData(b1: _*)
      val q1 = EventsStream.startIncrementalAggSink(
        input.toDF().toDF("k", "v"), dir + "/t", ckpt, "k", "v")
      q1.processAllAvailable(); q1.stop()
      input.addData(b2: _*)
      val q2 = EventsStream.startIncrementalAggSink(
        input.toDF().toDF("k", "v"), dir + "/t", ckpt, "k", "v")
      q2.processAllAvailable(); q2.stop()
      val streamed = ops.IncrementalAgg.finish(spark.read.parquet(dir + "/t"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val recomputed = ops.IncrementalAgg.finish(ops.IncrementalAgg.aggregate(
          (b1 ++ b2).toDF("k", "v"), "k", "v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed === recomputed)
      assert(streamed === Set(("a", 3L, 7.75), ("b", 2L, 10.75), ("c", 1L, 3.0)))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("merge sink recovers from a crash inside the rename-pair swap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-crashswap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-crashswap-ckpt").toString
    try {
      val input = MemoryStream[(String, Double)]
      input.addData(("a", 1.0), ("b", 2.0))
      val q1 = EventsStream.startUpsertSink(
        input.toDF().toDF("k", "v"), dir + "/t", ckpt, Seq("k"))
      q1.processAllAvailable(); q1.stop()

      // Simulate a crash BETWEEN the two swap renames: the target has
      // been moved aside to __old but the new table never made it in,
      // and an orphan __tmp from the dead batch is still on disk.
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(dir + "/t"),
        new org.apache.hadoop.fs.Path(dir + "/t__old")))
      Seq(("zz", -1.0)).toDF("k", "v").write.parquet(dir + "/t__tmp")

      // Restart from the same checkpoint with a new batch: the repair
      // step must restore __old as the live target BEFORE merging, so
      // batch 2 folds into the pre-crash state, not an empty table.
      input.addData(("b", 20.0), ("c", 3.0))
      val q2 = EventsStream.startUpsertSink(
        input.toDF().toDF("k", "v"), dir + "/t", ckpt, Seq("k"))
      q2.processAllAvailable(); q2.stop()

      val fin = spark.read.parquet(dir + "/t")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(fin === Set(("a", 1.0), ("b", 20.0), ("c", 3.0)))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "/t__old")))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "/t__tmp")))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("upsert sink replays an uncommitted batch without duplicating rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-replay-ckpt").toString
    try {
      val input = MemoryStream[(String, Double)]
      input.addData(("a", 1.0), ("b", 2.0))
      val q1 = EventsStream.startUpsertSink(
        input.toDF().toDF("k", "v"), dir + "/t", ckpt, Seq("k"))
      q1.processAllAvailable(); q1.stop()

      // Simulate a crash AFTER the merge landed but BEFORE the
      // checkpoint persisted: lose the checkpoint wholesale, so the
      // restarted query re-delivers the already-applied batch —
      // exactly the at-least-once window foreachBatch exposes. The
      // upsert merge must converge, not append duplicates.
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator().asScala
        .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))

      val q2 = EventsStream.startUpsertSink(
        input.toDF().toDF("k", "v"), dir + "/t", ckpt, Seq("k"))
      q2.processAllAvailable(); q2.stop()

      val rows = spark.read.parquet(dir + "/t")
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(rows.length === 2, s"replayed batch duplicated rows: ${rows.toSeq}")
      assert(rows.toSet === Set(("a", 1.0), ("b", 2.0)))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("streaming SCD2 sink versions attribute changes across micro-batches") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2sink-ckpt").toString
    try {
      def ts(m: Long) = new Timestamp(m * 60000L)
      val input = MemoryStream[(Long, String, Timestamp)]
      // batch 1: k1=a (with earlier intra-batch flap to x that must NOT
      // fork history), k2=b
      input.addData((1L, "x", ts(1)), (1L, "a", ts(2)), (2L, "b", ts(2)))
      val q1 = EventsStream.startScd2Sink(
        input.toDF().toDF("k", "attr", "ts"), dir + "/dim", ckpt, "k", "attr", "ts")
      q1.processAllAvailable(); q1.stop()
      // batch 2: k1 changes to a2, k2 unchanged
      input.addData((1L, "a2", ts(10)), (2L, "b", ts(10)))
      val q2 = EventsStream.startScd2Sink(
        input.toDF().toDF("k", "attr", "ts"), dir + "/dim", ckpt, "k", "attr", "ts")
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(dir + "/dim")
        .select("k", "attr", "is_current").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
      assert(got === Set((1L, "a", false), (1L, "a2", true), (2L, "b", true)))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("stateful sessionization: gap split, merge within gap, timeout close") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionEvent
    import spark.implicits._

    // +1000 min base: ts=0 equals the initial watermark and would be
    // dropped as late data
    def ev(uid: Long, minute: Long, v: Double) =
      SessionEvent(uid, new Timestamp((1000 + minute) * 60000L), v)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = EventsStream.sessionize(input.toDF(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess").start()

    // u1: two events 10 min apart (one session), then one 60 min later
    // (closes session 1, opens session 2). u2: one lone event.
    input.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 70, 4.0), ev(2, 5, 9.0))
    q.processAllAvailable()
    // Far-future event pushes the watermark past every open timeout,
    // flushing u1's second session and u2's via EventTimeTimeout.
    input.addData(ev(3, 10000, 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess")
      .select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, 2L, 3.0)), s"u1 first session: $rows")  // gap split
    assert(rows.contains((1L, 1L, 4.0)), s"u1 timed-out session: $rows")
    assert(rows.contains((2L, 1L, 9.0)), s"u2 timed-out session: $rows")
  }

  test("declarative session_window matches the custom-state sessionizer") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionEvent
    import spark.implicits._

    def ev(uid: Long, minute: Long, v: Double) =
      SessionEvent(uid, new Timestamp((1000 + minute) * 60000L), v)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = EventsStream.sessionizeDeclarative(input.toDF(), "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess_d").start()

    // Same pattern as the custom-state test: u1 splits at the 60-min gap,
    // u2 has a lone session; the far-future event flushes everything.
    input.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 70, 4.0), ev(2, 5, 9.0))
    q.processAllAvailable()
    input.addData(ev(3, 10000, 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_d")
    val rows = out
      .select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Identical session memberships to the flatMapGroupsWithState path.
    assert(rows.contains((1L, 2L, 3.0)), s"u1 first session: $rows")
    assert(rows.contains((1L, 1L, 4.0)), s"u1 second session: $rows")
    assert(rows.contains((2L, 1L, 9.0)), s"u2 session: $rows")
    // session_close = last event + gap: u1's first session spans
    // [t0, t10 + 30min) = 40 minutes end to start.
    val span = out.filter($"user_id" === 1 && $"n_events" === 2)
      .select(($"session_close".cast("long") - $"session_start".cast("long")))
      .head().getLong(0)
    assert(span == 40 * 60, s"expected 40-min span (10 min + 30 gap), got ${span}s")
  }

  test("streaming heavy-hitters sink: k-row state, MG guarantee over the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hhsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hhsink-ckpt").toString
    try {
      // 60 "hot" + a long tail of singletons, split across two batches so
      // the guarantee must survive a merge boundary. n = 120, k = 9 ⇒
      // threshold n/(k+1) = 12; "hot" (60) must survive, undercount ≤ 12.
      val b1 = (1 to 30).map(_ => "hot") ++ (1 to 30).map(i => s"t$i")
      val b2 = (1 to 30).map(_ => "hot") ++ (31 to 60).map(i => s"t$i")
      val k = 9
      val input = MemoryStream[String]
      input.addData(b1: _*)
      val q1 = EventsStream.startHeavyHittersSink(
        input.toDF().toDF("item"), dir + "/hh", ckpt, "item", k)
      q1.processAllAvailable(); q1.stop()
      input.addData(b2: _*)
      val q2 = EventsStream.startHeavyHittersSink(
        input.toDF().toDF("item"), dir + "/hh", ckpt, "item", k)
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(dir + "/hh").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"state exceeded k rows: $got")
      val n = (b1 ++ b2).size
      val hotCnt = got.getOrElse("hot",
        fail(s"heavy item above n/(k+1) missing from summary: $got"))
      assert(hotCnt <= 60 && hotCnt >= 60 - n / (k + 1),
        s"hot counter $hotCnt outside [${60 - n / (k + 1)}, 60]")
      // every surviving counter is an undercount of the true frequency
      got.foreach { case (item, cnt) =>
        val truth = (b1 ++ b2).count(_ == item)
        assert(cnt <= truth, s"$item counter $cnt exceeds true $truth")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("streaming HLL sink: streamed registers equal the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hllsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hllsink-ckpt").toString
    try {
      // two batches with overlapping ids — idempotent max-merge must make
      // the maintained registers equal a single batch pass over the union
      val b1 = (1 to 800).map(i => ("a", i.toLong)) ++
        (1 to 50).map(i => ("b", i.toLong))
      val b2 = (400 to 1200).map(i => ("a", i.toLong)) ++
        (25 to 90).map(i => ("b", i.toLong))
      val input = MemoryStream[(String, Long)]
      input.addData(b1: _*)
      val q1 = EventsStream.startHllSink(
        input.toDF().toDF("g", "id"), dir + "/hll", ckpt, "g", "id", 8)
      q1.processAllAvailable(); q1.stop()
      input.addData(b2: _*)
      val q2 = EventsStream.startHllSink(
        input.toDF().toDF("g", "id"), dir + "/hll", ckpt, "g", "id", 8)
      q2.processAllAvailable(); q2.stop()
      val maintained = spark.read.parquet(dir + "/hll")
      // ≤ groups × m rows of state, ever
      assert(maintained.count() <= 2 * 256,
        s"register state exceeded groups×m: ${maintained.count()}")
      val streamed = graft.ops.Aggregates
        .hllEstimate(maintained, Seq("g"), p = 8)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batch = graft.ops.Aggregates
        .hllDistinct((b1 ++ b2).toDF("g", "id"), "g",
          org.apache.spark.sql.functions.col("id"), p = 8)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamed === batch,
        s"streamed $streamed != batch recompute $batch")
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
