package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Typed rows for the stateful sessionization path. */
case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
case class SessionAcc(startMs: Long, lastMs: Long, n: Long, sum: Double)
case class UserSession(user_id: Long, session_start: Timestamp,
                       session_end: Timestamp, n_events: Long, total_value: Double)
case class DebEvent(event_id: Long, user_id: Long, ts: Timestamp)

/** Structured Streaming surface — the streaming re-expression of the
  * reference's chunked CSV → append-sink loop (challenge2.py:295-298,
  * SURVEY.md §2 A4/A7): a file source drained micro-batch by micro-batch
  * into an append sink, plus watermarked window aggregation for the
  * events-shaped stream.
  */
object EventsStream {

  /** The events fixture schema with `ts` as `tsType` — streaming file
    * sources require a user-supplied schema, and fixture generations have
    * shipped `ts` both as TIMESTAMP(MICROS) (reads natively) and as
    * TIMESTAMP(NANOS) (no Spark type; under nanosAsLong it reads as
    * LongType nanos), so the type is probed from the footer at start. */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** readStream over the events parquet, `maxFilesPerTrigger` bounding each
    * micro-batch — the streaming analog of the 1M-row chunk loop (A4).
    * Streaming file sources take a DIRECTORY; the fixture dir holds other
    * tables too, so a glob filter selects just the events file(s). A one-off
    * batch read probes the footer's `ts` physical type (driver-side schema
    * inference only — no data scan) so the stream schema matches whichever
    * timestamp encoding this fixture generation carries. */
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    val probed = spark.read.option("pathGlobFilter", "events*.parquet")
      .parquet(dir).schema("ts").dataType
    val stream = spark.readStream
      .schema(rawSchema(probed))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
    probed match {
      case LongType => // nanos fixture read as long under nanosAsLong
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // naive micros fixture; sessions pin UTC,
        // so the cast is epoch-preserving (same convention as Tables)
        stream.withColumn("ts", col("ts").cast(TimestampType))
      case _ => stream
    }
  }

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

  /** Gap-based sessionization with CUSTOM STATE via flatMapGroupsWithState:
    * a session is a per-user run of events whose inter-event gap stays
    * under `gap`; a session closes when a later event exceeds the gap or
    * the event-time watermark passes lastTs+gap (EventTimeTimeout). State
    * per user is one small accumulator — bounded regardless of stream
    * length; the watermark bounds how long it lives. Output is append-mode
    * (each closed session exactly once). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 lateness: String = "30 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", lateness)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionAcc]) =>
          def toSession(a: SessionAcc) = UserSession(
            uid, new Timestamp(a.startMs), new Timestamp(a.lastMs), a.n, a.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            // Interval merge over (stored session ∪ batch events) in start
            // order: an out-of-order event arriving in a later micro-batch
            // (still within the watermark) correctly EXTENDS the open
            // session backwards (startMs is min'd) when within `gap` of
            // either boundary, and splits only when it is more than `gap`
            // away from the nearest session edge — not just from lastMs.
            val items = (state.getOption.toSeq ++
              batch.map(e => SessionAcc(e.ts.getTime, e.ts.getTime, 1, e.value)))
              .sortBy(a => (a.startMs, a.lastMs))
            var acc: SessionAcc = null
            val closed = Seq.newBuilder[UserSession]
            items.foreach { it =>
              if (acc == null) acc = it
              else if (it.startMs - acc.lastMs > gapMs) {
                closed += toSession(acc)
                acc = it
              } else acc = SessionAcc(math.min(acc.startMs, it.startMs),
                math.max(acc.lastMs, it.lastMs), acc.n + it.n, acc.sum + it.sum)
            }
            if (acc != null) {
              state.update(acc)
              // timeout must sit strictly above the current watermark
              state.setTimeoutTimestamp(
                math.max(acc.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** DECLARATIVE gap sessionization via `session_window` — the built-in
    * twin of the custom-state `sessionize` above. Spark merges windows
    * whose gap stays under `gap` inside its own session-aggregation state
    * store; no user state code, and the optimizer owns the plan (partial
    * merge before the shuffle, watermark-driven eviction after it).
    *
    * Semantics difference vs `sessionize`, by construction:
    * `session_window.end` = last event ts + gap (the close horizon),
    * whereas the custom operator reports the LAST EVENT time. Counts,
    * sums, and session boundaries (start, membership) are identical —
    * spec-checked against `sessionize` on the same stream. Prefer this
    * path when per-session output columns are aggregations; drop to
    * `sessionize` only when the per-session logic needs arbitrary code
    * (e.g. emitting mid-session milestones). */
  def sessionizeDeclarative(events: DataFrame, gap: String = "30 minutes",
                            lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).alias("n_events"), sum(col("value")).alias("total_value"))
      .select(col("user_id"),
        col("session_window.start").alias("session_start"),
        col("session_window.end").alias("session_close"),
        col("n_events"), col("total_value"))

  /** Sessionization-lite: per-user running event count via
    * flatMapGroupsWithState would be the stateful path; the declarative
    * variant (per-user windowed counts) covers the fixture semantics. */
  def perUserActivity(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), window_), col("user_id"))
      .agg(count(lit(1)).alias("n_events"))
      .select(col("window.start").alias("w_start"), col("user_id"), col("n_events"))

  /** Watermarked stream-stream INNER join: pair each left event with the
    * right events of the same user falling in [left.ts, left.ts + within].
    * Both sides carry watermarks AND the join predicate bounds event time
    * relative to the other side, which is exactly what lets Spark compute a
    * state-eviction horizon for BOTH buffers — without the time bound a
    * stream-stream join must buffer each side forever. This is the
    * attribution-join shape (view → click within N minutes) that at 100 TB
    * must never hold unbounded state. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       lateness: String = "30 minutes",
                       withinMinutes: Int = 10,
                       joinType: String = "inner"): DataFrame = {
    val l = left.select(col("event_id").alias("l_id"), col("user_id"),
      col("ts").alias("l_ts"))
      .withWatermark("l_ts", lateness)
    val r = right.select(col("event_id").alias("r_id"),
      col("user_id").alias("r_user"), col("ts").alias("r_ts"))
      .withWatermark("r_ts", lateness)
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
      joinType)
      .select(col("l_id"), col("r_id"), col("user_id"), col("l_ts"), col("r_ts"))
  }

  /** Left-outer variant of the attribution join: unmatched left events
    * (a view with NO click inside the bound) still emit — with null
    * right columns — once the watermark proves no match can arrive.
    * Same bounded state as the inner join; the only extra cost is that
    * left rows are held until the horizon passes even when matched.
    * This is the shape for conversion-rate pipelines, where the
    * non-converting majority is the signal. */
  def streamStreamJoinOuter(left: DataFrame, right: DataFrame,
                            lateness: String = "30 minutes",
                            withinMinutes: Int = 10): DataFrame =
    streamStreamJoin(left, right, lateness, withinMinutes, "leftOuter")

  /** Streaming face of the LLM text-prep stack: quality gate (with the
    * repetition bounds) → language filter → benchmark DECONTAMINATION
    * against a static eval set → EXACT dedup by content fingerprint
    * within the watermark horizon → token count. All the filters are
    * stateless row predicates (the same Column expressions as the batch
    * operators, kernels included — streaming reuses them unchanged); the
    * only state is the dedup's fingerprint set, bounded by the watermark
    * — the only dedup that runs forever. Input must carry (`idCol`,
    * `ts`, `textCol`).
    *
    * Decontamination is a stream-STATIC broadcast: the eval set's
    * distinct 13-gram hashes are packed into one static row, broadcast,
    * and each streaming document drops iff any of its shingle hashes
    * overlaps — stateless, so it adds no watermark pressure. The
    * arrays_overlap probe is O(|eval|)-ish per doc (vs the batch
    * operator's exploded semi-join); that is the right streaming trade —
    * a per-batch explode+join would rebuild the probe side every
    * micro-batch, and eval sets are small by definition. */
  def textPrepStream(docs: DataFrame, idCol: String, textCol: String,
                     lateness: String = "30 minutes",
                     evalSet: Option[DataFrame] = None,
                     evalTextCol: String = "text",
                     shingleN: Int = 13): DataFrame = {
    // Canonicalize FIRST (NFC + invisible strip + whitespace collapse —
    // the same narrow exprs as batch): every downstream gate and the
    // dedup fingerprint then see one representation, so a ZWSP-poisoned
    // duplicate cannot slip past the fingerprint state. Identity on
    // already-clean text; stateless.
    val canon = docs.withColumn(textCol,
      graft.ops.TextAnalysis.normalizeText(col(textCol)))
    val gated = canon
      .filter(graft.ops.TextAnalysis.qualityKeep(col(textCol), minTokens = 8,
        maxTokens = 100000, minStopRatio = 0.01,
        maxDupLineRatio = 0.2, maxTopNgramCharRatio = 0.2))
      .filter(graft.ops.TextAnalysis.langId(col(textCol)) === "en")
    val decontaminated = evalSet.fold(gated) { ev =>
      val evalHashes = ev
        .select(explode(graft.functions.MinHashSig.shingle_hashes(
          split(col(evalTextCol), " "), shingleN)).alias("__h"))
        .agg(collect_set(col("__h")).alias("__eval"))
      gated.crossJoin(broadcast(evalHashes))
        .filter(!arrays_overlap(
          graft.functions.MinHashSig.shingle_hashes(
            split(col(textCol), " "), shingleN), col("__eval")))
        .drop("__eval")
    }
    decontaminated
      .withColumn("__fp", graft.ops.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("__fp")
      .select(col(idCol), col("ts"),
        graft.ops.TextAnalysis.tokenCount(col(textCol)).cast("long")
          .alias("n_tokens"))
  }

  /** Streaming DEBOUNCE — the streaming face of `ops/Sessionize.debounce`
    * (same raw-predecessor gap semantics): an event is dropped when it
    * falls within `minGapMs` of the same key's previous event. State per
    * key is ONE timestamp (the last raw event time), expired by the
    * event-time watermark once no in-horizon event can precede it.
    * Within a micro-batch events are judged in (ts, event_id) order, so
    * replaying a backlog through arbitrary batch boundaries yields the
    * batch operator's answer for in-order input. */
  def debounceStream(events: DataFrame, minGapMs: Long,
                     lateness: String = "30 minutes"): Dataset[DebEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", lateness)
      .as[DebEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, DebEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, batch: Iterator[DebEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption.getOrElse(Long.MinValue)
            val out = Seq.newBuilder[DebEvent]
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (last == Long.MinValue || t - last > minGapMs) out += e
              last = t // raw-predecessor semantics: every event advances
            }
            state.update(last)
            state.setTimeoutTimestamp(
              math.max(last, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop repeated ids with state bounded by the
    * watermark (ids older than the lateness horizon are forgotten — the
    * only dedup that runs forever). The streaming face of the batch dedup
    * suite (SURVEY.md §2 C2 / ScaleDedup). */
  def dedupStream(events: DataFrame, idCol: String,
                  lateness: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** Append-mode memory sink, drained synchronously — the local smoke path
    * (batch parquet drives the stream; processAllAvailable = "run the whole
    * backlog"). Returns the started query; caller stops it. */
  def startMemorySink(df: DataFrame, name: String): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming UPSERT sink via foreachBatch: merge each micro-batch into a
    * parquet target by key (`Joins.upsert` — matched keys replaced,
    * new keys appended), the sink shape that makes a streaming pipeline
    * idempotent under replays: re-delivering a batch converges to the same
    * target instead of duplicating rows. Each batch must carry unique keys
    * (dropDuplicates upstream if needed).
    *
    * Target existence is decided by a filesystem check, NOT by whether the
    * read succeeds: a transient read error (corrupt footer, FS hiccup) must
    * FAIL the batch and be retried from the checkpoint — treating it as
    * "no target yet" would overwrite the target with only the current
    * batch, silently dropping every previously merged row.
    *
    * The merged result is written to a sibling temp dir and swapped in via
    * two metadata renames (target → __old, __tmp → target) instead of an
    * in-place overwrite: the full rewrite window, during which a crash
    * previously lost the target, shrinks to the rename pair, and a crash
    * inside that pair is repaired on the next batch (a missing target with
    * a __old sibling restores __old first). Renames also mean the merge
    * job reads the old target while writing elsewhere — no cache-and-
    * count materialization hack, no recompute-from-deleted-input failure
    * mode. A plain parquet dir is still not transactional; production
    * deployments put an ACID table format under this exact dataflow. */
  def startUpsertSink(df: DataFrame, targetDir: String, checkpoint: String,
                      keys: Seq[String]): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeReplace(batch.sparkSession, targetDir) {
          case Some(existing) => graft.ops.Joins.upsert(existing, batch.toDF(), keys)
          case None => batch.toDF()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Crash-safe maintained-table replace shared by the merging sinks:
    * compute `merge(existing)` (None ⇔ the target genuinely does not
    * exist — read errors on an existing target FAIL the batch rather
    * than silently restarting the table), write it to a temp path, then
    * swap via the rename pair. A crash between the two renames leaves
    * the previous state in __old (or an orphan __tmp); the repair step
    * restores it before deciding existence, so the batch replay sees the
    * pre-crash table. */
  private def mergeReplace(sp: SparkSession, targetDir: String)
                          (merge: Option[DataFrame] => DataFrame): Unit = {
    val target = new org.apache.hadoop.fs.Path(targetDir)
    val tmp = new org.apache.hadoop.fs.Path(targetDir + "__tmp")
    val old = new org.apache.hadoop.fs.Path(targetDir + "__old")
    val fs = target.getFileSystem(sp.sparkContext.hadoopConfiguration)
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val merged =
      if (fs.exists(target)) merge(Some(sp.read.parquet(targetDir)))
      else merge(None)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"merge sink: rename $target -> $old failed")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"merge sink: rename $tmp -> $target failed")
    fs.delete(old, true)
    ()
  }

  /** Streaming materialized-view maintenance: fold each micro-batch
    * through `ops.IncrementalAgg` into a maintained per-key state table
    * (count + exact DECIMAL sum) — the streaming twin of the batch
    * delta-maintenance query. Each batch costs one batch-sized
    * aggregation plus a state-sized merge through the same crash-safe
    * swap as the upsert sink; because the state moments are associative
    * and commutative, a replayed batch boundary re-derives the identical
    * table the batch recompute would produce (spec-checked). */
  def startIncrementalAggSink(df: DataFrame, targetDir: String,
                              checkpoint: String, key: String,
                              valueCol: String): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val delta = graft.ops.IncrementalAgg.aggregate(batch.toDF(), key, valueCol)
        mergeReplace(batch.sparkSession, targetDir) {
          case Some(existing) => graft.ops.IncrementalAgg.merge(Seq(existing, delta))
          case None => delta
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming heavy-hitters maintenance: fold each micro-batch's exact
    * item counts into a maintained Misra-Gries summary table of at most
    * `k` rows via `Aggregates.mgMergeTables` and the crash-safe swap.
    * State on disk is k rows FOREVER — unlike a maintained exact count
    * table, the vocabulary of an unbounded stream never accumulates —
    * and the summary keeps the MG guarantee over the whole stream: any
    * item with true frequency > n/(k+1) is present, counters undercount
    * by at most n/(k+1). The per-batch exact count is batch-vocab-sized
    * (bounded by the micro-batch), so no step holds stream-lifetime
    * state outside the k-row table. Pair with a periodic exact rescore
    * over candidates (see `Aggregates.exactHeavyHitters`) when exact
    * final counts matter. */
  def startHeavyHittersSink(df: DataFrame, targetDir: String,
                            checkpoint: String, itemCol: String,
                            k: Int): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val delta = batch.toDF().filter(col(itemCol).isNotNull)
          .groupBy(col(itemCol).alias("item"))
          .agg(count(lit(1)).alias("cnt"))
        mergeReplace(batch.sparkSession, targetDir) {
          case Some(summary) => graft.ops.Aggregates.mgMergeTables(summary, delta, k)
          case None => graft.ops.Aggregates.mgMergeTables(delta.limit(0), delta, k)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming HLL distinct-count maintenance: each micro-batch's
    * register deltas (`Aggregates.hllRegisters`) max-merge into a
    * maintained per-group register table via the crash-safe swap. State
    * on disk is ≤ groups×m rows FOREVER — the id universe of an
    * unbounded stream never accumulates — and because max is
    * associative, commutative, AND idempotent, the maintained table
    * equals a batch recompute over the whole history regardless of
    * micro-batch boundaries or replays (idempotence makes redelivered
    * batches harmless — a guarantee the count-based MG summary can't
    * make). Read the estimate off the table any time with
    * `Aggregates.hllEstimate`. */
  def startHllSink(df: DataFrame, targetDir: String, checkpoint: String,
                   group: String, valueCol: String, p: Int): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val delta = graft.ops.Aggregates.hllRegisters(batch.toDF(),
          Seq(group), col(valueCol), p)
        mergeReplace(batch.sparkSession, targetDir) {
          case Some(regs) =>
            graft.ops.Aggregates.hllRollup(regs.unionByName(delta), Seq(group))
          case None => delta
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming SCD2 dimension maintenance: each micro-batch of (key,
    * attr, ts) observations is collapsed to its latest row per key (the
    * micro-batch is the versioning granularity — intra-batch flapping
    * does not fork history) and folded into the maintained dimension via
    * `ops.Scd.scd2Apply` through the crash-safe swap. Only the CURRENT
    * slice is compared per batch; closed history streams through
    * untouched, so per-batch cost is batch + current-slice, not the
    * dimension's full history. */
  def startScd2Sink(df: DataFrame, targetDir: String, checkpoint: String,
                    key: String, attr: String, ts: String): StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(key).orderBy(col(ts).desc)
        val latest = batch.toDF()
          .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        mergeReplace(batch.sparkSession, targetDir) {
          case Some(dim) => graft.ops.Scd.scd2Apply(dim, latest, key, attr, ts)
          case None => graft.ops.Scd.scd2Build(latest, key, attr, ts, ts)
        }
      }
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
