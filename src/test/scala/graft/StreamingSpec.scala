package graft

import graft.ops.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, value: Double, event_type: String)

/** Structured Streaming twins (SURVEY §3.3, §5.2-1): the SAME aggregation
  * functions that back the batch contract queries, driven by MemoryStream
  * micro-batches, including watermark/late-data semantics (L6).
  */
class StreamingSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  private def t(str: String) = Timestamp.valueOf(str)

  test("L1 twin: streaming tumbling agg equals batch on identical data") {
    implicit val ctx = s.sqlContext
    val data = Seq(
      Ev(t("2024-01-01 00:05:00"), 1, 10.0, "view"),
      Ev(t("2024-01-01 00:55:00"), 2, 5.5, "click"),
      Ev(t("2024-01-01 01:30:00"), 1, 2.25, "view"))
    val ms = MemoryStream[Ev]
    val q = Streaming.tumblingAgg(ms.toDF()).writeStream
      .format("memory").queryName("t_tumble").outputMode("complete").start()
    ms.addData(data: _*)
    q.processAllAvailable()
    val streamed = s.table("t_tumble")
      .selectExpr("window.start AS ws", "n", "sum_value").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    val batch = Streaming.tumblingAgg(data.toDF())
      .selectExpr("window.start AS ws", "n", "sum_value").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.size == 2) // hour 0 (2 events), hour 1 (1 event)
  }

  test("L16 twin: streaming OHLC bars equal batch, open/close pick the time ends") {
    implicit val ctx = s.sqlContext
    // ts-unique per (hour, type) so min_by/max_by need no tiebreak
    val data = Seq(
      Ev(t("2024-01-01 00:05:00"), 1, 10.0, "view"),
      Ev(t("2024-01-01 00:20:00"), 2, 2.0, "view"),
      Ev(t("2024-01-01 00:50:00"), 3, 7.5, "view"),
      Ev(t("2024-01-01 00:30:00"), 4, 99.0, "click"),
      Ev(t("2024-01-01 01:10:00"), 1, 4.0, "view"))
    val ms = MemoryStream[Ev]
    val q = Streaming.ohlcAgg(ms.toDF()).writeStream
      .format("memory").queryName("t_ohlc").outputMode("complete").start()
    ms.addData(data: _*)
    q.processAllAvailable()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("window.start AS ws", "event_type", "open", "high", "low", "close", "n_events")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    val streamed = canon(s.table("t_ohlc"))
    q.stop()
    val batch = canon(Streaming.ohlcAgg(data.toDF()))
    assert(streamed == batch)
    // hour-0 view bar: open = value at 00:05, close = value at 00:50
    val bar = streamed.find(b => b._2 == "view" && b._1.startsWith("2024-01-01 00")).get
    assert(bar._3 == 10.0 && bar._6 == 7.5 && bar._4 == 10.0 && bar._5 == 2.0 && bar._7 == 3L)
  }

  test("L7 twin: streaming dropDuplicates keeps first arrival per key") {
    implicit val ctx = s.sqlContext
    val data = Seq(
      Ev(t("2024-01-01 00:05:00"), 1, 10.0, "view"),
      Ev(t("2024-01-01 00:06:00"), 1, 11.0, "view"),  // dup key, later
      Ev(t("2024-01-01 00:07:00"), 1, 12.0, "click"),
      Ev(t("2024-01-01 00:08:00"), 2, 13.0, "view"),
      Ev(t("2024-01-01 00:09:00"), 2, 14.0, "view")) // dup key, later
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    ms.addData(data: _*)
    q.processAllAvailable()
    val streamed = s.table("t_dedup")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
    q.stop()
    // time-ordered arrival → keep-first-arrival == keep-earliest-by-ts,
    // the batch contract of stream_dedup_keep_first
    assert(streamed == Set(
      (1L, "view", t("2024-01-01 00:05:00")),
      (1L, "click", t("2024-01-01 00:07:00")),
      (2L, "view", t("2024-01-01 00:08:00"))))
  }

  test("L8 twin: mapGroupsWithState accumulates state across micro-batches") {
    implicit val ctx = s.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streaming.statefulCount(ms.toDF())
      .writeStream.format("memory").queryName("t_state")
      .outputMode("update").start()
    ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:02:00"), 1, 1.0, "click"),
      Ev(t("2024-01-01 00:03:00"), 2, 1.0, "view"))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:04:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:05:00"), 2, 1.0, "view"))
    q.processAllAvailable()
    // update-mode memory sink appends one row per key per trigger; the
    // running maximum per key is the accumulated state
    val finalCounts = s.table("t_state").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    q.stop()
    assert(finalCounts == Map(1L -> 3L, 2L -> 2L))
  }

  test("L9 twin: flatMapGroupsWithState sessionizer closes on gap and on timeout") {
    implicit val ctx = s.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streaming.sessionizeCustom(
        ms.toDF()
          .withColumn("ts_us", org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp))"))
          .withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("t_sess_custom")
      .outputMode("append").start()
    // user 1: two events 5 min apart (one session), then a 40-min gap event
    // → first session closes on GAP when the third event arrives
    ms.addData(Ev(t("2024-01-01 00:00:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:05:00"), 1, 1.0, "view"))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:45:00"), 1, 1.0, "view"))
    q.processAllAvailable()
    // advance the watermark far past 00:45 + 30min via another user
    // → user 1's open session closes on TIMEOUT
    ms.addData(Ev(t("2024-01-01 02:00:00"), 2, 1.0, "view"))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 03:00:00"), 2, 1.0, "view"))
    q.processAllAvailable()
    val rows = s.table("t_sess_custom")
      .selectExpr("user_id", "start_us", "end_us", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    q.stop()
    def us(str: String) = t(str).getTime * 1000L
    val gapClosed = (1L, us("2024-01-01 00:00:00"), us("2024-01-01 00:35:00"), 2)
    val timeoutClosed = (1L, us("2024-01-01 00:45:00"), us("2024-01-01 01:15:00"), 1)
    assert(rows.contains(gapClosed), s"gap-close missing in $rows")
    assert(rows.contains(timeoutClosed), s"timeout-close missing in $rows")
  }

  test("L9 v2: transformWithState sessionizer closes on gap and on TIMER expiry") {
    implicit val ctx = s.sqlContext
    val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = Streaming.sessionizeV2(
          ms.toDF()
            .withColumn("ts_us", org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp))"))
            .withWatermark("ts", "0 seconds"))
        .writeStream.format("memory").queryName("t_sess_v2")
        .outputMode("append").start()
      // same scenario as the fMGWS L9 twin: gap-close then timer-close
      ms.addData(Ev(t("2024-01-01 00:00:00"), 1, 1.0, "view"),
        Ev(t("2024-01-01 00:05:00"), 1, 1.0, "view"))
      q.processAllAvailable()
      ms.addData(Ev(t("2024-01-01 00:45:00"), 1, 1.0, "view"))
      q.processAllAvailable()
      // watermark far past 00:45+30m → user 1's open session closes on the
      // registered event-time TIMER (handleExpiredTimer), not on new input
      ms.addData(Ev(t("2024-01-01 02:00:00"), 2, 1.0, "view"))
      q.processAllAvailable()
      ms.addData(Ev(t("2024-01-01 03:00:00"), 2, 1.0, "view"))
      q.processAllAvailable()
      val rows = s.table("t_sess_v2")
        .selectExpr("user_id", "start_us", "end_us", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      q.stop()
      def us(str: String) = t(str).getTime * 1000L
      val gapClosed = (1L, us("2024-01-01 00:00:00"), us("2024-01-01 00:35:00"), 2)
      val timerClosed = (1L, us("2024-01-01 00:45:00"), us("2024-01-01 01:15:00"), 1)
      assert(rows.contains(gapClosed), s"gap-close missing in $rows")
      assert(rows.contains(timerClosed), s"timer-close missing in $rows")
    } finally saved match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("L10 TTL: ValueState expires between micro-batches, count restarts") {
    // Poll the sink, do NOT processAllAvailable: in ProcessingTime
    // time-mode the TTL machinery keeps scheduling micro-batches, so the
    // "all available processed" condition never settles — but real data
    // still lands in the memory table within a batch or two, and no-data
    // batches emit nothing in update mode. (Trigger.AvailableNow is no
    // escape either: its MultiBatchExecutor trips a planner NPE in
    // TransformWithStateExec metric init on this Spark build.)
    implicit val ctx = s.sqlContext
    val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = Streaming.statefulCountV2Ttl(ms.toDF(), ttlMillis = 1500)
        .writeStream.format("memory").queryName("t_state_ttl")
        .outputMode("update").start()
      def awaitRow(n: Long, timeoutMs: Long = 60000): Unit = {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        while (s.table("t_state_ttl").where(s"user_id = 1 AND n_events = $n").isEmpty) {
          assert(System.nanoTime() < deadline, s"(1, $n) never reached the sink")
          Thread.sleep(200)
        }
      }
      ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
        Ev(t("2024-01-01 00:02:00"), 1, 1.0, "click"))
      awaitRow(2) // first batch counts user 1 → 2
      Thread.sleep(4000) // 1.5 s TTL, 4 s wait: state well past expiry
      ms.addData(Ev(t("2024-01-01 00:10:00"), 1, 1.0, "view"))
      awaitRow(1) // expired state reads absent → count RESTARTS at 1
      val all = s.table("t_state_ttl").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      q.stop()
      assert(!all.contains((1L, 3L)), s"state survived past its TTL: $all")
    } finally saved match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("L10 list/map state: ring trims to 3, map counts persist across batches") {
    implicit val ctx = s.sqlContext
    val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = Streaming.statefulProfileV2(ms.toDF())
        .writeStream.format("memory").queryName("t_profile_v2")
        .outputMode("update").start()
      ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
        Ev(t("2024-01-01 00:02:00"), 1, 2.0, "click"))
      q.processAllAvailable()
      // batch 1: 2 distinct types, ring holds 2
      ms.addData(Ev(t("2024-01-01 00:03:00"), 1, 3.0, "view"),
        Ev(t("2024-01-01 00:04:00"), 1, 4.0, "error"))
      q.processAllAvailable()
      val rows = s.table("t_profile_v2").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
      q.stop()
      assert(rows.contains((1L, 2, 2)), s"first-batch profile missing in $rows")
      // batch 2: map remembers view+click, adds error → 3 types; the
      // 4-value ring is trimmed to the LAST 3
      assert(rows.contains((1L, 3, 3)), s"cross-batch map/list state missing in $rows")
    } finally saved match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("L10 twin: transformWithState (state v2) accumulates across micro-batches") {
    implicit val ctx = s.sqlContext
    val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store in streaming
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = Streaming.statefulCountV2(ms.toDF())
        .writeStream.format("memory").queryName("t_state_v2")
        .outputMode("update").start()
      ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
        Ev(t("2024-01-01 00:02:00"), 1, 1.0, "click"),
        Ev(t("2024-01-01 00:03:00"), 2, 1.0, "view"))
      q.processAllAvailable()
      ms.addData(Ev(t("2024-01-01 00:04:00"), 1, 1.0, "view"))
      q.processAllAvailable()
      val finalCounts = s.table("t_state_v2").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      q.stop()
      assert(finalCounts == Map(1L -> 3L, 2L -> 1L))
    } finally saved match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("L6 watermark: late event beyond watermark is dropped (append mode)") {
    implicit val ctx = s.sqlContext
    val ms = MemoryStream[Ev]
    val q = Streaming.watermarkedAgg(ms.toDF()).writeStream
      .format("memory").queryName("t_wm").outputMode("append").start()
    // batch 1: one event in hour 0, one in hour 1 → watermark becomes 01:20
    ms.addData(Ev(t("2024-01-01 00:05:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 01:30:00"), 1, 1.0, "view"))
    q.processAllAvailable()
    // batch 2: watermark 01:20 > hour-0 end → hour-0 window finalized (n=1)
    ms.addData(Ev(t("2024-01-01 02:30:00"), 1, 1.0, "view"))
    q.processAllAvailable()
    // batch 3: late hour-0 event, far behind watermark (02:20) → dropped
    ms.addData(Ev(t("2024-01-01 00:20:00"), 1, 999.0, "view"))
    q.processAllAvailable()
    val rows = s.table("t_wm")
      .selectExpr("window.start AS ws", "event_type", "n").collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    q.stop()
    val hour0 = rows.filter(_._1.startsWith("2024-01-01 00:"))
    assert(hour0.length == 1, s"hour-0 emitted once, got: ${rows.mkString(", ")}")
    assert(hour0.head._3 == 1, "late event must NOT be counted")
  }

  test("L3 twin: streaming session windows close at watermark and match batch") {
    implicit val ctx = s.sqlContext
    val early = Seq(
      Ev(t("2024-01-01 00:00:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:10:00"), 1, 2.0, "view"),
      Ev(t("2024-01-01 01:00:00"), 1, 3.0, "view"))
    val ms = MemoryStream[Ev]
    val q = Streaming.sessionAgg(ms.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("t_sess").outputMode("append").start()
    ms.addData(early: _*)
    q.processAllAvailable()
    // push watermark far ahead so both user-1 sessions close
    ms.addData(Ev(t("2024-01-01 05:00:00"), 2, 0.0, "view"))
    q.processAllAvailable()
    val streamed = s.table("t_sess").where("user_id = 1")
      .selectExpr("session_window.start AS ss", "session_window.end AS se", "n", "sum_value")
      .collect().map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2))).toSet
    q.stop()
    val batch = Streaming.sessionAgg(early.toDF())
      .selectExpr("session_window.start AS ss", "session_window.end AS se", "n", "sum_value")
      .collect().map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.size == 2) // [00:00,00:40) with 2 events; [01:00,01:30) with 1
  }

  test("streaming parquet file sink with checkpoint round-trips") {
    implicit val ctx = s.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.5, "view"),
      Ev(t("2024-01-01 00:02:00"), 2, 2.5, "click"))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:03:00"), 3, 3.5, "view"))
    q.processAllAvailable()
    q.stop()
    val back = s.read.parquet(out)
    assert(back.count() == 3)
    assert(back.selectExpr("sum(value)").head().getDouble(0) == 7.5)
  }

  test("checkpoint RESTART: a NEW query on the same checkpoint resumes exactly-once") {
    implicit val ctx = s.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_restart_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt").toString
    val ms = MemoryStream[Ev]
    def start() = ms.toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:02:00"), 2, 2.0, "view"))
    q1.processAllAvailable()
    q1.stop()
    // data arriving while NO query runs — recovery must pick it up, the
    // committed prefix must NOT be re-emitted (the whole point of the
    // checkpoint in a 100 TB pipeline: a crashed writer restarts without
    // duplicating or losing rows)
    ms.addData(Ev(t("2024-01-01 00:03:00"), 3, 4.0, "view"))
    val q2 = start()
    ms.addData(Ev(t("2024-01-01 00:04:00"), 4, 8.0, "view"))
    q2.processAllAvailable()
    q2.stop()
    val back = s.read.parquet(out)
    // exactly-once: 4 distinct users, each exactly once, nothing lost
    assert(back.count() == 4, s"expected 4 rows exactly-once, got ${back.count()}")
    assert(back.select("user_id").distinct().count() == 4)
    assert(back.selectExpr("sum(value)").head().getDouble(0) == 15.0)
  }

  test("checkpoint RECOVERY (fMGWS): per-key STATE survives a stop/restart exactly-once") {
    // VERDICT r6 #4: the previous restart test proved OFFSET recovery on a
    // stateless sink; this one proves the STATE STORE itself recovers — a
    // flatMapGroupsWithState running count must resume from its
    // checkpointed per-key value, not restart at zero, and committed
    // batches must not re-emit.
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val ctx = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fmgws_ckpt").toString
    val ms = MemoryStream[Ev]
    val emitted = new scala.collection.concurrent.TrieMap[(Long, Long, Long), Unit]
    def start() = ms.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator((uid, n))
        })
      .toDF("user_id", "n")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.collect().foreach(r => emitted.put((batchId, r.getLong(0), r.getLong(1)), ()))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    val q1 = start()
    ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:02:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:03:00"), 2, 1.0, "view"))
    q1.processAllAvailable()
    q1.stop() // "crash" after batch 0 committed
    // arrives while NO query runs
    ms.addData(Ev(t("2024-01-01 00:04:00"), 1, 1.0, "view"))
    val q2 = start() // NEW query object, same checkpoint
    q2.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:05:00"), 2, 1.0, "view"))
    q2.processAllAvailable()
    q2.stop()
    val keys = emitted.keySet.toSet
    // state recovered: user 1 continues 2 -> 3 (not restarting at 1),
    // user 2 continues 1 -> 2, each in a post-restart batch
    assert(keys.exists(k => k._2 == 1L && k._3 == 3L && k._1 > 0), s"user 1 must resume at 3: $keys")
    assert(keys.exists(k => k._2 == 2L && k._3 == 2L && k._1 > 0), s"user 2 must resume at 2: $keys")
    assert(!keys.exists(k => k._3 == 1L && k._2 == 1L && k._1 > 0),
      s"user 1 must never restart from zero after recovery: $keys")
    // exactly-once: the committed batch-0 outputs appear under batch 0 only
    assert(keys.count(k => k._2 == 1L && k._3 == 2L) == 1, s"batch-0 output re-emitted: $keys")
  }

  test("checkpoint RECOVERY (transformWithState): RocksDB state survives restart exactly-once") {
    // The same stop/restart protocol over the state-v2 processor: the
    // RocksDB-backed ValueState must reload from the checkpoint's state
    // snapshot + changelog and continue counting.
    implicit val ctx = s.sqlContext
    val saved = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
      val ms = MemoryStream[Ev]
      val emitted = new scala.collection.concurrent.TrieMap[(Long, Long, Long), Unit]
      def start() = Streaming.statefulCountV2(ms.toDF())
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          df.collect().foreach(r => emitted.put((batchId, r.getLong(0), r.getLong(1)), ()))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
        Ev(t("2024-01-01 00:02:00"), 1, 1.0, "click"),
        Ev(t("2024-01-01 00:03:00"), 2, 1.0, "view"))
      q1.processAllAvailable()
      q1.stop()
      ms.addData(Ev(t("2024-01-01 00:04:00"), 1, 1.0, "view"),
        Ev(t("2024-01-01 00:05:00"), 2, 1.0, "view"))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val keys = emitted.keySet.toSet
      assert(keys.exists(k => k._2 == 1L && k._3 == 3L && k._1 > 0), s"user 1 must resume at 3: $keys")
      assert(keys.exists(k => k._2 == 2L && k._3 == 2L && k._1 > 0), s"user 2 must resume at 2: $keys")
      assert(!keys.exists(k => k._1 > 0 && k._3 <= 1L),
        s"no key may restart from zero after recovery: $keys")
      assert(keys.count(k => k._2 == 1L && k._3 == 2L) == 1, s"batch-0 output re-emitted: $keys")
    } finally saved match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("M27 streaming twin: per-micro-batch MERGE equals the batch merge") {
    implicit val ctx = s.sqlContext
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    // the SAME classify body as batch pipeline_incremental_merge, driven
    // per micro-batch via foreachBatch against a parquet corpus table —
    // the daily-crawl-as-a-stream idiom (VERDICT r3 #3)
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), col("source"), graft.ops.TextAnalysis.contentFp.as("fp"))
    val existing = docs.where(col("doc_id") % 2 === 0).cache()
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    existing.write.mode("overwrite").parquet(corpusDir)
    val audit = scala.collection.concurrent.TrieMap.empty[String, Long]
    val ms = MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("doc_id", "source", "fp").writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val classified = graft.ops.TextAnalysis
          .classifyMergeBatch(df, s.read.parquet(corpusDir)).cache()
        // materialize (audit) BEFORE appending, so the corpus read under
        // the cached join never races the corpus write below
        classified.groupBy("action").count().collect().foreach { r =>
          val k = r.getString(0)
          audit.put(k, audit.getOrElse(k, 0L) + r.getLong(1))
        }
        classified.where("action = 'insert'")
          .select("doc_id", "source", "fp")
          .write.mode("append").parquet(corpusDir)
        classified.unpersist(); ()
      }
      .start()
    // today's crawl arrives as two ordered micro-batches (doc_id order, so
    // first-seen == lowest doc_id, matching the batch keep-first contract)
    val crawl = docs.where(col("doc_id") % 3 === 0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val (half1, half2) = crawl.splitAt(crawl.length / 2)
    ms.addData(half1.toSeq)
    q.processAllAvailable()
    ms.addData(half2.toSeq)
    q.processAllAvailable()
    q.stop()
    // batch reference on identical data
    val batchAudit = run("pipeline_incremental_merge").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts and total drops must agree exactly; a collision SPANNING the
    // two micro-batches classifies as `dup` (corpus hit) where the one-shot
    // batch says `batch_dup` — same kept set, so compare the drop total
    assert(audit.getOrElse("insert", 0L) == batchAudit.getOrElse("insert", 0L),
      s"insert mismatch: stream=$audit batch=$batchAudit")
    assert(
      audit.getOrElse("dup", 0L) + audit.getOrElse("batch_dup", 0L) ==
        batchAudit.getOrElse("dup", 0L) + batchAudit.getOrElse("batch_dup", 0L),
      s"drop-total mismatch: stream=$audit batch=$batchAudit")
    // cross-batch keep-first: the final curated corpus is exactly
    // existing ∪ first-seen crawl inserts — same set the batch merge keeps
    val expected = graft.ops.TextAnalysis
      .classifyMergeBatch(docs.where(col("doc_id") % 3 === 0), existing)
      .where("action = 'insert'").select("doc_id")
      .unionAll(existing.select("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val got = s.read.parquet(corpusDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"corpus diverged: missing=${expected -- got} extra=${got -- expected}")
    existing.unpersist()
  }

  test("foreachBatch sink: custom handler sees each micro-batch exactly once") {
    implicit val ctx = s.sqlContext
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => {
        seen.synchronized { seen += ((id, df.count())) }; ()
      })
      .start()
    ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:02:00"), 2, 2.0, "view"))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:03:00"), 3, 3.0, "view"))
    q.processAllAvailable()
    q.stop()
    assert(seen.map(_._2).toList == List(2L, 1L), seen.mkString(","))
  }

  test("custom state: flatMapGroupsWithState keeps per-user running counts") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val ctx = s.sqlContext
    val ms = MemoryStream[Ev]
    val counted = ms.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator((uid, n))
        })
      .toDF("user_id", "n")
    val q = counted.writeStream.format("memory")
      .queryName("t_state").outputMode("update").start()
    ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:02:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:03:00"), 2, 1.0, "view"))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:04:00"), 1, 1.0, "view"))
    q.processAllAvailable()
    val byBatch = s.table("t_state").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    // state carried across micro-batches: user 1 reaches 3 in batch 2
    assert(byBatch.contains((1L, 2L)) && byBatch.contains((1L, 3L)))
    assert(byBatch.contains((2L, 1L)))
  }

  test("streaming exact dedup: dropDuplicates removes cross-batch repeats") {
    implicit val ctx = s.sqlContext
    case class IdEv(event_id: Long, ts: Timestamp, value: Double)
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val deduped = ms.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("t_dedup").outputMode("append").start()
    ms.addData((1L, t("2024-01-01 00:01:00"), 1.0), (2L, t("2024-01-01 00:02:00"), 2.0))
    q.processAllAvailable()
    // same event_id again in a later batch → state suppresses it
    ms.addData((1L, t("2024-01-01 00:10:00"), 99.0), (3L, t("2024-01-01 00:11:00"), 3.0))
    q.processAllAvailable()
    val ids = s.table("t_dedup").select("event_id").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.mkString(",")}")
  }

  test("stream-stream join: views joined to purchases within 5 minutes") {
    implicit val ctx = s.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val v = views.toDF().selectExpr("user_id", "ts AS v_ts")
      .withWatermark("v_ts", "10 minutes")
    val p = purchases.toDF().selectExpr("user_id AS p_user", "ts AS p_ts")
      .withWatermark("p_ts", "10 minutes")
    val joined = v.join(p,
      org.apache.spark.sql.functions.expr(
        "user_id = p_user AND p_ts BETWEEN v_ts AND v_ts + INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory")
      .queryName("t_ssjoin").outputMode("append").start()
    views.addData(Ev(t("2024-01-01 00:00:00"), 1, 0.0, "view"),
      Ev(t("2024-01-01 00:20:00"), 2, 0.0, "view"))
    purchases.addData(
      Ev(t("2024-01-01 00:03:00"), 1, 9.99, "purchase"),  // within 5 min of user 1's view
      Ev(t("2024-01-01 00:40:00"), 2, 5.00, "purchase"))  // too late for user 2's view
    q.processAllAvailable()
    val rows = s.table("t_ssjoin").select("user_id").collect().map(_.getLong(0))
    q.stop()
    assert(rows.sameElements(Array(1L)), s"got ${rows.mkString(",")}")
  }

  test("C9 join_asof: signup events match themselves; non-signup carry last") {
    val df = run("join_asof")
    val ev = Tables.events(spark, sf)
    val selfMatch = df.join(
        ev.where("event_type = 'signup'").select("event_id"), "event_id")
      .where("signup_ts_us <> ts_us").count()
    assert(selfMatch == 0, "a signup's as-of match is itself")
    assert(df.count() == ev.count())
  }

  test("C9f join_asof_forward: signups self-match; matches never precede the event") {
    val df = run("join_asof_forward")
    val ev = Tables.events(spark, sf)
    val selfMatch = df.join(
        ev.where("event_type = 'signup'").select("event_id"), "event_id")
      .where("next_signup_ts_us <> ts_us").count()
    assert(selfMatch == 0, "a signup's forward as-of match is itself")
    assert(df.where("next_signup_ts_us < ts_us").count() == 0,
      "forward match must be at-or-after the event")
    assert(df.count() == ev.count())
  }

  test("C8 join_range_funnel: gaps within [0, 5 min]") {
    val df = run("join_range_funnel")
    assert(df.where("gap_us < 0 OR gap_us > 300000000").count() == 0)
  }

  test("L9 batch: sorted-group sessionizer handles one user holding ~all events") {
    import org.apache.spark.sql.functions._
    // VERDICT r2 #5's pathological shape: a single hot user whose full
    // history lands in one group. The secondary sort runs in the shuffle's
    // external sorter (spills), and foldSessions streams the iterator —
    // no per-group array materializes on an executor.
    val n = 50000L
    val ev = s.range(n).select(
      lit(7L).as("user_id"),
      // 1-min cadence, plus a 40-min hole in front of every 100th event →
      // deterministic 100-event sessions (`div` not `/`: `/` yields DOUBLE)
      (col("id") * 60000000L +
        expr("id div 100") * 2400000000L).as("ts_us"))
    val sessions = Streaming.sessionizeBatchSorted(ev).collect()
    assert(sessions.length == (n / 100 - 1).toInt,
      s"expected ${n / 100 - 1} closed sessions, got ${sessions.length}")
    assert(sessions.forall(_.n == 100), "every closed session spans its 100-event block")
    assert(sessions.forall(cs => cs.end_us == cs.start_us + 99L * 60000000L + sessionGap))
  }
  private val sessionGap = 30L * 60 * 1000000

  test("L9 batch: sorted-group sessionizer ≡ flatMapGroupsWithState batch run") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf).withColumn("ts", col("ts").cast("timestamp"))
    val a = Streaming.sessionizeCustom(ev).toDF()
    val b = Streaming.sessionizeBatchSorted(ev).toDF()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "both sessionizer paths must emit identical closed sessions")
  }

  test("stream-static enrichment: stream joins a broadcast dimension per micro-batch") {
    implicit val ctx = s.sqlContext
    import org.apache.spark.sql.functions.{broadcast, col}
    // static dim (re-read per micro-batch in a real lake; broadcast-sized)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[Ev]
    val enriched = ms.toDF().join(broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("t_enrich")
      .outputMode("append").start()
    ms.addData(
      Ev(t("2024-01-01 00:01:00"), 1, 10.0, "view"),
      Ev(t("2024-01-01 00:02:00"), 2, 11.0, "view"),
      Ev(t("2024-01-01 00:03:00"), 3, 12.0, "view")) // no dim row → null tier
    q.processAllAvailable()
    val rows = s.table("t_enrich").select("user_id", "tier").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    q.stop()
    assert(rows == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
  }

  test("foreachBatch sink: batch-id-keyed writes make replays idempotent") {
    implicit val ctx = s.sqlContext
    import org.apache.spark.sql.DataFrame
    // the exactly-once production pattern: key the write by batchId so a
    // replayed micro-batch OVERWRITES its own output instead of appending
    // a duplicate — simulated here with a map keyed by batchId
    val written = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val ms = MemoryStream[Ev]
    def writeBatch(df: DataFrame, batchId: Long): Unit = {
      val n = df.count()
      written.put(batchId, n)       // idempotent: replay replaces, not appends
      if (batchId == 0) writeBatch0Replay(df, batchId) // simulate one replay
    }
    def writeBatch0Replay(df: DataFrame, batchId: Long): Unit =
      written.put(batchId, df.count())
    val q = ms.toDF().writeStream.foreachBatch(writeBatch _)
      .outputMode("append").start()
    ms.addData(Ev(t("2024-01-01 00:01:00"), 1, 1.0, "view"),
      Ev(t("2024-01-01 00:02:00"), 2, 1.0, "view"))
    q.processAllAvailable()
    ms.addData(Ev(t("2024-01-01 00:03:00"), 3, 1.0, "view"))
    q.processAllAvailable()
    q.stop()
    // despite the replayed batch 0, totals count each event exactly once
    assert(written.values.sum == 3, s"got $written")
  }

  test("L13 late data: a purchase behind the watermark is dropped from the join") {
    implicit val ctx = s.sqlContext
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("CAST(value AS BIGINT) AS event_id", "ts", "user_id")
    val (mv, mp) = (MemoryStream[Ev], MemoryStream[Ev])
    val joined = Streaming.viewPurchaseJoin(
      shape(mv.toDF()).withWatermark("ts", "10 minutes"),
      shape(mp.toDF()).withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("t_ssjoin_late")
      .outputMode("append").start()
    // batch 1: a view plus far-future events on both sides advance the
    // watermark well past the view's 1-hour match window
    mv.addData(Ev(t("2024-01-01 00:00:00"), 1, 100, "view"),
      Ev(t("2024-01-01 09:00:00"), 9, 900, "view"))
    mp.addData(Ev(t("2024-01-01 09:00:00"), 9, 901, "purchase"))
    q.processAllAvailable()
    // batch 2: an in-window purchase for view 100 arrives HOURS behind
    // the ~08:50 watermark — state for that window is gone, no output
    mp.addData(Ev(t("2024-01-01 00:30:00"), 1, 200, "purchase"))
    q.processAllAvailable()
    val got = s.table("t_ssjoin_late").select("v_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(!got.contains((100L, 200L)),
      s"late purchase must be dropped by watermark eviction, got $got")
  }

  test("L13 twin: watermarked stream-stream interval join matches batch") {
    implicit val ctx = s.sqlContext
    // event_id rides in `value` (Ev has no id field); body reads event_id
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("CAST(value AS BIGINT) AS event_id", "ts", "user_id")
    val views = Seq(
      Ev(t("2024-01-01 00:00:00"), 1, 100, "view"),
      Ev(t("2024-01-01 02:00:00"), 2, 101, "view"))
    val purchases = Seq(
      Ev(t("2024-01-01 00:30:00"), 1, 200, "purchase"), // in window → match
      Ev(t("2024-01-01 02:00:00"), 1, 201, "purchase"), // > 1h after view 100
      Ev(t("2024-01-01 01:00:00"), 2, 202, "purchase"), // before user-2 view
      Ev(t("2024-01-01 02:59:00"), 2, 203, "purchase")) // in window → match
    val (mv, mp) = (MemoryStream[Ev], MemoryStream[Ev])
    val joined = Streaming.viewPurchaseJoin(
      shape(mv.toDF()).withWatermark("ts", "10 minutes"),
      shape(mp.toDF()).withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").start()
    mv.addData(views: _*); mp.addData(purchases: _*)
    q.processAllAvailable()
    val streamed = s.table("t_ssjoin").select("v_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    val batch = Streaming.viewPurchaseJoin(
        shape(views.toDF()), shape(purchases.toDF()))
      .select("v_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed == Set((100L, 200L), (101L, 203L)))
  }
}
