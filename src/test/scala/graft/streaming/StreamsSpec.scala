package graft.streaming

import graft.SparkSpec
import graft.streaming.Streams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Task-visible one-shot fault flag (top-level object: the closure must not
  * capture the spec class; local mode shares the JVM so the flag is seen by
  * executor threads directly). */
object CrashOnce {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600L * 1000 * 24 + minute * 60000L)

  test("batch sessionize splits on gap and aggregates per session") {
    val events = Seq(
      Event(1, ts(0), "click", 1.0), Event(1, ts(2), "click", 2.0),
      Event(1, ts(30), "view", 5.0), // > 10 min gap → new session
      Event(2, ts(1), "click", 1.0)).toDS()
    val out = sessionize(events, gapMillis = 10 * 60000L).collect()
      .map(s => (s.user_id, s.n_events, s.sum_value)).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 5.0), (2L, 1L, 1.0)))
  }

  test("streaming sessionize emits closed sessions via event-time timeout") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMillis = 10 * 60000L)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), "click", 1.0), Event(1, ts(2), "click", 2.0))
      q.processAllAvailable()
      // advance event time far past the gap so the watermark closes user 1's session
      mem.addData(Event(2, ts(60), "click", 9.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(120), "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("sessions_out").as[Session].collect()
        .map(s => (s.user_id, s.n_events, s.sum_value)).toSet
      assert(got.contains((1L, 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming sessionize splits gap-separated events buffered before the watermark fires") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMillis = 10 * 60000L)
      .writeStream.format("memory").queryName("sessions_split_out")
      .outputMode("append").start()
    try {
      // both events arrive in ONE batch, separated by > gap: the watermark
      // has not fired between them, but they must still close as TWO sessions
      mem.addData(Event(1, ts(0), "click", 1.0), Event(1, ts(30), "view", 5.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(120), "click", 9.0)) // push the watermark far ahead
      q.processAllAvailable()
      val got = spark.table("sessions_split_out").as[Session].collect()
        .map(s => (s.user_id, s.n_events, s.sum_value)).toSet
      assert(got.contains((1L, 1L, 1.0)) && got.contains((1L, 1L, 5.0)),
        s"expected two split sessions for user 1, got $got")
    } finally q.stop()
  }

  test("sessionizer state stays bounded under a never-idle hot key") {
    implicit val sc = spark.sqlContext
    Streams.sessionStateHighWater.set(0)
    val base = 1704067200000L
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMillis = 10 * 60000L)
      .writeStream.format("memory").queryName("hotkey_out")
      .outputMode("append").start()
    try {
      // 20 batches x 500 events, one per second, never a gap: the raw-event
      // buffer this replaces would hold all 10,000 events; aggregate state
      // holds ONE open segment
      for (b <- 0 until 20) {
        mem.addData((0 until 500).map(i =>
          Event(1, new Timestamp(base + (b * 500 + i) * 1000L), "e", 1.0)))
        q.processAllAvailable()
      }
      // two far-future sentinels: advance the watermark, then fire timeouts
      mem.addData(Event(2, new Timestamp(base + 100000 * 1000L), "s", 0.0))
      q.processAllAvailable()
      mem.addData(Event(2, new Timestamp(base + 200000 * 1000L), "s", 0.0))
      q.processAllAvailable()
      val got = spark.table("hotkey_out").as[Session].collect()
        .filter(_.user_id == 1L).map(s => (s.n_events, s.sum_value)).toSeq
      assert(got == Seq((10000L, 10000.0)), s"hot key sessions: $got")
      assert(Streams.sessionStateHighWater.get() <= 2L,
        s"state high-water ${Streams.sessionStateHighWater.get()} — not bounded")
    } finally q.stop()
  }

  test("sessionizer parity under heavy out-of-order arrival straddling the watermark") {
    implicit val sc = spark.sqlContext
    val base = 1704067200000L
    // 3 users x 120 events at 3 s spacing, a 2-minute jump every 25 events
    // (gap = 60 s → ~5 sessions per user, varying sums)
    val all = for (u <- 1L to 3L; i <- 0 until 120) yield {
      val t = base + u * 7000L + i * 3000L + (i / 25) * 120000L
      Event(u, new Timestamp(t), "e", (u * 31 + i % 13) * 0.5)
    }
    val sorted = all.sortBy(_.ts.getTime)
    // batches of 45 in time order, but each batch is internally SHUFFLED and
    // every event within 9 s of the previous batch's max is DEFERRED into the
    // next batch — a late-but-admissible arrival under the 10 s watermark
    // delay that lands behind rows the state already absorbed
    val rnd = new scala.util.Random(1234)
    val batches = sorted.grouped(45).toSeq
    val deferred = scala.collection.mutable.ArrayBuffer.empty[Event]
    val adversarial = batches.zipWithIndex.map { case (b, i) =>
      val carryIn = deferred.toSeq; deferred.clear()
      val maxTs = b.map(_.ts.getTime).max
      val (late, onTime) =
        if (i < batches.size - 1) b.partition(e => e.ts.getTime > maxTs - 9000L)
        else (Seq.empty, b)
      deferred ++= late
      rnd.shuffle(carryIn ++ onTime)
    } :+ deferred.toSeq
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMillis = 60000L)
      .writeStream.format("memory").queryName("ooo_out")
      .outputMode("append").start()
    try {
      adversarial.filter(_.nonEmpty).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val far = sorted.last.ts.getTime
      mem.addData(Event(9, new Timestamp(far + 3600000L), "s", 0.0))
      q.processAllAvailable()
      mem.addData(Event(9, new Timestamp(far + 7200000L), "s", 0.0))
      q.processAllAvailable()
      val got = spark.table("ooo_out").as[Session].collect()
        .filter(_.user_id < 9).map(s => (s.user_id, s.start, s.end, s.n_events, s.sum_value)).toSet
      val expect = sessionize(all.toDS(), gapMillis = 60000L).collect()
        .map(s => (s.user_id, s.start, s.end, s.n_events, s.sum_value)).toSet
      assert(got == expect,
        s"stream != batch: missing ${expect -- got}, extra ${got -- expect}")
    } finally q.stop()
  }

  test("dedupStream drops in-watermark duplicate keys on a real micro-batch stream") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupStream(mem.toDS().toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), "click", 1.0), Event(1, ts(1), "click", 2.0), // dup key
        Event(1, ts(2), "view", 3.0), Event(2, ts(3), "click", 4.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(4), "click", 5.0)) // still within watermark → dup
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq
      assert(got.size == 3 && got.toSet == Set((1L, "click"), (1L, "view"), (2L, "click")))
    } finally q.stop()
  }

  test("intervalJoin bounds matches by event-time range on streams") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = intervalJoin(
      clicks.toDS().toDF("user_id", "ts", "event_type", "value"),
      buys.toDS().toDF().select(col("user_id"), col("ts").as("buy_ts"),
        col("event_type").as("buy_type"), col("value").as("buy_value")),
      keys = Seq("user_id"), leftTs = "ts", rightTs = "buy_ts",
      before = "0 minutes", after = "30 minutes")
    val q = joined.select(col("user_id"), col("ts"), col("buy_ts"))
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts(0), "click", 1.0), Event(2, ts(0), "click", 1.0))
      buys.addData(
        Event(1, ts(10), "purchase", 9.0),  // within 30 min after the click → match
        Event(2, ts(45), "purchase", 9.0),  // beyond the interval → no match
        Event(3, ts(5), "purchase", 9.0))   // no clicking user → no match
      q.processAllAvailable()
      val got = spark.table("ssjoin_out").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L), s"expected only user 1 to join, got $got")
    } finally q.stop()
  }

  test("file sink is exactly-once across a mid-batch crash and checkpoint restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_sink_eo_").toString
    val src = s"$base/src"; val out = s"$base/out"; val chk = s"$base/chk"
    // 8 rows across 4 files, one file per micro-batch
    (0L until 8L).map(i => (i, new Timestamp(1704067200000L + i * 1000L)))
      .toDF("id", "ts").repartition(4).write.parquet(src)
    def start() = spark.readStream
      .schema("id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id" :: Nil)
      .as[(Long, Timestamp)]
      .map { case (id, t) =>
        // one-shot fault: the first task to see id 5 dies MID-batch, after
        // sibling tasks may already have written uncommitted sink files
        if (id == 5 && CrashOnce.armed.compareAndSet(true, false))
          throw new RuntimeException("injected mid-batch crash")
        (id, t)
      }.toDF("id", "ts")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    CrashOnce.armed.set(true)
    val q1 = start()
    // the injected throw fails its task, which fails the micro-batch and
    // terminates the query (local mode has no task retries)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable(); q1.awaitTermination(60000)
    }
    q1.stop()
    val q2 = start() // restart from the checkpoint: the failed batch replays
    try q2.processAllAvailable() finally q2.stop()
    // the _spark_metadata-aware read sees each row EXACTLY once — the killed
    // attempt's orphan part files are invisible, the replayed batch is not
    // double-committed
    val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 8L).toSeq,
      s"file sink not exactly-once after crash+restart: ${got.toSeq}")
  }

  test("windowedCounts over a stream equals the batch aggregation") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = windowedCounts(mem.toDF(), "1 hour").writeStream
      .format("memory").queryName("wc_out").outputMode("complete").start()
    try {
      mem.addData(Event(1, ts(0), "click", 1.0), Event(2, ts(30), "click", 2.0),
        Event(1, ts(70), "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("wc_out")
        .select(col("event_type"), col("n"), col("sum_value")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }
}
