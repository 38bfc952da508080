package graft.streaming

import graft.SparkSpec
import graft.streaming.Streams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The same stateful operators, pinned under the RocksDB state store
  * provider. The default HDFS-backed provider holds every key's state in
  * executor heap — at 100 TB ingest (billions of live dedup digests /
  * session keys) that heap map IS the scale limit. RocksDB keeps state
  * off-heap and spills to local disk, so state capacity scales with disk,
  * not heap; these tests prove our operators (including the kryo-encoded
  * segment-aggregate sessionizer state) are provider-agnostic and that
  * RocksDB state survives a checkpoint restart. */
class RocksDbStateSpec extends SparkSpec {

  /** Cloned session pinned to RocksDB: provider class is a per-session SQL
    * conf, so the suite-wide default-provider tests are untouched. */
  private lazy val rocks = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss
  }

  test("sessionizer matches batch under the RocksDB state store") {
    import rocks.implicits._
    implicit val sc = rocks.sqlContext
    val base = 1704067200000L
    // 2 users x 80 events at 3 s spacing with a 2-minute jump every 20
    // events (gap = 60 s) → several sessions per user, delivered across
    // 4 micro-batches so state round-trips RocksDB between triggers
    val all = for (u <- 1L to 2L; i <- 0 until 80) yield {
      val t = base + u * 7000L + i * 3000L + (i / 20) * 120000L
      Event(u, new Timestamp(t), "e", (u * 31 + i % 13) * 0.5)
    }
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMillis = 60000L)
      .writeStream.format("memory").queryName("rocks_sessions")
      .outputMode("append").start()
    try {
      all.sortBy(_.ts.getTime).grouped(40).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val far = all.map(_.ts.getTime).max
      Seq(1, 2).foreach { k =>
        mem.addData(Event(9, new Timestamp(far + k * 3600000L), "s", 0.0))
        q.processAllAvailable()
      }
      val got = rocks.table("rocks_sessions").as[Session].collect()
        .filter(_.user_id < 9)
        .map(s => (s.user_id, s.start, s.end, s.n_events, s.sum_value)).toSet
      val expect = sessionize(all.toDS(), gapMillis = 60000L).collect()
        .map(s => (s.user_id, s.start, s.end, s.n_events, s.sum_value)).toSet
      assert(got == expect,
        s"RocksDB stream != batch: missing ${expect -- got}, extra ${got -- expect}")
    } finally q.stop()
  }

  test("sessionizer state survives a checkpoint restart under RocksDB (q90 path)") {
    import rocks.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rocks_sess_").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val chk = s"$dir/chk"
    val base = 1704067200000L
    def start() = {
      val stream = rocks.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1).parquet(src).as[Event]
      sessionize(stream, gapMillis = 60000L)
        .toDF()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
    }
    // wave 1: user 1's session OPENS (events at 0/10/20 s), consumed, STOP.
    // Its segment aggregate lives only in the checkpointed RocksDB state.
    (0 until 3).map(i => (1L, new Timestamp(base + i * 10000L), "e", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // outage wave: events at 50/60 s — within gap-reach of the open
    // session, so they must MERGE into it after the restart (a fresh state
    // would instead open a second session)
    (5 to 6).map(i => (1L, new Timestamp(base + i * 10000L), "e", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src)
    // restart and DRAIN the outage wave BEFORE the sentinel lands: the file
    // source orders pending files by modification time with arbitrary
    // ties — both files written during the outage could share an mtime
    // tick, letting the sentinel advance the watermark first and drop the
    // 50/60 s events as late (an ordering flake, not a state bug)
    val q2 = start()
    try {
      q2.processAllAvailable()
      // sentinel far ahead: advances the watermark past end + gap → timeout
      Seq((9L, new Timestamp(base + 7200000L), "s", 0.0))
        .toDF("user_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(src)
      q2.processAllAvailable()
    } finally q2.stop()
    val got = rocks.read.parquet(out).as[Session].collect()
      .filter(_.user_id == 1L)
      .map(s => (s.start.getTime, s.end.getTime, s.n_events, s.sum_value)).toSeq
    assert(got == Seq((base, base + 60000L, 5L, 5.0)),
      s"session split or lost across the RocksDB restart: $got")
  }

  test("dedup state survives a checkpoint restart under RocksDB") {
    import rocks.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rocks_eo_").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val chk = s"$dir/chk"
    def start() = {
      val stream = rocks.readStream
        .schema("id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1).parquet(src)
      dedupStream(stream, Seq("id"), tsCol = "ts")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
    }
    // wave 1: ids 0-5 (one file), consumed, query STOPPED
    (0L to 5L).map(i => (i, new Timestamp(1704067200000L + i * 1000L)))
      .toDF("id", "ts").coalesce(1).write.mode("append").parquet(src)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // wave 2 lands during the outage: ids 3-8 — 3,4,5 are duplicates whose
    // digests live only in the CHECKPOINTED RocksDB state
    (3L to 8L).map(i => (i, new Timestamp(1704067200000L + (i + 2) * 1000L)))
      .toDF("id", "ts").coalesce(1).write.mode("append").parquet(src)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = rocks.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    assert(got == (0L to 8L).toSeq,
      s"restarted RocksDB dedup state lost or duplicated rows: $got")
  }
}
