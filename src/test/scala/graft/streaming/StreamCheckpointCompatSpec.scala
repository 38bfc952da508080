package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

/** Checkpoint/state-store VERSION compatibility across Spark upgrades —
  * the r15 verdict's named audit-class candidate. The contract this spec
  * pins (so an upgrade that moves any piece of it is a loud suite diff,
  * never a silent format change in production checkpoints):
  *
  *  1. The resume path is versioned END TO END: the offsets and commits
  *     logs open with a "v1" stamp, the checkpoint `metadata` file carries
  *     the query id, the per-operator state dir carries a "v1"-stamped
  *     operator metadata file, and state deltas exist per shuffle
  *     partition. A Spark minor that bumps any of these formats changes
  *     bytes this spec reads.
  *  2. State-format session confs are CHECKPOINT-STICKY: the offsets log
  *     records `aggregation.stateFormatVersion`, `join.stateFormatVersion`,
  *     `flatMapGroupsWithState.stateFormatVersion`, the provider class,
  *     the state encoding, the state compression codec, and
  *     `shuffle.partitions` at checkpoint-creation time, and a resume
  *     REAPPLIES the recorded values over the resuming session's own
  *     defaults. That mechanism — not matching defaults — is why a
  *     checkpoint written by this Spark resumes correctly under a later
  *     minor whose defaults differ: the old formats ride along until the
  *     checkpoint is retired. The failure mode that remains is a major
  *     release REMOVING support for a recorded version, which this spec
  *     makes visible by pinning today's recorded values.
  *
  * Operational corollary for the q104/q116 services (recorded in PLANS
  * round-16): upgrade the engine and RESUME existing checkpoints freely
  * within a Spark major; to change a state format deliberately, drain
  * (stop at a fold boundary), delete the checkpoint, and cold-start — the
  * services rebuild their state from the persisted parquet protocol dirs,
  * which carry their own semantic stamps (`StateProtocol`), not Spark
  * state-store bytes. */
class StreamCheckpointCompatSpec extends SparkSpec {

  private def firstLine(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8").linesIterator.next()

  test("checkpoint version stamps are pinned and recorded confs are sticky on resume") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_chk_compat_").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val chk = s"$dir/chk"
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC
    def start(ss: SparkSession) = {
      val stream = ss.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 1).parquet(src)
      stream.withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "1 minute"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w"), col("user_id"), col("n"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
    }
    // wave 1: 3 events for user 1 inside minute 1 — the window stays OPEN
    // (watermark well short of its end), so its partial count lives only
    // in the checkpointed state store when the query stops
    (0 until 3).map(i => (1L, new Timestamp(base + 60000L + i * 5000L), 1.0))
      .toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = start(spark)
    try q1.processAllAvailable() finally q1.stop()

    // --- 1. version stamps the resume path will read ---
    assert(firstLine(s"$chk/offsets/0") == "v1", "offsets log version moved")
    assert(firstLine(s"$chk/commits/0") == "v1", "commits log version moved")
    assert(new String(Files.readAllBytes(Paths.get(s"$chk/metadata")), "UTF-8")
      .contains("\"id\""), "checkpoint metadata lost the query id")
    assert(firstLine(s"$chk/state/0/_metadata/metadata") == "v1",
      "operator state metadata version moved")
    assert(new java.io.File(s"$chk/state/0/0").list().exists(_.endsWith(".delta")),
      "no state delta written for partition 0")
    // the recorded state-format confs, exactly as a 4.1 checkpoint writes
    // them — a later Spark changing any DEFAULT here changes what NEW
    // checkpoints record, which is worth a loud diff and a PLANS note
    val offsetsConf = new String(
      Files.readAllBytes(Paths.get(s"$chk/offsets/0")), "UTF-8")
    Seq(
      "\"spark.sql.streaming.aggregation.stateFormatVersion\":\"2\"",
      "\"spark.sql.streaming.join.stateFormatVersion\":\"2\"",
      "\"spark.sql.streaming.flatMapGroupsWithState.stateFormatVersion\":\"2\"",
      "state.HDFSBackedStateStoreProvider",
      "\"spark.sql.streaming.stateStore.encodingFormat\":\"unsaferow\"",
      "\"spark.sql.streaming.stateStore.compression.codec\":\"lz4\"",
      "\"spark.sql.shuffle.partitions\":\"4\"").foreach { pin =>
      assert(offsetsConf.contains(pin), s"offsets log no longer records $pin")
    }

    // --- 2. sticky resume under a session with DIFFERENT defaults ---
    // wave 2 lands during the outage: 2 more events in the SAME minute-1
    // window, then a sentinel advancing the watermark past it. The
    // resuming session runs shuffle.partitions=9 — if the checkpoint's
    // recorded 4 did not govern, the restored state (hash-partitioned 4
    // ways) would be read under the wrong partitioning.
    (3 until 5).map(i => (1L, new Timestamp(base + 60000L + i * 5000L), 1.0))
      .toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(src)
    val resumeSess = spark.newSession()
    resumeSess.conf.set("spark.sql.shuffle.partitions", "9")
    val q2 = start(resumeSess)
    try {
      q2.processAllAvailable()
      Seq((9L, new Timestamp(base + 7200000L), 0.0))
        .toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(src)
      q2.processAllAvailable()
    } finally q2.stop()
    val got = spark.read.parquet(out)
      .filter(col("user_id") === 1L)
      .select(date_format(col("w"), "yyyy-MM-dd HH:mm:ss"), col("n"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01 00:01:00", 5L)),
      s"window state split or lost across the resume: $got")
    // the post-resume batch's offsets entry must still record the
    // checkpoint's shuffle.partitions (4), not the session's 9 — the
    // stickiness mechanism itself, observed on disk
    val lastBatch = new java.io.File(s"$chk/offsets").list()
      .filter(_.forall(_.isDigit)).map(_.toInt).max
    val resumedConf = new String(
      Files.readAllBytes(Paths.get(s"$chk/offsets/$lastBatch")), "UTF-8")
    assert(resumedConf.contains("\"spark.sql.shuffle.partitions\":\"4\""),
      "resume did not stick the checkpoint's recorded shuffle.partitions")
  }
}
