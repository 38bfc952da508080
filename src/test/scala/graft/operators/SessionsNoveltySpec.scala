package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize splits on gaps > gapSec, keeps exact-gap events, and is per-user") {
    val df = Seq(
      // user 1: three events 10 min apart (one session), then a 31-min gap
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (1L, 2L, ts("2026-01-01 10:10:00")),
      (1L, 3L, ts("2026-01-01 10:20:00")),
      (1L, 4L, ts("2026-01-01 10:51:00")),
      // exactly 1800 s after the previous event: same session
      (1L, 5L, ts("2026-01-01 11:21:00")),
      // user 2: a single event
      (2L, 6L, ts("2026-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "t")
    val got = Sessions.sessionize(df, Seq("user_id"), "t", gapSec = 1800,
        tieBreak = Seq("event_id"))
      .select("user_id", "event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L),
      (1L, 4L, 2L), (1L, 5L, 2L),
      (2L, 6L, 1L)))
  }

  test("sessionize tie-break makes numbering deterministic at equal timestamps") {
    val df = Seq(
      (1L, 2L, ts("2026-01-01 10:00:00")),
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (1L, 3L, ts("2026-01-01 11:00:00"))
    ).toDF("user_id", "event_id", "t")
    val got = Sessions.sessionize(df, Seq("user_id"), "t", gapSec = 1800,
        tieBreak = Seq("event_id"))
      .select("event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("novelAgainst equals the exact anti-join, including at a sloppy fpp") {
    val ref = spark.range(0, 500).select(concat(lit("k"), col("id")).as("k"), col("id"))
    val batch = spark.range(400, 700).select(concat(lit("k"), col("id")).as("k"), col("id"))
    val expected = batch.join(ref.select("k"), Seq("k"), "left_anti")
      .select("id").as[Long].collect().toSet
    // fpp 0.4 forces many batch rows through the suspect path — exactness
    // must not depend on the bloom's precision.
    for (fpp <- Seq(0.01, 0.4)) {
      val got = Dedup.novelAgainst(batch, ref, col("k"), expectedItems = 500, fpp = fpp)
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"fpp=$fpp")
      assert(got == (500L until 700L).toSet)
    }
  }

  test("novelAgainst keeps within-batch duplicates and null-safe keys") {
    val ref = Seq("a").toDF("k")
    val batch = Seq("a", "b", "b", null).toDF("k")
    val got = Dedup.novelAgainst(batch, ref, col("k"), expectedItems = 10)
      .select("k").collect().map(r => Option(r.getString(0))).toSeq
    // "a" is a dup; both "b"s survive; the null key is never in the bloom →
    // it flows through the definitely-novel path (SQL NOT EXISTS semantics
    // for a null probe differ — the operator documents string-key behavior).
    assert(got.sorted == Seq(None, Some("b"), Some("b")).sorted(
      Ordering.Option(Ordering.String)))
  }

  test("DfsioBench runs all six legs against a Hadoop-path scratch base, validating bytes") {
    // point the scratch base at an explicit Hadoop file: URI — the cluster
    // configuration shape (on a real deployment this is hdfs://... / s3a://...)
    val base = java.nio.file.Files.createTempDirectory("graft_scratch_base")
    spark.conf.set("spark.graft.scratchDir", "file:" + base)
    try {
      val legs = graft.bench.DfsioBench.run(spark, totalMb = 4).toMap
      assert(legs.keySet == Set("write", "read", "append", "random_read",
        "backward_read", "skip_read"))
      assert(legs.values.forall(_ > 0))
      // the run cleans up after itself under the configured base
      val left = java.nio.file.Files.list(base).count()
      assert(left == 0, s"dfsio left $left entries under the scratch base")
    } finally {
      spark.conf.unset("spark.graft.scratchDir")
      java.nio.file.Files.deleteIfExists(base)
    }
  }

  test("Scratch.dir resolves, creates, and qualifies under the configured base") {
    val base = java.nio.file.Files.createTempDirectory("graft_scratch_base2")
    spark.conf.set("spark.graft.scratchDir", "file:" + base)
    try {
      val d = graft.sources.Scratch.dir(spark, "sub/leaf")
      assert(d.startsWith("file:"), s"not a qualified Hadoop URI: $d")
      assert(new java.io.File(base.toFile, "sub/leaf").isDirectory)
      graft.sources.Scratch.delete(spark.sparkContext.hadoopConfiguration, d)
      assert(!new java.io.File(base.toFile, "sub/leaf").exists)
    } finally {
      spark.conf.unset("spark.graft.scratchDir")
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    }
  }
}
