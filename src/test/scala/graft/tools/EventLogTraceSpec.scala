package graft.tools

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The log lines below are Spark's public event-log JSON schema
  * (SparkListenerJobStart/JobEnd as `spark.eventLog.enabled` writes them);
  * Bench tags every query's jobs via setJobDescription, which lands in
  * Properties."spark.job.description". */
class EventLogTraceSpec extends SparkSpec {

  private val log = Seq(
    """{"Event":"SparkListenerApplicationStart","App Name":"bench"}""",
    """{"Event":"SparkListenerJobStart","Job ID":0,"Submission Time":1000,"Properties":{"spark.job.description":"q01_wordcount"}}""",
    """{"Event":"SparkListenerJobEnd","Job ID":0,"Completion Time":1800,"Job Result":{"Result":"JobSucceeded"}}""",
    """{"Event":"SparkListenerJobStart","Job ID":1,"Submission Time":2000,"Properties":{"spark.job.description":"q02_grep_topk"}}""",
    """{"Event":"SparkListenerJobStart","Job ID":2,"Submission Time":2500,"Properties":{"spark.job.description":"q01_wordcount"}}""",
    """{"Event":"SparkListenerJobEnd","Job ID":2,"Completion Time":4100,"Job Result":{"Result":"JobSucceeded"}}""",
    """{"Event":"SparkListenerJobEnd","Job ID":1,"Completion Time":3000,"Job Result":{"Result":"JobSucceeded"}}""",
    """{"Event":"SparkListenerJobStart","Job ID":3,"Submission Time":5000,"Properties":{}}""",
    """{"Event":"SparkListenerJobStart","Job ID":4,"Submission Time":6000,"Properties":{"spark.job.description":"gridmix:q01_wordcount"}}""",
    """{"Event":"SparkListenerJobEnd","Job ID":4,"Completion Time":6400}""",
    """not even json""")

  test("fromLog folds jobs into per-name (first submission, last completion) entries") {
    val entries = EventLogTrace.fromLog(log.iterator)
    assert(entries == Seq(
      // q01 spans two jobs: submission 1000 (= t0), last completion 4100
      EventLogTrace.TraceEntry("q01_wordcount", 0L, 3.1),
      EventLogTrace.TraceEntry("q02_grep_topk", 1000L, 1.0),
      // the gridmix re-run is its own (non-replayable) name, kept by default
      EventLogTrace.TraceEntry("gridmix:q01_wordcount", 5000L, 0.4)))
  }

  test("converts a REAL Spark-written rolling event log (zstd, v2 directory layout)") {
    // fixture captured from an actual Bench run with SPARK_GRAFT_EVENTLOG_DIR
    // set (Spark 4.1 rolling event-log v2: eventlog_v2_<app>/events_1_<app>
    // .zstd) — proves the converter parses what spark.eventLog.enabled
    // REALLY produces, not just this repo's idea of the format
    val dir = "src/test/resources/eventlog_v2_local-1786601120228"
    val out = java.nio.file.Files.createTempDirectory("graft_evreal")
      .resolve("trace.json").toString
    val entries = EventLogTrace.convert(
      spark.sparkContext.hadoopConfiguration, dir, out,
      nameFilter = graft.SparkEntry.queries.contains)
    assert(entries.map(_.name).sorted ==
      Seq("q01_wordcount", "q23_dedup_exact", "q34_pi"))
    // offsets are relative to the first submission and durations are real
    assert(entries.head.offsetMs == 0L)
    assert(entries.forall(e => e.sec > 0.0 && e.sec < 60.0))
    // and the produced trace satisfies the bench replay invariants
    val txt = Files.readString(Paths.get(out))
    val parsed = """\{"name":"([^"]+)","offset_ms":([0-9]+)""".r
      .findAllMatchIn(txt).map(_.group(1)).toSeq
    assert(parsed.sorted == Seq("q01_wordcount", "q23_dedup_exact", "q34_pi"))
  }

  test("convert writes a trace the bench replay path accepts, filtered to real queries") {
    val dir = Files.createTempDirectory("graft_evlog")
    val logPath = dir.resolve("eventlog").toString
    Files.write(Paths.get(logPath),
      String.join("\n", log: _*).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = dir.resolve("trace.json").toString
    val entries = EventLogTrace.convert(
      spark.sparkContext.hadoopConfiguration, logPath, out,
      nameFilter = graft.SparkEntry.queries.contains)
    assert(entries.map(_.name) == Seq("q01_wordcount", "q02_grep_topk"))
    // the written trace parses with the EXACT regex Bench's replay uses, and
    // satisfies the replay invariants: known names, no duplicates
    val txt = Files.readString(Paths.get(out))
    val parsed = """\{"name":"([^"]+)","offset_ms":([0-9]+)""".r
      .findAllMatchIn(txt).map(m => (m.group(1), m.group(2).toLong)).toSeq
    assert(parsed == Seq(("q01_wordcount", 0L), ("q02_grep_topk", 1000L)))
    assert(parsed.map(_._1).forall(graft.SparkEntry.queries.contains))
    assert(parsed.map(_._1).distinct.size == parsed.size)
  }

  test("reads lz4 and snappy event logs (Spark codec framings, not Hadoop's)") {
    // Spark's event-log writer compresses with ITS codecs: .lz4 is an
    // lz4-java BLOCK stream, .snappy a xerial framed stream — write the
    // fixtures with exactly those, as spark.eventLog.compression.codec does
    val dir = Files.createTempDirectory("graft_evcodec")
    val bytes = String.join("\n", log: _*).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val lz4Path = dir.resolve("events_1_app.lz4")
    val lz = new net.jpountz.lz4.LZ4BlockOutputStream(
      Files.newOutputStream(lz4Path))
    try lz.write(bytes) finally lz.close()
    val snapPath = dir.resolve("events_1_app.snappy")
    val sn = new org.xerial.snappy.SnappyOutputStream(
      Files.newOutputStream(snapPath))
    try sn.write(bytes) finally sn.close()
    Seq(lz4Path, snapPath).foreach { p =>
      val out = dir.resolve(p.getFileName.toString + ".trace.json").toString
      val entries = EventLogTrace.convert(
        spark.sparkContext.hadoopConfiguration, p.toString, out,
        nameFilter = graft.SparkEntry.queries.contains)
      assert(entries.map(_.name) == Seq("q01_wordcount", "q02_grep_topk"), p)
    }
  }

  test("names with quotes/control chars emit valid JSON and round-trip the replay parser") {
    val name = "load \"hot\"\tshard\\1"
    val json = EventLogTrace.toJson(Seq(EventLogTrace.TraceEntry(name, 42L, 1.5)))
    // valid JSON: json4s (the strict parser Spark ships) must accept it
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    import org.json4s.DefaultFormats
    implicit val fmts: org.json4s.Formats = DefaultFormats
    assert((parsed.children.head \ "name").extract[String] == name)
    // and Bench's replay pattern + unescape recover the original name
    val m = """\{"name":"((?:[^"\\]|\\.)*)","offset_ms":([0-9]+)""".r
      .findAllMatchIn(json).toSeq
    assert(m.size == 1)
    assert(EventLogTrace.unescapeName(m.head.group(1)) == name)
    assert(m.head.group(2).toLong == 42L)
  }
}
