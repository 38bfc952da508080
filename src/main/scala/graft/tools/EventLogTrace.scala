package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Spark event-log → gridmix trace converter — the engine's Rumen
  * TraceBuilder (reference: hadoop-tools/hadoop-rumen/src/main/java/org/
  * apache/hadoop/tools/rumen/TraceBuilder.java:1, which parses MR job-history
  * logs into replayable load traces).
  *
  * Spark's event log (`spark.eventLog.enabled=true`) is a JSON-lines file of
  * listener events. A job carries the submitting query's name when the
  * driver sets `sc.setJobDescription` (Bench does, per query). Each named
  * job group becomes ONE trace entry:
  *   offset_ms = its first job submission, relative to the log's first;
  *   sec       = last completion − first submission of that name.
  * The output is exactly the `gridmix_trace.json` format the bench's
  * `SPARK_GRAFT_GRIDMIX_TRACE` path replays — so ANY run with event logging
  * on (not just a bench run) can be re-driven as a contended load mix.
  *
  * json4s ships with Spark; parsing uses it rather than regexes so nested
  * fields ("Properties") are read structurally.
  */
object EventLogTrace {

  final case class TraceEntry(name: String, offsetMs: Long, sec: Double)

  /** Fold the event stream into per-name (first submission, last completion)
    * trace entries, sorted by submission. Jobs without a description are
    * skipped — they have no replayable identity. */
  def fromLog(lines: Iterator[String]): Seq[TraceEntry] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val jobName = scala.collection.mutable.Map.empty[Long, String]
    val starts = scala.collection.mutable.Map.empty[String, Long]
    val ends = scala.collection.mutable.Map.empty[String, Long]
    lines.foreach { line =>
      val j = try JsonMethods.parse(line) catch { case _: Exception => JNothing }
      (j \ "Event").extractOpt[String] match {
        case Some("SparkListenerJobStart") =>
          for {
            id <- (j \ "Job ID").extractOpt[Long]
            sub <- (j \ "Submission Time").extractOpt[Long]
            name <- (j \ "Properties" \ "spark.job.description").extractOpt[String]
          } {
            jobName(id) = name
            starts(name) = math.min(starts.getOrElse(name, Long.MaxValue), sub)
          }
        case Some("SparkListenerJobEnd") =>
          for {
            id <- (j \ "Job ID").extractOpt[Long]
            done <- (j \ "Completion Time").extractOpt[Long]
            name <- jobName.get(id)
          } ends(name) = math.max(ends.getOrElse(name, Long.MinValue), done)
        case _ => ()
      }
    }
    if (starts.isEmpty) Nil
    else {
      val t0 = starts.values.min
      starts.toSeq.sortBy { case (name, sub) => (sub, name) }.map { case (name, sub) =>
        TraceEntry(name, sub - t0,
          math.max(0L, ends.getOrElse(name, sub) - sub) / 1000.0)
      }
    }
  }

  /** Serialize entries in the exact format `Bench` writes and replays.
    * Names are JSON-escaped: job descriptions are free-form user strings
    * (`setJobDescription("load \"hot\" shard")`), and an unescaped quote
    * would both break the JSON and truncate Bench's replay regex. */
  def toJson(entries: Seq[TraceEntry]): String =
    entries.map { e =>
      val name = e.name.replace("\\", "\\\\").replace("\"", "\\\"")
      val sec = String.format(java.util.Locale.ROOT, "%.3f", Double.box(e.sec))
      s"""{"name":"$name","offset_ms":${e.offsetMs},"sec":$sec}"""
    }.mkString("[", ",", "]") + "\n"

  /** Convert an event log (any Hadoop filesystem; `.inprogress` logs work —
    * the format is line-delimited) into a local trace file the bench's
    * replay path accepts. `nameFilter` selects which job descriptions become
    * trace entries — pass `SparkEntry.queries.contains` to keep only entries
    * the replay path can run (a bench log also tags `gridmix:`/`rescale:`
    * re-runs, which are not replayable identities). Returns the entries. */
  def convert(conf: Configuration, logPath: String, outPath: String,
              nameFilter: String => Boolean = _ => true): Seq[TraceEntry] = {
    val p = new Path(logPath)
    val in = p.getFileSystem(conf).open(p)
    val entries = try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      fromLog(Iterator.continually(r.readLine()).takeWhile(_ != null))
        .filter(e => nameFilter(e.name))
    } finally in.close()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), toJson(entries))
    entries
  }
}
