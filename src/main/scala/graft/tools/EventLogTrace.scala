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

  /** Incremental fold over event-log lines — one instance spans a whole
    * rolling-log directory, fed file by file so no log ever has to fit in
    * memory at once. */
  private final class Accumulator {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    private implicit val fmts: Formats = DefaultFormats
    private val jobName = scala.collection.mutable.Map.empty[Long, String]
    private val starts = scala.collection.mutable.Map.empty[String, Long]
    private val ends = scala.collection.mutable.Map.empty[String, Long]

    def feed(line: String): Unit = {
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

    def result(): Seq[TraceEntry] =
      if (starts.isEmpty) Nil
      else {
        val t0 = starts.values.min
        starts.toSeq.sortBy { case (name, sub) => (sub, name) }.map { case (name, sub) =>
          TraceEntry(name, sub - t0,
            math.max(0L, ends.getOrElse(name, sub) - sub) / 1000.0)
        }
      }
  }

  /** Fold the event stream into per-name (first submission, last completion)
    * trace entries, sorted by submission. Jobs without a description are
    * skipped — they have no replayable identity. */
  def fromLog(lines: Iterator[String]): Seq[TraceEntry] = {
    val acc = new Accumulator
    lines.foreach(acc.feed)
    acc.result()
  }

  /** JSON string escape for trace names — job descriptions are free-form
    * user strings (`setJobDescription("load \"hot\" shard")`): quotes and
    * backslashes get the standard short escapes, control characters
    * (a tab or newline in a description would otherwise emit invalid JSON)
    * become \u00XX. Shared with Bench's trace capture writer; `unescapeName`
    * is its exact inverse, used by Bench's replay parser. */
  def escapeName(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"'  => b.append("\\\"")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Inverse of `escapeName` (also tolerates the other standard JSON short
    * escapes so a hand-edited trace file parses). */
  def unescapeName(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case '/' => b.append('/'); i += 2
          case e   => b.append(e); i += 2 // \\ and \" (and anything else, verbatim)
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Serialize entries in the exact format `Bench` writes and replays. */
  def toJson(entries: Seq[TraceEntry]): String =
    entries.map { e =>
      val sec = String.format(java.util.Locale.ROOT, "%.3f", Double.box(e.sec))
      s"""{"name":"${escapeName(e.name)}","offset_ms":${e.offsetMs},"sec":$sec}"""
    }.mkString("[", ",", "]") + "\n"

  /** Feed one event-log file into `acc`, transparently decompressing every
    * codec suffix Spark's event-log writer can produce (`spark.eventLog.
    * compression.codec`: zstd, lz4, snappy — all three client jars ship
    * with Spark). NOTE these are SPARK's codec framings, not Hadoop's: a
    * Spark `.lz4` event log is an lz4-java BLOCK stream and `.snappy` a
    * xerial framed stream, so Hadoop's CompressionCodecFactory (whose
    * Lz4Codec/SnappyCodec use Hadoop block framing) would mis-read them —
    * the streams here are the same classes Spark's own history server
    * opens the files with. Unknown suffixes fall through as plain text
    * (the uncompressed default). */
  private def feedFile(conf: Configuration, f: Path, acc: Accumulator): Unit = {
    val raw = f.getFileSystem(conf).open(f)
    val base = f.getName.stripSuffix(".inprogress")
    val in: java.io.InputStream =
      if (base.endsWith(".zstd")) new com.github.luben.zstd.ZstdInputStream(raw)
      else if (base.endsWith(".lz4")) new net.jpountz.lz4.LZ4BlockInputStream(raw)
      else if (base.endsWith(".snappy")) new org.xerial.snappy.SnappyInputStream(raw)
      else raw
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    try Iterator.continually(r.readLine()).takeWhile(_ != null).foreach(acc.feed)
    finally r.close()
  }

  /** Convert an event log into a local trace file the bench's replay path
    * accepts. `logPath` may be a single log file (`.inprogress` works — the
    * format is line-delimited), or a Spark ROLLING event-log directory
    * (`eventlog_v2_<app>/` holding `events_<i>_<app>[.zstd]` files, read in
    * index order) — the layout `spark.eventLog.enabled` actually produces.
    * `nameFilter` selects which job descriptions become trace entries — pass
    * `SparkEntry.queries.contains` to keep only entries the replay path can
    * run (a bench log also tags `gridmix:`/`rebench:`/`rescale:` re-runs,
    * which are not replayable identities). Returns the entries. */
  def convert(conf: Configuration, logPath: String, outPath: String,
              nameFilter: String => Boolean = _ => true): Seq[TraceEntry] = {
    val p = new Path(logPath)
    val fs = p.getFileSystem(conf)
    val files: Seq[Path] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.startsWith("events_")).toSeq
          .sortBy(q => q.getName.split("_")(1).toLong)
      else Seq(p)
    require(files.nonEmpty, s"$logPath contains no event-log files")
    val acc = new Accumulator
    files.foreach(feedFile(conf, _, acc))
    val entries = acc.result().filter(e => nameFilter(e.name))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), toJson(entries))
    entries
  }
}
