package graft.operators

import graft.operators.TypedBytes._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}

/** Typed-bytes FILE bridge — the reference's DumpTypedBytes / LoadTypedBytes
  * utilities (hadoop-tools/hadoop-streaming .../streaming/DumpTypedBytes.java:44,
  * LoadTypedBytes.java:47): move (key, value) data between engine tables and
  * the typed-bytes wire format that non-JVM streaming programs consume.
  *
  * Spark-first: `dump` writes one typed-bytes file per partition (distributed,
  * no driver hop) under `path/part-NNNNN.tb`; `load` reads every file back via
  * `binaryFiles` with one task per file. Record framing is the same
  * `TypedBytes.write/read` codec the pipe operator uses — byte-compatible
  * with hadoop-streaming's `-io typedbytes` programs. */
object TypedBytesFiles {

  /** Dump a two-STRING-column frame as typed-bytes (key, value) files.
    *
    * Overwrite semantics: the target directory is deleted first — a previous
    * dump with more partitions would otherwise leave stale part-NNNNN.tb
    * files that `load` silently reads back. Each task writes to a hidden
    * `.part-*.tmp` name and renames into place on success, so a speculative
    * or retried attempt can never leave a torn final file: the first rename
    * wins, the loser deletes its temp. `load`'s `part-*.tb` glob (and
    * binaryFiles' hidden-file filter) never matches the temp names. */
  def dump(df: DataFrame, path: String): Unit = {
    val cols = df.columns
    require(cols.length == 2, s"dump expects (key, value), got ${cols.toSeq}")
    val hconfSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val dfsRoot = target.getFileSystem(hconfSer.value)
    if (dfsRoot.exists(target)) dfsRoot.delete(target, true)
    dfsRoot.mkdirs(target)
    df.select(cols(0), cols(1)).rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val fin = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.tb")
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".part-$pid%05d.tb.${java.util.UUID.randomUUID()}.tmp")
        val fs = fin.getFileSystem(hconfSer.value)
        val out = new DataOutputStream(new BufferedOutputStream(fs.create(tmp, true)))
        try it.foreach { row =>
          write(out, TBString(row.getString(0)))
          write(out, TBString(row.getString(1)))
        } finally out.close()
        if (!fs.rename(tmp, fin)) fs.delete(tmp, false) // lost the commit race
        Iterator.single(1)
      }
    }.count() // materialize the writes
    ()
  }

  /** Load typed-bytes (key, value) files back into a (key, value) frame.
    * Values are rendered with the codec's type fidelity (strings stay
    * strings; other scalars via toString — the text-side convention the
    * reference's dump uses). */
  def load(spark: SparkSession, path: String): DataFrame = {
    val pairs = spark.sparkContext.binaryFiles(path + "/part-*.tb")
      .flatMap { case (_, stream) =>
        val in = new DataInputStream(new BufferedInputStream(stream.open()))
        Iterator.continually(read(in))
          .takeWhile {
            case Some(_) => true
            case None => in.close(); false
          }
          .map(_.get)
          .grouped(2)
          .map {
            case Seq(k, v) => (render(k), render(v))
            case other => throw new java.io.EOFException(s"odd typed-bytes stream: $other")
          }
      }
    spark.createDataFrame(pairs).toDF("key", "value")
  }

  private def render(v: TBValue): String = v match {
    case TBString(s) => s
    case TBBytes(b)  => new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case TBByte(x)   => x.toString
    case TBBool(x)   => x.toString
    case TBInt(x)    => x.toString
    case TBLong(x)   => x.toString
    case TBFloat(x)  => x.toString
    case TBDouble(x) => x.toString
    case other       => other.toString
  }
}
