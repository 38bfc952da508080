package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import java.io.{BufferedInputStream, BufferedOutputStream, BufferedReader, BufferedWriter,
  DataInputStream, DataOutputStream, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** External-process pipe operator (streaming parity).
  *
  * Re-expresses hadoop-streaming's PipeMapper/PipeReducer
  * (hadoop-tools/hadoop-streaming .../streaming/PipeMapper.java:38,
  * PipeMapRed.java:214 process spawn, :293 output pump): each partition
  * spawns the command once, feeds records as newline-terminated UTF-8 lines
  * on stdin from a dedicated writer thread (deadlock-free vs. full pipe
  * buffers), and emits the process's stdout lines as output records.
  *
  * Distributed by construction: one subprocess per partition, no driver
  * involvement. At 100 TB the cost model matches hadoop-streaming's (one
  * exec + two pipe pumps per task).
  */
object Pipe {

  /** Typed-bytes variant (the `-io typedbytes` wire of hadoop-streaming,
    * STR/streaming/io + STR/typedbytes): (key, value) records framed as two
    * typed-bytes values each way. Same per-partition process + feeder-thread
    * shape as `pipeLines`. */
  def pipeTypedBytes(ds: Dataset[(TypedBytes.TBValue, TypedBytes.TBValue)],
                     cmd: Seq[String],
                     env: Map[String, String] = Map.empty)
      : Dataset[(TypedBytes.TBValue, TypedBytes.TBValue)] = {
    implicit val enc: Encoder[(TypedBytes.TBValue, TypedBytes.TBValue)] =
      Encoders.kryo[(TypedBytes.TBValue, TypedBytes.TBValue)]
    ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd.asJava)
        env.foreach { case (k, v) => pb.environment().put(k, v) }
        // child stderr goes straight to the task's stderr: an undrained pipe
        // blocks the child after ~64KB (the reference pumps stderr for the
        // same reason, PipeMapRed.java:293)
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        val out = new DataOutputStream(new BufferedOutputStream(proc.getOutputStream))
        val feeder = new Thread(() => {
          try {
            it.foreach { case (k, v) =>
              TypedBytes.write(out, k); TypedBytes.write(out, v)
            }
            out.close()
          } catch { case _: java.io.IOException => () }
        }, "graft-tb-pipe-feeder")
        feeder.setDaemon(true)
        feeder.start()
        val in = new DataInputStream(new BufferedInputStream(proc.getInputStream))
        Iterator.continually {
          TypedBytes.read(in).map { k =>
            val v = TypedBytes.read(in)
              .getOrElse(throw new java.io.EOFException("odd typed-bytes stream"))
            (k, v)
          }
        }.takeWhile {
          case Some(_) => true
          case None =>
            in.close()
            val code = proc.waitFor()
            if (code != 0)
              throw new RuntimeException(s"pipe command ${cmd.mkString(" ")} exited with $code")
            false
        }.map(_.get)
      }
    }
  }

  def pipeLines(ds: Dataset[String], cmd: Seq[String],
                env: Map[String, String] = Map.empty): Dataset[String] = {
    implicit val enc: Encoder[String] = Encoders.STRING
    ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd.asJava)
        env.foreach { case (k, v) => pb.environment().put(k, v) }
        pb.redirectError(ProcessBuilder.Redirect.INHERIT) // never let stderr back-pressure the child
        val proc = pb.start()
        val writer = new BufferedWriter(
          new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
        val feeder = new Thread(() => {
          try {
            it.foreach { line => writer.write(line); writer.write('\n') }
            writer.close()
          } catch { case _: java.io.IOException => () /* consumer exited early */ }
        }, "graft-pipe-feeder")
        feeder.setDaemon(true)
        feeder.start()
        val reader = new BufferedReader(
          new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
        new Iterator[String] {
          private var nextLine: String = reader.readLine()
          def hasNext: Boolean = {
            if (nextLine == null) {
              reader.close()
              val code = proc.waitFor()
              if (code != 0)
                throw new RuntimeException(s"pipe command ${cmd.mkString(" ")} exited with $code")
            }
            nextLine != null
          }
          def next(): String = {
            val out = nextLine
            nextLine = reader.readLine()
            out
          }
        }
      }
    }
  }
}
