package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TestDFSIO-equivalent I/O throughput probe — the BASELINE.md metric family
  * (JCT/fs/TestDFSIO.java:88-134: mb/sec for write / read / append / random /
  * backward / skip legs) the query suite does not otherwise exercise.
  *
  * Writes `totalMb` MiB as exactly-1-KiB text records (19-digit zero-padded
  * id + fixed filler + newline — deterministic, incompressible enough to not
  * game the sink), then exercises each read pattern:
  *
  *  - write / read / append: DataFrame-level sequential I/O; the append leg
  *    appends totalMb/4 more records (`TestDFSIO.java:88` append mode) and
  *    every leg re-validates the exact byte count.
  *  - random / backward / skip: per-file positioned reads through the Hadoop
  *    `FileSystem` API, one task per file (TestDFSIO's one-map-per-file
  *    design): random seeks over a seeded permutation (25% of records),
  *    a full record-wise backward scan, and a read-1-skip-3 stride
  *    (`TestDFSIO.java:128-134`). Every record read is validated (terminating
  *    newline + full 1 KiB), and every leg's total byte count is checked
  *    against the closed-form expectation.
  *
  * The dataset lives under the `spark.graft.scratchDir` base (graft.sources
  * .Scratch) so the same code measures HDFS/object-store I/O on a real
  * cluster; reported numbers are seconds per leg, mb/sec = MB / seconds.
  */
object DfsioBench {
  private val Rec = 1024
  // distinct dir per run in one JVM: re-bench passes must not race each other
  private val runCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Runs all six legs; returns (legName, seconds) in execution order. The
    * scratch directory is removed afterwards. */
  def run(spark: SparkSession, totalMb: Int): Seq[(String, Double)] = {
    require(totalMb > 0)
    val sc = spark.sparkContext
    val dir = graft.sources.Scratch.dir(spark,
      s"graft_dfsio_${sc.applicationId}_${runCounter.getAndIncrement()}")
    val data = dir + "/data"
    try {
      val rows = totalMb.toLong * 1024L // 1 KiB per row
      val filler = "x" * (Rec - 19 - 1) // id(19) + filler + '\n' = 1024 B
      def record(c: org.apache.spark.sql.Column) =
        concat(lpad(c.cast("string"), 19, "0"), lit(filler)).as("value")
      def readBytes(): Long =
        spark.read.text(data).agg(sum(length(col("value")) + 1)).head().getLong(0)

      var t = System.nanoTime()
      spark.range(rows).select(record(col("id"))).write.mode("overwrite").text(data)
      val writeSec = (System.nanoTime() - t) / 1e9

      t = System.nanoTime()
      val bytes = readBytes()
      val readSec = (System.nanoTime() - t) / 1e9
      require(bytes == rows * Rec, s"dfsio read-back mismatch: $bytes != ${rows * Rec}")

      val appendRows = rows / 4
      t = System.nanoTime()
      spark.range(rows, rows + appendRows).select(record(col("id")))
        .write.mode("append").text(data)
      val appendSec = (System.nanoTime() - t) / 1e9
      require(readBytes() == (rows + appendRows) * Rec, "dfsio append mismatch")

      // Positioned-read legs: conf shipped via Scratch.confEntries so
      // executor-side FileSystem resolution honors the driver's fs settings.
      val fs0 = new Path(data).getFileSystem(sc.hadoopConfiguration)
      val files = fs0.globStatus(new Path(data, "part-*"))
        .map(s => (s.getPath.toString, s.getLen)).toSeq
      require(files.nonEmpty && files.forall(_._2 % Rec == 0), "non-record-aligned part file")
      val bc = sc.broadcast(graft.sources.Scratch.confEntries(sc.hadoopConfiguration))

      def seekLeg(mode: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val total = sc.parallelize(files, files.length).map { case (pathStr, len) =>
          val conf = graft.sources.Scratch.confFrom(bc.value)
          val p = new Path(pathStr)
          val in = p.getFileSystem(conf).open(p)
          val buf = new Array[Byte](Rec)
          var read = 0L
          def readAt(off: Long): Unit = {
            in.seek(off); in.readFully(buf)
            require(buf(Rec - 1) == '\n', s"corrupt record at $pathStr:$off")
            read += Rec
          }
          try {
            val nRec = len / Rec
            mode match {
              case "random" =>
                val rnd = new scala.util.Random(pathStr.hashCode)
                var i = 0L
                while (i < nRec / 4) {
                  readAt(((rnd.nextLong() % nRec + nRec) % nRec) * Rec); i += 1
                }
              case "backward" =>
                var r = nRec - 1
                while (r >= 0) { readAt(r * Rec); r -= 1 }
              case "skip" =>
                var off = 0L
                while (off + Rec <= len) { readAt(off); off += 4L * Rec }
            }
          } finally in.close()
          read
        }.reduce(_ + _)
        ((System.nanoTime() - t0) / 1e9, total)
      }
      def expect(mode: String): Long = files.map { case (_, len) =>
        val nRec = len / Rec
        mode match {
          case "random"   => nRec / 4 * Rec
          case "backward" => nRec * Rec
          // an empty part file (possible when parallelism > rows at tiny
          // SPARK_GRAFT_DFSIO_MB) reads 0 records — the closed form below
          // would claim 1
          case "skip"     => if (len == 0) 0 else ((len - Rec) / (4L * Rec) + 1) * Rec
        }
      }.sum
      val legs = Seq("random", "backward", "skip").map { m =>
        val (sec, got) = seekLeg(m)
        require(got == expect(m), s"dfsio $m byte count $got != ${expect(m)}")
        s"${m}_read" -> sec
      }
      bc.destroy()
      Seq("write" -> writeSec, "read" -> readSec, "append" -> appendSec) ++ legs
    } finally {
      try graft.sources.Scratch.delete(sc.hadoopConfiguration, dir)
      catch { case e: Exception =>
        System.err.println(s"[dfsio] cleanup failed for $dir: ${e.getMessage}")
      }
    }
  }
}
