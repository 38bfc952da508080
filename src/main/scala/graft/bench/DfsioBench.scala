package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TestDFSIO-equivalent sequential I/O throughput probe — the one BASELINE.md
  * metric family (JCT/fs/TestDFSIO.java:88-134: mb/sec aggregate for
  * write/read legs) the query suite does not otherwise exercise.
  *
  * Writes `totalMb` MiB as exactly-1-KiB text records (19-digit zero-padded
  * id + fixed filler + newline — deterministic, incompressible enough to not
  * game the sink), then reads them all back. Validation: the read leg must
  * account for every written byte. Reported numbers are seconds per leg;
  * mb/sec = totalMb / seconds, the reference's metric.
  */
object DfsioBench {

  /** Returns (writeSec, readSec). The temp directory is removed afterwards. */
  def run(spark: SparkSession, totalMb: Int): (Double, Double) = {
    require(totalMb > 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_dfsio").toString
    try {
      val rows = totalMb.toLong * 1024L // 1 KiB per row
      val filler = "x" * (1024 - 19 - 1) // id(19) + filler + '\n' = 1024 B
      var t = System.nanoTime()
      spark.range(rows)
        .select(concat(lpad(col("id").cast("string"), 19, "0"), lit(filler)).as("value"))
        .write.mode("overwrite").text(dir)
      val writeSec = (System.nanoTime() - t) / 1e9
      t = System.nanoTime()
      val bytes = spark.read.text(dir)
        .agg(sum(length(col("value")) + 1)).head().getLong(0)
      val readSec = (System.nanoTime() - t) / 1e9
      require(bytes == rows * 1024L,
        s"dfsio read-back mismatch: $bytes != ${rows * 1024L}")
      (writeSec, readSec)
    } finally {
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    }
  }
}
