package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cluster-safe scratch-path resolution.
  *
  * Every intermediate write (q35's partitioned side output, the DFSIO bench
  * dataset) resolves its base directory from `spark.graft.scratchDir` — any
  * Hadoop filesystem URI (`hdfs://...`, `s3a://...`, `file:/...`); the
  * default is the local JVM tmpdir, which is only correct for `local[*]`.
  * All path operations go through the Hadoop `FileSystem` API, never
  * `java.io` / `java.nio.file` — the same code runs unchanged when the
  * scratch base points at HDFS or an object store on a real cluster
  * (java.io paths would silently write executor-local disks there).
  */
object Scratch {

  /** The configured scratch base as a Hadoop path. */
  def base(spark: SparkSession): Path = new Path(
    spark.conf.get("spark.graft.scratchDir",
      "file:" + System.getProperty("java.io.tmpdir")))

  /** Create (if absent) `base/name` and return it fully qualified — a URI
    * string any Spark reader/writer and any `FileSystem` accept. */
  def dir(spark: SparkSession, name: String): String = {
    val p = new Path(base(spark), name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    fs.makeQualified(p).toString
  }

  /** Recursive delete through the path's own filesystem. */
  def delete(conf: Configuration, uri: String): Unit = {
    val p = new Path(uri)
    p.getFileSystem(conf).delete(p, true)
  }

  /** Hadoop `Configuration` is not serializable; executor-side FileSystem
    * work (DfsioBench's positioned reads, Sinks.keyedTextFiles) ships the
    * conf as a broadcastable entry array and rebuilds it per task, so the
    * driver's fs settings (credentials, endpoints) are honored on a real
    * cluster. ONE implementation — keep the two users in sync by sharing it. */
  def confEntries(conf: Configuration): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    conf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
  }

  def confFrom(entries: Array[(String, String)]): Configuration = {
    val conf = new Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}
