package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query by name, print the formatted physical plan and
  * per-stage wall times. `runMain graft.DevRun <query> <sfDir> [explain]` */
object DevRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PAR_FIRST", "false"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks))
      }
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"[devrun] $name total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._3).take(15).foreach { case (id, n, ms, tasks) =>
      println(f"[devrun] stage $id%4d ${ms}%7d ms $tasks%4d tasks  $n")
    }
    val all = stages.asScala.toSeq
    if (all.nonEmpty)
      println(f"[devrun] stages total: n=${all.size} sum=${all.map(_._3).sum / 1000.0}%.1f s " +
        f"median=${all.map(_._3).sorted.apply(all.size / 2)} ms")
    spark.stop()
  }
}
