package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Job-counter surface (≙ MapReduce Counters / TaskCounter,
  * hadoop-mapreduce-client-core .../mapreduce/TaskCounter.java:28-42).
  *
  * Spark-first: `df.observe` attaches named aggregate metrics to a plan —
  * collected DURING execution with zero extra passes (the reference's
  * counters, but declarative); a QueryExecutionListener receives them.
  */
object Counters {

  /** Attach named metrics to a plan (e.g. record counts, null counts). */
  def observe(df: DataFrame, name: String, metrics: (String, Column)*): DataFrame = {
    require(metrics.nonEmpty)
    val cols = metrics.map { case (alias, c) => c.as(alias) }
    df.observe(name, cols.head, cols.tail: _*)
  }

  /** Collect observed metrics of the next completed query on this session.
    * Returns the listener; call `metrics()` after an action ran. */
  final class MetricSink extends QueryExecutionListener {
    private val collected = new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        collected.put(name,
          row.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> row.get(i) }.toMap)
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    def metrics(): Map[String, Map[String, Any]] = {
      import scala.jdk.CollectionConverters._
      collected.asScala.toMap
    }
  }

  def attachSink(spark: org.apache.spark.sql.SparkSession): MetricSink = {
    val sink = new MetricSink
    spark.listenerManager.register(sink)
    sink
  }
}
