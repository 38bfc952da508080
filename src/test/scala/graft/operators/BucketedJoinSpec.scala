package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's CompositeInputFormat map-side join requires inputs
  * "identically sorted & partitioned" (.../lib/join/CompositeInputFormat.java:39-52);
  * the Spark equivalent is bucketed tables: both sides bucketed on the join
  * key join WITHOUT a shuffle. This spec proves the no-Exchange plan. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans no shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — the conf is static.
    // The in-memory catalog forgets tables across JVMs while their dirs
    // remain on disk, so clean the locations too.
    spark.sql("DROP TABLE IF EXISTS g_facts")
    spark.sql("DROP TABLE IF EXISTS g_dims")
    Seq("g_facts", "g_dims").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    val facts = (1 to 1000).map(i => (i % 50, i.toDouble)).toDF("k", "v")
    val dims = (0 until 50).map(i => (i, s"name$i")).toDF("k", "name")
    facts.write.bucketBy(8, "k").sortBy("k").saveAsTable("g_facts")
    dims.write.bucketBy(8, "k").sortBy("k").saveAsTable("g_dims")
    val joined = spark.table("g_facts").join(spark.table("g_dims"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected bucketed no-shuffle join, got:\n$plan")
    assert(joined.count() == 1000)
  }
}
