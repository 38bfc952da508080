package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingCountersSpec extends SparkSpec {
  import spark.implicits._

  test("md5Filter is deterministic and selects ~1/f of rows") {
    val df = (1 to 1000).map(i => s"doc $i content").toDF("text")
    val n1 = Sampling.md5Filter(df, col("text"), 16).count()
    val n2 = Sampling.md5Filter(df, col("text"), 16).count()
    assert(n1 == n2)
    assert(n1 > 20 && n1 < 130) // ~62 expected at 1/16
  }

  test("regexFilter keeps matching keys") {
    val df = Seq("alpha", "beta", "alphabet").toDF("k")
    assert(Sampling.regexFilter(df, col("k"), "^alpha").count() == 2)
  }

  test("observe collects counters during execution with no extra pass") {
    val sink = Counters.attachSink(spark)
    val df = Counters.observe(
      spark.range(100).toDF("id"), "stats",
      "n" -> count(lit(1)), "sum_id" -> sum(col("id")))
    df.write.mode("overwrite").format("noop").save()
    // listener delivery is async-ish; spin briefly
    var tries = 0
    while (sink.metrics().isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
    val m = sink.metrics()("stats")
    assert(m("n") == 100L && m("sum_id") == 4950L)
  }
}
