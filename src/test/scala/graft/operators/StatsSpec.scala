package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exactMedian matches in-memory median on odd and even counts") {
    val odd = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val even = Seq(4.0, 1.0, 3.0, 2.0)
    assert(Stats.exactMedian(odd.toDF("v"), "v") == 5.0)
    assert(Stats.exactMedian(even.toDF("v"), "v") == 2.5)
  }

  test("exactMedian agrees with Spark's exact percentile on real data") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val got = Stats.exactMedian(li, "l_quantity")
    val exp = li.select(median(col("l_quantity"))).collect().head.getDouble(0)
    assert(got == exp)
  }

  test("exactMedian handles heavy duplication (bracket = single value)") {
    val df = (Seq.fill(1000)(7.0) ++ Seq(1.0, 99.0)).toDF("v")
    assert(Stats.exactMedian(df, "v") == 7.0)
  }
}
