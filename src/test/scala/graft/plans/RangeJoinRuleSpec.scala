package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {

  private def withRule[A](width: Long)(body: => A): A = {
    val rule = RangeJoinRewrite()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRewrite]) :+ rule
    spark.conf.set(rule.WidthKey, width.toString)
    try body
    finally {
      spark.conf.set(rule.WidthKey, "0")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRewrite])
    }
  }

  private def points = spark.range(0, 2000)
    .select(col("id").as("pid"), (col("id") * 7 % 500).as("p"))
  private def ivals = spark.range(0, 300)
    .select(col("id").as("iid"), (col("id") * 13 % 480).as("lo"))
    .withColumn("hi", col("lo") + (col("iid") % 25))

  test("rewrites BETWEEN inner join to a bucketized equi join, same result") {
    val expected = points.join(ivals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    withRule(16) {
      val joined = points.join(ivals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
      assert(physical.contains("Generate explode"), physical)
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }

  test("narrow-point spread mirrors Joins.rangeJoin: (bucket, point) under a broadcast window side, bucket alone otherwise") {
    def spreadKeys(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
          r.partitionExpressions.length
      }
    val cond = col("p") >= col("lo") && col("p") <= col("hi")
    val expected = points.join(ivals, cond).select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule(16) {
      // ivals is tiny → broadcast side → full (bucket, point) fan-out
      val broad = points.join(ivals, cond)
      assert(spreadKeys(broad) == Seq(2),
        s"broadcast window side must spread by (bucket, point): ${spreadKeys(broad)}")
      // the window side must be the BUILD side (BuildRight) — without the
      // hint Spark broadcasts the smaller point side and the explode
      // serializes into the window side's AQE-coalesced partitions
      assert(broad.queryExecution.executedPlan.toString.contains("BuildRight"),
        "the exploded window side must be hinted broadcast (BuildRight)")
      assert(broad.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val shuffled = points.join(ivals, cond)
        assert(spreadKeys(shuffled) == Seq(1),
          s"non-broadcast window side must keep the co-partitionable bucket key: ${spreadKeys(shuffled)}")
        assert(shuffled.select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet == expected,
          "spread-key choice must never change rows")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("does not touch joins that already have an equi conjunct") {
    withRule(16) {
      val joined = points.withColumn("k", col("pid") % 3)
        .join(ivals.withColumn("k", col("iid") % 3),
          Seq("k")).filter(col("p") >= col("lo") && col("p") <= col("hi"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Generate explode"), physical)
    }
  }

  test("inverted intervals do not explode (guarded to an empty bucket list)") {
    import spark.implicits._
    val p = Seq((1L, 10L), (2L, 3L)).toDF("pid", "p")
    // the sentinel row's naive sequence(bucket(1e12), bucket(0)) would be a
    // ~1.4e11-element descending array — the rewrite must not build it
    val iv = Seq((100L, 0L, 20L), (200L, 1000000000000L, 0L)).toDF("iid", "lo", "hi")
    val expected = p.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule(7) {
      val joined = p.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("Generate explode"), physical)
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected && got == Set((1L, 100L), (2L, 100L)))
    }
  }

  test("date-typed BETWEEN joins rewrite to the bucketized plan with unchanged results") {
    import spark.implicits._
    // 400 daily points against 60 date windows of 5-32 days each
    val p = spark.range(0, 400)
      .select(col("id").as("pid"), date_add(lit("2024-01-01").cast("date"),
        (col("id") * 7 % 365).cast("int")).as("d"))
    val iv = spark.range(0, 60)
      .select(col("id").as("iid"), date_add(lit("2024-01-01").cast("date"),
        (col("id") * 11 % 350).cast("int")).as("lo"))
      .withColumn("hi", date_add(col("lo"), (col("iid") % 28 + 5).cast("int")))
    val cond = col("d") >= col("lo") && col("d") <= col("hi")
    val expected = p.join(iv, cond).select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    withRule(30) { // width in DAYS for date columns
      val joined = p.join(iv, cond)
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
      assert(physical.contains("Generate explode"), physical)
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }

  test("timestamp-typed BETWEEN joins rewrite with micro-second bucket widths") {
    // hourly points against 30 windows of up to ~2 days
    val p = spark.range(0, 500)
      .select(col("id").as("pid"),
        (lit("2024-03-01 00:00:00").cast("timestamp") +
          make_dt_interval(lit(0), (col("id") * 3 % 700).cast("int"))).as("ts"))
    val iv = spark.range(0, 30)
      .select(col("id").as("iid"),
        (lit("2024-03-01 00:00:00").cast("timestamp") +
          make_dt_interval(lit(0), (col("id") * 19 % 650).cast("int"))).as("lo"))
      .withColumn("hi", col("lo") + make_dt_interval(lit(0), (col("iid") % 48 + 1).cast("int")))
    val cond = col("ts") >= col("lo") && col("ts") <= col("hi")
    val expected = p.join(iv, cond).select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    withRule(86400000000L) { // 1 day in MICROSECONDS
      val joined = p.join(iv, cond)
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
      assert(physical.contains("Generate explode"), physical)
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }

  test("non-numeric width conf disables the rewrite instead of failing the query") {
    val rule = RangeJoinRewrite()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRewrite]) :+ rule
    spark.conf.set(rule.WidthKey, "not-a-number")
    try {
      val joined = points.join(ivals, col("p") >= col("lo") && col("p") <= col("hi"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Generate explode"), physical)
      assert(joined.limit(5).count() == 5) // executes fine, rule just off
    } finally {
      spark.conf.set(rule.WidthKey, "0")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRewrite])
    }
  }

  test("null-safe equi conjunct counts as an equi join (no redundant rewrite)") {
    withRule(16) {
      val l = points.withColumn("k", col("pid") % 3).alias("l")
      val r = ivals.withColumn("k", col("iid") % 3).alias("r")
      val joined = l.join(r,
        col("l.k") <=> col("r.k") && col("p") >= col("lo") && col("p") <= col("hi"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Generate explode"), physical)
    }
  }

  test("preserves row multiplicity (duplicate points and overlapping intervals)") {
    import spark.implicits._
    val p = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("pid", "p")
    val iv = Seq((100L, 0L, 20L), (200L, 5L, 15L), (300L, 10L, 10L)).toDF("iid", "lo", "hi")
    val expected = p.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      .groupBy().count().head().getLong(0)
    withRule(7) {
      val got = p.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .groupBy().count().head().getLong(0)
      // pid 1 and 2 sit at p=10, inside all three intervals; pid 3 matches none
      assert(got == expected && got == 6L)
    }
  }
}
