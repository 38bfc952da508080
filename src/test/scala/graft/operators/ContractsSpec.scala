package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContractsSpec extends SparkSpec {
  import spark.implicits._
  import Contracts._

  private def report(df: org.apache.spark.sql.DataFrame, cs: Seq[Constraint]) =
    Contracts.check(df, cs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet

  test("every violation type is counted exactly on a crafted frame") {
    // id 4 dup-keys id 3; id 5 has null b; values: one out-of-bounds (99),
    // one unaccepted ("x"), nulls pass bounds/accepted but fail satisfies
    val df = Seq(
      (1L, Some(10.0), Some("a")),
      (2L, Some(99.0), Some("x")),
      (3L, Some(20.0), Some("b")),
      (3L, Some(30.0), Some("a")),
      (5L, None: Option[Double], None: Option[String])
    ).toDF("k", "b", "v")
    val ref = Seq(1L, 2L, 3L).toDF("rk") // k=5 dangles
    val got = report(df, Seq(
      NotNull("b"),
      Bounds("b", 0, 50),
      AcceptedValues("v", Seq("a", "b")),
      Satisfies("b_lt_25", col("b") < 25), // rows 2,3(30.0),5(null) fail
      RowCountMin(8), // 5 rows -> 3 short
      Unique(Seq("k")), // one extra row on k=3
      ForeignKey("k", ref, "rk", "ref"))) // k=5 dangles (1 row)
    assert(got == Set(
      ("not_null", "b", 1L, "fail"),
      ("bounds", "b in [0.0,50.0]", 1L, "fail"),
      ("accepted_values", "v", 1L, "fail"),
      ("satisfies", "b_lt_25", 3L, "fail"),
      ("row_count_min", ">=8", 3L, "fail"),
      ("unique", "k", 1L, "fail"),
      ("foreign_key", "k->ref.rk", 1L, "fail")))
  }

  test("a clean frame passes every constraint with zero violations") {
    val df = Seq((1L, 5.0, "a"), (2L, 6.0, "b")).toDF("k", "b", "v")
    val got = report(df, Seq(NotNull("b"), Bounds("b", 0, 10),
      AcceptedValues("v", Seq("a", "b")), Satisfies("pos", col("b") > 0),
      RowCountMin(2), Unique(Seq("k")),
      ForeignKey("k", Seq(1L, 2L).toDF("rk"), "rk", "ref")))
    assert(got.forall(r => r._3 == 0L && r._4 == "pass"))
    assert(got.size == 7)
  }

  test("AcceptedValues works on non-string columns (numeric literals)") {
    val df = Seq(1L, 2L, 7L, 2L).toDF("code")
    val got = report(df, Seq(AcceptedValues("code", Seq(1L, 2L, 3L))))
    assert(got == Set(("accepted_values", "code", 1L, "fail"))) // the 7
  }

  test("null FK values are not violations (SQL FK semantics); NotNull catches them") {
    val df = Seq(Some(1L), None, None).toDF("k")
    val ref = Seq(1L).toDF("rk")
    val got = report(df, Seq(ForeignKey("k", ref, "rk", "ref"), NotNull("k")))
    assert(got == Set(("foreign_key", "k->ref.rk", 0L, "pass"),
      ("not_null", "k", 2L, "fail")))
  }

  test("row-local constraints share ONE scan of the input") {
    // the 100 TB property: adding scan-tier checks must not add passes
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val rep = Contracts.check(df, Seq(NotNull("l_shipdate"),
      Bounds("l_quantity", 1, 50), AcceptedValues("l_returnflag", Seq("A", "N", "R")),
      Satisfies("disc", col("l_discount") >= 0), RowCountMin(1)))
    val scans = rep.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 1, s"scan-tier suite read the input ${scans.size} times")
    assert(rep.count() == 5)
  }

  test("an EMPTY batch: sum-shaped checks pass with 0 violations; row-count fails with the exact shortfall") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("k", "b")
    val got = report(empty, Seq(NotNull("b"), Bounds("b", 0, 10),
      Satisfies("pos", col("b") > 0), RowCountMin(5), Unique(Seq("k")),
      ForeignKey("k", Seq(1L).toDF("rk"), "rk", "ref")))
    assert(got == Set(
      ("not_null", "b", 0L, "pass"),
      ("bounds", "b in [0.0,10.0]", 0L, "pass"),
      ("satisfies", "pos", 0L, "pass"),
      ("row_count_min", ">=5", 5L, "fail"),
      ("unique", "k", 0L, "pass"),
      ("foreign_key", "k->ref.rk", 0L, "pass")))
  }

  test("empty suite is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Contracts.check(Seq(1).toDF("x"), Nil)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("checkStream: counters accumulate across micro-batches and equal the batch report") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Option[Double])]
    val suite = Seq(NotNull("b"), Bounds("b", 0, 10), RowCountMin(4))
    val sq = Contracts.checkStream(mem.toDF().toDF("k", "b"), suite)
      .writeStream.format("memory").queryName("contract_stream")
      .outputMode("complete").start()
    try {
      mem.addData((1L, Some(5.0)), (2L, Some(99.0))) // one OOB
      sq.processAllAvailable()
      val mid = spark.table("contract_stream").collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      assert(mid("bounds") == 1L && mid("row_count_min") == 2L)
      mem.addData((3L, None), (4L, Some(-1.0)))      // one null, one OOB
      sq.processAllAvailable()
    } finally sq.stop()
    val fin = spark.table("contract_stream").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3))).toSet
    val batch = Contracts.check(
        Seq((1L, Some(5.0)), (2L, Some(99.0)), (3L, None: Option[Double]),
          (4L, Some(-1.0))).toDF("k", "b"), suite)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3))).toSet
    assert(fin == batch)
    assert(fin == Set(("not_null", 1L, "fail"), ("bounds", 2L, "fail"),
      ("row_count_min", 0L, "pass")))
  }

  test("checkStream rejects stateful-tier constraints loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val e = intercept[IllegalArgumentException] {
      Contracts.checkStream(mem.toDF().toDF("k"), Seq(Unique(Seq("k"))))
    }
    assert(e.getMessage.contains("row-local"))
  }
}
