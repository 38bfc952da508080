package graft

import org.apache.spark.sql.functions._

/** SURVEY §5 idioms 3+5: randomized load (RandomTextWriter-style fuzz input)
  * with golden-by-recomputation checks — the engine's distributed results
  * must equal a plain in-memory Scala recomputation of the same statistic
  * (the TestWordStats protocol, EXT/examples/TestWordStats.java:261-289). */
class GoldenRecomputationSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a")
  private val lines: Seq[String] = (1 to 400).map { _ =>
    (1 to 1 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }
  private lazy val df = lines.toDF("text")

  test("wordcount equals in-memory recomputation on fuzz input") {
    val got = df.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = lines.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == exp)
  }

  test("word mean/median/stddev equal in-memory recomputation") {
    val words = lines.flatMap(_.split("\\s+")).filter(_.nonEmpty)
    val lens = words.map(_.length.toDouble).sorted
    val expMean = lens.sum / lens.size
    val expMedian =
      if (lens.size % 2 == 1) lens(lens.size / 2)
      else (lens(lens.size / 2 - 1) + lens(lens.size / 2)) / 2.0
    val expStd = math.sqrt(lens.map(x => (x - expMean) * (x - expMean)).sum / lens.size)
    val w = df.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
    val r = w.agg(avg(length(col("w"))).as("m"),
      median(length(col("w")).cast("long")).as("md"),
      stddev_pop(length(col("w"))).as("sd")).collect().head
    assert(math.abs(r.getDouble(0) - expMean) < 1e-9)
    assert(math.abs(r.getDouble(1) - expMedian) < 1e-9)
    assert(math.abs(r.getDouble(2) - expStd) < 1e-9)
    // and the scalable exact median agrees too
    assert(Stats2.exactMedianOf(w) == expMedian)
  }

  private object Stats2 {
    def exactMedianOf(w: org.apache.spark.sql.DataFrame): Double =
      graft.operators.Stats.exactMedian(
        w.select(length(col("w")).cast("double").as("len")), "len")
  }

  test("multipleOutputs writes independently-shaped side outputs") {
    val base = java.nio.file.Files.createTempDirectory("graft_mo2")
    graft.sources.Sinks.multipleOutputs(df, Map(
      "counts" -> (((d: org.apache.spark.sql.DataFrame) =>
        d.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .groupBy("w").count()), s"$base/counts"),
      "lens" -> (((d: org.apache.spark.sql.DataFrame) =>
        d.select(length(col("text")).as("n"))), s"$base/lens")))
    assert(spark.read.parquet(s"$base/counts").columns.toSet == Set("w", "count"))
    assert(spark.read.parquet(s"$base/lens").count() == 400)
  }
}
