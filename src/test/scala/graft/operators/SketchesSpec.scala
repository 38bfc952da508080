package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // ---- KMV unit-level algebra (no Spark job: reduce/merge are plain calls) ----

  private def sketchOf(k: Int, xs: Seq[Long]): Array[Long] = {
    val agg = new Sketches.KmvSketch(k)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  test("kmv keeps the k smallest distinct values, sorted") {
    val xs = Seq[Long](50, 10, 30, 10, 20, 40, 5, 50)
    assert(sketchOf(3, xs).toSeq == Seq(5L, 10L, 20L))
    // never fills: every distinct value present
    assert(sketchOf(10, xs).toSeq == Seq(5L, 10L, 20L, 30L, 40L, 50L))
  }

  test("kmv merge equals the sketch of the concatenated stream (mergeability)") {
    val agg = new Sketches.KmvSketch(8)
    val a = (0 until 200).map(i => ((i * 2654435761L) % 100003).abs)
    val b = (0 until 200).map(i => ((i * 40503L + 7) % 100003).abs)
    val merged = agg.merge(sketchOf(8, a), sketchOf(8, b))
    assert(merged.toSeq == sketchOf(8, a ++ b).toSeq)
    // merge is commutative and absorbs the empty sketch
    assert(agg.merge(sketchOf(8, b), sketchOf(8, a)).toSeq == merged.toSeq)
    assert(agg.merge(merged, agg.zero).toSeq == merged.toSeq)
    assert(agg.merge(agg.zero, merged).toSeq == merged.toSeq)
  }

  test("kmv estimate is exact below k and within 30% at 64x fill") {
    // 5000 distinct ids through the same md5-60bit hash the query uses
    val df = spark.range(0, 5000).select(Sketches.hash60(col("id")).as("h"))
    val est = df.agg(Sketches.kmv(64)(col("h")).as("s"))
      .select(Sketches.kmvEstimate(col("s"), 64).as("e"))
      .head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.30, s"estimate $est vs 5000")
    // below k: exact
    val small = spark.range(0, 17).select(Sketches.hash60(col("id")).as("h"))
      .agg(Sketches.kmv(64)(col("h")).as("s"))
      .select(Sketches.kmvEstimate(col("s"), 64).as("e"))
      .head().getDouble(0)
    assert(small == 17.0)
  }

  test("kmv udaf equals the window-rank formulation on a grouped frame") {
    val df = spark.range(0, 3000)
      .select((col("id") % 7).as("g"), Sketches.hash60(col("id")).as("h"))
    val viaUdaf = df.groupBy("g").agg(Sketches.kmv(16)(col("h")).as("s"))
      .select(col("g"), col("s")).as[(Long, Seq[Long])].collect().toMap
    val viaWindow = df.distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("h")))
      .filter(col("rn") <= 16).groupBy("g")
      .agg(sort_array(collect_list("h")).as("s"))
      .select(col("g"), col("s")).as[(Long, Seq[Long])].collect().toMap
    assert(viaUdaf == viaWindow)
  }

  // ---- Count-Min ----

  test("count-min estimates dominate true counts and are exact sans collision") {
    val words = Seq.tabulate(400)(i => s"k${i % 20}").toDF("w") // 20 keys x 20
    val sketch = Sketches.countMin(words, col("w"), lit(1L), depth = 4, width = 64)
    val truth = words.groupBy("w").agg(count(lit(1)).as("t"))
    val est = Sketches.countMinEstimate(sketch, truth, col("w"), depth = 4, width = 64)
    val rows = truth.join(est, col("w") === col("cm_key"))
      .select(col("t"), col("cm_est")).as[(Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (t, e) => assert(e >= t, s"CM underestimated: $e < $t") }
    // 20 keys in a 4x64 grid: at least one depth row must be collision-free
    // for most keys; with these md5 buckets all estimates are exact
    assert(rows.forall { case (t, e) => e == t })
  }

  test("count-min narrow grid shows one-sided error under forced collisions") {
    val words = (0 until 30).flatMap(i => Seq.fill(i + 1)(s"w$i")).toDF("w")
    val sketch = Sketches.countMin(words, col("w"), lit(1L), depth = 2, width = 4)
    val truth = words.groupBy("w").agg(count(lit(1)).as("t"))
    val est = Sketches.countMinEstimate(sketch, truth, col("w"), depth = 2, width = 4)
    val rows = truth.join(est, col("w") === col("cm_key"))
      .select(col("t"), col("cm_est")).as[(Long, Long)].collect()
    assert(rows.forall { case (t, e) => e >= t })
    // 30 keys cannot fit 2x4 cells without collisions: someone overcounts
    assert(rows.exists { case (t, e) => e > t })
  }

  test("count-min probe of a never-seen key estimates from shared cells only") {
    val words = Seq("a", "a", "b").toDF("w")
    val sketch = Sketches.countMin(words, col("w"), lit(1L), depth = 4, width = 1024)
    val est = Sketches.countMinEstimate(sketch, Seq("zz-unseen").toDF("p"),
      col("p"), depth = 4, width = 1024)
    // wide grid: the unseen key's cells are almost surely untouched -> 0
    assert(est.select(col("cm_est")).head().getLong(0) == 0L)
  }

  test("count-min sketch has at most depth x width cells, weights summed") {
    val words = Seq.tabulate(1000)(i => s"k$i").toDF("w")
    val sketch = Sketches.countMin(words, col("w"), lit(2L), depth = 3, width = 8)
    val cells = sketch.collect()
    assert(cells.length <= 3 * 8)
    // total mass per depth row = total weighted stream length
    val perDepth = sketch.groupBy("depth").agg(sum("cnt").as("m"))
      .select("m").as[Long].collect().toSeq
    assert(perDepth == Seq(2000L, 2000L, 2000L))
  }
}
