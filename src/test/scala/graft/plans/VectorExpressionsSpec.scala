package graft.plans

import graft.SparkSpec
import graft.operators.Similarity
import graft.plans.VectorExpressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is bit-identical to the HOF fold and the static unroll") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map(_ => (Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      vec_dot(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b"), -1).as("hof"),
      Similarity.dot(col("a"), col("b"), 64).as("unrolled")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) == r.getDouble(2))
    }
  }

  test("vec_dot handles nulls and stays inside whole-stage codegen") {
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).collect().head.isNullAt(0))
    // a parquet-backed plan (local relations are folded before codegen)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.select(vec_dot(col("embedding"), col("embedding")).as("n2"))
    // "*(n)" prefixes mark whole-stage-codegen'd operators in the plan string
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [vectordot"))
    assert(q.collect().forall(r => r.getDouble(0) >= 0.0))
  }

  test("vec_dot registers for SQL (runtime registry + extensions wiring)") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect().head.getDouble(0)
    assert(v == 11.0)
    // the builder-time path wires the same function tuple
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
