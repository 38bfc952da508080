package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the manual salting pattern (the reference's
  * only skew tool is RehashPartitioner,
  * hadoop-mapreduce-client-core .../lib/partition/RehashPartitioner.java:35;
  * AQE skew-join splitting is on by default in Engine, this is the explicit
  * tool for when a SINGLE key exceeds what one task can hold).
  *
  * `saltedJoin` splits each left key into `saltFactor` sub-keys via a
  * deterministic row hash and replicates each right row `saltFactor` times,
  * so one hot key spreads over `saltFactor` tasks. Right side grows by the
  * factor — use for skewed-fact ⋈ modest-dim joins.
  */
object Skew {

  def withSalt(df: DataFrame, saltFactor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol,
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltFactor)).cast("int"))

  def replicated(df: DataFrame, saltFactor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, explode(sequence(lit(0), lit(saltFactor - 1))))

  /** Inner/left equi-join on `keys` with left-side salting. Semantically
    * identical to `left.join(right, keys, how)`; physically the join key is
    * (keys..., salt), fanning a hot key across `saltFactor` partitions. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left" || how == "left_outer",
      "salted join supports inner/left joins (right rows are replicated)")
    val l = withSalt(left, saltFactor)
    val r = replicated(right, saltFactor)
    l.join(r, keys :+ "__salt", how).drop("__salt")
  }
}
