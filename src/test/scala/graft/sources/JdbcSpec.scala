package graft.sources

import graft.SparkSpec

/** DBInputFormat / DBOutputFormat against a real database: embedded Derby
  * (ships with Spark). The partitioned read mirrors DataDrivenDBInputFormat's
  * IntegerSplitter — numPartitions stride queries over [lower, upper]. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.put("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc sink + stride-partitioned jdbc source round-trip") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "score")
    Sinks.jdbc(df, url, "people", props) // Append creates the table
    val back = Sources.jdbc(spark, url, "people", "id", 1, 200, 4, props)
    assert(back.rdd.getNumPartitions == 4, "stride partitioning must yield 4 splits")
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == (1 to 200).map(i => (i.toLong, s"name$i", i * 1.5)).toSet)
    // partition pruning sanity: each split reads a disjoint stripe (sum of
    // per-partition counts equals the total, nothing duplicated)
    val perPart = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.sum == 200 && perPart.forall(_ > 0))
  }

  test("predicate-split jdbc source (DataDrivenDB text-splitter shape)") {
    import spark.implicits._
    val df = (1 to 60).map(i => (i.toLong, if (i % 3 == 0) "apple" else if (i % 3 == 1) "mango" else "zebra"))
      .toDF("id", "word")
    Sinks.jdbc(df, url, "words", props)
    // Spark's JDBC writer maps StringType to Derby CLOB with case-sensitive
    // (quoted) names; CLOB needs a VARCHAR cast to be comparable
    val w = """CAST("word" AS VARCHAR(32))"""
    val back = Sources.jdbcPredicates(spark, url, "words",
      Seq(s"$w < 'm'", s"$w >= 'm' AND $w < 't'", s"$w >= 't'"), props)
    assert(back.rdd.getNumPartitions == 3)
    val perPart = back.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq
    assert(perPart == Seq(20, 20, 20)) // disjoint covering stripes
    assert(back.count() == 60)
  }
}
