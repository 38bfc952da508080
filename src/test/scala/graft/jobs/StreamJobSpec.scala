package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.Encoders

/** End-to-end streaming-job facade tests, mirroring the reference's
  * TestStreaming golden I/O (hadoop-tools/hadoop-streaming .../streaming/
  * TestStreaming.java:69-75: tr-map + uniq-reduce over dotted lines). */
class StreamJobSpec extends SparkSpec {

  private def ds(lines: Seq[String]) = {
    import spark.implicits._
    spark.createDataset(lines)(Encoders.STRING).repartition(3)
  }

  test("mapper + keyed shuffle + reducer reproduces the TestStreaming golden output") {
    // input lines with dots; mapper ≙ `tr . \n` (split words onto lines);
    // reducer ≙ uniq with an R prefix — the reference's golden case
    val input = Seq("roses.are.red", "violets.are.blue", "bunnies.are.pink")
    val out = StreamJob.run(ds(input), StreamJob.Spec(
        mapper = Seq("tr", ".", "\n"),
        reducer = Seq("sh", "-c", "uniq | sed s/^/R/")))
      .collect().sorted.toSeq
    assert(out == Seq("Rare\t", "Rblue\t", "Rbunnies\t", "Rpink\t", "Rred\t", "Rroses\t", "Rviolets\t"))
  }

  test("all lines of one key meet in one partition, contiguous and sorted") {
    // uniq -c only merges CONSECUTIVE lines: correct global counts prove the
    // shuffle contract (partition-by-key + sort-within-partition)
    val input = (1 to 50).flatMap(i => Seq(s"k${i % 5}")) // 10 copies of each of 5 keys
    val out = StreamJob.run(ds(input), StreamJob.Spec(
        mapper = Seq("cat"),
        reducer = Seq("uniq", "-c")))
      .collect().map(_.trim.split("\\s+", 2) match { case Array(n, k) => (k, n.toInt) })
      .toMap
    assert(out == (0 until 5).map(i => s"k$i" -> 10).toMap) // .trim drops the trailing separator
  }

  test("identity reducer yields keyed sorted lines; -k sort spec drives order") {
    val input = Seq("b\t2", "a\t9", "b\t1", "a\t3")
    val perPart = StreamJob.run(ds(input), StreamJob.Spec(
        mapper = Seq("cat"),
        numKeyFields = 1,
        sortSpec = "-k1,1 -k2,2nr")) // by key, then numeric value descending
    // collect per partition: within each partition lines must be sorted
    val parts = perPart.rdd.glom().collect().filter(_.nonEmpty)
    parts.foreach { p =>
      val keys = p.map(_.split("\t")(0))
      assert(keys.sameElements(keys.sorted), s"keys not sorted in ${p.toSeq}")
      p.groupBy(_.split("\t")(0)).foreach { case (_, ls) =>
        val vals = ls.map(_.split("\t")(1).toInt)
        assert(vals.sameElements(vals.sortBy(-(_: Int))), s"values not desc in ${ls.toSeq}")
      }
    }
    assert(perPart.collect().sorted.toSeq == Seq("a\t3", "a\t9", "b\t1", "b\t2"))
  }

  test("partition-on-key-prefix (KeyFieldBasedPartitioner) co-locates by prefix") {
    // key = f1 SEP f2, partition on f1 only: both u1 rows must share a partition
    val input = Seq("u1\tx\t1", "u2\ty\t2", "u1\tz\t3")
    val out = StreamJob.run(ds(input), StreamJob.Spec(
        mapper = Seq("cat"),
        numKeyFields = 2,
        partitionKeyFields = 1))
    val parts = out.rdd.glom().collect().filter(_.nonEmpty)
    val u1Parts = parts.zipWithIndex.filter(_._1.exists(_.startsWith("u1"))).map(_._2)
    assert(u1Parts.length == 1, s"u1 rows split across partitions ${u1Parts.toSeq}")
    assert(out.collect().sorted.toSeq == Seq("u1\tx\t1", "u1\tz\t3", "u2\ty\t2"))
  }

  test("combiner runs before the shuffle and composes with the reducer") {
    // combiner uniq -c turns per-partition runs into `cnt word` lines; the
    // reducer then sums first-field counts per key with awk
    val input = (1 to 30).map(i => s"w${i % 3}")
    val out = StreamJob.run(ds(input), StreamJob.Spec(
        mapper = Seq("cat"),
        combiner = Seq("sh", "-c", """uniq -c | awk '{print $2 "\t" $1}'"""),
        reducer = Seq("sh", "-c",
          """awk -F'\t' '{k=$1; s[k]+=$2; if (!(k in seen)) {order[++n]=k; seen[k]=1}} END {for (i=1;i<=n;i++) print order[i] "\t" s[order[i]]}'""")))
      .collect().map(_.split("\t") match { case Array(k, n) => (k, n.toInt) }).toMap
    assert(out == Map("w0" -> 10, "w1" -> 10, "w2" -> 10))
  }
}
