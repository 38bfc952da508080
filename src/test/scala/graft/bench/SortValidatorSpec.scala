package graft.bench

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortValidatorSpec extends SparkSpec {
  import spark.implicits._

  test("permutation checksum accepts reorderings, rejects mutations") {
    val in = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
    val shuffled = in.orderBy(rand(42))
    assert(SortValidator.isPermutation(in, shuffled))
    val mutated = in.withColumn("v", when(col("k") === 500, lit("X")).otherwise(col("v")))
    assert(!SortValidator.isPermutation(in, mutated))
    val dropped = in.filter(col("k") =!= 1)
    assert(!SortValidator.isPermutation(in, dropped))
  }

  test("global sort check accepts orderBy output, rejects unsorted") {
    val df = (1 to 5000).map(i => ((i * 37) % 5000, i)).toDF("k", "id")
    assert(SortValidator.isGloballySorted(df.orderBy("k", "id").repartitionByRange(8, col("k"), col("id")).sortWithinPartitions("k", "id"), Seq("k", "id")))
    assert(SortValidator.isGloballySorted(df.orderBy("k"), Seq("k")))
    assert(!SortValidator.isGloballySorted(df, Seq("k")))
  }

  test("validates the lineitem sort query end-to-end") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
    val sorted = li.orderBy("l_orderkey", "l_linenumber")
    assert(SortValidator.isGloballySorted(sorted, Seq("l_orderkey", "l_linenumber")))
    assert(SortValidator.isPermutation(li, sorted))
  }

  test("codec round-trips: gzip and bzip2 compressed text read back identically") {
    val lines = (1 to 500).map(i => s"line $i").toDF("value")
    for (codec <- Seq("gzip", "bzip2")) { // zstd needs native libs absent here
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$codec").toString + "/out"
      lines.write.option("compression", codec).text(dir)
      val back = spark.read.text(dir)
      assert(SortValidator.isPermutation(lines, back), codec)
    }
  }
}
