package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  test("curate filters, dedups exactly and near-dup, and annotates") {
    import spark.implicits._
    val near1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val near2 = (near1.split(" ").dropRight(1) :+ "wX").mkString(" ") // ~97% shingle overlap
    val docs = Seq(
      (1L, near1, "en"),
      (2L, near1, "en"),            // exact dup of 1 → dropped
      (3L, near2, "en"),            // near-dup of 1 → dropped
      (4L, "tiny", "en"),           // < minTokens → dropped
      (5L, "the quick brown fox jumps over a lazy dog", "en"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusPipeline.curate(docs, CorpusPipeline.Config(nearDupThreshold = 0.5))
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out == Seq(1L, 5L))
  }

  test("run() writes a partitioned curated corpus from testdata") {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val back = CorpusPipeline.run(spark, sf, out)
    val n = back.count()
    assert(n > 0 && n <= 500)
    assert(back.columns.contains("predicted_lang"))
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("predicted_lang=")))
  }
}
