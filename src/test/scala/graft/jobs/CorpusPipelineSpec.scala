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

  test("curateStream gates quality and dedups content on a live micro-batch stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    final case class Doc(doc_id: Long, ingest_ts: java.sql.Timestamp, text: String, lang: String)
    val good = "the quick brown fox jumps over a lazy dog"
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val stream = mem.toDS().toDF("doc_id", "ingest_ts", "text", "lang")
    val q = CorpusPipeline.curateStream(stream)
      .writeStream.format("memory").queryName("curate_stream_out")
      .outputMode("append").start()
    try {
      def ts(m: Int) = new java.sql.Timestamp(86400000L + m * 60000L)
      mem.addData(
        (1L, ts(0), good, "en"),
        (2L, ts(1), "tiny", "en"),       // fails the quality gate
        (3L, ts(2), good, "en"))         // same content as 1 → deduped
      q.processAllAvailable()
      mem.addData((4L, ts(3), good + " again", "en"))
      q.processAllAvailable()
      val ids = spark.table("curate_stream_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(4L) && ids.intersect(Set(1L, 3L)).size == 1 && !ids.contains(2L),
        s"unexpected curated ids: $ids")
    } finally q.stop()
  }

  test("curate's PII scrub and repetition gate") {
    import spark.implicits._
    val looping = ("spam ham " * 30).trim                 // top 2-gram covers ~half
    val clean = "the quick brown fox jumps over a lazy dog"
    val docs = Seq(
      (1L, looping, "en"),
      (2L, clean, "en"),
      (3L, s"$clean mail bob@example.com today", "en"),
      (4L, s"$clean mail sue@example.org today", "en")) // after scrub: dup of 3
      .toDF("doc_id", "text", "lang")
    val cfg = CorpusPipeline.Config(minUniqRatio = 0.0, maxTop2gramFrac = 0.2,
      scrubPii = true)
    val out = CorpusPipeline.curate(docs, cfg).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(ids == Seq(2L, 3L)) // 1 repetition-gated; 4 dedups into 3 post-scrub
    val texts = out.map(_.getAs[String]("text"))
    assert(texts.exists(_.contains("<EMAIL>")) && !texts.exists(_.contains("@")))
  }

  test("curationReport stage counts are consistent with curate itself") {
    import spark.implicits._
    val near1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val near2 = (near1.split(" ").dropRight(1) :+ "wX").mkString(" ")
    val docs = Seq(
      (1L, near1, "en"),
      (2L, near1, "en"),            // exact dup of 1
      (3L, near2, "en"),            // near-dup of 1
      (4L, "tiny", "en"),           // fails the quality gate
      (5L, "the quick brown fox jumps over a lazy dog", "de"))
      .toDF("doc_id", "text", "lang")
    val cfg = CorpusPipeline.Config(nearDupThreshold = 0.5)
    val rep = CorpusPipeline.curationReport(docs, cfg)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_input"), r.getAs[Long]("n_quality"),
         r.getAs[Long]("n_exact"), r.getAs[Long]("n_final"))).toMap
    // en: 4 in, 3 pass quality (4 is tiny), 2 after exact (2 dups into 1),
    // 1 after near-dup (3 folds into 1); de: untouched at every stage
    assert(rep("en") == (4L, 3L, 2L, 1L))
    assert(rep("de") == (1L, 1L, 1L, 1L))
    // the final column agrees with what curate actually returns per language
    val curated = CorpusPipeline.curate(docs, cfg)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep.view.mapValues(_._4).toMap.filter(_._2 > 0) == curated)
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
