package graft.jobs

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SpanDedupMaintenanceSpec extends SparkSpec {

  private def toks(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id").cast("long").as("doc_id"), tokens(col("text")).as("toks"))

  private def key(d: org.apache.spark.sql.DataFrame) = d
    .select(col("id"), col("n_tokens"), col("n_dup_starts"), col("n_spans"),
      col("n_covered"), concat_ws(" ", col("clean_toks")).as("clean"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getString(5))).toSet

  test("every fold equals the full recompute over its prefix; compaction bounds the dir count") {
    val docs = toks(spark.read.parquet(s"$sf/documents.parquet"))
      .filter(col("doc_id") < 60)
    def batch(k: Int) = docs.filter(col("doc_id") >= k * 10 && col("doc_id") < (k + 1) * 10)
    def prefix(k: Int) = docs.filter(col("doc_id") < (k + 1) * 10)
    val root = java.nio.file.Files.createTempDirectory("sdm").toString
    val (grams, clean) = (s"$root/grams", s"$root/clean")
    val cfg = SpanDedupMaintenance.Config(n = 8, compactEvery = 2)
    (0 until 6).foreach { k =>
      val got = key(SpanDedupMaintenance.foldBatch(batch(k), k.toLong,
        grams, clean, "doc_id", "toks", cfg))
      // the service contract: fold k == the FULL span dedup over batches
      // 0..k restricted to batch k's docs (the operator's split identity,
      // folded across the whole sequence)
      val want = key(Dedup.removeDuplicateSpansOfTokens(prefix(k), "doc_id", "toks", n = 8)
        .filter(col("id") >= k * 10))
      assert(got == want, s"fold $k diverged from its prefix recompute")
    }
    // compactEvery=2 over 6 folds: gen=3 from fold 4; b=4, b=5 pending —
    // bounded by compactEvery+1 dirs, never the 6 an uncompacted run leaves
    val gdirs = new java.io.File(grams).listFiles()
      .map(_.getName).filter(n => n.startsWith("b=") || n.startsWith("gen=")).sorted.toSeq
    assert(gdirs == Seq("b=4", "b=5", "gen=3"), s"unexpected gram dirs: $gdirs")
    // the deliverable: every batch's clean output is present
    val cdirs = new java.io.File(clean).listFiles()
      .map(_.getName).filter(_.startsWith("b=")).sorted.toSeq
    assert(cdirs == (0 until 6).map(k => s"b=$k").sorted)
  }

  test("replaying the latest fold after compaction is idempotent (crash-recovery path)") {
    val docs = toks(spark.read.parquet(s"$sf/documents.parquet"))
      .filter(col("doc_id") < 30)
    def batch(k: Int) = docs.filter(col("doc_id") >= k * 10 && col("doc_id") < (k + 1) * 10)
    val root = java.nio.file.Files.createTempDirectory("sdm_rp").toString
    val (grams, clean) = (s"$root/grams", s"$root/clean")
    // compactEvery=2: fold 2 compacts gen=1 and deletes b=0/b=1, so the
    // replay must resolve its prior through the committed generation
    val cfg = SpanDedupMaintenance.Config(n = 8, compactEvery = 2)
    (0 until 3).foreach(k => SpanDedupMaintenance.foldBatch(batch(k), k.toLong,
      grams, clean, "doc_id", "toks", cfg))
    val cleanBefore = key(spark.read.parquet(s"$clean/b=2"))
    val gramsBefore = SpanDedupMaintenance.gramCounts(spark, grams)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val replayed = key(SpanDedupMaintenance.foldBatch(batch(2), 2L,
      grams, clean, "doc_id", "toks", cfg))
    val gramsAfter = SpanDedupMaintenance.gramCounts(spark, grams)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(replayed == cleanBefore, "replayed clean output diverged")
    assert(gramsAfter == gramsBefore, "replayed gram state diverged")
    // and the state equals a from-scratch recount of everything ingested
    val recount = Dedup.spanGramCounts(docs, "doc_id", "toks", n = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gramsAfter == recount, "accumulated gram state != full recount")
  }
}
