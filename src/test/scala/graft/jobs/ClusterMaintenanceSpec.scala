package graft.jobs

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class ClusterMaintenanceSpec extends SparkSpec {

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.select("id", "cluster_id", "cluster_size", "is_canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("foldBatch over ascending batches equals the full pruned build; replay is idempotent; retention keeps two versions") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    val cfg = ClusterMaintenance.Config(threshold = 0.35, numPlanes = 4,
      dim = 64, probeRadius = 1, numTables = 16)
    def batch(w: Int) = emb.filter(
      col("vec_id") >= (maxId + 1) * w / 3 && col("vec_id") < (maxId + 1) * (w + 1) / 3)

    val root = java.nio.file.Files.createTempDirectory("cmaint").toString
    val (state, corpus) = (s"$root/state", s"$root/corpus")
    ClusterMaintenance.foldBatch(batch(0), 0, state, corpus, "vec_id", "embedding", cfg)
    ClusterMaintenance.foldBatch(batch(1), 1, state, corpus, "vec_id", "embedding", cfg)
    // REPLAY of batch 1 (the crash-recovery path): keyed overwrites make
    // the second invocation rewrite identical state, not corrupt it
    ClusterMaintenance.foldBatch(batch(1), 1, state, corpus, "vec_id", "embedding", cfg)
    ClusterMaintenance.foldBatch(batch(2), 2, state, corpus, "vec_id", "embedding", cfg)

    val got = rows(ClusterMaintenance.latestAssignment(spark, state))
    val full = rows(Dedup.componentAssignments(
      emb.select(col("vec_id")), "vec_id",
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35, numPlanes = 4, dim = 64, probeRadius = 1, numTables = 16),
      "id_a", "id_b"))
    assert(got == full,
      s"incremental service diverged from the full pruned build (${got.size} vs ${full.size})")

    // retention: after batch 2 commits, v=0 is gone and v=1/v=2 remain
    val versions = new java.io.File(state).listFiles()
      .map(_.getName).filter(_.startsWith("v=")).sorted.toSeq
    assert(versions == Seq("v=1", "v=2"), s"unexpected versions: $versions")
  }
}
