package graft.jobs

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental semantic-cluster maintenance as a SERVICE — the library
  * piece behind q104's streaming harness, usable from foreachBatch, a
  * scheduled batch job, or a backfill loop alike.
  *
  * State layout (all plain parquet — restartable from nothing but the
  * directories):
  *  - `stateDir/v=N`  — the full-coverage assignment after batch N
  *    (id, cluster_id, cluster_size, is_canonical);
  *  - `corpusDir/b=N` — batch N's vectors (the accumulated corpus every
  *    later batch probes).
  *
  * Contracts:
  *  - batches carry APPEND-ONLY ids (every id in batch N greater than all
  *    ids in batches < N) — the precondition under which
  *    [[Dedup.incrementalComponentAssignments]] equals a full recompute
  *    exactly (star-replacement theorem, spec-gated);
  *  - [[foldBatch]] is IDEMPOTENT per (batchId, batch content): every
  *    write is a keyed overwrite, so a replay after a mid-fold crash
  *    rewrites the same state — exactly-once for a foreachBatch caller
  *    without any sink-side transaction;
  *  - state retention: a replay reads only v=N-1, so versions ≤ N-2 are
  *    deleted as each fold commits — the long-running service holds two
  *    assignment versions at any stream length.
  *
  * Scale shape per fold: |batch| x bucket-candidate similarity
  * ([[Similarity.cosineNearDupPairsAgainst]], the pruned multi-table LSH
  * probe — never corpus x corpus) plus connected components over
  * (corpus star edges + new pairs).
  */
object ClusterMaintenance {

  final case class Config(threshold: Double = 0.35, numPlanes: Int = 4,
                          dim: Int = 64, probeRadius: Int = 1,
                          numTables: Int = 8)

  /** Fold one ingest batch — (idCol: integral, vecCol: array<float>) —
    * into the versioned state. Reads `stateDir/v=${batchId-1}` and
    * `corpusDir/b=0..batchId-1`; writes `stateDir/v=$batchId` and
    * `corpusDir/b=$batchId`; deletes `stateDir/v=${batchId-2}`. */
  def foldBatch(batch: DataFrame, batchId: Long,
                stateDir: String, corpusDir: String,
                idCol: String, vecCol: String,
                cfg: Config = Config()): Unit = {
    val b0 = batch.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("embedding"))
    val b = b0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sess = b.sparkSession
      val corpus =
        if (batchId == 0) b.limit(0)
        else sess.read.schema(b.schema)
          .parquet((0L until batchId).map(i => s"$corpusDir/b=$i"): _*)
      val prior =
        if (batchId == 0)
          b.limit(0).select(col("vec_id").as("id"),
            col("vec_id").as("cluster_id"))
        else sess.read.parquet(s"$stateDir/v=${batchId - 1}")
      val pairs = Similarity.cosineNearDupPairsAgainst(b, corpus,
        "vec_id", "embedding", threshold = cfg.threshold,
        numPlanes = cfg.numPlanes, dim = cfg.dim,
        probeRadius = cfg.probeRadius, numTables = cfg.numTables)
      val next = Dedup.incrementalComponentAssignments(prior,
        b.select(col("vec_id")), "vec_id", pairs, "id_a", "id_b")
      next.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
      b.write.mode("overwrite").parquet(s"$corpusDir/b=$batchId")
      if (batchId >= 2) {
        val p = new org.apache.hadoop.fs.Path(s"$stateDir/v=${batchId - 2}")
        p.getFileSystem(sess.sparkContext.hadoopConfiguration).delete(p, true)
        ()
      }
    } finally b.unpersist(false)
    ()
  }

  /** The latest committed assignment version under `stateDir` (bounded
    * directory listing — at most the retained two versions exist). */
  def latestAssignment(spark: SparkSession, stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val latest = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p)
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.drop(2).toLong).max
    spark.read.parquet(s"$stateDir/v=$latest")
  }
}
