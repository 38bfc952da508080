package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks — the reference's output-format family over `df.write`.
  *
  * Mappings (SURVEY §2.2):
  *  - TextOutputFormat (key TAB value lines)       → csv with tab separator
  *  - MultipleTextOutputFormat / MultipleOutputs   → `partitionBy` dynamic partitioning
  *  - NullOutputFormat                             → `format("noop")`
  *  - DBOutputFormat                               → `write.jdbc`
  *  - FileOutputCommitter / ManifestCommitter      → built-in (Spark drives Hadoop committers)
  *
  * Scale notes: partitioned writes should be preceded by
  * `repartition(partitionCols)` so each task writes few files (no
  * small-file explosion at 1000 executors); `maxRecordsPerFile` caps runaway
  * partitions.
  */
object Sinks {

  /** TextOutputFormat: `key<TAB>value` lines. */
  def keyValueText(df: DataFrame, path: String, separator: String = "\t"): Unit =
    df.select(concat_ws(separator, df.columns.map(col): _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Dynamic-partitioned parquet (MultipleOutputs / MultipleTextOutputFormat):
    * one directory per distinct partition value.
    *
    * Repartitioning on the partition columns ALONE collapses parallelism to
    * the partition-value cardinality (3 writers for a 3-value column — at
    * 100 TB that's 3 tasks writing the whole table). Instead the shuffle key
    * is (partitionCols, spread) where spread fans each value over up to
    * `numWriteTasks` writers: full write parallelism, while files-per-dir
    * stays bounded by numWriteTasks (no small-file explosion). The explicit
    * partition count keeps AQE from re-coalescing the write stage. */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         numWriteTasks: Int = 32): Unit = {
    val spread = pmod(xxhash64(struct(df.columns.map(col): _*)), lit(numWriteTasks))
    df.repartition(numWriteTasks, partitionCols.map(col) :+ spread: _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** MultipleOutputs named side outputs (.../lib/output/MultipleOutputs.java:187):
    * several independently-shaped outputs from ONE computed input. The input
    * should be cached/checkpointed by the caller if expensive — each named
    * output is a separate write of a derived frame. */
  def multipleOutputs(df: DataFrame,
                      outputs: Map[String, (DataFrame => DataFrame, String)]): Unit =
    outputs.foreach { case (_, (derive, path)) =>
      derive(df).write.mode(SaveMode.Overwrite).parquet(path)
    }

  /** Old-API MultipleTextOutputFormat with ARBITRARY per-record file naming
    * (CORE/mapred/lib/MultipleOutputFormat.java:90,144
    * `generateFileNameForKeyValue`): the output file of each record is any
    * derived expression of the record — not just the `name=value/` directory
    * scheme `partitionBy` offers (e.g. `reports/2024/us.txt` from a date and
    * a region column).
    *
    * Plan shape: one shuffle on the file-name column co-locates each file's
    * records (and sorts within partitions, so a task streams file-by-file),
    * then each task writes its files through the Hadoop FileSystem API — so
    * the sink works against HDFS/object stores on a real cluster. Several
    * small files may share a task; one file never spans tasks. Parallelism =
    * min(distinct names, numWriteTasks); per-file write is streaming, so
    * file size is unbounded.
    *
    * Safety: data-derived names are validated structurally (relative, no
    * `..`, no URI scheme) AND the resolved path is required to stay under
    * `baseDir`. Each file is written to a task-attempt temp name and renamed
    * into place only after it is complete, so a retried or speculative task
    * attempt can never interleave bytes with another attempt — the
    * last-committed attempt wins with a whole file (rename is the same
    * task-commit primitive FileOutputCommitter v2 relies on). With
    * `overwrite` (default, matching the sibling sinks' SaveMode.Overwrite)
    * the base dir is cleared first so stale files from a previous run can't
    * mix generations.
    *
    * @param fileName column evaluating to the file's RELATIVE path under
    *                 `baseDir`
    * @param line     column with the record's text line (null is rejected
    *                 with the offending file named, like ANSI mode would)
    */
  def keyedTextFiles(df: DataFrame, fileName: org.apache.spark.sql.Column,
                     line: org.apache.spark.sql.Column, baseDir: String,
                     numWriteTasks: Int = 32, overwrite: Boolean = true): Unit = {
    val spark = df.sparkSession
    val driverConf = spark.sparkContext.hadoopConfiguration
    if (overwrite) Scratch.delete(driverConf, baseDir)
    val bc = spark.sparkContext.broadcast(Scratch.confEntries(driverConf))
    df.select(fileName.cast("string").as("__file"), line.cast("string").as("__line"))
      .repartition(numWriteTasks, col("__file"))
      .sortWithinPartitions("__file")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val conf = Scratch.confFrom(bc.value)
          val base = new org.apache.hadoop.fs.Path(baseDir)
          val fs = base.getFileSystem(conf)
          // FileContext gives rename-with-OVERWRITE: one atomic replace, no
          // delete window (see commit() below)
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
          val qualifiedBase = fs.makeQualified(base).toString
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(tc => s"${tc.stageAttemptNumber()}-${tc.taskAttemptId()}")
            .getOrElse("driver")
          def resolve(name: String): org.apache.hadoop.fs.Path = {
            // structural checks plus a resolved-prefix check: Path(parent,
            // child) passes a scheme-qualified child ("file:/etc/x",
            // "hdfs://other/x") through UNRESOLVED, so prefix-verify the
            // qualified result too
            require(name != null && name.nonEmpty && !name.startsWith("/") &&
              !name.contains(":") && !name.split('/').contains(".."),
              s"unsafe output file name: $name")
            val p = fs.makeQualified(new org.apache.hadoop.fs.Path(base, name))
            require(p.toString.startsWith(qualifiedBase + "/"),
              s"output file name escapes base dir: $name")
            p
          }
          var current: String = null
          var currentFinal: org.apache.hadoop.fs.Path = null
          var currentTemp: org.apache.hadoop.fs.Path = null
          var out: java.io.BufferedWriter = null
          // complete the in-flight file: close the temp, then replace the
          // final name via FileContext rename(OVERWRITE). On HDFS this is a
          // single atomic replace — no window in which a killed speculative
          // attempt can remove another attempt's committed file. Filesystems
          // whose AbstractFileSystem falls back to the default overwrite
          // implementation (local fs, some object stores) still realize it
          // as an internal delete+rename — a far smaller window than the
          // previous explicit delete-then-rename, but not zero: where
          // attempt-concurrency must be bulletproof off-HDFS, disable
          // speculation for this sink.
          def commit(): Unit = if (out != null) {
            out.close(); out = null
            fc.rename(currentTemp, currentFinal,
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          }
          try {
            rows.foreach { r =>
              val name = r.getString(0)
              // check null on EVERY row: nulls sort first, so a null name at
              // partition start would satisfy `name != current` == false
              // (null == null) and die with a bare NPE at out.write instead
              // of this named error
              require(name != null, "unsafe output file name: null")
              if (name != current) {
                commit()
                current = name
                currentFinal = resolve(name)
                currentTemp = new org.apache.hadoop.fs.Path(currentFinal.getParent,
                  s".${currentFinal.getName}.inprogress-$attempt")
                out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
                  fs.create(currentTemp, true),
                  java.nio.charset.StandardCharsets.UTF_8))
              }
              val text = r.getString(1)
              require(text != null, s"null line for output file $name")
              out.write(text); out.write('\n')
            }
            commit() // the task's last file
          } finally {
            // reached with out != null only when an exception skipped a
            // commit — drop the partial temp, keep committed files intact
            if (out != null) {
              try { out.close(); fs.delete(currentTemp, false) }
              catch { case _: Exception => () }
            }
          }
        }
      }
  }

  /** Discard sink (NullOutputFormat) — runs the plan, writes nothing. */
  def noop(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).format("noop").save()

  /** JDBC sink (DBOutputFormat). */
  def jdbc(df: DataFrame, url: String, table: String,
           props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
}
