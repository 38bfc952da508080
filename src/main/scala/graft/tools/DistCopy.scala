package graft.tools

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed file-tree copy with per-file validation — the engine's DistCp
  * (reference: hadoop-tools/hadoop-distcp/src/main/java/org/apache/hadoop/
  * tools/DistCp.java:1, mapred/CopyMapper.java:1). The most-used Hadoop
  * operational tool: replicate a dataset between filesystems/clusters with
  * per-file integrity checks and incremental re-runs.
  *
  * Shape: the copy listing (paths + lengths, never bytes) is built on the
  * driver like DistCp's CopyListing; files are copied one-per-task, largest
  * first (the UniformSize scheduling intent — long copies start early), all
  * byte movement through the Hadoop FileSystem API on executors, so the same
  * code copies HDFS↔HDFS, HDFS↔object-store, local↔anything. The report —
  * one row per file with the action taken — is the only thing that returns.
  *
  * Semantics mirrored from CopyMapper.java:
  *  - every copy lands on a task-attempt temp name and is renamed into place
  *    via FileContext rename(OVERWRITE) — atomic on HDFS; elsewhere the FS
  *    may realize overwrite as an internal delete+rename (see
  *    `Sinks.keyedTextFiles`), but a retried/speculative attempt can never
  *    leave a HALF-file under the final name either way;
  *  - `update = true` re-run: a file is SKIPPED when the destination exists
  *    with equal length and (unless `checksum = false`) equal content digest
  *    (CopyMapper.java:376-402's size+checksum skip rule);
  *  - after each copy the destination is re-read and its MD5 compared to the
  *    source's (computed while streaming) — a hard per-file validation.
  *    DistCp compares composite FileChecksums, which HDFS serves from block
  *    metadata without re-reading but object stores often can't
  *    (CopyMapper.java:383-386) — content MD5 costs one extra sequential
  *    read of what was just written but validates on EVERY filesystem pair.
  *    `checksum = false` (DistCp's -skipcrccheck) drops both digest passes
  *    and validates length only;
  *  - `preserve` (DistCp's -p flag string, the full `rbugpcaxt` surface of
  *    DistCpOptionSwitch.java:49 — Replication, Block-size, User, Group,
  *    Permission, Checksum-type, ACLs, XAttrs, Timestamps): each requested
  *    attribute is applied after validation where the destination
  *    filesystem supports it and DEGRADES GRACEFULLY (logged notice, flag
  *    dropped from the report's `preserved` column) where it does not —
  *    ownership/ACLs/XAttrs need a privileged or capable FS,
  *    replication/block-size only mean anything on HDFS-likes, and
  *    checksum-type is a create-time HDFS option no local FS exposes.
  *    Block-size and replication are applied at CREATE time on the copy
  *    branch (the only time a block size can be chosen); on the update-skip
  *    branch block-size is immutable for an existing file, so `b` degrades
  *    there (the reference instead re-copies on block-size mismatch under
  *    -pb — a divergence documented here: off-HDFS the block size is
  *    unobservable, so re-copying for it would be pure cost). Attributes
  *    ARE re-applied on skipped files (the reference's CopyMapper calls
  *    preserve even for SKIPs), so an update+preserve re-run converges
  *    attribute drift without re-copying bytes.
  *
  * Directory structure: parents are created on demand; empty source
  * directories are not replicated (copy what has bytes).
  */
object DistCopy {

  /** The reference's full -p attribute universe, in canonical order. */
  private val PreserveFlags = "rbugpcaxt"

  /** One row per source file: relative path, size, what happened — "copy"
    * (bytes moved + validated) or "skip" (update-mode unchanged) — and
    * which preserve flags were actually applied (requested flags the
    * destination FS cannot honor are dropped here, with a logged notice). */
  final case class FileReport(rel: String, bytes: Long, action: String,
                              preserved: String)

  /** Once-per-JVM-per-(flag, reason) degradation notice: at 10^8 files a
    * per-file warning would BE the job output. */
  private val noticed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def noteDegraded(flag: Char, why: String): Unit =
    if (noticed.add(s"$flag|$why"))
      System.err.println(s"[distcp] -p$flag unsupported here ($why); continuing without it")

  /** Apply the requested preserve flags to `dp`, returning those actually
    * applied. `atCreate` flags (r/b, chosen at create time) are VERIFIED
    * against the destination's status rather than assumed — a local FS
    * silently accepts-and-ignores the create-time replication/block-size
    * params, and the report must never claim an unapplied flag. `srcSt` is
    * the caller's already-fetched source status (no second metadata RPC
    * per file). Ordering: mutators that may bump times run first;
    * permission then timestamps LAST, so nothing disturbs what was set. */
  private def applyPreserve(flags: String, sfs: FileSystem, sp: Path,
                            srcSt: org.apache.hadoop.fs.FileStatus,
                            dfs: FileSystem, dp: Path,
                            atCreate: String): String = {
    if (flags.isEmpty) return ""
    val st = srcSt
    val applied = new StringBuilder
    if (atCreate.nonEmpty) {
      val dstSt = dfs.getFileStatus(dp)
      if (atCreate.indexOf('r') >= 0) {
        if (dstSt.getReplication == st.getReplication) applied.append('r')
        else noteDegraded('r', s"create-time replication not honored on ${dfs.getScheme}")
      }
      if (atCreate.indexOf('b') >= 0) {
        if (dstSt.getBlockSize == st.getBlockSize) applied.append('b')
        else noteDegraded('b', s"create-time block size not honored on ${dfs.getScheme}")
      }
    }
    def attempt(flag: Char)(body: => Unit): Unit =
      if (flags.indexOf(flag) >= 0 && atCreate.indexOf(flag) < 0)
        try { body; applied.append(flag) }
        catch { case e: Exception =>
          noteDegraded(flag, s"${e.getClass.getSimpleName} on ${dfs.getScheme}")
        }
    attempt('r') { // verified, not assumed: local setReplication no-ops true
      if (!dfs.setReplication(dp, st.getReplication) ||
          dfs.getFileStatus(dp).getReplication != st.getReplication)
        throw new UnsupportedOperationException("FS declined setReplication")
    }
    attempt('b') { // only choosable at create; an existing file's layout is fixed
      throw new UnsupportedOperationException(
        "block size is immutable for an existing file; re-copy to apply")
    }
    attempt('c') { // HDFS create-time checksum opt; no FS here exposes it
      throw new UnsupportedOperationException(
        "checksum-type preservation is an HDFS create-time option")
    }
    attempt('u')(dfs.setOwner(dp, st.getOwner, null))
    attempt('g')(dfs.setOwner(dp, null, st.getGroup))
    attempt('a')(dfs.setAcl(dp, sfs.getAclStatus(sp).getEntries))
    attempt('x') {
      val xs = sfs.getXAttrs(sp)
      xs.forEach((k, v) => dfs.setXAttr(dp, k, v))
    }
    attempt('p')(dfs.setPermission(dp, st.getPermission))
    attempt('t')(dfs.setTimes(dp, st.getModificationTime, st.getAccessTime))
    PreserveFlags.filter(applied.toString.indexOf(_) >= 0)
  }

  /** Streaming MD5 of a file's content through its own filesystem. */
  private def md5Of(fs: FileSystem, p: Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    val buf = new Array[Byte](1 << 16)
    try {
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Copy (or update-skip) ONE file — the shared per-task body of both the
    * in-memory and the spilled-listing drivers. */
  private def copyOne(conf: org.apache.hadoop.conf.Configuration,
                      qsrcStr: String, qdstStr: String, rel: String,
                      update: Boolean, checksum: Boolean,
                      preserve: String): FileReport = {
    val sp = new Path(s"$qsrcStr/$rel")
    val dp = new Path(s"$qdstStr/$rel")
    val sfs = sp.getFileSystem(conf)
    val dfs = dp.getFileSystem(conf)
    val srcSt = sfs.getFileStatus(sp)
    val srcLen = srcSt.getLen
    val skip = update && dfs.exists(dp) &&
      dfs.getFileStatus(dp).getLen == srcLen &&
      (!checksum || md5Of(dfs, dp) == md5Of(sfs, sp))
    if (skip)
      // attributes re-sync even when the bytes skip (the reference's
      // CopyMapper calls preserve for SKIPs too): a source whose
      // mtime/permissions changed since the last run converges here
      FileReport(rel, srcLen, "skip",
        applyPreserve(preserve, sfs, sp, srcSt, dfs, dp, atCreate = ""))
    else {
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(tc => s"${tc.stageAttemptNumber()}-${tc.taskAttemptId()}")
        .getOrElse("driver")
      val tmp = new Path(dp.getParent, s".${dp.getName}.distcp-$attempt")
      dfs.mkdirs(dp.getParent)
      val md = java.security.MessageDigest.getInstance("MD5")
      // replication and block size are CREATE-time choices — honor -pr/-pb
      // by creating the temp with the source's values (the rename carries
      // them to the final name); everything else is a post-copy setter
      val atCreate = PreserveFlags.filter(f =>
        preserve.indexOf(f) >= 0 && (f == 'r' || f == 'b'))
      // any failure before the rename (write I/O error, length-mismatch
      // require) must delete the temp: a stale `.name.distcp-*` left in the
      // destination would be listed — not hidden — by a later copy FROM it
      try {
        val in = sfs.open(sp)
        val out =
          if (atCreate.isEmpty) dfs.create(tmp, true)
          else dfs.create(tmp, true,
            conf.getInt("io.file.buffer.size", 4096),
            if (atCreate.indexOf('r') >= 0 && srcSt.getReplication > 0)
              srcSt.getReplication else dfs.getDefaultReplication(tmp),
            if (atCreate.indexOf('b') >= 0 && srcSt.getBlockSize > 0)
              srcSt.getBlockSize else dfs.getDefaultBlockSize(tmp))
        var copied = 0L
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) {
            if (n > 0) { out.write(buf, 0, n); md.update(buf, 0, n); copied += n }
            n = in.read(buf)
          }
        } finally { in.close(); out.close() }
        require(copied == srcLen,
          s"$rel changed during copy: read $copied of $srcLen bytes")
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(dfs.getUri, conf)
        fc.rename(tmp, dp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch { case e: Throwable =>
        try dfs.delete(tmp, false) catch { case _: Exception => () }
        throw e
      }
      if (checksum) {
        val srcMd5 = md.digest().map("%02x".format(_)).mkString
        val dstMd5 = md5Of(dfs, dp)
        require(dstMd5 == srcMd5,
          s"$rel checksum mismatch after copy: src $srcMd5 dst $dstMd5")
      }
      // remaining attribute preservation (CopyMapper's preserve step):
      // applied LAST so the validation re-read can't disturb what was set
      FileReport(rel, srcLen, "copy",
        applyPreserve(preserve, sfs, sp, srcSt, dfs, dp, atCreate))
    }
  }

  /** Copy every file under `srcDir` to the same relative path under
    * `dstDir`. Returns the per-file report (also the unit test surface:
    * callers assert on action counts).
    *
    * Listings up to `spillThreshold` entries are held in driver memory
    * (~100 B each — the default 2^20 is ~100 MB, the envelope DistCp's
    * in-memory listing build works in). Beyond that the listing is SPILLED:
    * streamed to a scratch file while it is built (driver memory stays
    * O(threshold)) and the copy is driven from a DataFrame over that file —
    * DistCp's sequence-file CopyListing, re-expressed. In spill mode the
    * report is written to scratch parquet by the copy tasks themselves and
    * returned as a lazy frame over it, so at the 10^8-file scale neither the
    * listing nor the report ever concentrates on the driver. */
  def copy(spark: SparkSession, srcDir: String, dstDir: String,
           update: Boolean = false, checksum: Boolean = true,
           maxTasks: Int = 128, spillThreshold: Int = 1 << 20,
           preserve: String = ""): DataFrame = {
    val badFlags = preserve.filter(PreserveFlags.indexOf(_) < 0)
    require(badFlags.isEmpty,
      s"unknown -p flag(s) '$badFlags' (supported: $PreserveFlags)")
    val sc = spark.sparkContext
    val conf = sc.hadoopConfiguration
    val srcFs = new Path(srcDir).getFileSystem(conf)
    val qsrc = srcFs.makeQualified(new Path(srcDir))
    val dstFs = new Path(dstDir).getFileSystem(conf)
    dstFs.mkdirs(new Path(dstDir))
    val qdst = dstFs.makeQualified(new Path(dstDir))
    val (qsrcStr, qdstStr) = (qsrc.toString, qdst.toString)
    val bc = sc.broadcast(graft.sources.Scratch.confEntries(conf))

    // Copy listing: metadata only (path + length), streamed from the
    // recursive iterator — only the first `spillThreshold` entries are ever
    // buffered before the spill decision.
    val it = TreeListing.list(srcFs, qsrc)
    val head = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (it.hasNext && head.size < spillThreshold) head += it.next()

    if (it.hasNext)
      return copySpilled(spark, qsrcStr, qdstStr, head.iterator ++ it,
        update, checksum, preserve, maxTasks, bc)

    val listing = head.sortBy(-_._2).toSeq // largest first: long copies schedule early
    require(listing.forall(f => f._1.nonEmpty && !f._1.startsWith("/")),
      s"source listing produced a non-relative path under $qsrc")

    val slices = math.max(1, math.min(listing.size, maxTasks))
    // Round-robin the size-descending listing across tasks: parallelize()
    // slices CONTIGUOUSLY, which would hand all the largest files to task 0
    // to copy serially. One group per partition (parallelize of `slices`
    // groups into `slices` slices) puts the i-th largest file on task
    // i % slices — byte-balanced to within one large file.
    val groups = (0 until slices).map(s =>
      (s until listing.size by slices).map(listing))
    val reports = sc.parallelize(groups, slices).flatMap(identity).map { case (rel, _) =>
      copyOne(graft.sources.Scratch.confFrom(bc.value), qsrcStr, qdstStr, rel,
        update, checksum, preserve)
    }.collect()
    // EAGER by design: the copy is a side effect of the tasks — returning
    // the lazy RDD would silently re-copy the whole tree on every action
    // (a second count(), an AQE re-plan, a lost-executor recompute). The
    // collected report is one small row per file, the same envelope as the
    // driver-side listing above.
    spark.createDataFrame(reports.toSeq)
  }

  /** Spilled-listing driver: the listing streams to a scratch text file
    * (`len TAB rel` per line, never resident in driver memory), tasks are
    * fed from a DataFrame over it, and the report lands in scratch parquet
    * written by the copy tasks. Scheduling differs from the in-memory path
    * only in HOW balance is achieved: round-robin row distribution balances
    * task file-counts statistically (exact global striping would need a
    * global sort rank — a driver-sized bottleneck at this scale), and each
    * task copies its own files largest-first. */
  private def copySpilled(spark: SparkSession, qsrcStr: String, qdstStr: String,
                          entries: Iterator[(String, Long)],
                          update: Boolean, checksum: Boolean, preserve: String,
                          maxTasks: Int,
                          bc: org.apache.spark.broadcast.Broadcast[Array[(String, String)]]): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val scratch = graft.sources.Scratch.dir(spark,
      s"graft_distcp_spill_${spark.sparkContext.applicationId}_${spillRunCounter.getAndIncrement()}")
    val listingPath = new Path(s"$scratch/listing.txt")
    val os = listingPath.getFileSystem(conf).create(listingPath, true)
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(os, java.nio.charset.StandardCharsets.UTF_8))
    // \r is rejected along with \n: Hadoop's line reader splits on lone CR
    // too, so a CR-bearing name would silently garble the listing
    try entries.foreach { case (rel, len) =>
      require(rel.nonEmpty && !rel.startsWith("/") &&
        !rel.contains("\n") && !rel.contains("\r") && !rel.contains("\t"),
        s"unsupported path in listing: $rel")
      w.write(s"$len\t$rel\n")
    } finally w.close()

    val reportDir = s"$scratch/report"
    try {
      spark.read.text(listingPath.toString)
        .select(
          split(col("value"), "\t", 2).getItem(0).cast("long").as("len"),
          split(col("value"), "\t", 2).getItem(1).as("rel"))
        .repartition(math.max(1, maxTasks))
        .sortWithinPartitions(col("len").desc)
        .select(col("rel"), col("len")).as[(String, Long)]
        .mapPartitions { rows =>
          val taskConf = graft.sources.Scratch.confFrom(bc.value)
          rows.map { case (rel, _) =>
            copyOne(taskConf, qsrcStr, qdstStr, rel, update, checksum, preserve)
          }
        }
        // the write EXECUTES the copy exactly once (same eagerness contract
        // as the in-memory path); the returned frame reads the report
        .write.mode("overwrite").parquet(reportDir)
    } finally {
      // delete the spilled listing on failure too (it can be GBs)
      try listingPath.getFileSystem(conf).delete(listingPath, false)
      catch { case _: Exception => () }
    }
    spark.read.parquet(reportDir)
  }

  private val spillRunCounter = new java.util.concurrent.atomic.AtomicLong()
}
