package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.nio.charset.StandardCharsets

class SourcesSpec extends SparkSpec {

  test("keyValueText splits at first separator; missing separator → empty value") {
    val dir = Files.createTempDirectory("graft_kv")
    Files.write(dir.resolve("in.txt"),
      "k1\tv1\nk2\tv2a\tv2b\nnovalue\n".getBytes(StandardCharsets.UTF_8))
    val got = Sources.keyValueText(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("k1", "v1"), ("k2", "v2a\tv2b"), ("novalue", "")))
  }

  test("fixedLength reads constant-width binary records") {
    val dir = Files.createTempDirectory("graft_fl")
    Files.write(dir.resolve("in.bin"), "AAABBBCCC".getBytes(StandardCharsets.UTF_8))
    val got = Sources.fixedLength(spark, dir.resolve("in.bin").toString, 3)
      .collect().map(r => new String(r.getAs[Array[Byte]](0), StandardCharsets.UTF_8)).toSet
    assert(got == Set("AAA", "BBB", "CCC"))
  }

  test("textWithParallelism controls the partition count (NLineInputFormat's purpose)") {
    val dir = Files.createTempDirectory("graft_nl")
    Files.write(dir.resolve("in.txt"),
      (1 to 100).map(i => s"line$i").mkString("\n").getBytes(StandardCharsets.UTF_8))
    val df = Sources.textWithParallelism(spark, dir.toString, 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == 100)
  }

  test("multipleInputs unions heterogeneous branches by name") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("id", "a_only")
    val b = Seq((2, 9.0)).toDF("id", "b_only")
    val out = Sources.multipleInputs(Seq(a, b))
    assert(out.columns.toSet == Set("id", "a_only", "b_only"))
    assert(out.count() == 2)
  }

  test("xmlRecords extracts begin/end-tag-delimited records") {
    val dir = Files.createTempDirectory("graft_xml")
    Files.write(dir.resolve("in.xml"),
      "<?junk?><rec><a>1</a></rec>\n<rec><a>2</a></rec>trailing".getBytes(StandardCharsets.UTF_8))
    val got = Sources.xmlRecords(spark, dir.toString, "<rec>", "</rec>")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("<rec><a>1</a></rec>", "<rec><a>2</a></rec>"))
  }

  test("sequenceFileText round-trips (Text, Text) records") {
    import org.apache.hadoop.io.Text
    val dir = Files.createTempDirectory("graft_seq").resolve("part").toString
    spark.sparkContext.parallelize(Seq(("k1", "v1"), ("k2", "v2")), 1)
      .map { case (k, v) => (new Text(k), new Text(v)) }
      .saveAsSequenceFile(dir)
    val got = Sources.sequenceFileText(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("k1", "v1"), ("k2", "v2")))
  }

  test("sequenceFileBinary round-trips raw bytes incl. non-UTF8 payloads") {
    import org.apache.hadoop.io.BytesWritable
    val dir = Files.createTempDirectory("graft_seqbin").resolve("part").toString
    val payloads = Seq(
      Array[Byte](0, 1, 2, -1, -128, 127),
      Array[Byte](),                      // empty value must stay empty
      "plain".getBytes(StandardCharsets.UTF_8))
    spark.sparkContext.parallelize(payloads.zipWithIndex, 1)
      .map { case (v, i) => (new BytesWritable(Array(i.toByte)), new BytesWritable(v)) }
      .saveAsSequenceFile(dir)
    val got = Sources.sequenceFileBinary(spark, dir)
      .collect().map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(got == payloads.zipWithIndex.map { case (v, i) => (Seq(i.toByte), v.toSeq) }.toMap)
  }

  test("auto sniffs sequence-file magic vs text per file and unions them") {
    import org.apache.hadoop.io.Text
    val dir = Files.createTempDirectory("graft_auto")
    // one sequence file + one text file in the SAME directory
    spark.sparkContext.parallelize(Seq(("sk", "sv")), 1)
      .map { case (k, v) => (new Text(k), new Text(v)) }
      .saveAsSequenceFile(dir.resolve("seqpart").toString)
    // saveAsSequenceFile writes a subdir; auto() is per-file, so point at a dir
    // holding the actual files
    val flat = Files.createTempDirectory("graft_auto_flat")
    Files.list(dir.resolve("seqpart")).forEach { p =>
      if (p.getFileName.toString.startsWith("part-"))
        Files.copy(p, flat.resolve("data.seq"))
    }
    Files.write(flat.resolve("plain.txt"), "hello\nworld\n".getBytes(StandardCharsets.UTF_8))
    val got = Sources.auto(spark, flat.toString)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("sk", "sv"), ("", "hello"), ("", "world")))
  }

  test("Generators: random text/bytes are deterministic and partition-independent") {
    val a = Generators.randomText(spark, 200, 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = Generators.randomText(spark, 200, 13) // different partitioning
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b && a.size == 200)
    assert(a.forall { case (k, v) => v.startsWith(k) && v.split(" ").forall(_.matches("w\\d{4}")) })
    val bytes = Generators.randomBytes(spark, 50, 3, keyLen = 10, valLen = 100)
      .collect().map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq))
    assert(bytes.length == 50 && bytes.map(_._1).distinct.length == 50)
    assert(bytes.forall { case (k, v) => k.length == 10 && v.length == 100 })
  }

  test("MapFiles: lookup pushes the key predicate into the parquet scan") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val out = Files.createTempDirectory("graft_mapfile").toString
    MapFiles.write(df, out, "k")
    val hit = MapFiles.lookup(spark, out, "k", 437L)
    assert(hit.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((437L, "v437")))
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,437)"),
      s"key predicate not pushed into the scan:\n$plan")
  }

  test("compressed text (gzip) reads transparently, same rows as plain text") {
    // LineRecordReader's codec path (CORE/mapreduce/lib/input/LineRecordReader.java:55,
    // CompressedSplitLineReader.java:111) — Spark inherits the same Hadoop
    // codec factory, so .gz text must be a drop-in (one non-splittable
    // partition per gzip file, the reference's semantics too).
    val dir = Files.createTempDirectory("graft_gz")
    val lines = (1 to 500).map(i => s"line-$i")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("a.txt.gz")))
    gz.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8)); gz.close()
    val got = spark.read.textFile(dir.toString).collect().sorted
    assert(got.toSeq == lines.sorted)
    // gzip is not splittable: the file must land in exactly one partition
    assert(spark.read.textFile(dir.toString).rdd.getNumPartitions == 1)
  }

  test("write-side codecs (bzip2/lz4/snappy/gzip/deflate text, zstd parquet) round-trip") {
    // the reference's codec family (IO/compress/*Codec.java) through the same
    // Hadoop codec factory Spark loads; each write must read back identically.
    // zstd is exercised through parquet (this Spark build's text datasource
    // whitelists bzip2/deflate/snappy/lz4/gzip only).
    import spark.implicits._
    val lines = (1 to 300).map(i => s"row-$i").toDF("value")
    Seq("bzip2", "lz4", "snappy", "gzip", "deflate").foreach { codec =>
      val out = Files.createTempDirectory(s"graft_codec_$codec").toString + "/data"
      lines.write.option("compression", codec).text(out)
      val files = new java.io.File(out).listFiles().map(_.getName)
      assert(files.exists(f => f.startsWith("part-") && !f.endsWith(".txt")),
        s"$codec: ${files.toSeq}") // extension shows the codec actually applied
      val back = spark.read.textFile(out).collect().sorted
      assert(back.toSeq == (1 to 300).map(i => s"row-$i").sorted, s"codec $codec")
    }
    val out = Files.createTempDirectory("graft_codec_zstd").toString + "/data"
    lines.write.option("compression", "zstd").parquet(out)
    assert(new java.io.File(out).listFiles().exists(_.getName.contains(".zstd.")))
    assert(spark.read.parquet(out).as[String].collect().sorted.toSeq ==
      (1 to 300).map(i => s"row-$i").sorted)
  }

  test("partitionAndSortLines co-locates by partition fields and sorts by the full spec") {
    import spark.implicits._
    val lines = Seq("u1 b 2", "u2 a 5", "u1 a 9", "u1 c 1", "u2 b 3")
      .toDF("line").repartition(4)
    val out = graft.operators.KeyFieldSort
      .partitionAndSortLines(lines, "line", " ", "-k1,1", "-k1,1 -k3,3nr")
    val parts = out.select("line").as[String].rdd.glom().collect().filter(_.nonEmpty)
    // each user's lines live in exactly one partition...
    Seq("u1", "u2").foreach { u =>
      assert(parts.count(_.exists(_.startsWith(u))) == 1, s"$u split across partitions")
    }
    // ...and within it are ordered by user then numeric field 3 descending
    parts.foreach { p =>
      val perUser = p.groupBy(_.split(" ")(0))
      perUser.foreach { case (_, ls) =>
        val vals = ls.map(_.split(" ")(2).toInt)
        assert(vals.sameElements(vals.sortBy(-(_: Int))), s"not sorted desc: ${ls.toSeq}")
      }
    }
  }

  test("partitionedParquet writes hive-style partitions readable back") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y"), (3, "x")).toDF("id", "tag")
    val out = Files.createTempDirectory("graft_pw").toString
    Sinks.partitionedParquet(df, out, Seq("tag"))
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(new java.io.File(out).listFiles().map(_.getName).count(_.startsWith("tag=")) == 2)
  }

  test("keyedTextFiles: arbitrary per-record file naming (old-API MultipleOutputFormat)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat_ws, col, lit}
    val df = Seq(
      ("2024", "us", "a"), ("2024", "us", "b"), ("2024", "de", "c"),
      ("2025", "us", "d"), ("2025", "de", "e"), ("2025", "de", "f")
    ).toDF("year", "region", "payload")
    val out = Files.createTempDirectory("graft_keyed").toString
    // file name derived from TWO columns with nested dirs — beyond partitionBy
    Sinks.keyedTextFiles(df,
      concat_ws("/", col("year"), concat_ws(".", col("region"), lit("txt"))),
      col("payload"), out)
    def slurp(rel: String): Seq[String] = {
      val src = scala.io.Source.fromFile(s"$out/$rel")
      try src.getLines().toList finally src.close()
    }
    assert(slurp("2024/us.txt").sorted == Seq("a", "b"))
    assert(slurp("2024/de.txt") == Seq("c"))
    assert(slurp("2025/us.txt") == Seq("d"))
    assert(slurp("2025/de.txt").sorted == Seq("e", "f"))
    // overwrite semantics: a re-run whose keys changed must not leave stale
    // files from the previous generation behind
    Sinks.keyedTextFiles(df.filter(col("year") === "2025"),
      concat_ws("/", col("year"), concat_ws(".", col("region"), lit("txt"))),
      col("payload"), out)
    assert(!new java.io.File(s"$out/2024").exists, "stale 2024 generation survived")
    assert(slurp("2025/us.txt") == Seq("d"))
    // path escapes: both the ../ form and the scheme-qualified form (which
    // Hadoop's Path(parent, child) would pass through unresolved) must die
    Seq("../escape.txt", "file:/tmp/graft_keyed_evil.txt").foreach { evil =>
      val err = intercept[org.apache.spark.SparkException] {
        Sinks.keyedTextFiles(df, lit(evil), col("payload"), out)
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
      assert(msgs(err).exists(m => m != null && m.contains("unsafe")), evil)
    }
    assert(!new java.io.File("/tmp/graft_keyed_evil.txt").exists)
    // null payloads fail with the offending file named, not a bare NPE
    val nullErr = intercept[org.apache.spark.SparkException] {
      Sinks.keyedTextFiles(Seq(("a.txt", null: String)).toDF("f", "p"),
        col("f"), col("p"), out)
    }
    def msgs2(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs2(e.getCause))
    assert(msgs2(nullErr).exists(m => m != null && m.contains("null line")))
    // null file NAMES die with the named error too: nulls sort first within a
    // partition, so a null name at partition start used to pass `name !=
    // current` (null == null) and NPE at out.write instead
    val nullName = intercept[org.apache.spark.SparkException] {
      Sinks.keyedTextFiles(Seq((null: String, "x"), ("a.txt", "y")).toDF("f", "p"),
        col("f"), col("p"), out)
    }
    assert(msgs2(nullName).exists(m => m != null && m.contains("unsafe output file name")))
  }
}
