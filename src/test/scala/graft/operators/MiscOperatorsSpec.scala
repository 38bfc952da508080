package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class MiscOperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("KeyFieldSort parses -k specs and orders numerically/reversed") {
    import KeyFieldSort._
    assert(parse("-k2,2nr -k1,1") ==
      Seq(KeySpec(2, numeric = true, reverse = true), KeySpec(1, numeric = false, reverse = false)))
    val df = Seq("b 2", "a 10", "c 2").toDF("line")
    val got = sortLines(df, "line", " ", "-k2,2nr -k1,1").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a 10", "b 2", "c 2")) // numeric desc (10 first), then word asc
    // a NON-NUMERIC field under -kn sorts as null (with the missing
    // fields: last under desc) instead of aborting the sort under ANSI
    val dirty = Seq("b 2", "a oops", "c 10", "d").toDF("line")
    val got2 = sortLines(dirty, "line", " ", "-k2,2nr -k1,1")
      .collect().map(_.getString(0)).toSeq
    assert(got2 == Seq("c 10", "b 2", "a oops", "d"))
  }

  test("Aggregates DSL matches direct aggregation") {
    val df = Seq(("x", 1), ("x", 5), ("y", 2)).toDF("g", "v")
    import Aggregates._
    val out = aggregate(df, Seq(col("g")), Seq(
      spec("LongValueSum", col("v"), "s"),
      spec("LongValueMax", col("v"), "mx"),
      spec("UniqValueCount", col("v"), "u")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map("x" -> (6L, 5L, 2L), "y" -> (2L, 2L, 1L)))
  }

  test("Aggregates DSL resolves user plugins, which may shadow built-ins") {
    val df = Seq(("x", 1), ("x", 5), ("y", 2)).toDF("g", "v")
    import Aggregates._
    val plugins = Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      "SumOfSquares" -> (c => sum((c * c).cast("long"))),
      // shadows the built-in: plugin wins, as a user override should
      "LongValueSum" -> (c => sum(c.cast("long")) * 10))
    val out = aggregate(df, Seq(col("g")), Seq(
      spec("SumOfSquares", col("v"), "sq"),
      spec("LongValueSum", col("v"), "s10"),
      spec("LongValueMax", col("v"), "mx")), plugins)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map("x" -> (26L, 60L, 5L), "y" -> (4L, 20L, 2L)))
    val err = intercept[IllegalArgumentException] {
      aggregate(df, Seq(col("g")), Seq(spec("NoSuchAgg", col("v"), "z")), plugins)
    }
    assert(err.getMessage.contains("NoSuchAgg") && err.getMessage.contains("SumOfSquares"))
  }

  test("ValueHistogram reports stats of per-value counts") {
    val df = Seq(("g", "a"), ("g", "a"), ("g", "a"), ("g", "b")).toDF("k", "v")
    val r = Aggregates.valueHistogram(df, col("k"), col("v")).collect().head
    assert(r.getAs[Long]("n_values") == 2L)
    assert(r.getAs[Long]("min_cnt") == 1L)
    assert(r.getAs[Long]("max_cnt") == 3L)
    assert(math.abs(r.getAs[Double]("avg_cnt") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("stddev_cnt") - 1.0) < 1e-12)
  }

  test("Pipe through cat is identity; through tr uppercases") {
    val ds = Seq("hello", "world").toDS()
    assert(Pipe.pipeLines(ds, Seq("cat")).collect().sorted.toSeq == Seq("hello", "world"))
    assert(Pipe.pipeLines(ds, Seq("tr", "a-z", "A-Z")).collect().sorted.toSeq
      == Seq("HELLO", "WORLD"))
  }

  test("TypedBytes codec round-trips all types including nesting") {
    import TypedBytes._
    val vals: Seq[TBValue] = Seq(
      TBBytes(Array[Byte](1, 2, -3)), TBByte(7), TBBool(true), TBInt(42),
      TBLong(1L << 40), TBFloat(1.5f), TBDouble(math.Pi), TBString("héllo"),
      TBVector(Vector(TBInt(1), TBString("x"))),
      TBList(List(TBBool(false), TBLong(9))),
      TBMap(Map(TBString("k") -> TBVector(Vector(TBDouble(2.5))))))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    vals.foreach(write(out, _))
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = Iterator.continually(read(in)).takeWhile(_.isDefined).map(_.get).toSeq
    assert(back.length == vals.length)
    back.zip(vals).foreach {
      case (TBBytes(a), TBBytes(b)) => assert(a.sameElements(b))
      case (got, exp) => assert(got == exp)
    }
  }

  test("pipeTypedBytes round-trips records through cat") {
    import TypedBytes._
    implicit val enc = org.apache.spark.sql.Encoders.kryo[(TBValue, TBValue)]
    val recs: Seq[(TBValue, TBValue)] =
      (1 to 50).map(i => (TBString(s"k$i"): TBValue, TBLong(i.toLong): TBValue))
    val ds = spark.createDataset(recs)(enc).repartition(2)
    val back = Pipe.pipeTypedBytes(ds, Seq("cat")).collect().toSet
    assert(back == recs.toSet)
  }

  test("TypedBytesFiles dump/load round-trips a (key, value) frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbf").toString
    val df = (1 to 100).map(i => (s"k$i", s"v$i")).toDF("key", "value").repartition(3)
    TypedBytesFiles.dump(df, dir)
    val back = TypedBytesFiles.load(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == (1 to 100).map(i => (s"k$i", s"v$i")).toSet)
  }

  test("Pipe surfaces nonzero exit codes") {
    val ds = Seq("x").toDS()
    val ex = intercept[Exception] {
      Pipe.pipeLines(ds, Seq("false")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("TextFunctions: tokens, shingles, fingerprint determinism, langId") {
    val df = Seq("the quick brown fox").toDF("text")
    val toks = df.select(TextFunctions.tokens(col("text"))).collect().head.getSeq[String](0)
    assert(toks == Seq("the", "quick", "brown", "fox"))
    val sh = df.select(TextFunctions.wordShingles(col("text"), 2)).collect().head.getSeq[String](0)
    assert(sh == Seq("the quick", "quick brown", "brown fox"))
    val f1 = df.select(TextFunctions.fingerprint(col("text"))).collect().head.getLong(0)
    val f2 = df.select(TextFunctions.fingerprint(col("text"))).collect().head.getLong(0)
    assert(f1 == f2)
    // order sensitivity
    val g = Seq("quick the brown fox").toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).collect().head.getLong(0)
    assert(f1 != g)
    val lang = df.select(TextFunctions.langId(col("text"),
      Seq("de" -> Seq("der"), "en" -> Seq("the")))).collect().head.getString(0)
    assert(lang == "en")
  }

  test("quality metrics") {
    val df = Seq("the the fox").toDF("text")
    val r = df.select(TextFunctions.qualityMetrics(col("text"), Seq("the")).as("q"))
      .select(col("q.*")).collect().head
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_uniq") == 2L)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.666667) < 1e-6)
  }

  test("quality metrics: token-less documents get null ratios, not a DIVIDE_BY_ZERO abort") {
    // an empty/whitespace-only doc has n_tokens = 0: the ratios are
    // undefined (null), and under ANSI the unguarded division would kill
    // the whole scan on the first such doc; a gate comparing a null ratio
    // evaluates null -> the row is filtered, which is what gates want
    val df = Seq("", "   ", "real words here").toDF("text")
    val rows = df.select(TextFunctions.qualityMetrics(col("text"), Seq("the")).as("q"))
      .select(col("q.*")).collect()
    val empty = rows.filter(_.getAs[Long]("n_tokens") == 0L)
    assert(empty.length == 2)
    empty.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("uniq_ratio")))
      assert(r.isNullAt(r.fieldIndex("avg_token_len")))
      assert(r.isNullAt(r.fieldIndex("stopword_ratio")))
    }
    assert(rows.count(_.getAs[Long]("n_tokens") == 3L) == 1)
  }

  test("redactPii replaces email/phone/ip with typed tags; piiCounts counts them") {
    val df = Seq(
      "write to jane.doe+x@example.co.uk or call +1 (555) 123-4567 from 10.0.0.1",
      "no pii in this sentence at all").toDF("text")
    val red = df.select(TextFunctions.redactPii(col("text"))).collect().map(_.getString(0))
    assert(red(0) == "write to <EMAIL> or call <PHONE> from <IP>")
    assert(red(1) == "no pii in this sentence at all")
    val c = df.select(TextFunctions.piiCounts(col("text")).as("c")).select(col("c.*"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c(0) == ((1L, 1L, 1L)))
    assert(c(1) == ((0L, 0L, 0L)))
  }

  test("redactPii does not rewrite bare digit runs (epoch millis, order ids)") {
    val keep = Seq(
      "created_at=1723456789012 order 4155551234 id 12345678901234", // 13/10/14 digits
      "pi to 10 places 3.1415926535")
    val scrub = Seq(
      ("call 415-555-1234 now", "call <PHONE> now"),
      ("call (415) 555-1234 now", "call <PHONE> now"),
      ("call +14155551234 now", "call <PHONE> now"),
      ("call +1 (555) 123-4567 now", "call <PHONE> now"))
    val red = (keep ++ scrub.map(_._1)).toDF("text")
      .select(TextFunctions.redactPii(col("text"))).collect().map(_.getString(0))
    keep.zipWithIndex.foreach { case (s, i) => assert(red(i) == s, s"corrupted: ${red(i)}") }
    scrub.zipWithIndex.foreach { case ((_, exp), i) => assert(red(keep.size + i) == exp) }
  }

  test("MonteCarlo: radical inverse + pi estimate accuracy") {
    import MonteCarlo._
    assert(radicalInverse(1, 2) == 0.5)
    assert(radicalInverse(2, 2) == 0.25)
    assert(radicalInverse(3, 2) == 0.75)
    val pi = estimatePi(spark, 4, 25000).collect().head.getAs[Double]("pi_est")
    assert(math.abs(pi - math.Pi) < 0.01)
  }

  test("Multimodal: stub decode is deterministic and batch plumbing preserves ids") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
    val feats = Multimodal.extractFeatures(Multimodal.asMediaTable(docs, "doc_id", "text"))
      .collect()
    assert(feats.length == 10)
    assert(feats.forall(_.feature.length == 8))
    val again = Multimodal.extractFeatures(Multimodal.asMediaTable(docs, "doc_id", "text"))
      .collect()
    assert(feats.map(f => (f.media_id, f.checksum)).toSet ==
      again.map(f => (f.media_id, f.checksum)).toSet)
  }
}
