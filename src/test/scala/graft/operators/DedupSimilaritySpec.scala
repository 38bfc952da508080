package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup keeps exactly one row per duplicate group (min tiebreak)") {
    val df = Seq((1L, "same text here"), (2L, "same text here"), (3L, "unique"))
      .toDF("id", "text")
    val out = Dedup.exactDedup(df, Seq(col("text")), col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 3L))
  }

  test("exactDedup tuple digest is injective: null-position and embedded-NUL tuples stay distinct") {
    // concat_ws-style joining would merge rows 1/2 (concat_ws skips nulls)
    // and rows 3/4 (a NUL inside a key shifts the boundary between keys);
    // the fixed-width per-key digest blocks must keep all four distinct,
    // while rows 5/6 (genuinely equal tuples with nulls) still dedup
    val df = Seq(
      (1L, Some("x"), None: Option[String]),
      (2L, None: Option[String], Some("x")),
      (3L, Some("a\u0000b"), Some("c")),
      (4L, Some("a"), Some("b\u0000c")),
      (5L, None: Option[String], Some("y")),
      (6L, None: Option[String], Some("y"))).toDF("id", "k1", "k2")
    val out = Dedup.exactDedup(df, Seq(col("k1"), col("k2")), col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("exactDedup binary keys digest raw bytes, not the lossy string cast") {
    // two DISTINCT single-byte keys, both invalid as UTF-8 (lone lead
    // bytes): the r14 digest cast every key to string and re-encoded it,
    // which folds invalid bytes to U+FFFD — both keys digest identically
    // and dedup silently MERGES them. Binary keys must feed md5 their raw
    // bytes (rows 1/2 distinct); genuinely equal byte keys still dedup
    // (rows 1/3).
    val df = Seq(
      (1L, Array(0xC3.toByte)), (2L, Array(0xC4.toByte)),
      (3L, Array(0xC3.toByte))).toDF("id", "k")
    // the counterfactual premise: the old string-cast digest collides here
    val oldDigests = df.select(
        md5(to_binary(col("k").cast("string"), lit("utf-8"))).as("d"))
      .distinct().count()
    assert(oldDigests == 1L,
      s"premise: the string-cast path must fold both invalid bytes to one digest, got $oldDigests")
    val out = Dedup.exactDedup(df, Seq(col("k")), col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L))
  }

  test("minhash estimate tracks true jaccard for identical and disjoint docs") {
    val words = (0 until 50).map(i => s"w$i").mkString(" ")
    val other = (100 until 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words), (2L, words), (3L, other)).toDF("id", "text")
    val pairs = Dedup.minhashCandidatePairs(df, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical docs: signature agreement must be 1.0; disjoint doc never pairs
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("minhash signatures are deterministic across invocations") {
    val df = Seq((1L, "a b c d e f g h")).toDF("id", "text")
    val s1 = Dedup.minhashSignatures(df, "id", "text").collect().head.getSeq[Long](1)
    val s2 = Dedup.minhashSignatures(df, "id", "text").collect().head.getSeq[Long](1)
    assert(s1 == s2 && s1.length == 64)
  }

  test("simhash: identical docs equal, disjoint docs differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota")).toDF("id", "text")
    val m = Dedup.simhash(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("simhashNearDupPairs finds identical docs at hamming 0 via band join") {
    val df = Seq((1L, "alpha beta gamma delta eps"), (2L, "alpha beta gamma delta eps"),
      (3L, "totally different words here now")).toDF("id", "text")
    val out = Dedup.simhashNearDupPairs(df, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 0L)))
  }

  test("saltedJoin equals the plain join") {
    val fact = (1 to 500).map(i => (i % 7, i)).toDF("k", "v")
    val dim = (0 until 7).map(i => (i, s"d$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("ngramJaccardPairs computes exact jaccard") {
    // doc1/doc2 share half their 2-gram shingles
    val df = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x y z")).toDF("id", "text")
    // shingles(1) = {a b, b c}; shingles(2) = {a b, b d} → jaccard = 1/3
    val out = Dedup.ngramJaccardPairs(df, "id", "text", 2, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 2L, 1.0 / 3.0)))
  }

  test("zero-norm vectors are excluded from similarity search, not fatal") {
    // a zero embedding (failed encoder output) has no direction: under ANSI
    // the norm-product division would abort the whole job; the operators
    // must instead exclude the row — nobody's neighbor, and no neighbors
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)), (4L, Array(0.0f, 1.0f)))
      .toDF("id", "vec")
    val q = df.filter(col("id") === 1 || col("id") === 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val top = Similarity.cosineTopK(df, "id", "vec", q, "qid", "qvec", 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // qid 3 (zero query) returns nothing; id 3 never appears as a neighbor
    assert(top == Set((1L, 2L), (1L, 4L)))
    val pairs = Similarity.cosineNearDupPairs(df, "id", "vec",
        threshold = 0.9, numPlanes = 4, dim = 2, probeRadius = 4, numTables = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    val ivf = Similarity.ivfTopK(df, "id", "vec", q, "qid", "qvec", 10,
        nlist = 2, nprobe = 2)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == Set((1L, 2L), (1L, 4L)))
  }

  test("ivfTopK fails loudly when EVERY coarse centroid degenerates to zero") {
    // +v/-v pairs with nlist=1: the Lloyd mean cancels to exactly (0,0),
    // every centroid score is null (try_divide by a zero norm), array_max
    // is null — pre-fix, array_position(arr, null) gave every row a null
    // cid and the whole corpus silently dropped out of the bucketed join
    // (empty result, no error). The guard must name the degeneracy.
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, -1.0f))).toDF("id", "vec")
    val q = df.filter(col("id") === 1)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val e = intercept[Throwable] {
      Similarity.ivfTopK(df, "id", "vec", q, "qid", "qvec", 2,
        nlist = 1, nprobe = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("every coarse centroid scored null")),
      s"degenerate quantizer must fail loudly, got: ${messages(e).mkString(" | ")}")
  }

  test("cosine: orthogonal = 0, identical = 1") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f)))
      .toDF("id", "vec")
    val q = df.filter(col("id") === 1).select(col("id").as("qid"), col("vec").as("qvec"))
    val got = Similarity.cosineTopK(df, "id", "vec", q, "qid", "qvec", 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(math.abs(got(3L) - 1.0) < 1e-12)
    assert(math.abs(got(2L)) < 1e-12)
  }

  test("ivfTopK with nprobe == nlist is exactly brute force; nprobe=1 is a subset") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 80L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("id", "vec")
    val q = df.filter(col("id") <= 3).select(col("id").as("qid"), col("vec").as("qvec"))
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.cosineTopK(df, "id", "vec", q, "qid", "qvec", 5, dim = 16)
      .select("qid", "id"))
    val full = pairs(Similarity.ivfTopK(df, "id", "vec", q, "qid", "qvec", 5,
      nlist = 4, nprobe = 4).select("qid", "id"))
    assert(full == brute)
    val narrow = pairs(Similarity.ivfTopK(df, "id", "vec", q, "qid", "qvec", 5,
      nlist = 4, nprobe = 1).select("qid", "id"))
    assert(narrow.nonEmpty && narrow.subsetOf(
      pairs(Similarity.cosineTopK(df, "id", "vec", q, "qid", "qvec", 80, dim = 16)
        .select("qid", "id"))))
  }

  test("ivfTopKExact: exhaustive probing equals brute force; build is run-to-run identical") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 80L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("id", "vec")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qq = df.filter(col("id") <= 3).select(col("id").as("qid"), col("vec").as("qvec"))
    val brute = pairs(Similarity.cosineTopK(df, "id", "vec", qq, "qid", "qvec", 5, dim = 16)
      .select("qid", "id"))
    val full = pairs(Similarity.ivfTopKExact(df, "id", "vec", qq, "qid", "qvec", 5,
      nlist = 4, nprobe = 4).select("qid", "id"))
    assert(full == brute)
    // determinism: the pruned configuration returns identical RANKED rows on
    // repeated builds (exact-integer Lloyd — no avg() merge-order wobble)
    def ranked() = Similarity.ivfTopKExact(df, "id", "vec", qq, "qid", "qvec", 5,
      nlist = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val r1 = ranked()
    assert(r1.nonEmpty && r1 == ranked())
  }

  test("lshCosineTopK returns a subset of brute-force results per query") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 60L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("id", "vec")
    val q = df.filter(col("id") <= 3).select(col("id").as("qid"), col("vec").as("qvec"))
    val brute = Similarity.cosineTopK(df, "id", "vec", q, "qid", "qvec", 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCosineTopK(df, "id", "vec", q, "qid", "qvec", 60,
      numPlanes = 4, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty && lsh.subsetOf(brute))
  }

  test("LSH ANN: exhaustive probing equals brute force; multi-table recall >= 0.9 on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.cosineTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
      k = 5, dim = 64))
    val exhaustive = pairs(Similarity.lshCosineTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
      k = 5, numPlanes = 8, dim = 64, probeRadius = 8, numTables = 1))
    assert(exhaustive == brute, "exhaustive probing must equal brute force (the q32 oracle claim)")
    // These embeddings are near-random (top-5 neighbor cos ~ 0.33 -> per-plane
    // flip prob ~ 0.39): the hard case for LSH. 16 tables x 4 bits, radius 1
    // is the config the operator doc derives for recall ~ 0.99 here.
    val probed = pairs(Similarity.lshCosineTopK(emb, "vec_id", "embedding", q, "qid", "qvec",
      k = 5, numPlanes = 4, dim = 64, probeRadius = 1, numTables = 16))
    val recall = probed.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, f"multi-table LSH recall $recall%.3f < 0.9")
  }

  test("topKRecall: exact per-query hit counts against a known truth/ann pair") {
    // truth: q1 -> {1,2,3}, q2 -> {4,5}; ann finds {1,3} for q1, {4,5,9} for
    // q2 (9 is a false positive — must not count); q2's recall is exact 1.0
    val truth = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L)).toDF("qid", "id")
    val ann = Seq((1L, 1L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 9L)).toDF("qid", "id")
    val rows = Similarity.topKRecall(truth, ann).orderBy("qid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((1L, 3L, 2L, 0.666667), (2L, 2L, 2L, 1.0)))
  }

  test("quantizeInt8: exact scale/floor values, zero-vector guard, integer range") {
    val df = Seq(
      (1L, Array(12.7f, -6.35f, 0.0f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    val got = df.select(col("id"), Similarity.quantizeInt8(col("vec")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // scale = 12.7/127 = 0.1; floor semantics: -6.35/0.1 = -63.5 -> -64
    assert(got(1L) == Seq(127.0f, -64.0f, 0.0f, 10.0f))
    assert(got(2L) == Seq(0.0f, 0.0f, 0.0f, 0.0f))
    // real embeddings stay in int8 range
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bounds = emb.select(Similarity.quantizeInt8(col("embedding")).as("q"))
      .select(array_min(col("q")).as("lo"), array_max(col("q")).as("hi"))
      .agg(min(col("lo")), max(col("hi"))).collect().head
    assert(bounds.getFloat(0) >= -128.0f && bounds.getFloat(1) <= 127.0f)
  }

  test("cosineNearDupPairs: exhaustive config is exact; pruned config is a high-recall subset") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, numPlanes = 8, dim = 64, probeRadius = 8, numTables = 1))
    assert(exact.nonEmpty)
    val pruned = pairs(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, numPlanes = 4, dim = 64, probeRadius = 1, numTables = 16))
    assert(pruned.subsetOf(exact), "pruned candidates must never invent pairs")
    val recall = pruned.size.toDouble / exact.size
    assert(recall >= 0.9, f"near-dup recall $recall%.3f < 0.9")
  }

  test("q103: pruned cluster build plans a bucket join (no cartesian) and refines the exhaustive clustering") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val prunedPairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, numPlanes = 4, dim = 64, probeRadius = 1, numTables = 16)
    // the scale claim: the candidate stage is the (t, sig) bucket join —
    // never a cartesian/nested-loop product anywhere in the physical plan
    val physical = prunedPairs.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"), physical)
    // pruned edges ⊆ exhaustive edges ⇒ pruned components REFINE the
    // exhaustive ones: all members of a pruned cluster share one
    // exhaustive cluster label (missed pairs can split clusters, never
    // merge distinct ones)
    val ids = emb.select(col("vec_id").cast("long").as("vec_id"))
    def asg(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.componentAssignments(ids, "vec_id", pairs, "id_a", "id_b")
        .select("id", "cluster_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = asg(prunedPairs)
    val ex = asg(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, numPlanes = 8, dim = 64, probeRadius = 8, numTables = 1))
    val prunedClusters = pr.groupBy(_._2).values
    assert(prunedClusters.forall(m => m.map(kv => ex(kv._1)).size >= 1 &&
      m.map(kv => ex(kv._1)).toSet.size == 1),
      "a pruned cluster spans two exhaustive clusters")
    assert(pr.keySet == ex.keySet) // full coverage on both sides
  }

  test("removeDuplicateSpans: corpus-wide coverage, overlap merge, adjacency, cleaned text") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ") // the shared 8-gram
    val docs = Seq(
      (1L, s"alpha $a beta"),     // one covered span [1,9)
      (2L, s"$a gamma delta"),    // span at position 0
      (3L, s"x y $a $a"),         // SAME gram twice in one doc: adjacent spans [2,10)+[10,18)
      (4L, "seven unique tokens never repeated anywhere here"), // 7 tokens < n: no grams
      (5L, s"p $a q"),            // starts 1 (a1..a8) and 2 (a2..a8 q) OVERLAP -> one span [1,10)
      (6L, (2 to 8).map(i => s"a$i").mkString(" ") + " q r s t u v w x")) // shares doc5's start-2 gram
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) == ((10L, 1L, 1L, 8L, "alpha beta")))
    assert(out(2L) == ((10L, 1L, 1L, 8L, "gamma delta")))
    // adjacent equal-length spans stay two spans but cover contiguously
    assert(out(3L) == ((18L, 2L, 2L, 16L, "x y")))
    assert(out(4L) == ((7L, 0L, 0L, 0L,
      "seven unique tokens never repeated anywhere here")))
    // overlapping dup starts merge into ONE span [1,10): 9 covered
    assert(out(5L) == ((10L, 2L, 1L, 9L, "p")))
    assert(out(6L)._2 == 1L && out(6L)._4 == 8L) // its shared prefix window
  }

  test("span dedup shuffles the gram digest, never the raw gram string") {
    // The corpus-wide movements of the gram column (count groupBy + join
    // back) must exchange the fixed 32-hex md5, not the ~n-token string:
    // after optimization NO node in the plan may output a raw `gram`
    // attribute, and the digest must be the attribute the dup-gram
    // aggregation and join carry (≈3-5x less shuffle payload at n=8).
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "a b c d e f g h j"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 8)
    val attrs = out.queryExecution.optimizedPlan
      .collect { case p => p.output.map(_.name) }.flatten.toSet
    assert(attrs.contains("gram_md5"),
      s"expected the gram digest attribute in the plan, got $attrs")
    assert(!attrs.contains("gram"),
      "raw gram string attribute survived optimization — the exchanges " +
        "would shuffle the full n-token string")
  }

  test("incremental span dedup == full recompute over batch ∪ corpus restricted to batch") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ") // gram shared batch<->corpus
    val b = (1 to 8).map(i => s"b$i").mkString(" ") // gram duplicated INSIDE the batch
    val corpus = Seq(
      (1L, s"old text $a more old text"),
      (2L, "completely unrelated corpus content here okay then")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"x $a y"),            // covered only VIA THE CORPUS (batch count 1)
      (11L, s"$b p q"),            // covered via the batch's own other doc
      (12L, s"r s $b"),
      (13L, "wholly novel tokens never seen in either side at all")) // bloom definite-miss path
      .toDF("doc_id", "text")
    import graft.functions.TextFunctions.tokens
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id").as("id"), tokens(col("text")).as("toks"))
    def key(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id"), col("n_tokens"), col("n_dup_starts"), col("n_spans"),
        col("n_covered"), concat_ws(" ", col("clean_toks")).as("clean"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    val full = key(Dedup.removeDuplicateSpansOfTokens(
        toks(corpus.unionByName(batch)), "id", "toks", n = 8)
      .filter(col("id") >= 10L))
    val grams = Dedup.spanGramCounts(toks(corpus), "id", "toks", n = 8)
    val incr = key(Dedup.removeDuplicateSpansIncrementalOfTokens(
      toks(batch), "id", "toks", n = 8, grams,
      expectedCorpusGrams = 100L))
    assert(incr == full, s"incremental diverged:\n$incr\nvs full:\n$full")
    // the crafted rows did exercise all three paths
    val byId = incr.map(t => t._1 -> t._4).toMap
    assert(byId(10L) == 1L && byId(11L) == 1L && byId(13L) == 0L)
  }

  test("q113 gate premise: the 80/20 split exercises BOTH dup paths on the gate corpus") {
    // the gated row only pins the cross-batch arithmetic if the corpus
    // actually contains: grams duplicated within the batch alone AND
    // batch-unique grams covered only via the corpus side — measured
    // 88/386 grams at sf0.001 and 76/299 at sf0.01
    import graft.functions.TextFunctions.tokens
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val maxId = docs.agg(max(col("doc_id").cast("long"))).head().getLong(0)
    val h = maxId * 4 / 5
    def toks(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id").cast("long").as("doc_id"), tokens(col("text")).as("toks"))
    val corpusGrams = Dedup.spanGramCounts(
      toks(docs.filter(col("doc_id") < h)), "doc_id", "toks", n = 8)
    val batchGrams = Dedup.spanGramCounts(
      toks(docs.filter(col("doc_id") >= h)), "doc_id", "toks", n = 8)
    val dupInBatch = batchGrams.filter(col("cnt") > 1).count()
    val viaCorpusOnly = batchGrams.filter(col("cnt") === 1)
      .join(corpusGrams.select("gram_md5"), Seq("gram_md5"), "left_semi").count()
    assert(dupInBatch > 0, "no gram duplicated within the batch alone")
    assert(viaCorpusOnly > 0, "no batch-unique gram covered via the corpus " +
      "— q113 would never exercise the cross-batch join")
  }

  test("warm-started CC from a prior assignment equals cold start with no extra rounds") {
    // the incremental-fold shape: star edges from a prior assignment plus
    // new-batch pairs that bridge two old clusters through a chain of new
    // nodes — the case where labels must travel farthest
    val star = ((1L to 15L).map(i => (i, 0L)) ++ (17L to 31L).map(i => (i, 16L)))
      .toDF("s", "d")
    val fresh = ((32L to 39L).map(i => (i, i + 1)) ++ Seq((15L, 32L), (40L, 31L)))
      .toDF("s", "d")
    val edges = star.unionByName(fresh)
    val seed = ((0L to 15L).map(i => (i, 0L)) ++ (16L to 31L).map(i => (i, 16L)))
      .toDF("node", "lbl")
    val (coldDf, coldRounds) =
      Dedup.connectedComponentsWithRounds(edges, "s", "d")
    val cold = coldDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (warmDf, warmRounds) =
      Dedup.connectedComponentsWithRounds(edges, "s", "d", seed = Some(seed))
    val warm = warmDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(warm == cold, "warm-started labels diverged from cold start")
    assert(cold.forall(_._2 == 0L), "everything bridges into component 0")
    assert(warmRounds <= coldRounds,
      s"warm start took MORE rounds ($warmRounds) than cold ($coldRounds)")
  }

  test("incrementalComponentAssignments: warmStart=false equals the default warm path") {
    val oldEdges = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val prior = Dedup.componentAssignments((0L to 9L).toDF("id"), "id",
      oldEdges, "a", "b")
    val newEdges = Seq((2L, 10L), (6L, 10L), (9L, 12L)).toDF("a", "b")
    val newU = (10L to 12L).toDF("id")
    def rows(warm: Boolean) = Dedup.incrementalComponentAssignments(prior,
        newU, "id", newEdges, "a", "b", warmStart = warm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(rows(warm = true) == rows(warm = false))
  }

  test("CC truncation uses the RELIABLE checkpoint path when a checkpoint dir is set") {
    val dir = java.nio.file.Files.createTempDirectory("cc_chk").toString
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite session unexpectedly has a checkpoint dir")
    sc.setCheckpointDir(dir)
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("s", "d")
      val got = Dedup.connectedComponents(edges, "s", "d")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
      // the durable path actually wrote checkpoint files
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no reliable checkpoint files written despite configured dir")
    } finally {
      // SparkContext has no unset API; empty string disables the dir again
      val f = sc.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
    }
  }

  test("ngramJaccardPairs df-cap keeps a stop-shingle corpus near-linear") {
    // 40 docs, pairwise-disjoint content except ONE ubiquitous shingle
    // ("the same") present in every doc. Uncapped, that shingle alone fans
    // out C(40,2) = 780 candidate pairs; capped, it is dropped from the
    // inverted index and no pair survives.
    val docs = (1L to 40L).map(i => (i, s"the same a$i b$i c$i")).toDF("id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, "id", "text", 2, 0.0)
    assert(uncapped.count() == 780L)
    val capped = Dedup.ngramJaccardPairs(docs, "id", "text", 2, 0.0, maxDocFreq = 10)
    assert(capped.count() == 0L)
  }

  test("saltedJoin equals plain join when the hot branch carries rows, incl. left join") {
    val fact = (1 to 500).map(i => (i % 7, i)).toDF("k", "v")
    val dim = (0 until 5).map(i => (i, s"d$i")).toDF("k", "name") // keys 5,6 unmatched
    // threshold 10: every key (~71 rows) is classified hot -> salted path
    val plainInner = fact.join(dim, Seq("k")).collect().map(_.toSeq).toSet
    val saltedInner = Skew.saltedJoin(fact, dim, Seq("k"), 8, hotKeyThreshold = 10)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(saltedInner == plainInner)
    val plainLeft = fact.join(dim, Seq("k"), "left").collect().map(_.toSeq).toSet
    val saltedLeft = Skew.saltedJoin(fact, dim, Seq("k"), 8, how = "left", hotKeyThreshold = 10)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(saltedLeft == plainLeft)
    // threshold 72: no key exceeds it -> pure cold path, still identical
    val mixed = Skew.saltedJoin(fact, dim, Seq("k"), 8, hotKeyThreshold = 72)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(mixed == plainInner)
  }

  test("hotKeysBySampling finds the dominant key; saltedJoin with it stays exact") {
    // key 0 is 100x hotter than the rest — a full-fraction sample (exactness
    // baseline) and a 30% sample must both flag it and nothing lukewarm
    val fact = ((1 to 20000).map(i => (0, i)) ++ (1 to 200).map(i => (i % 10 + 1, i)))
      .toDF("k", "v")
    val dim = (0 until 11).map(i => (i, s"d$i")).toDF("k", "name")
    val full = Skew.hotKeysBySampling(fact, Seq("k"), threshold = 1000, fraction = 1.0)
      .collect().map(_.getInt(0)).toSeq
    assert(full == Seq(0))
    val sampled = Skew.hotKeysBySampling(fact, Seq("k"), threshold = 1000, fraction = 0.3)
      .collect().map(_.getInt(0)).toSeq
    assert(sampled == Seq(0))
    // join results are identical regardless of detection strategy
    val plain = fact.join(dim, Seq("k")).collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), 8, hotKeyThreshold = 1000,
        detect = Skew.hotKeysBySampling(_, _, _))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("connectedComponents: long path, mixed components, noisy edge list") {
    // a 200-node path (diameter 199 — bare propagation would need 199
    // rounds; pointer jumping must close it within the 64-round cap),
    // a triangle, an isolated pair, plus reversed duplicates + a self-loop
    val path = (0L until 199L).map(i => (i, i + 1))
    val noise = Seq((300L, 301L), (301L, 302L), (302L, 300L), (400L, 401L),
      (302L, 301L), (401L, 400L), (500L, 500L))
    val edges = (path ++ noise).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 199L).foreach(v => assert(got(v) == 0L, s"node $v"))
    Seq(300L, 301L, 302L).foreach(v => assert(got(v) == 300L))
    Seq(400L, 401L).foreach(v => assert(got(v) == 400L))
    // the self-loop-only node has no real edge → not a member of any component
    assert(!got.contains(500L))
    assert(got.size == 205)
  }

  test("connectedComponents matches union-find on a pseudo-random graph") {
    // deterministic LCG edge list over 400 nodes, ~300 edges
    var st = 12345L
    def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
    val edges = (0 until 300).map { _ =>
      (math.floorMod(next(), 400L), math.floorMod(next(), 400L))
    }.filter { case (a, b) => a != b }
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    // union toward the smaller root, so each root stays its component's min
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = edges.flatMap(e => Seq(e._1, e._2)).distinct.groupBy(find)
    val expectMap = roots.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }
    val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expectMap)
  }

  test("connectedComponents releases per-round snapshots (storage stays O(1) tables)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // 64-node path → ~7 rounds; without the explicit release every round's
    // localCheckpoint would linger in persistent storage until driver GC
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b")
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    // at most the result's own checkpoint survives the call
    assert(after.size <= 1, s"leaked ${after.size} persisted RDDs: $after")
    assert(out.count() == 64)
  }

  test("connectedComponents rejects non-integral id columns loudly") {
    val bad = Seq(("a", "b")).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(bad, "x", "y")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("componentAssignments: full coverage, singleton fill, canonical = min member") {
    // universe 0..9; edges cluster {1,3,5} and {7,8}; 0,2,4,6,9 isolated
    val universe = (0L to 9L).toDF("id")
    val edges = Seq((3L, 1L), (5L, 3L), (8L, 7L)).toDF("a", "b")
    val rows = Dedup.componentAssignments(universe, "id", edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 10, "every universe id gets exactly one row")
    val byId = rows.map(r => r._1 -> r).toMap
    Seq(1L, 3L, 5L).foreach(v => assert(byId(v)._2 == 1L && byId(v)._3 == 3L))
    Seq(7L, 8L).foreach(v => assert(byId(v)._2 == 7L && byId(v)._3 == 2L))
    Seq(0L, 2L, 4L, 6L, 9L).foreach(v =>
      assert(byId(v)._2 == v && byId(v)._3 == 1L, s"singleton $v fills own label"))
    // exactly one canonical per cluster, and it is the min member
    val canon = rows.filter(_._4 == 1).map(_._1).toSet
    assert(canon == Set(0L, 1L, 2L, 4L, 6L, 7L, 9L))
    assert(rows.forall(r => (r._4 == 1) == (r._1 == r._2)))
  }

  test("incrementalComponentAssignments == full recompute, incl. a new doc bridging two old clusters") {
    // old universe 0..9 with clusters {0,1,2} and {5,6}; new batch 10..12:
    // 10 bridges the two OLD clusters (the merge case the star reduction
    // must get right), 11 joins nothing (stays singleton), 12 pairs with 9
    // (an old singleton gets pulled into a new 2-cluster)
    val oldEdges = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val oldU = (0L to 9L).toDF("id")
    val prior = Dedup.componentAssignments(oldU, "id", oldEdges, "a", "b")
    val newEdges = Seq((2L, 10L), (6L, 10L), (9L, 12L)).toDF("a", "b")
    val newU = (10L to 12L).toDF("id")
    val incr = Dedup.incrementalComponentAssignments(prior, newU, "id",
        newEdges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val full = Dedup.componentAssignments((0L to 12L).toDF("id"), "id",
        oldEdges.unionByName(newEdges), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(incr == full)
    // the SCOPED form must survive the hardest case — a new doc merging two
    // old clusters (both become "affected"; their stars enter the scoped
    // graph together)
    val scoped = Dedup.incrementalComponentAssignmentsScoped(prior, newU, "id",
        newEdges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(scoped == full)
    // the bridged mega-cluster kept the older label 0 and counts 10,
    // the merged members {0,1,2,5,6,10}
    assert(incr.contains((10L, 0L, 6L, 0)))
  }

  test("scoped incremental: untouched clusters pass through verbatim; touched recompute") {
    // clusters {0,1,2} (label 0) and {5,6} (label 5); singletons 3,4,7,8,9.
    // The batch touches ONLY cluster 0 (edge 2-10) and singleton 9 (edge
    // 9-12): cluster {5,6} and singletons 3,4,7,8 are untouched — the
    // scoped fold must emit their EXACT prior rows (same size, same
    // canonical bit), while the affected subgraph recomputes.
    val oldEdges = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val oldU = (0L to 9L).toDF("id")
    val prior = Dedup.componentAssignments(oldU, "id", oldEdges, "a", "b")
    val newEdges = Seq((2L, 10L), (9L, 12L)).toDF("a", "b")
    val newU = (10L to 12L).toDF("id")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val scoped = rows(Dedup.incrementalComponentAssignmentsScoped(prior, newU,
      "id", newEdges, "a", "b"))
    val unscoped = rows(Dedup.incrementalComponentAssignments(prior, newU,
      "id", newEdges, "a", "b"))
    val full = rows(Dedup.componentAssignments((0L to 12L).toDF("id"), "id",
      oldEdges.unionByName(newEdges), "a", "b"))
    assert(scoped == full && unscoped == full)
    val priorRows = rows(prior)
    Seq(3L, 4L, 5L, 6L, 7L, 8L).foreach { v =>
      val p = priorRows.find(_._1 == v).get
      assert(scoped.contains(p), s"untouched prior row for id $v must pass through verbatim")
    }
    // touched side really recomputed: cluster 0 grew to 4, old singleton 9
    // became a 2-cluster's canonical
    assert(scoped.contains((10L, 0L, 4L, 0)))
    assert(scoped.contains((9L, 9L, 2L, 1)))
    assert(scoped.contains((11L, 11L, 1L, 1)), "edge-free batch id stays singleton")
  }

  test("scoped incremental with zero new edges: prior verbatim, batch all singletons") {
    val prior = Dedup.componentAssignments((0L to 5L).toDF("id"), "id",
      Seq((0L, 1L)).toDF("a", "b"), "a", "b")
    val out = Dedup.incrementalComponentAssignmentsScoped(prior,
        Seq(10L, 11L).toDF("id"), "id",
        Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val priorRows = prior.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(out == priorRows ++ Set((10L, 10L, 1L, 1), (11L, 11L, 1L, 1)))
  }

  test("scoped fold's shuffle volume tracks the batch, not the corpus") {
    // 20k-id corpus in 10k 2-clusters; a 3-id batch touching ONE cluster.
    // The unscoped fold shuffles the whole star set through the CC loop
    // (plus the corpus-wide distinct and size groupBy); the scoped fold's
    // only corpus-sized work is broadcast-probe SCANS — its total shuffle
    // write records must be a small fraction of the unscoped fold's.
    // Records (not seconds): deterministic under host load.
    val n = 20000L
    val oldEdges = spark.range(n / 2)
      .select((col("id") * 2).as("a"), (col("id") * 2 + 1).as("b"))
    val prior = Dedup.componentAssignments(spark.range(n).toDF("id"), "id",
      oldEdges, "a", "b").localCheckpoint(true) // materialize OUTSIDE the measurement
    val newU = Seq(n, n + 1, n + 2).toDF("id")
    val newEdges = Seq((1L, n)).toDF("a", "b")
    def measured(body: => Set[(Long, Long, Long, Int)]): (Set[(Long, Long, Long, Int)], Long) = {
      val recs = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          recs.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val r = body
        // listener bus is async — poll until the counter stabilizes
        var last = -1L; var same = 0
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (same < 5 && System.nanoTime() < deadline) {
          val v = recs.get()
          if (v == last) same += 1 else { same = 0; last = v }
          Thread.sleep(100)
        }
        (r, last)
      } finally spark.sparkContext.removeSparkListener(l)
    }
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val (scopedRows, scopedRecs) = measured(rows(
      Dedup.incrementalComponentAssignmentsScoped(prior, newU, "id", newEdges, "a", "b")))
    val (unscopedRows, unscopedRecs) = measured(rows(
      Dedup.incrementalComponentAssignments(prior, newU, "id", newEdges, "a", "b")))
    assert(scopedRows == unscopedRows, "scoped and unscoped folds must agree")
    assert(scopedRows.contains((n, 0L, 3L, 0)), "premise: the batch merged into cluster 0")
    assert(scopedRows.count(_._3 == 2L) == (n / 2 - 1) * 2,
      "premise: all other 2-clusters untouched")
    assert(unscopedRecs > 10L * scopedRecs,
      s"scoped fold should shuffle <10% of the unscoped fold's records " +
        s"(scoped=$scopedRecs, unscoped=$unscopedRecs)")
  }

  test("q94 theorem on real embeddings: incremental semantic clustering equals full recompute") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "cluster_id", "cluster_size", "is_canonical")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, numPlanes = 8, dim = 64, probeRadius = 8, numTables = 1)
    val full = rows(Dedup.componentAssignments(
      emb.select(col("vec_id").cast("long").as("vec_id")), "vec_id",
      pairs, "id_a", "id_b"))
    val h = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) * 4 / 5
    val old = emb.filter(col("vec_id") < h)
    val prior = Dedup.componentAssignments(
      old.select(col("vec_id").cast("long").as("vec_id")), "vec_id",
      Similarity.cosineNearDupPairs(old, "vec_id", "embedding",
        threshold = 0.35, numPlanes = 8, dim = 64, probeRadius = 8, numTables = 1),
      "id_a", "id_b")
    val incr = rows(Dedup.incrementalComponentAssignments(prior,
      emb.filter(col("vec_id") >= h).select(col("vec_id").cast("long").as("vec_id")),
      "vec_id", pairs.filter(col("id_b") >= h), "id_a", "id_b"))
    assert(incr == full)
    // the scoped (affected-subgraph) form — the path q94 and the service
    // fold actually run — must agree on the same real data
    val scoped = rows(Dedup.incrementalComponentAssignmentsScoped(prior,
      emb.filter(col("vec_id") >= h).select(col("vec_id").cast("long").as("vec_id")),
      "vec_id", pairs.filter(col("id_b") >= h), "id_a", "id_b"))
    assert(scoped == full)
  }

  test("rankMetrics: exact MRR/NDCG on crafted rankings, zero rows for misses and absent queries") {
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1: relevant at ranks 2,3 of truth size 3; q2: nothing relevant found;
    // q3: in truth but absent from the ranked table; q4: perfect ranking
    val truth = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 7L), (3L, 8L),
      (4L, 40L)).toDF("qid", "id")
    val ranked = Seq((1L, 10L, 1), (1L, 2L, 2), (1L, 3L, 3), (1L, 99L, 4),
      (2L, 50L, 1), (2L, 51L, 2), (4L, 40L, 1)).toDF("qid", "id", "rank")
    val got = Similarity.rankMetrics(truth, ranked, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val dcg1 = 1.0 / lg2(3) + 1.0 / lg2(4)
    val idcg1 = 1.0 / lg2(2) + 1.0 / lg2(3) + 1.0 / lg2(4)
    assert(got == Set(
      (1L, 0.5, r6(dcg1 / idcg1)),
      (2L, 0.0, 0.0),
      (3L, 0.0, 0.0),
      (4L, 1.0, 1.0)))
    // ranks beyond k are ignored: a relevant hit at rank 6 adds nothing
    val far = Similarity.rankMetrics(Seq((9L, 1L)).toDF("qid", "id"),
        Seq((9L, 1L, 6)).toDF("qid", "id", "rank"), k = 5)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    assert(far == Seq((0.0, 0.0)))
    // duplicated truth rows change nothing: membership and ideal are over
    // the distinct set (no join fan-out into the DCG sum)
    val dup = Similarity.rankMetrics(
        Seq((4L, 40L), (4L, 40L), (4L, 40L)).toDF("qid", "id"),
        Seq((4L, 40L, 1)).toDF("qid", "id", "rank"), k = 5)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    assert(dup == Seq((1.0, 1.0)))
  }

  test("rankMetricsGraded: exact graded values; reduces to binary rankMetrics at rel=1") {
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1: grades 3 (found at rank 2) and 1 (found at rank 1) — the BETTER
    // doc ranked lower, so ndcg < 1; duplicate truth row keeps max grade
    val truth = Seq((1L, 10L, 1L), (1L, 20L, 3L), (1L, 20L, 2L),
      (2L, 30L, 0L)).toDF("qid", "id", "rel")
    val ranked = Seq((1L, 10L, 1), (1L, 20L, 2), (2L, 30L, 1))
      .toDF("qid", "id", "rank")
    val rows = Similarity.rankMetricsGraded(truth, ranked, k = 5)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val dcg1 = 1.0 / lg2(2) + 7.0 / lg2(3)
    val idcg1 = 7.0 / lg2(2) + 1.0 / lg2(3)
    assert(rows(1L) == ((1.0, r6(dcg1 / idcg1))))
    // all-zero grades: idcg 0 -> ndcg 0, mrr 0 (rel > 0 never fires)
    assert(rows(2L) == ((0.0, 0.0)))
    // binary reduction: rel=1 truth gives exactly rankMetrics' numbers
    val bt = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 7L), (3L, 8L),
      (4L, 40L)).toDF("qid", "id")
    val br = Seq((1L, 10L, 1), (1L, 2L, 2), (1L, 3L, 3), (1L, 99L, 4),
      (2L, 50L, 1), (2L, 51L, 2), (4L, 40L, 1)).toDF("qid", "id", "rank")
    def rows3(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val binary = rows3(Similarity.rankMetrics(bt, br, k = 5))
    val graded = rows3(Similarity.rankMetricsGraded(
      bt.withColumn("rel", lit(1L)), br, k = 5))
    assert(graded == binary)
  }

  test("cosineNearDupPairsAgainst == full-corpus pairs restricted to batch-touching, both configs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val h = 400L
    val old = emb.filter(col("vec_id") < h)
    val batch = emb.filter(col("vec_id") >= h)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((planes, radius, tables) <- Seq((8, 8, 1), (4, 1, 16))) {
      val full = rows(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.3, numPlanes = planes, dim = 64,
        probeRadius = radius, numTables = tables))
      val touching = full.filter { case (a, b) => a >= h || b >= h }
      val against = rows(Similarity.cosineNearDupPairsAgainst(batch, old,
        "vec_id", "embedding", threshold = 0.3, numPlanes = planes, dim = 64,
        probeRadius = radius, numTables = tables))
      assert(against == touching,
        s"config ($planes,$radius,$tables): one-sided probe must equal the " +
          s"symmetric two-sided restriction (${against.size} vs ${touching.size})")
    }
  }

  test("prebucketed Against == direct Against (the persisted bucket-state path)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val h = 400L
    val old = emb.filter(col("vec_id") < h)
    val batch = emb.filter(col("vec_id") >= h)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucket rows round-tripped through parquet exactly as the service
    // persists them — the claim is that STORED (id, t, sig) rows are a
    // full substitute for recomputing the corpus-side signatures
    val bkDir = java.nio.file.Files.createTempDirectory("bktab").toString
    Similarity.lshBucketTable(old, "vec_id", "embedding",
        numPlanes = 4, dim = 64, numTables = 16)
      .write.mode("overwrite").parquet(bkDir)
    val stored = spark.read.schema("id long, t int, sig long").parquet(bkDir)
    val direct = rows(Similarity.cosineNearDupPairsAgainst(batch, old,
      "vec_id", "embedding", threshold = 0.3, numPlanes = 4, dim = 64,
      probeRadius = 1, numTables = 16))
    val bucketed = rows(Similarity.cosineNearDupPairsAgainstBucketed(batch, old,
      stored, "vec_id", "embedding", threshold = 0.3, numPlanes = 4, dim = 64,
      probeRadius = 1, numTables = 16))
    assert(bucketed == direct,
      s"prebucketed pairs diverged (${bucketed.size} vs ${direct.size})")
    assert(direct.nonEmpty, "premise: the config must produce pairs on this data")
  }

  test("cluster-keyed split: no near-dup pair ever crosses a split boundary (q95 leakage property)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, numPlanes = 8, dim = 64, probeRadius = 8, numTables = 1)
    val asg = Dedup.componentAssignments(
      emb.select(col("vec_id").cast("long").as("vec_id")), "vec_id",
      pairs, "id_a", "id_b")
    val split = CorpusQuality.hashSplit(asg, col("cluster_id").cast("string"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("id"), col("split"))
    val crossing = pairs
      .join(split.select(col("id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(split.select(col("id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(crossing == 0L, s"$crossing near-dup pairs straddle a split boundary")
    // and the split is non-degenerate: at least two splits actually occur
    assert(split.select("split").distinct().count() >= 2)
    // NEGATIVE CONTROL: the standard per-DOCUMENT split leaks on this very
    // corpus — some near-dup pair straddles a boundary — which is exactly
    // the failure the cluster key exists to close
    val docKeyed = CorpusQuality.hashSplit(asg, col("id").cast("string"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("id"), col("split"))
    val leaky = pairs
      .join(docKeyed.select(col("id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(docKeyed.select(col("id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(leaky > 0L,
      "control failed: a doc-keyed split shows no leakage on this corpus, " +
        "so the test would not detect a regression to doc keying")
  }
}
