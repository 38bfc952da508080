package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus pipelines.
  *
  * Four tiers, all shuffle-minimal and expression-only (no UDFs):
  *  - exact:   hash-groupBy on content digest — one shuffle on the digest.
  *  - minhash: shingle → 64-perm MinHash signature (one codegen'd pass) →
  *             LSH banding → bucket self-join for candidates. Only documents
  *             sharing a band bucket ever meet, so the join is linear-ish in
  *             candidates, not O(n²) — the property that survives 100 TB.
  *  - simhash: 64-bit sign-of-sums fingerprint; near-dups = small Hamming
  *             distance within identical high-bit prefix buckets.
  *  - exact n-gram Jaccard: shingle-explode + equi-join + group-count (for
  *             validation / small candidate sets; the oracle-checkable tier).
  */
object Dedup {

  /** Exact dedup on `keyCols` digest, keeping the row minimizing `tieBreak`.
    * Single shuffle (groupBy digest + min_by), no window needed — the digest
    * keeps the shuffle key at 32 hex chars even when the keys are whole
    * documents (grouping on the raw keys would shuffle the full text).
    *
    * The tuple digest is INJECTIVE (up to md5 collision): each key becomes a
    * fixed-width 32-char block — its md5, or a non-hex null marker (null
    * keys group together, matching groupBy null semantics) — and the blocks
    * are concatenated then digested once. The separator-join this replaces
    * (concat_ws over the raw keys) was not injective: concat_ws SKIPS nulls,
    * so ("x", null) and (null, "x") merged, and a separator byte INSIDE one
    * key shifts the block boundaries, so ("a\u0000b", "c") and
    * ("a", "b\u0000c") merged — the silent wrong-merge class exact dedup
    * exists to prevent. Non-binary keys group by their string cast;
    * BINARY keys digest their raw bytes — `cast(binary as string)` folds
    * invalid-UTF-8 bytes to replacement chars, so two distinct byte keys
    * could digest identically through the cast (the last conditional in
    * the injectivity claim, closed r15). The per-key datatype dispatch is
    * driver-side analysis only (one `df.select(k).schema` per key).
    *
    * Determinism contract: ties in `tieBreak` keep an ARBITRARY row of the
    * group (min_by semantics) — partition-order- and retry-dependent. Pass
    * a group-unique tiebreak (an id) when the surviving row's identity
    * must be reproducible across runs; every call site here does. */
  def exactDedup(df: DataFrame, keyCols: Seq[Column], tieBreak: Column): DataFrame = {
    val blocks = keyCols.map { k =>
      val bytes = df.select(k).schema.head.dataType match {
        case org.apache.spark.sql.types.BinaryType => k
        case _ => to_binary(k.cast("string"), lit("utf-8"))
      }
      coalesce(md5(bytes), lit("x" * 32))
    }
    val digest = md5(to_binary(concat(blocks: _*), lit("utf-8")))
    val packed = struct(df.columns.map(col): _*)
    df.groupBy(digest.as("__digest"))
      .agg(min_by(packed, tieBreak).as("__row"))
      .select(col("__row.*"))
  }

  /** Deterministic MinHash permutation parameters (LCG, fixed seed). */
  private val MinhashPrime = 4294967311L // smallest prime > 2^32
  private[graft] def permParams(numHashes: Int): (Seq[Long], Seq[Long]) = {
    var state = 88172645463325252L
    def next(): Long = { // xorshift64 — deterministic, public-domain algorithm
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
    }
    val a = Seq.fill(numHashes)(math.abs(next()) % ((1L << 29) - 1) + 1)
    val b = Seq.fill(numHashes)(math.abs(next()) % (1L << 29))
    (a, b)
  }

  /** MinHash signatures over word `n`-gram shingles:
    * sig[i] = min over shingles of (a_i * h32(shingle) + b_i) mod p.
    *
    * Shape: explode shingle hashes once, then ONE hash aggregation with 64
    * `min` columns. Map-side partial aggregation reduces each task's stream
    * to 64 longs per doc before the shuffle — at 100 TB the shuffle carries
    * ~512 B/doc regardless of doc length. (A single nested-array expression
    * would recompute the shingle set per permutation after projection
    * collapse — measured pathological.)
    *
    * Docs with no shingles (shorter than `shingleN` words) are dropped.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, shingleN: Int = 3,
                        tokenHash: Column => Column = tokenHash32): DataFrame =
    // Tokenize ONCE into a named column before shingling: passing the token
    // expression straight into the shingle transform re-tokenizes the text
    // per shingle index (the q25 295 s pathology; see shinglesOfTokens).
    minhashSignaturesOfTokens(
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks")),
      "id", "__toks", numHashes, shingleN, tokenHash)

  /** [[minhashSignatures]] over an ALREADY-TOKENIZED corpus — the composed-
    * pipeline entry point: a chain that has materialized `tokens(text)` once
    * (e.g. for its quality gate) sketches from that column instead of
    * re-deriving split() in a second plan branch. `toksCol` must be a plain
    * attribute, not a computed expression (see shinglesOfTokens). */
  def minhashSignaturesOfTokens(df: DataFrame, idCol: String, toksCol: String,
                                numHashes: Int = 64, shingleN: Int = 3,
                                tokenHash: Column => Column = tokenHash32): DataFrame = {
    val (as, bs) = permParams(numHashes)
    val hs = df
      .select(col(idCol).as("id"), col(toksCol).as("__toks"))
      .select(col("id"),
        explode(array_distinct(shinglesOfTokens(col("__toks"), shingleN))).as("s"))
      .select(col("id"), tokenHash(col("s")).as("h"))
    val aggs = (0 until numHashes).map { i =>
      min(pmod(lit(as(i)) * col("h") + lit(bs(i)), lit(MinhashPrime))).as(s"__m$i")
    }
    hs.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** LSH band buckets for a signature: array of (band, bucket-hash). The
    * bucket id hashes the band's signature slice directly (xxhash64 on the
    * array — overflow-free under ANSI mode). */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)

  /** Candidate near-duplicate pairs via MinHash + LSH banding.
    *
    * Returns (id_a, id_b, est_jaccard) for id_a < id_b where the pair shares
    * ≥1 band bucket and the signature-agreement estimate ≥ `threshold`.
    * Buckets larger than `maxBucket` are dropped (degenerate content — e.g.
    * empty docs — would otherwise produce a quadratic bucket; standard LSH
    * skew guard).
    *
    * Choose (bands, rows = numHashes/bands) so the banding s-curve's 50%%
    * recall point (1/bands)^(1/rows) sits at or below `threshold` — e.g.
    * 16x4 suits thresholds ≥ ~0.5, 32x2 reaches down to ~0.2. A threshold
    * far below the midpoint is accepted but logs a warning: such pairs
    * rarely ever become candidates.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 64, bands: Int = 16,
                            threshold: Double = 0.5,
                            maxBucket: Int = 1000,
                            tokenHash: Column => Column = tokenHash32): DataFrame =
    candidatePairsFromSigs(
      minhashSignatures(df, idCol, textCol, numHashes, tokenHash = tokenHash),
      numHashes, bands, threshold, maxBucket)._1

  /** [[minhashCandidatePairs]] over an already-tokenized corpus (see
    * [[minhashSignaturesOfTokens]]) — identical pairs, no second tokenize. */
  def minhashCandidatePairsOfTokens(df: DataFrame, idCol: String, toksCol: String,
                                    numHashes: Int = 64, bands: Int = 16,
                                    threshold: Double = 0.5,
                                    maxBucket: Int = 1000,
                                    tokenHash: Column => Column = tokenHash32): DataFrame =
    minhashCandidatePairsOfTokensReleasable(df, idCol, toksCol, numHashes,
      bands, threshold, maxBucket, tokenHash)._1

  /** [[minhashCandidatePairsOfTokens]] plus a thunk releasing the internal
    * signature cache (~520 B/doc, persisted because the pair plan references
    * it four times). A composed job that consumes the pairs EAGERLY — e.g.
    * closes them into components, whose output is checkpoint-backed — should
    * release as soon as that action completes; one-shot callers can rely on
    * the retained-cache policy ([[minhashCandidatePairs]] scaladoc). */
  def minhashCandidatePairsOfTokensReleasable(
      df: DataFrame, idCol: String, toksCol: String,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.5,
      maxBucket: Int = 1000,
      tokenHash: Column => Column = tokenHash32): (DataFrame, () => Unit) =
    candidatePairsFromSigs(
      minhashSignaturesOfTokens(df, idCol, toksCol, numHashes, tokenHash = tokenHash),
      numHashes, bands, threshold, maxBucket)

  /** [[minhashCandidatePairs]]' banding/bucketing/scoring stage over
    * PRE-COMPUTED signatures — (id, sig: array<bigint>) with `numHashes`
    * entries. Public for callers that bring their own sketch (and for the
    * synthetic-scale soak, which drives the bucket-cap skew guard with
    * adversarial signature sets no real tokenizer run could shape
    * precisely). Returns the pairs plus the signature-cache release thunk
    * ([[minhashCandidatePairsOfTokensReleasable]] semantics). */
  def candidatePairsOfSignatures(sigs: DataFrame, numHashes: Int = 64,
                                 bands: Int = 16, threshold: Double = 0.5,
                                 maxBucket: Int = 1000): (DataFrame, () => Unit) =
    candidatePairsFromSigs(sigs, numHashes, bands, threshold, maxBucket)

  private def candidatePairsFromSigs(rawSigs: DataFrame, numHashes: Int,
                                     bands: Int, threshold: Double,
                                     maxBucket: Int): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // Parameter sanity: the (bands, rows) s-curve should put its steep section
    // near the declared threshold — 50% candidate recall at j ≈ (1/bands)^(1/r).
    // A threshold far below that point implies recall the banding cannot give.
    // Warn (don't throw): mismatched callers get the low-recall behavior they
    // asked for, with the fix spelled out in the log.
    val recall50 = math.pow(1.0 / bands, 1.0 / r)
    if (threshold < recall50 * 0.6)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"minhashCandidatePairs: threshold $threshold%.2f is far below the " +
          f"(bands=$bands, rows=$r) s-curve midpoint $recall50%.2f — pairs near " +
          f"the threshold will rarely become candidates; re-band (more bands, " +
          f"fewer rows) or raise the threshold")
    // The signature table is referenced four times in this plan (both sides
    // of the bucket join, both signature joins); persist so the shingle
    // explosion + 64-way min aggregation runs once. ~520 B/doc — at 100 TB
    // input this is n_docs * 0.5 KB, safely cacheable/spillable.
    val sigs = rawSigs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Explode band buckets; kill skewed buckets before the self-join.
    val bucketed = sigs
      .select(col("id"), col("sig"), explode(lshBuckets(col("sig"), bands, r)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val bucketSizes = bucketed.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") between (2, maxBucket))
    val ok = bucketed.join(bucketSizes, Seq("band", "bucket"), "left_semi")
    // Distinct id-pairs FIRST (ids only — a pair found in many bands must not
    // be scored per band), then join the 64-long signatures back once per side.
    val a = ok.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = ok.select(col("band"), col("bucket"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // Statically-unrolled agreement count (codegen'd; a zip_with/aggregate
    // lambda runs interpreted and measured ~10x slower at bench scale).
    val agree = (0 until numHashes).map { i =>
      when(element_at(col("sig_a"), i + 1) === element_at(col("sig_b"), i + 1), 1)
        .otherwise(0)
    }.reduce(_ + _)
    val out = pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    (out, () => { sigs.unpersist(blocking = false); () })
  }

  /** Hash-word providers for `simhash`: token → fixed-width hash words whose
    * concatenated low bits form the 64-bit space. The default is one 64-bit
    * xxhash64 word (fast path); `Md5Words` is two 32-bit words from the md5
    * digest — reproducible by an ANSI SQL oracle (no 64-bit hex parse, which
    * would overflow a signed BIGINT). */
  val XxWords: (Column => Seq[Column], Int) = (w => Seq(xxhash64(w)), 64)
  val Md5Words: (Column => Seq[Column], Int) = (w => Seq(md5Hash32(w), md5Hash32b(w)), 32)

  /** 64-bit SimHash per row: sign of per-bit weighted sums over token hashes.
    * Tokens are pre-aggregated to (id, token) → count so the 64-column sum
    * runs over DISTINCT words weighted by count (roughly halves the agg input
    * on natural text); then ONE hash aggregation with 64 statically-unrolled
    * sum(±count) columns — whole-stage-codegen'd, map-side combined, no
    * row×64 expansion (an exploded (id, bit) form measured 10x slower). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              hashWords: (Column => Seq[Column], Int) = XxWords): DataFrame = {
    val (words, wordBits) = hashWords
    val wc = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("cnt"))
    val hcols = words(col("w")).zipWithIndex.map { case (c, i) => c.as(s"__h$i") }
    val hashed = wc.select(col("id") +: col("cnt") +: hcols: _*)
    def bit(b: Int): Column =
      shiftright(col(s"__h${b / wordBits}"), b % wordBits).bitwiseAND(lit(1L))
    val sums = (0 until 64).map { b =>
      sum(when(bit(b) === lit(1L), col("cnt")).otherwise(-col("cnt"))).as(s"__b$b")
    }
    hashed.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 64).map { b =>
          when(col(s"__b$b") > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-duplicate pairs: by pigeonhole, any pair within Hamming
    * distance `maxHamming` (< bands) of each other shares at least one exact
    * 16-bit band — so candidates come from an equi-join on (band, band-bits),
    * then the exact distance is one codegen'd `bit_count(xor)`. Linear in
    * candidates, never O(n²). */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3,
                          hashWords: (Column => Seq[Column], Int) = XxWords): DataFrame = {
    require(maxHamming < 4, "4 bands of 16 bits guarantee recall only for maxHamming < 4")
    val sim = simhash(df, idCol, textCol, hashWords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sim.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))
      }: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val a = banded.select(col("band"), col("bits"), col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("bits"), col("id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact word-`n`-gram Jaccard similarity for all pairs with ≥1 shared
    * shingle and jaccard ≥ threshold. Shingle-explode + equi-join: each pair
    * is formed only via shared shingles (inverted-index join), never a cross
    * join. Intended for modest candidate sets or as the exactness oracle.
    *
    * `maxDocFreq` drops shingles appearing in more than that many documents
    * from the inverted index BEFORE the self-join: one ubiquitous shingle
    * (boilerplate, a stop-phrase) would otherwise fan out df² pairs — the
    * quadratic blowup at 100 TB. Set sizes are computed from the UNCAPPED
    * shingle sets, so when the cap binds the reported jaccard is a lower
    * bound (capped shingles lose only their pair-discovery role). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxDocFreq: Long = 10000): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id"), explode(array_distinct(shinglesOfTokens(col("__toks"), n))).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    val idx = sh.join(rare, Seq("sh"), "left_semi")
    val inter = idx.select(col("id").as("id_a"), col("sh"))
      .join(idx.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected edge list — the clustering
    * step that turns near-duplicate PAIRS (minhash/simhash/jaccard tiers
    * above) into dedup GROUPS, so a pipeline can keep ONE canonical doc per
    * group instead of dropping one side of every pair (pair-wise dropping
    * over-deletes on transitive chains a–b, b–c).
    *
    * Algorithm: distributed min-label propagation with pointer jumping.
    * The edge table is symmetrized and seeded with one self-edge per node,
    * so each round
    *   (a) relaxes each label to the min over the node's CLOSED
    *       neighborhood in a single edge–label join + min-agg (the
    *       self-edge contributes the node's own label — no separate
    *       label-merge join), then
    *   (b) pointer-jumps: replaces each label by its label's label (one
    *       self-join on the relaxed table; Spark's exchange reuse computes
    *       the relax aggregation once even though it appears on both
    *       sides).
    * Jumping roughly doubles the graph distance a label has travelled, so
    * rounds are O(log diameter) on ANY graph — bare propagation is
    * O(diameter), which on a 10⁶-doc duplicate chain would mean 10⁶
    * sequential rounds. Each round costs three shuffles (edge–label join,
    * min-agg, jump self-join). Per-round state is one (node, label) row
    * per node and only labels travel between rounds, so a 10⁸-member
    * component costs the same shuffle volume as 10⁸ singletons — nothing
    * component-shaped is ever materialized in one place. Each round's
    * labels are checkpointed (see [[truncate]]: RELIABLE checkpoint when
    * the session configures a checkpoint dir — the cluster-deployment
    * fault-tolerance path — executor-local otherwise) — MANDATORY, not an
    * optimization: the
    * jump references the relaxed table twice, so without truncation the
    * logical plan doubles every round and plan traversal goes exponential
    * (measured: an 8-round run OOMs the driver building an explain
    * string). Live storage stays O(nodes + edges): once a round's
    * checkpoint is materialized by the convergence action, the previous
    * round's backing RDD is unpersisted explicitly — never more than two
    * label snapshots plus the edge cache. (localCheckpoint trades
    * executor-loss recovery for speed; at ≤ ~40 rounds for any physical
    * diameter, a lost executor costs one query retry — prefer a reliable
    * `checkpoint` dir if that matters.)
    *
    * Convergence is detected by an exact monotone argument rather than a
    * change-join: labels never increase (relax takes a min; a jump assigns
    * lbl(u) ≤ u = lbl(v) ≤ old lbl(v)), so the label SUM (widened to
    * decimal(38,0) — overflow-free at any node count) strictly decreases
    * until fixpoint, and an unchanged sum IS the fixpoint. That scalar is
    * the only value the driver reads per round.
    *
    * Returns (node, component) where component = min node id of the
    * component — deterministic, no tie-breaking; the result is left
    * checkpoint-cached (callers typically consume it more than once — size
    * it as one long pair per node). Self-loops in the input are discarded: a
    * node appearing ONLY in self-loops is absent from the output (it is
    * in no 2+-node component). Id columns must be integral — a lossy cast
    * (string ids hashing to null) would silently drop edges, so it is
    * rejected loudly.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 64): DataFrame =
    connectedComponentsWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** Eager, plan-truncating checkpoint for the CC loop's reused frames.
    * When the session has a RELIABLE checkpoint directory configured
    * (`SparkContext.setCheckpointDir`), use it: checkpoint files live on
    * the DFS and survive executor loss, so a cluster deployment keeps
    * fault tolerance through the loop (set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` if the app
    * outlives many builds). Otherwise `localCheckpoint`: faster (executor-
    * local blocks, no DFS round-trip) but NON-REPLAYABLE — losing an
    * executor mid-loop fails the query and a retry recomputes from source.
    * That is the right default for the ≲40-round loops here on local or
    * retry-tolerant jobs; a cluster job that cannot afford a query retry
    * opts into durability by setting a checkpoint dir — no API change. */
  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** [[connectedComponents]] plus the number of label-propagation rounds the
    * build ran (including the final confirming round whose label sum was
    * unchanged) — the observable the O(log diameter) claim is measured by:
    * the soak bench pins rounds ≈ log₂(diameter) on a synthetic
    * million-node chain, turning the complexity argument into a number. */
  /** `seed`, when given, WARM-STARTS the label propagation: a (node, lbl)
    * frame whose labels replace the self-label start for the nodes it
    * covers (uncovered nodes still start at themselves). Contract — for
    * EXACTNESS, not just speed — each seeded `lbl` must be (a) ≤ its
    * `node` and (b) the id of a node REACHABLE from `node` in the edge
    * graph. Both invariants are what the convergence proof rests on
    * (labels never increase, labels always name reachable nodes, so the
    * fixpoint label is the component min); self-labels satisfy them
    * trivially, and a prior component assignment whose clusters are
    * star-edged into the graph satisfies them by construction (the star
    * edge member→label makes the label reachable, min-labels are ≤ member
    * ids). A seed violating the contract silently mislabels — hence the
    * spec-gated warm==cold equality in DedupSimilaritySpec rather than a
    * (corpus-sized) runtime check. Seeding near the fixpoint cuts rounds
    * from O(log diameter) to the few needed to merge NEW structure —
    * measured 6–10 → ~3 on the incremental maintenance folds. */
  def connectedComponentsWithRounds(edges: DataFrame, srcCol: String,
                                    dstCol: String,
                                    maxIter: Int = 64,
                                    seed: Option[DataFrame] = None): (DataFrame, Int) = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    Seq(srcCol, dstCol).foreach { c =>
      val dt = edges.schema(c).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"connectedComponents: id column '$c' must be integral, got $dt " +
          "(casting would null out unparseable ids and silently drop edges)")
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    // Cache the symmetrized edges for the duration of the build: they feed
    // `und` twice (directly and via the self-edge node list), and without
    // the cache each copy re-runs the whole upstream edge computation —
    // for q74 that is an extra full minhash sketch pass (measured +50%).
    val real = sym.union(sym.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d"))
      .persist(lvl)
    val nodes = real.select(col("s")).distinct()
    // Symmetrized + self-edge-seeded + deduped once; reused every round.
    // truncate, i.e. a checkpoint (not persist): a persisted frame still CARRIES the
    // upstream logical plan inside its InMemoryRelation, and every one of
    // the O(log) per-round actions re-runs analysis + optimization over
    // it — for an edge plan holding a large expression tree (the pruned
    // LSH candidate generator: 64 hyperplane literal arrays) that driver
    // cost dwarfed the actual stages (measured 10x on q104's per-batch
    // folds). The checkpoint truncates the plan to a LogicalRDD leaf, so
    // every round plans over a two-column table no matter what produced
    // the edges.
    val und = truncate(
      real.union(nodes.select(col("s"), col("s").as("d"))).distinct())
    val selfStart = und.filter(col("s") === col("d"))
      .select(col("s").as("node"), col("s").as("lbl"))
    var labels = truncate(seed match {
      case None => selfStart
      case Some(sd) =>
        // warm start: prior labels where provided, self elsewhere — the
        // seed is restricted to the graph's own node set so stray rows
        // cannot inject labels for absent nodes
        val s0 = sd.select(col("node").cast("long").as("node"),
          col("lbl").cast("long").as("pl"))
        selfStart.join(s0, Seq("node"), "left")
          .select(col("node"), coalesce(col("pl"), col("lbl")).as("lbl"))
    })
    real.unpersist() // und is materialized; the build cache is done
    // Deterministic release of a localCheckpoint's persisted blocks: the
    // checkpointed Dataset is backed by a LogicalRDD leaf whose RDD holds
    // the storage. (Dataset.unpersist goes through the CacheManager and
    // does not know about checkpoint RDDs; without this, snapshots linger
    // until driver GC happens to collect the Dataset.)
    def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
    var prevSum: Option[java.math.BigDecimal] = None
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val relaxed = und
        .join(labels.select(col("node").as("d"), col("lbl").as("nl")), Seq("d"))
        .groupBy("s").agg(min(col("nl")).as("lbl"))
        .select(col("s").as("node"), col("lbl"))
      // Jump: labels are always node ids present in the table (mins of node
      // ids), so the lookup is total; left+coalesce guards the invariant.
      // The eager localCheckpoint both materializes the round and truncates
      // the otherwise per-round-doubling plan (relaxed appears twice).
      val jumped = truncate(relaxed.join(
          relaxed.select(col("node").as("lbl"), col("lbl").as("ll")), Seq("lbl"), "left")
        .select(col("node"), coalesce(col("ll"), col("lbl")).as("lbl")))
      val sum = jumped.agg(
          org.apache.spark.sql.functions.sum(col("lbl").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
      release(labels) // jumped is materialized — release the old snapshot
      labels = jumped
      val s = Option(sum) // None ⇔ empty graph — converged trivially
      done = s == prevSum || s.isEmpty
      prevSum = s
      it += 1
    }
    release(und)
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    (labels.select(col("node"), col("lbl").as("component")), it)
  }

  /** Full-coverage cluster assignment over a universe of ids: close `edges`
    * into components ([[connectedComponents]]) and give EVERY id in
    * `universe` a row — (id, cluster_id, cluster_size, is_canonical) — with
    * singletons filling their own id as the label. The cluster label is the
    * component's minimum member id, so `is_canonical` (id == cluster_id)
    * marks exactly one keeper per cluster: the SemDeDup-style
    * keep-one-per-cluster dedup decision, materialized as a column instead
    * of a filter so callers can also compute removal rates or pick a
    * different survivor policy downstream.
    *
    * Scale shape on top of the CC rounds: one left join of the universe
    * against the (strictly smaller) clustered-node set, one groupBy on
    * cluster_id for sizes, one join back — all hash-partitioned on id-like
    * keys, nothing driver-side, no windows.
    *
    * Precondition: edge endpoints should lie in `universe`. An edge to an
    * OUTSIDE id still propagates labels (it can even become a cluster's
    * min label) but gets no assignment row — sizes then count only the
    * universe members. Every caller here derives edges from the universe
    * itself, so this stays a documented contract rather than a
    * (corpus-sized, anti-join) runtime check. */
  def componentAssignments(universe: DataFrame, idCol: String,
                           edges: DataFrame, srcCol: String, dstCol: String,
                           maxIter: Int = 64,
                           seed: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = universe.schema(idCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
      s"componentAssignments: id column '$idCol' must be integral, got $dt")
    val cc = connectedComponentsWithRounds(edges, srcCol, dstCol, maxIter, seed)._1
    val ids = universe.select(col(idCol).cast("long").as("id"))
    val assigned = ids
      .join(cc.select(col("node").as("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster_id"))
    val sz = assigned.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sz, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("cluster_size"),
        (col("id") === col("cluster_id")).cast("int").as("is_canonical"))
  }

  /** Incremental (cross-batch) component closure: fold a NEW batch's edges
    * into an EXISTING full-coverage assignment without re-running the old
    * corpus's pairwise similarity. `assignment` is prior
    * [[componentAssignments]] output (or any (id, cluster_id) table whose
    * labels are component minima); `newEdges` is every similarity pair that
    * TOUCHES a new id (new-new and new-old — the candidate generator runs
    * batch × accumulated, never accumulated × accumulated).
    *
    * Correctness: a component of a graph is unchanged when each old cluster
    * is replaced by its star (member — label), because the star has exactly
    * the old cluster's connectivity; adding the new-touching edges then
    * yields the same components a full recompute over all pairs would find.
    * With append-only ids (new ids > old ids) the min-label is also
    * preserved: old clusters keep their labels, clusters merged by a new
    * bridge doc take the smaller (older) label — so incremental == full
    * recompute EXACTLY, not approximately (spec-gated in DedupSimilaritySpec).
    *
    * This is the 100 TB maintenance story: a daily batch pays
    * |batch| × candidate-bucket similarity plus CC over
    * (|corpus| star edges + new pairs), instead of corpus × corpus.
    *
    * `warmStart` (default on) seeds the label propagation from the prior
    * assignment itself instead of self-labels — valid EXACTLY (not
    * approximately) because the prior labels satisfy the seed contract of
    * [[connectedComponentsWithRounds]] under this method's own input
    * contract: each prior label is the min of its old cluster, hence
    * ≤ the member id, and the star edge (member → label) this method adds
    * makes it reachable by construction. The fold then converges in the
    * few rounds needed to merge NEW bridges (label distance already 0
    * inside unchanged old clusters) instead of re-walking every old
    * cluster's diameter — warm==cold equality is spec-gated in
    * DedupSimilaritySpec alongside the incremental==full gate. */
  def incrementalComponentAssignments(assignment: DataFrame,
                                      newUniverse: DataFrame, idCol: String,
                                      newEdges: DataFrame, srcCol: String,
                                      dstCol: String,
                                      maxIter: Int = 64,
                                      warmStart: Boolean = true): DataFrame = {
    val star = assignment
      .select(col("id").cast("long").as("s"), col("cluster_id").cast("long").as("d"))
    val fresh = newEdges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    val universe = assignment.select(col("id").cast("long").as("id"))
      .unionByName(newUniverse.select(col(idCol).cast("long").as("id")))
      .distinct()
    val seed =
      if (warmStart)
        Some(assignment.select(col("id").cast("long").as("node"),
          col("cluster_id").cast("long").as("lbl")))
      else None
    componentAssignments(universe, "id", star.unionByName(fresh), "s", "d",
      maxIter, seed)
  }

  /** SCOPED form of [[incrementalComponentAssignments]]: restrict the fold's
    * CC loop to the AFFECTED subgraph and pass every untouched prior row
    * through verbatim. Same inputs, same output, same exactness — but the
    * per-fold iterative cost becomes batch-proportional instead of
    * corpus-proportional.
    *
    * Why this is exact (and not an approximation): in the star-reduced
    * graph G = star(all old clusters) ∪ `newEdges`, an old cluster NONE of
    * whose members touches a new edge is a connected component of G all by
    * itself — its members connect only through its own star edges (other
    * clusters' stars are disjoint by definition, and the new edges miss it
    * by assumption). So components of G split into (a) untouched old
    * clusters, exactly as the prior assignment records them — same members,
    * same min-label, same size, same canonical — and (b) components of the
    * scoped graph star(affected clusters) ∪ newEdges over
    * (affected members ∪ new ids), which is the IDENTICAL subgraph a full
    * build would see for those nodes. Affected = prior clusters containing
    * any endpoint of a new edge. Hence scoped == unscoped == full recompute
    * row-for-row (three-way equality spec-gated in DedupSimilaritySpec).
    *
    * Scale shape per fold: the unscoped form shuffles the WHOLE corpus star
    * set through every label-propagation round and runs the corpus-wide
    * distinct/size-groupBy — O(rounds × |corpus|) shuffle rows per fold
    * even when the batch touches almost nothing. Here the corpus appears
    * only as broadcast-probe SCANS of the prior assignment (affected-cluster
    * semi/anti joins — map-side, no corpus shuffle); everything iterative
    * runs on |affected ∪ batch| rows. The irreducible corpus term left in a
    * fold is sequential scans + the full-coverage state write.
    *
    * Preconditions (the first two inherited from the unscoped form, where
    * they are needed for exactness anyway):
    *  - append-only ids — every `newUniverse` id greater than all prior ids
    *    (label preservation), and every `newEdges` endpoint present in
    *    `assignment` ∪ `newUniverse`;
    *  - `assignment` carries the FULL coverage schema
    *    (id, cluster_id, cluster_size, is_canonical) — untouched rows pass
    *    through verbatim, so all four columns must exist (the unscoped form
    *    reads only id/cluster_id because it recomputes the rest);
    *  - `newEdges` is batch-proportional: its endpoint set and the affected
    *    clusters' member rows are collected into BROADCAST relations here.
    *    For a batch so large that its candidate-pair endpoints cannot
    *    broadcast (≳10⁸ pairs), fall back to the unscoped form — exactness
    *    never depends on the choice. */
  def incrementalComponentAssignmentsScoped(assignment: DataFrame,
                                            newUniverse: DataFrame, idCol: String,
                                            newEdges: DataFrame, srcCol: String,
                                            dstCol: String,
                                            maxIter: Int = 64): DataFrame = {
    val (untouched, rec) = incrementalComponentAssignmentsScopedParts(
      assignment, newUniverse, idCol, newEdges, srcCol, dstCol, maxIter)
    untouched.unionByName(rec)
  }

  /** The two halves of [[incrementalComponentAssignmentsScoped]], exposed
    * separately: `(untouched, recomputed)` where `untouched` is the prior
    * rows of clusters no new edge reaches (passed through verbatim) and
    * `recomputed` is the freshly-computed assignment over
    * (affected-cluster members ∪ new ids).
    *
    * Why the split matters: `recomputed` is the fold's exact CHANGE SET —
    * its id set is precisely the rows the fold superseded or created (every
    * member of an affected cluster is in the scoped universe; every other
    * prior row is untouched by the exactness argument above). A caller
    * maintaining versioned state can therefore persist `recomputed` alone
    * as a batch-proportional DELTA and reconstruct full coverage later by
    * latest-fold-wins merge over (snapshot, deltas) — the contract
    * [[graft.jobs.ClusterMaintenance]] builds its delta state layout on. */
  def incrementalComponentAssignmentsScopedParts(assignment: DataFrame,
                                                 newUniverse: DataFrame, idCol: String,
                                                 newEdges: DataFrame, srcCol: String,
                                                 dstCol: String,
                                                 maxIter: Int = 64): (DataFrame, DataFrame) = {
    // Materialize the candidate pairs once (they feed the endpoint set, the
    // scoped edge graph, and — via the broadcast builds — would otherwise
    // re-run the whole LSH candidate generator per consumer). localCheckpoint
    // rather than persist: the downstream CC loop plans over these many
    // times, and a persisted frame still carries the generator's plan
    // (see the note in connectedComponentsWithRounds).
    val fresh = newEdges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .localCheckpoint(true)
    val eps = fresh.select(col("s").as("id"))
      .unionByName(fresh.select(col("d").as("id"))).distinct()
    // Prior clusters containing any fresh endpoint. Corpus side is scanned,
    // never shuffled: eps broadcasts into the semi join, affected (≤ |eps|
    // rows) broadcasts into the touched/untouched splits below.
    val affected = assignment.join(broadcast(eps), Seq("id"), "left_semi")
      .select(col("cluster_id")).distinct()
      .localCheckpoint(true)
    // touched is affected-cluster-sized (batch-proportional). Checkpoint
    // rather than persist/unpersist: the result frame below still references
    // it lazily (through scopedU inside rec), so an eager unpersist here
    // would silently re-run the corpus semi join at consumption time.
    val touched = assignment
      .join(broadcast(affected), Seq("cluster_id"), "left_semi")
      .select(col("id").cast("long").as("id"),
        col("cluster_id").cast("long").as("cluster_id"))
      .localCheckpoint(true)
    val star = touched.select(col("id").as("s"), col("cluster_id").as("d"))
    val scopedU = touched.select(col("id"))
      .unionByName(newUniverse.select(col(idCol).cast("long").as("id")))
      .distinct()
    val seed = Some(touched.select(col("id").as("node"),
      col("cluster_id").as("lbl")))
    val rec = componentAssignments(scopedU, "id", star.unionByName(fresh),
      "s", "d", maxIter, seed)
    val untouched = assignment
      .join(broadcast(affected), Seq("cluster_id"), "left_anti")
      .select(col("id").cast("long").as("id"),
        col("cluster_id").cast("long").as("cluster_id"),
        col("cluster_size").cast("long").as("cluster_size"),
        col("is_canonical").cast("int").as("is_canonical"))
    // rec's CC loop materialized eagerly above (checkpointed labels), so
    // consumers re-run only the cheap scoped joins on top of it — the
    // corpus-sized side is the untouched scan, read once by whatever action
    // consumes the result.
    (untouched, rec)
  }

  /** Exact SUBSTRING (span-level) dedup — the within-document member of
    * the dedup family (Lee et al. 2022, arXiv:2107.06499: duplicated
    * spans, not just duplicated documents, hurt LM training): every
    * position whose `n`-token window occurs more than once in the WHOLE
    * corpus (any doc, including elsewhere in the same doc) is "covered";
    * covered positions merge into maximal spans; the cleaned document is
    * the uncovered tokens in order. Returns one row per input doc:
    * (id, n_tokens, n_dup_starts, n_spans, n_covered, clean_text) —
    * docs with no duplicated span (or shorter than n) pass through with
    * zero counts and their full text.
    *
    * Scale shape: the window enumeration is shuffle-free (per-row
    * sequence explode, the chunker's shape); corpus-wide gram counts are
    * ONE groupBy on the gram's md5 DIGEST (map-side combined; see
    * [[windowStarts]] — the raw n-token string never shuffles) + one
    * join back — and unlike PAIR generation, that join is LINEAR in
    * window starts (each start matches its own gram's one distinct-dup
    * row, never the other occurrences), so a boilerplate gram with 10^6
    * occurrences contributes 10^6 covered starts, not 10^12 pairs — no
    * df cap needed (AQE handles the hot-key skew); span merging is a
    * per-document window ordered by start — bounded by document length,
    * like the chunker (intervals share length n, so ends are monotone in
    * starts and "new span iff start > prev start + n − 1" is exact).
    * The cleaned-text rebuild pays O(tokens × spans) per doc inside one
    * codegen'd projection — no extra shuffle. */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    removeDuplicateSpansOfTokens(
        docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks")),
        "id", "toks", n)
      .withColumn("clean_text", concat_ws(" ", col("clean_toks")))
      .drop("clean_toks")

  /** [[removeDuplicateSpans]] over an EXISTING token-array column — the
    * composed-pipeline form (`CorpusPipeline.segmentPlan` projects
    * `tokens(text)` exactly once; this variant consumes that attribute so
    * adding span dedup to the chain adds no tokenize). Returns
    * (id, n_tokens, n_dup_starts, n_spans, n_covered, clean_toks). */
  def removeDuplicateSpansOfTokens(docs: DataFrame, idCol: String,
                                   toksCol: String, n: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(toksCol).as("toks"))
    val starts = windowStarts(base, n)
    val dupGrams = starts.groupBy("gram_md5").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("gram_md5")
    val dupStarts = starts.join(dupGrams, Seq("gram_md5")).select("id", "start")
    spanOutput(base, dupStarts, n)
  }

  /** Every n-token window start of (id, toks): one row (id, start,
    * gram_md5) per position 0..len−n. The gram travels as its md5 DIGEST,
    * never the raw joined string: both corpus-wide movements of this
    * column — the gram-count groupBy's exchange and the join back onto
    * starts — carry a fixed 32-hex key instead of an ~n-token string
    * (~3–5× less shuffle payload at n = 8 for any corpus). Joining tokens
    * with ' ' keeps gram identity unambiguous (tokens cannot contain
    * whitespace), and md5's 128 bits make a colliding pair vanishingly
    * improbable at any realistic gram count (birthday bound ~2⁻³⁸ even at
    * 10¹⁵ grams); the DuckDB oracles replay md5 natively. */
  private def windowStarts(base: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "span length must be at least 2 tokens")
    base.select(col("id"),
        explode(when(size(col("toks")) >= n,
            sequence(lit(0), size(col("toks")) - n))
          .otherwise(array().cast("array<int>"))).as("start"),
        col("toks"))
      .select(col("id"), col("start"),
        md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(n))))
          .as("gram_md5"))
  }

  /** Shared back half of the span-dedup family: merge covered window
    * starts into maximal spans (per-document window, bounded by doc
    * length — fixed-length intervals make "new span iff start >
    * prev + n − 1" exact) and rebuild each doc's cleaned token stream in
    * one codegen'd projection. */
  private def spanOutput(base: DataFrame, dupStarts: DataFrame,
                         n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("start")
    val spans = dupStarts
      .withColumn("ng", when(lag(col("start"), 1).over(w).isNull ||
        col("start") > lag(col("start"), 1).over(w) + (n - 1), 1L).otherwise(0L))
      .withColumn("grp", sum(col("ng")).over(w))
      .groupBy("id", "grp")
      .agg(min(col("start")).as("s"), (max(col("start")) + n).as("e"),
        count(lit(1)).as("n_starts"))
    val perDoc = spans.groupBy("id").agg(
      count(lit(1)).as("n_spans"),
      sum(col("e") - col("s")).as("n_covered"),
      sum(col("n_starts")).as("n_dup_starts"),
      collect_list(struct(col("s"), col("e"))).as("spans"))
    base.join(perDoc, Seq("id"), "left")
      .select(col("id"), size(col("toks")).cast("long").as("n_tokens"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        filter(col("toks"), (_, i) =>
          !coalesce(exists(col("spans"), sp =>
            i >= sp.getField("s") && i < sp.getField("e")), lit(false)))
          .as("clean_toks"))
  }

  /** Corpus gram-count state for the INCREMENTAL span-dedup path:
    * (gram_md5, cnt) over every `n`-token window of `docs` — the
    * accumulated table a continuously-ingested pipeline maintains beside
    * its corpus. Counts from successive batches merge by plain summation
    * (`union.groupBy(gram_md5).sum(cnt)`), so the table is mergeable
    * monoid state: one map-side-combined groupBy per batch, never a
    * corpus recount. */
  def spanGramCounts(docs: DataFrame, idCol: String, toksCol: String,
                     n: Int): DataFrame =
    windowStarts(docs.select(col(idCol).as("id"), col(toksCol).as("toks")), n)
      .groupBy("gram_md5").agg(count(lit(1)).as("cnt"))

  /** Cross-batch (incremental) exact-substring dedup —
    * [[removeDuplicateSpans]] for a continuously ingested corpus: a window
    * start in `batch` is covered iff its gram occurs MORE THAN ONCE across
    * batch ∪ corpus, where the corpus side enters as its accumulated
    * [[spanGramCounts]] table rather than being re-scanned. EXACTLY equals
    * the full recompute over (batch ∪ corpus) restricted to the batch's
    * docs, for ANY split: covered-ness of a start depends only on the
    * TOTAL count of its gram, and that total splits as
    * batch count + corpus count (spec-gated in DedupSimilaritySpec).
    *
    * Scale shape per batch: the batch's own gram counts are one map-side-
    * combined groupBy; a broadcast Bloom over the corpus gram table (the
    * [[novelAgainst]] pattern) then prefilters the corpus join — a gram
    * occurring once in the batch and DEFINITELY absent from the corpus is
    * proven unique without shuffling toward the corpus table, so a
    * mostly-novel daily batch pays ~|batch| local work plus an exact semi
    * join sized by fpp·|batch grams| + true cross-batch dups — never
    * |corpus|. (The Bloom build itself scans the gram table once per
    * call; a long-running service should build it once per corpus
    * generation and use the prebuilt-filter overload.) The result is
    * EXACT either way — the Bloom only ever skips work, never decides
    * dup-ness (false positives fall through to the exact join). */
  def removeDuplicateSpansIncrementalOfTokens(batch: DataFrame, idCol: String,
                                              toksCol: String, n: Int,
                                              corpusGrams: DataFrame,
                                              expectedCorpusGrams: Long,
                                              fpp: Double = 0.01): DataFrame = {
    val bf = corpusGrams.select(col("gram_md5"))
      .stat.bloomFilter("gram_md5", math.max(1L, expectedCorpusGrams), fpp)
    removeDuplicateSpansIncrementalOfTokens(batch, idCol, toksCol, n,
      corpusGrams, bf)
  }

  /** [[removeDuplicateSpansIncrementalOfTokens]] with a PREBUILT Bloom
    * filter over the corpus gram digests — the service form (build the
    * filter once per corpus generation, reuse across batches). */
  def removeDuplicateSpansIncrementalOfTokens(batch: DataFrame, idCol: String,
                                              toksCol: String, n: Int,
                                              corpusGrams: DataFrame,
                                              corpusBloom: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    removeDuplicateSpansIncrementalOfTokens(batch, idCol, toksCol, n,
      corpusGrams, Seq(corpusBloom))

  /** [[removeDuplicateSpansIncrementalOfTokens]] whose corpus Bloom
    * coverage is SPLIT across several prebuilt filters — the compacted
    * service's shape: one persisted filter covering the committed
    * generation plus a small fresh one covering the batch dirs after it.
    * A gram is a possible corpus hit iff ANY filter might contain it, so
    * the union of filters covers exactly the union of the state dirs; the
    * definite-miss guarantee (hence exactness) is preserved filter-wise.
    *
    * Containment contract — the direction matters: a unanimous
    * definite-miss is TRUSTED without consulting the semi join, so the
    * union of `corpusBlooms` must cover AT LEAST every gram present in
    * `corpusGrams` (filters may over-cover — extra keys only cost false
    * positives the exact semi join absorbs — but must never under-cover:
    * a filter set missing a corpus gram silently misses the duplicates
    * that gram would have flagged). */
  def removeDuplicateSpansIncrementalOfTokens(batch: DataFrame, idCol: String,
                                              toksCol: String, n: Int,
                                              corpusGrams: DataFrame,
                                              corpusBlooms: Seq[org.apache.spark.util.sketch.BloomFilter]): DataFrame = {
    require(corpusBlooms.nonEmpty,
      "removeDuplicateSpansIncrementalOfTokens: at least one corpus Bloom filter")
    val base = batch.select(col(idCol).as("id"), col(toksCol).as("toks"))
    val starts = windowStarts(base, n)
    val batchCnt = starts.groupBy("gram_md5").agg(count(lit(1)).as("cnt"))
    // ≥2 in the batch alone: duplicated regardless of the corpus
    val dupInBatch = batchCnt.filter(col("cnt") > 1).select("gram_md5")
    // exactly 1 in the batch: duplicated iff the corpus has it — Bloom
    // prefilter (definite-miss ⇒ provably unique), exact semi join for
    // the possible hits
    val mightContain = udf((s: String) =>
      s != null && corpusBlooms.exists(_.mightContainString(s)))
    val viaCorpus = batchCnt.filter(col("cnt") === 1)
      .filter(mightContain(col("gram_md5")))
      .join(corpusGrams.select("gram_md5"), Seq("gram_md5"), "left_semi")
    val dupGrams = dupInBatch.unionByName(viaCorpus.select("gram_md5"))
    val dupStarts = starts.join(dupGrams, Seq("gram_md5")).select("id", "start")
    spanOutput(base, dupStarts, n)
  }

  /** Incremental dedup: rows of `batch` whose `key` does not appear in
    * `reference` — the "today's crawl vs the accumulated corpus" step of a
    * continuously ingested training pipeline.
    *
    * A Bloom filter over the reference keys (built distributed by
    * `stat.bloomFilter`'s aggregate — only the filter bits reach the driver)
    * is broadcast to prefilter the batch: rows the filter rejects are
    * DEFINITELY novel and never shuffle; only the ~`fpp` false-positive slice
    * plus the true duplicates reach an exact `left_anti` join. The result is
    * therefore EXACT — the bloom is a shuffle reducer, never a correctness
    * gate. At 100 TB the anti-join input shrinks from |batch| to
    * |dups| + fpp·|batch| rows; the filter itself costs ~1.2 GiB per 10⁹
    * reference keys at fpp 0.01, so size `expectedItems` to the real corpus
    * and keep fpp ≥ 1e-3 (or shard the reference and union) to stay within
    * executor broadcast budgets. */
  def novelAgainst(batch: DataFrame, reference: DataFrame, key: Column,
                   expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val refKeys = reference.select(key.cast("string").as("__k"))
    val bf = refKeys.stat.bloomFilter("__k", expectedItems, fpp)
    val mightContain = udf((s: String) => s != null && bf.mightContainString(s))
    val keyed = batch.withColumn("__k", key.cast("string"))
    val sureNovel = keyed.filter(!mightContain(col("__k")))
    val suspects = keyed.filter(mightContain(col("__k")))
      .join(refKeys.distinct(), Seq("__k"), "left_anti")
    sureNovel.unionByName(suspects).drop("__k")
  }
}
