package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval — BM25 scoring over a document corpus.
  *
  * The reference's text stack stops at boolean matching (Grep's per-line
  * regex count, .../examples/Grep.java:73) and raw term counts; a curation
  * pipeline also needs RANKED retrieval — "the documents most relevant to
  * this probe query" — for eval-set mining and targeted corpus slicing.
  *
  * Scoring is the BM25 family with the RAW idf ratio (N − df + ½)/(df + ½)
  * instead of its log: the log is monotone, so rankings are preserved
  * within a term, and the raw form keeps every score a short fixed-order
  * chain of IEEE ops that a SQL oracle replays bit-identically (the same
  * trade q64's tf-idf scorer makes — `ln` is the one primitive whose
  * cross-engine bit-equality we don't rely on). Per-term scores are summed
  * in explicit term-rank order (s1 + s2 + s3), not by an unordered SUM, so
  * float association cannot differ between engines.
  *
  * Scale shape: doc lengths and term frequencies are map-side-combined
  * aggregations; the probe-term set (tiny) broadcasts into the tf join; the
  * only per-corpus shuffle is the groupBy(doc) — no cross-doc state.
  */
object Relevance {

  /** BM25 scores for `docs` (idCol, textCol) against a probe-term frame
    * `terms` with columns (term, term_rank ∈ 1..nTerms). Returns one row per
    * matching doc: (id, score) — docs sharing no probe term are dropped
    * (score would be 0). k1/b are the standard defaults. The single-query
    * special case of [[bm25PerQuery]]. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: DataFrame, nTerms: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25PerQuery(docs, idCol, textCol,
      terms.withColumn("query_id", lit(0L)), nTerms, k1, b)
      .drop("query_id")

  /** BM25 over a SET of probe queries — the eval-mining shape: `probes` has
    * (query_id, term, term_rank ∈ 1..nTerms), and every query is scored in
    * ONE pass over the corpus. The token explosion, per-doc lengths, and
    * avgdl are computed once and shared; the (tiny) probe table broadcasts
    * into the tf join keyed by (query_id, term), so adding probe sets adds
    * broadcast rows, never corpus scans. df is counted per (query_id, term)
    * over the restricted tf — matching docs per term, identical across
    * queries sharing a term, BEFORE any top-k cut (the df-after-limit trap
    * RelevanceStatsSpec pins against). Returns (query_id, doc, score). */
  def bm25PerQuery(docs: DataFrame, idCol: String, textCol: String,
                   probes: DataFrame, nTerms: Int,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(nTerms >= 1, "need at least one probe term")
    val words = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("term"))
    // per-doc length + corpus size; avgdl = sum(dl)/N is the one shared scalar
    val dl = words.groupBy("doc").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    // tf restricted to probe terms (broadcast), df over the restricted tf
    val tf = words.join(broadcast(probes), Seq("term"))
      .groupBy("query_id", "doc", "term", "term_rank").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("query_id", "term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), Seq("query_id", "term"))
      .join(dl, Seq("doc"))
      .crossJoin(broadcast(corpus))
      .select(col("query_id"), col("doc"), col("term_rank"),
        // fixed op order, mirrored verbatim in the oracle SQL:
        // idf_raw * ((tf * (k1+1)) / (tf + (k1 * ((1-b) + (b * (dl/avgdl))))))
        (((col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + (lit(k1) * (lit(1.0 - b) +
              (lit(b) * (col("dl").cast("double") / col("avgdl")))))))).as("s"))
    // ordered sum: s1 + s2 + ... + s_n left-to-right (missing terms add 0.0)
    val perRank = (1 to nTerms).map(r =>
      coalesce(max(when(col("term_rank") === r, col("s"))), lit(0.0)))
    val total = perRank.reduceLeft(_ + _)
    scored.groupBy("query_id", "doc").agg(round(total, 6).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009): fuse N ranked
    * lists — each (qid, id, rank ∈ 1..) — into one score per (qid, id):
    * rrf = Σ_lists 1/(k0 + rank), a list missing the doc contributing 0.
    * The standard way to combine a dense (embedding ANN) and a sparse
    * (BM25) retriever without score calibration: only RANKS enter, so the
    * two systems' incomparable score scales never meet. Summation is in
    * list order (fixed float association, oracle-replayable); joins are on
    * per-query result sets — negligible next to the retrievers. k0 = 60 is
    * the paper's constant: small enough to reward top ranks, large enough
    * that one system's #1 cannot be drowned by the other's absence. */
  def rrfFuse(lists: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.zipWithIndex.map { case (d, i) =>
      d.select(col("qid"), col("id"), col("rank").cast("long").as(s"__r$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("qid", "id"), "full_outer"))
    val score = lists.indices
      .map(i => coalesce(lit(1.0) / (lit(k0.toDouble) + col(s"__r$i")), lit(0.0)))
      .reduceLeft(_ + _)
    joined.select(col("qid"), col("id"), round(score, 6).as("rrf"))
  }
}
