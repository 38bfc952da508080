package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for large-scale corpus processing.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * whole-stage-codegen'd, no UDFs, so the hot path stays inside Tungsten at
  * 100 TB. Tokenization mirrors the reference's whitespace StringTokenizer
  * (hadoop-mapreduce-examples WordCount.java:36-50); the rest is the
  * LLM-pipeline extension surface (dedup/quality/lang-id/fingerprinting).
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped (StringTokenizer semantics). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= lit(""))

  /** Word-level n-gram shingles over an ALREADY-MATERIALIZED token-array
    * column. `toks` MUST be a plain attribute (project `tokens(text)` into a
    * named column first): a computed expression passed here is re-evaluated
    * per shingle index inside the `transform` lambda — the whole text gets
    * re-tokenized O(len) times per document (measured 295 s → seconds on the
    * sf0.1 minhash bench when hoisted). */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Convenience one-expression form for small frames / tests. Do NOT use in
    * per-document hot paths — see `shinglesOfTokens` for why. */
  def wordShingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** BPE-style pre-tokenization (the GPT-2 pre-tokenizer shape): contractions,
    * space-prefixed letter runs, digit runs, punctuation runs. The actual BPE
    * merge table is model-specific; this is the regex split stage every BPE
    * pipeline runs first, which is what token-count estimation needs. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Deterministic 32-bit-ranged token hash (xxhash64 masked), for sketches.
    * The fast default — one codegen'd hash, no md5. */
  def tokenHash32(tok: Column): Column =
    xxhash64(tok).bitwiseAND(lit(0xffffffffL))

  /** 32-bit token hash an ANSI-SQL engine can reproduce exactly:
    * first 8 md5 hex chars as an integer. Spark `conv(substring(md5(x),1,8),16,10)`
    * ≡ DuckDB `CAST(('0x' || substring(md5(x),1,8)) AS BIGINT)` — the same
    * trick `Sampling.md5HashBucket` uses. Use when the sketch must be
    * oracle-checkable; ~2-3x the cost of `tokenHash32`. */
  def md5Hash32(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Second independent 32-bit word from the same md5 digest (hex chars 9-16). */
  def md5Hash32b(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 9, 8), 16, 10).cast("long")

  /** Order-sensitive rolling fingerprint of the token stream: a chained
    * hash acc' = xxhash64(acc, token) — overflow-free under ANSI mode, one
    * codegen'd pass, order-sensitive by construction. */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => xxhash64(acc, w))

  /** Rolling fingerprint in an oracle-reproducible form: the accumulator is
    * the first 15 md5 hex chars (60 bits — fits a signed BIGINT), chained
    * acc' = md5(acc || 0x01 || token), final state parsed as a long. DuckDB:
    * `list_reduce(list_prepend('0', toks), (a, w) -> substring(md5(a || chr(1) || w), 1, 15))`. */
  def fingerprintMd5(text: Column): Column =
    conv(aggregate(tokens(text), lit("0"),
      (acc, w) => substring(md5(concat(acc, lit("\u0001"), w).cast("binary")), 1, 15)),
      16, 10).cast("long")

  /** Case/compatibility-folded content digest: md5 of
    * lower(NFKC(text)) — the dedup key that survives the encoding AND
    * casing variants two crawls of one page actually exhibit (combining
    * marks vs composed, full-width vs ASCII, ligatures, case). NFKC is
    * the native `NormalizeText` expression (codegen'd, ASCII fast path
    * free); lower() folds case AFTER normalization so compatibility
    * foldings (ﬁ → fi) are themselves case-folded. Note lower() is an
    * APPROXIMATION of Unicode NFKC_Casefold, not an implementation of
    * it: one-to-many case foldings survive as distinct digests ('ß' vs
    * 'SS' → 'ß' vs 'ss'; 'İ' lowers to 'i'+U+0307, not 'i') — variants
    * differing only in simple (1:1) case and compatibility/combining
    * encoding are what this key collapses. Pass to
    * `Dedup.exactDedup` via `Seq(canonicalDigest(col("text")))` when the
    * corpus needs variant-insensitive exact dedup. */
  def canonicalDigest(text: Column): Column =
    md5(to_binary(
      lower(graft.plans.TextExpressions.normalize_text(text, "NFKC")),
      lit("utf-8")))

  /** Language-ID by stopword-profile overlap: argmax over profiles of
    * |distinct(tokens) ∩ profile|; ties resolved by profile order. */
  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    require(profiles.nonEmpty)
    val toks = array_distinct(tokens(text))
    val scores = profiles.map { case (l, ws) =>
      (lit(l), size(array_intersect(toks, typedLitStrings(ws))))
    }
    val (bl, _) = scores.tail.foldLeft((scores.head._1, scores.head._2)) {
      case ((bestL, bestS), (l, s)) =>
        (when(s > bestS, l).otherwise(bestL), when(s > bestS, s).otherwise(bestS))
    }
    bl
  }

  private def typedLitStrings(ws: Seq[String]): Column =
    array(ws.map(lit): _*)

  /** PII patterns for redaction/counting: email, E.164-ish / US phone,
    * IPv4. Deliberately conservative (favor precision): curation pipelines
    * re-run with domain-specific patterns; these are the always-on floor. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** A bare digit run is NOT a phone (epoch-millis timestamps and order ids
    * are 10-14 digits — rewriting them would silently corrupt the corpus):
    * a match needs an explicit phone marker — leading `+`, a parenthesized
    * area code, or separators between all groups — and must not be embedded
    * in a longer digit run (digit-boundary lookarounds). */
  val PhonePattern: String =
    "(?<!\\d)(?:" +
      "\\+\\d{1,3}[ .-]?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]?\\d{4}" + // +E.164-ish
      "|\\(\\d{3}\\)[ .-]?\\d{3}[ .-]?\\d{4}" +                   // (415) 555 1234
      "|\\d{3}[ .-]\\d{3}[ .-]\\d{4}" +                           // 415-555-1234
      ")(?!\\d)"
  val Ipv4Pattern: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Replace email/phone/IPv4 literals with typed placeholder tags — the
    * scrubbing pass a corpus runs before anything is retained. Pure
    * regexp_replace chain: codegen'd, no UDF. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val p = regexp_replace(e, PhonePattern, "<PHONE>")
    regexp_replace(p, Ipv4Pattern, "<IP>")
  }

  /** Per-document PII hit counts as a struct (n_email, n_phone, n_ip) — the
    * measurement/reporting side of `redactPii`. */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long").as("n_email"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long").as("n_phone"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long").as("n_ip"))

  /** Per-document quality metrics as a struct:
    * n_tokens, n_uniq, uniq_ratio, avg_token_len, stopword_ratio. */
  def qualityMetrics(text: Column, stopwords: Seq[String]): Column =
    qualityMetricsOfTokens(tokens(text), stopwords)

  /** [[qualityMetrics]] over an already-materialized token array — the
    * composed-pipeline form: a chain that projects `tokens(text)` once feeds
    * that attribute here, to its sketches, and to its chunker, so the whole
    * plan tokenizes a document exactly once. Pass a plain attribute where
    * the caller reuses `toks` elsewhere (a computed expression re-evaluates
    * inside each lambda below). */
  def qualityMetricsOfTokens(toks: Column, stopwords: Seq[String]): Column = {
    val n = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val nStop = size(filter(toks, w => array_contains(typedLitStrings(stopwords), w))).cast("long")
    // Token-less documents carry NULL ratios (no `otherwise`): the ratios
    // are undefined at n = 0, and the unguarded division would ABORT the
    // whole scan under ANSI mode (Spark 4's default and this engine's) on
    // the first empty/whitespace-only document in the corpus — a quality
    // gate comparing against a null ratio evaluates null → filtered out,
    // which is what every gate wants for an empty document anyway.
    def ratio(num: Column): Column = when(n > 0, round(num / n, 6))
    struct(
      n.as("n_tokens"),
      nUniq.as("n_uniq"),
      ratio(nUniq).as("uniq_ratio"),
      ratio(sumLen).as("avg_token_len"),
      ratio(nStop).as("stopword_ratio"))
  }
}
