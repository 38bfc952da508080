package graft

import org.apache.spark.sql.types._

/** Pins the Tables-accessor contract against driver testdata regeneration.
  *
  * The driver has regenerated `/root/testdata` between rounds with CHANGED
  * physical types (events.ts went TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/NTZ,
  * which silently broke analysis of every events query until Tables.events
  * learned to normalize). This spec fails loudly and attributably the next
  * time the contract the queries rely on shifts. */
class TestdataCompatSpec extends SparkSpec {

  private lazy val tables = new Engine.Tables(spark, sf)

  test("events.ts normalizes to TimestampType whatever the parquet physical type") {
    val f = tables.events.schema("ts")
    assert(f.dataType == TimestampType,
      s"Tables.events must yield TimestampType ts, got ${f.dataType}")
  }

  test("events carries the columns the query tier depends on") {
    val cols = tables.events.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(cols("event_id") == LongType || cols("event_id") == IntegerType)
    assert(cols.contains("user_id") && cols.contains("event_type"))
    assert(cols("value") == DoubleType)
    assert(cols.contains("props")) // q20 JSON extraction
  }

  test("documents and embeddings carry the LLM-pipeline columns") {
    val d = tables.documents.schema.fieldNames.toSet
    assert(Set("doc_id", "text", "lang", "source").subsetOf(d),
      s"documents schema drifted: $d")
    // q86 and the packing tier read doc_id scalars after a cast("long") in
    // the plan; the cast is only sound from an integral physical type
    val idType = tables.documents.schema("doc_id").dataType
    assert(idType == LongType || idType == IntegerType,
      s"doc_id drifted to non-integral $idType")
    val e = tables.embeddings.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(e.keySet.contains("vec_id"))
    // the semantic-cluster tier (q93-q95, q99) casts vec_id to long and
    // feeds it to connectedComponents, which REQUIRES an integral type —
    // a drift to string/decimal would null-out or reject the cast
    assert(e("vec_id") == LongType || e("vec_id") == IntegerType,
      s"vec_id drifted to non-integral ${e("vec_id")}")
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding column drifted: ${e("embedding")}")
    // q96/q100 contract suites pin lineitem/documents columns by name
    val li = tables.lineitem.schema.fieldNames.toSet
    assert(Set("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
      "l_shipdate").subsetOf(li), s"lineitem schema drifted: $li")
    assert(tables.documents.schema.fieldNames.contains("n_chars"),
      "documents.n_chars (q100 bounds check) missing")
  }

  test("documents.text is NFKC==NFC clean and embeddings ids align with documents (q105/q108 premises)") {
    import org.apache.spark.sql.functions._
    import graft.plans.TextExpressions.normalize_text
    // q105's oracle replays the canonical key as md5(lower(nfc_normalize))
    // because DuckDB has no NFKC — sound ONLY while the corpus carries no
    // compatibility characters (ligatures, full-width forms, ℕ-style
    // symbols). If a testdata regeneration introduces one, flag it HERE
    // before q105 hash-mismatches mysteriously.
    val drifted = graft.Engine.tables(spark, sf).documents
      .filter(normalize_text(col("text"), "NFKC") =!= normalize_text(col("text"), "NFC"))
      .count()
    assert(drifted == 0,
      s"$drifted documents carry compatibility characters (NFKC != NFC): " +
        "q105's DuckDB replay assumption no longer holds")
    // q108 fuses BM25 over doc_id with ANN over vec_id as ONE id space
    val docs = graft.Engine.tables(spark, sf).documents
      .select(col("doc_id").cast("long").as("id"))
    val vecs = graft.Engine.tables(spark, sf).embeddings
      .select(col("vec_id").cast("long").as("id"))
    assert(docs.exceptAll(vecs).count() == 0 && vecs.exceptAll(docs).count() == 0,
      "doc_id and vec_id no longer enumerate the same id space (q108 premise)")
    // every LSH/ANN query hashes with dim-64 planes and the oracles'
    // list_dot_product errors on unequal lengths — a truncated embedding
    // must fail HERE, not as a silent partial-dot signature downstream
    val dims = graft.Engine.tables(spark, sf).embeddings
      .select(size(col("embedding")).as("d"))
      .agg(min(col("d")), max(col("d"))).head
    assert(dims.getInt(0) == 64 && dims.getInt(1) == 64,
      s"embedding dimension drifted: [${dims.getInt(0)}, ${dims.getInt(1)}] != 64")
  }

  test("TPC-H-ish date columns read as a timestamp family (oracle strings depend on it)") {
    Seq(tables.lineitem.schema("l_shipdate").dataType,
        tables.orders.schema("o_orderdate").dataType).foreach { t =>
      assert(t == TimestampType || t == TimestampNTZType, s"got $t")
    }
  }
}
