package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc gate: the README "Query suite" table and `SparkEntry.queries` must
  * name exactly the same queries — a new query without a README row, or a
  * stale README row naming a removed query, fails the build. */
class ReadmeSyncSpec extends AnyFunSuite {

  test("README query table names exactly the SparkEntry.queries surface") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val inReadme = "q\\d{2,}_[a-z0-9_]+".r.findAllIn(readme).toSet
    val declared = SparkEntry.queries.keySet
    val missing = declared -- inReadme
    val stale = inReadme -- declared
    assert(missing.isEmpty, s"queries missing from README: ${missing.toSeq.sorted}")
    assert(stale.isEmpty, s"README names unknown queries: ${stale.toSeq.sorted}")
    // every declared query must also carry an oracle (or the driver records
    // only a weak rows-check) — pin the invariant here where it's visible
    val unoracled = declared -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracleSql: ${unoracled.toSeq.sorted}")
  }
}
