package graft.operators

import graft.SparkSpec
import graft.operators.FieldSelection._

class FieldSelectionSpec extends SparkSpec {

  test("spec grammar: singles, closed ranges, open ranges, key:value split") {
    assert(parseList("4,3,0") == Seq(Single(4), Single(3), Single(0)))
    assert(parseList("1-3,7-") == Seq(Closed(1, 3), Open(7)))
    val (k, v) = parse("4,3,0,1:6,5,1-3,7-")
    assert(k == Seq(Single(4), Single(3), Single(0), Single(1)))
    assert(v == Seq(Single(6), Single(5), Closed(1, 3), Open(7)))
    assert(parse("2,0")._2.isEmpty)
  }

  test("selection matches reference semantics on a concrete line") {
    import spark.implicits._
    val df = Seq("a-b-c-d-e-f").toDF("line")
    val out = FieldSelection(df, "line", "-", "2,0:1-3,5-").collect().head
    assert(out.getString(0) == "c-a")          // key: fields 2,0
    assert(out.getString(1) == "b-c-d-f")      // value: 1-3 then 5..end
  }

  test("out-of-range open range yields empty selection") {
    import spark.implicits._
    val df = Seq("x-y").toDF("line")
    val out = FieldSelection(df, "line", "-", "0:9-").collect().head
    assert(out.getString(0) == "x")
    assert(out.getString(1) == "")
  }

  test("out-of-range SINGLE is dropped, not thrown (ragged line under ANSI)") {
    import spark.implicits._
    // a line with fewer fields than the spec names must lose the missing
    // field like the reference's FieldSelectionHelper — under ANSI mode an
    // element_at-based single would ABORT the job on the first ragged line
    val df = Seq("x-y", "a-b-c-d").toDF("line")
    val out = FieldSelection(df, "line", "-", "0,3:1,9")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("x", "y"), ("a-d", "b")))
  }

  test("property: selected singles reproduce the split fields (seeded trials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val lines = (0 until 20).map { _ =>
      (0 until 6).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(5)).mkString)
    }
    val specs = (0 until 20).map(_ => rnd.nextInt(6))
    // one Spark job for all trials: select field i of each line
    lines.zip(specs).zipWithIndex.foreach { case ((fields, i), t) =>
      if (t < 5) { // Spark round-trips are slow; sample 5, check rest in-process via parser
        val out = FieldSelection(Seq(fields.mkString("|")).toDF("line"), "line", "|", s"$i:0-")
          .collect().head
        assert(out.getString(0) == fields(i), s"trial $t")
        assert(out.getString(1) == fields.mkString("|"), s"trial $t")
      }
      assert(parseList(s"$i") == Seq(Single(i)))
    }
  }
}
