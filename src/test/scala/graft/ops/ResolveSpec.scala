package graft.ops

import graft.SparkSpec

/** P2: flexible column resolution against drifting header shapes. */
class ResolveSpec extends SparkSpec {
  import spark.implicits._

  test("resolves flattened two-level name first") {
    val df = Seq((1, 2)).toDF("Performance_Gls", "Gls")
    assert(Resolve.column(df, "Performance", "Gls", "goals") === Some("Performance_Gls"))
  }

  test("falls back to bare leaf, then single name, case-insensitively") {
    val leaf = Seq(1).toDF("gls")
    assert(Resolve.column(leaf, "Performance", "Gls", "goals") === Some("gls"))
    val single = Seq(1).toDF("Goals")
    assert(Resolve.column(single, "Performance", "Gls", "goals") === Some("Goals"))
    assert(Resolve.column(single, "Performance", "Gls", "xx") === None)
  }

  test("batch resolution reports all missing columns together") {
    val df = Seq((1, 2)).toDF("Performance_Gls", "assists")
    val out = Resolve.columns(df, Seq(
      ("Performance", "Gls", "goals"),
      ("Performance", "Ast", "assists"),
      ("Expected", "xG", "xg")))
    assert(out === Left(Seq("Expected_xG")))
    val ok = Resolve.columns(df, Seq(
      ("Performance", "Gls", "goals"),
      ("Performance", "Ast", "assists")))
    assert(ok === Right(Seq("Performance_Gls", "assists")))
  }
}
