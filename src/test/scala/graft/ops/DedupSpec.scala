package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** U3–U5: priority-ordered dedup must pick a DETERMINISTIC survivor —
  * the semantic trap called out in SURVEY.md §7.4 (1). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirst keeps exactly the highest-priority row per key") {
    val df = Seq(
      ("alice", 2, "match"),  // priority 2
      ("alice", 1, "season"), // priority 1 → survives
      ("bob",   1, "season"),
      ("carol", 2, "match")
    ).toDF("player", "src", "origin")
    val out = Dedup.keepFirst(df, Seq("player"), Seq(col("src"), col("origin")))
      .orderBy("player").collect().map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq === Seq(("alice", "season"), ("bob", "season"), ("carol", "match")))
  }

  test("keepFirst with desc priority expresses keep-last") {
    val df = Seq(("k", 1, "old"), ("k", 2, "new")).toDF("key", "v", "tag")
    val out = Dedup.keepFirst(df, Seq("key"), Seq(desc("v")))
    assert(out.collect().map(_.getString(2)).toSeq === Seq("new"))
  }

  test("unionKeepFirst: primary beats secondary; missing columns null-padded (U1)") {
    val season = Seq(("alice", 1990), ("bob", 1991)).toDF("player", "born")
    val matches = Seq(("alice", "MUN"), ("dave", "ARS")).toDF("player", "team")
    val out = Dedup.unionKeepFirst(season, matches, Seq("player"), Seq(col("player")))
      .orderBy("player").collect()
    assert(out.length === 3)
    val alice = out(0)
    assert(alice.getInt(alice.fieldIndex("born")) === 1990) // season row won
    assert(alice.isNullAt(alice.fieldIndex("team")))        // padded col
    val dave = out(2)
    assert(dave.isNullAt(dave.fieldIndex("born")))
    assert(dave.getString(dave.fieldIndex("team")) === "ARS")
  }

  test("keepFirst survivor is invariant under input partitioning (stability)") {
    val df = (1 to 200).map(i => (s"k${i % 20}", i % 7, i)).toDF("k", "prio", "id")
    val base = Dedup.keepFirst(df, Seq("k"), Seq(col("prio"), col("id"))).collect().toSet
    for (n <- Seq(1, 3, 13)) {
      val shuffled = Dedup.keepFirst(df.repartition(n), Seq("k"), Seq(col("prio"), col("id")))
      assert(shuffled.collect().toSet === base, s"repartition($n)")
    }
  }

  test("keepFirst is idempotent") {
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("k", "v")
    val once  = Dedup.keepFirst(df, Seq("k"), Seq(col("v")))
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("v")))
    assert(once.collect().toSet === twice.collect().toSet)
  }
}
