package graft.queries

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** q52's INTERSECT/EXCEPT lowering: Spark plans both as (distinct)
  * join-shaped set operations. This property pins their semantics to
  * an independent groupBy-based formulation — INTERSECT = keys seen
  * on both sides, EXCEPT = keys seen only left — including duplicate
  * collapse and empty/disjoint edge shapes ScalaCheck likes to find. */
class SetOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def holds(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val keys = Gen.listOf(Gen.chooseNum(0, 30))

  test("intersect equals the groupBy both-sides formulation") {
    holds(Prop.forAll(keys, keys) { (a: List[Int], b: List[Int]) =>
      val da = a.toDF("k"); val db = b.toDF("k")
      val viaOp = da.intersect(db).as[Int].collect().sorted.toSeq
      // independent spelling: tag, union, group, demand both tags
      val viaGroup = da.select($"k", org.apache.spark.sql.functions.lit(0).as("s"))
        .unionAll(db.select($"k", org.apache.spark.sql.functions.lit(1).as("s")))
        .distinct().groupBy("k")
        .count().filter($"count" === 2)
        .select("k").as[Int].collect().sorted.toSeq
      viaOp == viaGroup
    })
  }

  test("except equals the groupBy left-only formulation") {
    holds(Prop.forAll(keys, keys) { (a: List[Int], b: List[Int]) =>
      val da = a.toDF("k"); val db = b.toDF("k")
      val viaOp = da.except(db).as[Int].collect().sorted.toSeq
      val bSet = b.toSet
      val viaSets = a.distinct.filterNot(bSet).sorted
      viaOp == viaSets
    })
  }

  test("q52 tags partition: both + only_balance = rich (no key lost or duplicated)") {
    val q52 = Registry.queries("q52_set_ops")(spark, sfDir).collect()
    val both = q52.filter(_.getString(1) == "both").map(_.getLong(0)).toSet
    val only = q52.filter(_.getString(1) == "only_balance").map(_.getLong(0)).toSet
    assert((both & only).isEmpty, "a key carries both tags")
    val rich = graft.Tables.customer(spark, sfDir)
      .filter($"c_acctbal" > 5000).select("c_custkey")
      .distinct().as[Long].collect().toSet
    assert((both ++ only) == rich, "tags do not partition the rich-customer set")
  }
}
