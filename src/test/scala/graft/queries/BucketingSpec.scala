package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both fact tables on the
  * join key lets a sort-merge join run with ZERO shuffle — the layout
  * strategy for recurring fact⋈fact joins at 100 TB (pay the shuffle
  * once at write time, never again per query). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without any Exchange") {
    // default warehouse dir (static conf); managed tables dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val a = (1 to 5000).map(i => (i.toLong % 97, i.toDouble)).toDF("k", "va")
      val b = (1 to 5000).map(i => (i.toLong % 89, i * 2.0)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), plan.take(1500))
      // and an aggregation on the bucket key also avoids the shuffle
      val agg = spark.table("bkt_a").groupBy("k").agg(sum("va"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), aggPlan.take(1500))
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
