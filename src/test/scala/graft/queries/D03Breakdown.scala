package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Dev-only stage timing for d03 (enable with -DgraftD03=1). */
class D03Breakdown extends SparkSpec {
  if (sys.props.contains("graftD03")) {
    test("d03 stage timings at sf0.1") {
      val d = "/root/testdata/sf0.1"
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        info(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val tokens = split(lower(trim(col("text"))), "\\s+")
      val toks = Tables.documents(spark, d)
        .select(col("doc_id"), tokens.as("w")).filter(size(col("w")) >= 3)
      val sh = toks.select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("shingle")).distinct()
      t("shingles.count")(sh.count())
      t("shingles.count again")(sh.count())
      val h32 = conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long")
      val hashed = sh.withColumn("h32", h32)
      t("hash32.count")(hashed.agg(max(col("h32"))).collect())
      // minhash signatures alone
      val P = 2305843009213693951L
      val rnd = new java.util.Random(2024)
      val as = Seq.fill(16)((rnd.nextInt(1 << 20) | 1).toLong)
      val bs = Seq.fill(16)(rnd.nextInt(1 << 30).toLong)
      val hs = sh.withColumn("hs",
        zip_with(typedlit(as), typedlit(bs), (a, b) => pmod(a * h32 + b, lit(P))))
      val aggs = (0 until 16).map(i => min(element_at(col("hs"), i + 1)).as(s"mh$i"))
      t("minhash.agg")(hs.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count())
      val full = Registry.queries("d03_minhash_lsh")
      t("full d03")(full(spark, d).count())
      t("full d03 again")(full(spark, d).count())
    }
  }
}
