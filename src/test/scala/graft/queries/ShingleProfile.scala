package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing of the shingling family (d02/d03).
  * Run: sbt 'set Test/javaOptions += "-DgraftShingleProfile=1"' \
  *   'testOnly graft.queries.ShingleProfile'
  */
class ShingleProfile extends SparkSpec {
  if (sys.props.contains("graftShingleProfile")) {
    test("profile shingling stages at sf0.1") {
      val d = sys.props.getOrElse("graftProbeDir", "/root/testdata/sf0.1")
      val tokens = split(lower(trim(col("text"))), "\\s+")
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        info(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      for (round <- 1 to 2) {
        info(s"--- round $round")
        val toks = Tables.documents(spark, d)
          .select(col("doc_id"), tokens.as("w")).filter(size(col("w")) >= 3)
        time("tokenize+count")(toks.count())
        val shRaw = toks.select(col("doc_id"),
          explode(expr("transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("shingle"))
        val nRaw = time("explode shingles")(shRaw.count())
        val sh = shRaw.distinct()
        val nSh = time("distinct")(sh.count())
        val h1 = conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long")
        val h2 = conv(substring(md5(col("shingle")), 9, 8), 16, 10).cast("long")
        val hashed = sh.withColumn("hs",
          zip_with(typedlit(Similarity.minhashA), typedlit(Similarity.minhashB),
            (a, b) => pmod(a * h1 + b * h2, lit(Similarity.MINHASH_P))))
        time("md5+zipwith hashes")(hashed.select(max(element_at(col("hs"), 1))).collect())
        val minAggs = (0 until Similarity.MINHASH_K).map(i =>
          min(element_at(col("hs"), i + 1)).as(s"mh$i"))
        val minh = hashed.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
        time("minhash groupBy")(minh.count())
        val bands = minh.select(col("doc_id"), explode(array((0 until Similarity.MINHASH_K / 4).map(b =>
            struct(lit(b).as("band"),
              concat_ws(",", (0 until 4).map(r => col(s"mh${4 * b + r}")): _*).as("sig"))): _*)).as("bs"))
          .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
        val ba = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
        val bb = bands.select(col("doc_id").as("doc_b"), col("band"), col("sig"))
        val cand = ba.join(bb, Seq("band", "sig"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b")).distinct()
        time("band join cand")(cand.count())
        time("full d03")(Registry.queries("d03_minhash_lsh")(spark, d).count())
        time("full d02")(Registry.queries("d02_ngram_jaccard")(spark, d).count())
        info(s"raw=$nRaw distinct=$nSh")
      }
    }
  }
}
