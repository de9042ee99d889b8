package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for t23's distributed BPE training: a full independent
  * reference implementation (plain Scala, no Spark) over sf0.001, and
  * the overlapping-run edge case that distinguishes greedy
  * left-to-right merging from naive pair replacement. */
class BpeTrainSpec extends SparkSpec {

  /** Reference BPE: Sennrich's algorithm over a word-frequency map. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var vocab = words.map { case (w, c) => w.toCharArray.map(_.toString).toVector -> c }.toSeq
    (1 to rounds).map { k =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((l, r), cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      vocab = vocab.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        for (x <- syms) {
          if (out.nonEmpty && out.last == l && x == r) { out.remove(out.length - 1); out += (l + r) }
          else out += x
        }
        out.toVector -> c
      }
      (k, l, r, l + r, cnt)
    }
  }

  test("merge table matches the plain-Scala reference on sf0.001") {
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val expected = refBpe(words, TextOps.BPE_ROUNDS)
    val got = Registry.queries("t23_bpe_train")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === expected)
    // the synthetic corpus must actually exercise a multi-char merge
    // (a round whose pair has a side longer than one char) — otherwise
    // this test can't tell BPE from bigram counting
    assert(expected.exists { case (_, l, r, _, _) => l.length > 1 || r.length > 1 })
  }

  test("overlapping runs merge greedily left-to-right, not pairwise-all") {
    // corpus of one repeated word "aaa" (odd run): greedy (a,a) merge
    // gives [aa, a] — the (aa, a) pair then exists for round 2, while
    // (a, a) is GONE. A naive implementation that merges overlapping
    // occurrences or re-scans after each merge diverges here.
    val dir = java.nio.file.Files.createTempDirectory("bpeRun").toString
    import spark.implicits._
    Seq((1L, "aaa aaa aaa ab")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val got = Registry.queries("t23_bpe_train")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      // round 1: (a,a) count 2·3=6 beats (a,b) 1 → merge to [aa, a]
      assert(got(0) === ((1, "a", "a")), got.toString)
      // round 2: pairs now (aa,a) ×3 and (a,b) ×1 → (aa, a) wins;
      // a pairwise-all merge would have left no (aa, a) pair at all
      assert(got(1) === ((2, "aa", "a")), got.toString)
    } finally Shingles.release()
  }
}
