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

  test("t24 per-doc token accounting matches the reference segmentation on sf0.001") {
    val docWords = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val wordFreq = docWords.groupBy(_._2).map { case (w, g) => w -> g.length.toLong }
    // reference: replay the merges, keep the final segment count per word
    var vocab = wordFreq.keys.map(w => w -> w.toCharArray.map(_.toString).toVector).toMap
    for ((_, l, r, _, _) <- refBpe(wordFreq, TextOps.BPE_ROUNDS)) {
      vocab = vocab.map { case (w, syms) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        for (x <- syms) {
          if (out.nonEmpty && out.last == l && x == r) { out.remove(out.length - 1); out += (l + r) }
          else out += x
        }
        w -> out.toVector
      }
    }
    val expected = docWords.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.length.toLong, ws.map(t => vocab(t._2).length.toLong).sum))
    }
    val got = Registry.queries("t24_bpe_apply")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // merging must actually compress: fewer BPE tokens than characters
    assert(got.values.map(_._2).sum <
      docWords.map(_._2.length.toLong).sum)
  }

  test("t23 and t24 share ONE training; clearCache invalidates it (cold-cache honesty)") {
    val first = TextOps.bpeTrain(spark, sfDir)
    // second call — same session+dir, vocab still persisted — must be
    // the SAME instance (no retraining, the Graph shared-build rule)
    assert(TextOps.bpeTrain(spark, sfDir) eq first)
    // Bench's between-pass clearCache drops the persisted vocab; the
    // cache must then RE-TRAIN instead of serving driver-held merges a
    // cold-cache pass never paid for
    spark.catalog.clearCache()
    val retrained = TextOps.bpeTrain(spark, sfDir)
    assert(!(retrained eq first))
    assert(retrained._1 === first._1)
  }

  /** md5(doc_id) mod 100 — the t08 split bucket, replayed locally. */
  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 15), 16) % 100
  }

  /** Sequential rank-order merge replay over one word — the reference
    * tokenizer apply (equals lowest-rank-first: a rank-k merge only
    * creates pairs of later rank). */
  private def applyMerges(word: String,
      merges: Seq[(Int, String, String, String, Long)]): Vector[String] = {
    var syms = word.toCharArray.map(_.toString).toVector
    for ((_, l, r, _, _) <- merges) {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      for (x <- syms) {
        if (out.nonEmpty && out.last == l && x == r) { out.remove(out.length - 1); out += (l + r) }
        else out += x
      }
      syms = out.toVector
    }
    syms
  }

  test("t25 held-out apply matches train-split training + rank-order replay on sf0.001") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val trainWords = docs.filter(t => bucket(t._1) < 90)
      .groupBy(_._2).map { case (w, g) => w -> g.length.toLong }
    val merges = refBpe(trainWords, TextOps.BPE_ROUNDS)
    val valDocs = docs.filter(t => { val b = bucket(t._1); b >= 90 && b < 95 })
    val expected = valDocs.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.length.toLong, ws.map(t => applyMerges(t._2, merges).length.toLong).sum))
    }
    val got = Registry.queries("t25_bpe_apply_oov")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("t25's OOV path fires on a constructed split corpus and segments unseen words") {
    val dir = java.nio.file.Files.createTempDirectory("t25oov").toString
    val ids = (1L to 2000L)
    val trainIds = ids.filter(bucket(_) < 90).take(4)
    val valIds = ids.filter(i => { val b = bucket(i); b >= 90 && b < 95 }).take(2)
    assert(trainIds.size === 4 && valIds.size === 2)
    // training teaches (a,b)->ab then (ab,c)->abc (dominant pair each
    // round); the val docs carry 'abc' (in-vocab, compresses to ONE
    // token) AND 'zqzq' (all-OOV chars — no trained merge applies, so
    // it must stay 4 single-char tokens)
    val trainDocs = trainIds.map(_ -> "abc abc abc abc ab")
    val valDocs = Seq(valIds(0) -> "abc zqzq", valIds(1) -> "zqzq zqzq abc")
    import spark.implicits._
    (trainDocs ++ valDocs).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.queries("t25_bpe_apply_oov")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc val0: abc=1 token + zqzq=4 tokens; doc val1: 4+4+1
    assert(got === Map(valIds(0) -> ((2L, 5L)), valIds(1) -> ((3L, 9L))))
    // and the word really is OOV for the trainer
    assert(!trainDocs.exists(_._2.contains("zq")))
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

  test("mergeFold (regexp replace) ≡ mergeFoldHof (interpreted fold) " +
      "on adversarial symbol arrays") {
    import spark.implicits._
    // regex metacharacters, $/\ in the replacement, l==r overlap runs
    // (odd + even), back-to-back pair occurrences, multi-char symbols
    // that CONTAIN the pair text (must not merge mid-symbol),
    // singletons and empties
    val arrays: Seq[Seq[String]] = Seq(
      Seq("a", "b", "a", "b"),
      Seq("a", "a", "a"),
      Seq("a", "a", "a", "a"),
      Seq("x", "a", "b", "a", "b", "y"),
      Seq("xa", "ab"), // string form contains "a ab" inside "xa ab"
      Seq("$", "\\", "$\\"),
      Seq(".", "*", ".*", "("),
      Seq("a", "ab", "ab"),
      Seq("aa", "a", "a", "aa"),
      Seq("a"),
      Seq.empty[String],
      Seq("é", "漢", "é漢", "é"))
    val pairs = Seq(
      ("a", "b"), ("a", "a"), ("aa", "a"), ("a", "ab"), ("ab", "a"),
      ("$", "\\"), (".", "*"), ("é", "漢"), ("xa", "ab"))
    val df = arrays.toDF("syms")
    for ((l, r) <- pairs) {
      val got = df.select(
        TextOps.mergeFold(col("syms"), l, r).as("fast"),
        TextOps.mergeFoldHof(col("syms"), l, r).as("ref"))
        .collect()
      got.zip(arrays).foreach { case (row, in) =>
        assert(row.getSeq[String](0) === row.getSeq[String](1),
          s"fold mismatch for input $in with pair ($l, $r): " +
            s"fast=${row.getSeq[String](0)} ref=${row.getSeq[String](1)}")
      }
    }
    // chained merges (the t25 replay shape): fold K merges sequentially
    // through both implementations and compare the final arrays
    val merges = Seq(("a", "a"), ("aa", "a"), ("a", "b"), ("aa", "ab"))
    val chained = df.select(
      merges.foldLeft(col("syms")) { case (c, (l, r)) =>
        TextOps.mergeFold(c, l, r) }.as("fast"),
      TextOps.mergeFoldAll(col("syms"), merges).as("all"),
      merges.foldLeft(col("syms")) { case (c, (l, r)) =>
        TextOps.mergeFoldHof(c, l, r) }.as("ref")).collect()
    chained.zip(arrays).foreach { case (row, in) =>
      assert(row.getSeq[String](0) === row.getSeq[String](2),
        s"chained fold mismatch for input $in")
      assert(row.getSeq[String](1) === row.getSeq[String](2),
        s"mergeFoldAll mismatch for input $in")
    }
  }
}
