package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the corpus-curation family (t17/t18/t19/d08)
  * beyond the registry smoke + driver oracle: these pin the properties
  * the oracle hash can't express directly (quota math, split
  * consistency, twin collapse). */
class CurationSpec extends SparkSpec {

  test("t17: every reported doc is in the train split and ratios are consistent") {
    val out = Curation.t17.build(spark, sfDir).collect()
    assert(out.nonEmpty)
    val bucket = (id: Long) =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).take(15), 16) % 100
    for (r <- out) {
      assert(bucket(r.getAs[Long]("doc_id")) < 95, "contamination report must only cover train docs")
      val nHit = r.getAs[Long]("n_hit"); val nSh = r.getAs[Long]("n_sh")
      assert(nHit >= 1 && nHit <= nSh)
      assert(math.abs(r.getAs[Double]("hit_ratio") -
        math.round(nHit.toDouble / nSh * 10000) / 10000.0) < 1e-9)
    }
  }

  test("t17: a doc sharing every shingle with a test doc is flagged contaminated") {
    // all test-split shingles hit themselves by construction would be
    // excluded (test docs are not reported); instead assert the flag
    // rule: any row with ratio >= 0.5 or n_hit >= 8 is contaminated.
    val out = Curation.t17.build(spark, sfDir).collect()
    for (r <- out) {
      val expect = r.getAs[Long]("n_hit") >= 8 ||
        r.getAs[Long]("n_hit").toDouble / r.getAs[Long]("n_sh") >= 0.5
      assert(r.getAs[Boolean]("contaminated") === expect)
    }
  }

  test("t18: per-domain output size equals the integer quota (epochs + remainder)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val total = docs.count()
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Map("en" -> 40L, "zh" -> 25L, "de" -> 15L, "es" -> 10L, "fr" -> 10L)
    val out = Curation.t18.build(spark, sfDir)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, pct) <- w) {
      val quota = pct * total / 100
      assert(got.getOrElse(lang, 0L) === quota,
        s"$lang: rows ${got.get(lang)} != quota $quota")
      // oversampled domains repeat whole docs: every epoch <= ceil(quota/n_d)
      val maxEpoch = quota / perLang(lang) + (if (quota % perLang(lang) > 0) 1 else 0)
      val gotMax = out.filter(col("lang") === lang)
        .agg(max("epoch")).collect()(0).getLong(0)
      assert(gotMax === maxEpoch, s"$lang: max epoch $gotMax != $maxEpoch")
    }
  }

  test("t18: (doc_id, epoch) rows are unique and epochs are dense from 1") {
    val out = Curation.t18.build(spark, sfDir)
    assert(out.count() === out.select("doc_id", "epoch").distinct().count())
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("epoch").as("m"), min("epoch").as("lo"))
    assert(perDoc.filter(col("n") =!= col("m") || col("lo") =!= 1).count() === 0)
  }

  test("t19: scores are negative, finite, and the keep gate matches the threshold") {
    val out = Curation.t19.build(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val s = r.getAs[Double]("avg_logp")
      assert(s < 0 && !s.isNaN && !s.isInfinite)
      assert(r.getAs[Boolean]("keep") === (s >= -3.55))
      assert(r.getAs[Long]("n_tok") >= 1)
    }
  }

  test("t19: a corpus of one repeated token scores ln(1) = 0") {
    // unigram logp of the only token is ln(n/n) = 0 — pins the
    // numerator/denominator orientation (a flipped ratio would give 0
    // too only for the whole corpus; use two tokens to break symmetry)
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "b b a b")).toDF("doc_id", "text")
    val w = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    val vocab = w.groupBy("word").agg(count(lit(1)).as("n_w"))
    val tot = w.count().toDouble
    val expect1 = (3 * math.log(4 / tot) + math.log(4 / tot)) / 4 // doc1: 3×a + 1×b, both n_w=4
    val logp = w.join(vocab, "word")
      .withColumn("logp", round(log(col("n_w").cast("double") / lit(tot)), 6))
      .groupBy("doc_id").agg(avg("logp").as("s")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("s")).toMap
    assert(math.abs(logp(1L) - expect1) < 1e-4)
  }

  test("t20: recipe accounting is internally consistent per language") {
    val rows = Curation.t20.build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
    val totalTrain = rows.map(_.getAs[Long]("n_train")).sum
    // every train doc is accounted for in exactly one language row
    val bucket = pmod(conv(substring(
      md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"), lit(100))
    assert(totalTrain === docs.filter(bucket < 95).count())
    val totalSurv = rows.map(_.getAs[Long]("n_survivors")).sum
    for (r <- rows) {
      val (nTrain, nQual, nCont, nSurv) = (r.getAs[Long]("n_train"),
        r.getAs[Long]("n_quality_fail"), r.getAs[Long]("n_contaminated"),
        r.getAs[Long]("n_survivors"))
      // drops are non-disjoint: survivors bounded by both forms
      assert(nSurv <= nTrain - math.max(nQual, nCont))
      assert(nSurv >= nTrain - nQual - nCont)
      // selected docs come from survivors; emitted rows cover them
      assert(r.getAs[Long]("n_selected") <= nSurv)
      assert(r.getAs[Long]("n_rows") >= r.getAs[Long]("n_selected"))
      // quota arithmetic: n_rows = w_pct * totalSurvivors div 100
      val w = Map("en" -> 40L, "zh" -> 25L, "de" -> 15L, "es" -> 10L, "fr" -> 10L)
      assert(r.getAs[Long]("n_rows") === w(r.getAs[String]("lang")) * totalSurv / 100)
    }
  }

  test("d08: every original doc collapses with its perturbed twin (n_copies >= 2)") {
    val out = Curation.d08.build(spark, sfDir)
    assert(out.filter(col("n_copies") < 2).count() === 0,
      "canonicalization must collapse each doc with its punctuation/whitespace twin")
    // canonical_id is always the original (twin ids are offset by 1e9)
    assert(out.filter(col("canonical_id") >= 1000000000L).count() === 0)
    // group count equals d01's whitespace-normalized group count or fewer
    val d01Groups = TextOps.d01.build(spark, sfDir).count()
    assert(out.count() <= d01Groups)
  }

  test("d11: prefix-filtered join equals the brute-force self-join (lossless)") {
    // brute force: every pair sharing ANY shingle, exact Jaccard >= 1/2
    val sh = Shingles.hashed(spark, sfDir).select(col("doc_id"), col("h60"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.h60") === col("b.h60") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("nc"))
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(round(col("nc").cast("double") /
        (col("na") + col("nb") - col("nc")).cast("double"), 4) >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("nc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val filtered = TextOps.d11.build(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("n_common"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(filtered === brute,
      "prefix filtering must find exactly the exhaustive J >= 1/2 pair set")
    assert(filtered.nonEmpty, "corpus has planted near-dups; result can't be empty")
  }

  test("d11: the prefix index is strictly smaller than the full shingle table") {
    val sh = Shingles.hashed(spark, sfDir).select(col("doc_id"), col("h60"))
    val dfc = sh.groupBy("h60").agg(count(lit(1)).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val prefixRows = sh.join(dfc, "h60")
      .withColumn("n_tok", count(lit(1)).over(byDoc))
      .withColumn("rn", row_number().over(
        byDoc.orderBy(col("df"), col("h60"))))
      .filter(col("rn") <= expr("n_tok - ((n_tok + 1) div 2) + 1"))
      .count()
    val total = sh.count()
    assert(prefixRows < total,
      s"prefix index ($prefixRows) must index fewer postings than the full table ($total)")
    // t = 1/2 => at most ~n/2 + 1 postings per doc survive
    assert(prefixRows <= total / 2 + sh.select(col("doc_id")).distinct().count())
  }
}
