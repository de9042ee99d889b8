package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-curation operators for the training-data pipeline surface:
  * eval-set decontamination, dataset-mixture construction with
  * oversampling, unigram-LM quality scoring, and aggressive
  * canonicalization dedup. These extend the reference's data-hygiene
  * semantics (scr/processing.py's dedup/normalize passes) to the ops a
  * 100 TB pretraining corpus needs before tokenization.
  *
  * Scale design notes are per-operator; the common theme is that every
  * join here is an equi-join on a hash or a dimension-sized key, every
  * aggregation is algebraic (map-side combinable), and no state grows
  * with corpus size.
  */
object Curation {

  def defs: Seq[QueryDef] = Seq(t17, t18, t19, d08)

  /** t08's split assignment, recomputed from doc_id alone: split is a
    * pure function of the id, so membership never needs a join back to
    * a split table. */
  private def bucketOf(id: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(100))

  private val bucketSql =
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"

  /** Train/test DECONTAMINATION — the leakage audit every pretraining
    * run performs: find training documents that share word-3-gram
    * shingles with the held-out test split, report per-doc overlap
    * counts, and flag docs over the standard thresholds (≥8 matching
    * n-grams or ≥50% of the doc's shingles — the GPT-3/PaLM-style
    * 13-gram rule scaled to this corpus's 3-gram shingle space).
    *
    * Plan at scale: reuses the ONE persisted hashed-shingle table
    * (Shingles.hashed — built once per corpus snapshot, shared with
    * d02/d03/d06); split membership derives arithmetically from doc_id
    * (no join against a split table); the test-shingle set is a
    * DISTINCT over 5% of corpus shingles feeding one h60 equi-join —
    * it scales with the corpus, so it is deliberately NOT broadcast
    * (the round-4 s02 lesson). Counts are algebraic. Nothing holds
    * per-doc state beyond two longs. */
  val t17 = QueryDef(
    "t17_decontaminate",
    (s, d) => {
      val sh = Shingles.hashed(s, d)
        .select(col("doc_id"), col("h60"), bucketOf(col("doc_id")).as("bucket"))
      val testSh = sh.filter(col("bucket") >= 95).select("h60").distinct()
      val trainSh = sh.filter(col("bucket") < 95).select("doc_id", "h60")
      val tot = trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val hit = trainSh.join(testSh, "h60")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      hit.join(tot, "doc_id")
        .withColumn("hit_ratio",
          round(col("n_hit").cast("double") / col("n_sh"), 4))
        .withColumn("contaminated",
          col("n_hit") >= 8 || col("n_hit").cast("double") / col("n_sh") >= 0.5)
        .select(col("doc_id"), col("n_hit"), col("n_sh"),
          col("hit_ratio"), col("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${Shingles.oracleCte},
      b AS (SELECT doc_id, h60, $bucketSql AS bucket FROM sh),
      testsh AS (SELECT DISTINCT h60 FROM b WHERE bucket >= 95),
      train AS (SELECT doc_id, h60 FROM b WHERE bucket < 95),
      tot AS (SELECT doc_id, count(*) AS n_sh FROM train GROUP BY doc_id),
      hit AS (SELECT t.doc_id, count(*) AS n_hit
              FROM train t JOIN testsh USING (h60) GROUP BY t.doc_id)
      SELECT h.doc_id, h.n_hit, tot.n_sh,
             round(CAST(h.n_hit AS DOUBLE) / tot.n_sh, 4) AS hit_ratio,
             (h.n_hit >= 8 OR CAST(h.n_hit AS DOUBLE) / tot.n_sh >= 0.5) AS contaminated
      FROM hit h JOIN tot USING (doc_id)
      ORDER BY doc_id"""))

  /** Dataset-MIXTURE construction — resample the corpus to target
    * per-domain weights (domain = lang here; en 40%, zh 25%, de 15%,
    * es/fr 10% each), the static-mixture primitive behind Pile-style
    * corpus recipes. Underweight domains OVERSAMPLE by whole epochs
    * plus a hash-ranked remainder slice; overweight domains
    * downsample by hash rank. All arithmetic is integer (quota =
    * w_pct·T div 100), all selection is seeded-hash rank — the output
    * is a pure function of (corpus, weights), re-derivable for any
    * reproducibility audit, one `epoch` column per copy.
    *
    * Plan at scale: the per-domain rank is the dangerous part — a
    * `row_number() OVER (PARTITION BY lang)` window funnels EVERY row
    * of a domain through one reducer's sort (5 languages at 100 TB =
    * 5 serialized 20 TB sorts), so the rank runs on
    * [[graft.ops.Ids.densePerKey]] instead: range-partition by
    * (lang, hash), per-key-run partial counts (driver sees P+K longs,
    * never rows), broadcast offsets, partition-local numbering — the
    * keyed two-phase scan shared with sequence packing. Per-domain
    * counts and the corpus total join back as broadcast one-row/
    * dim-sized relations; the epoch explode is in-row. No shuffle
    * carries more than (id, lang, hash). */
  val t18 = QueryDef(
    "t18_mixture_sample",
    (s, d) => {
      val wPct = when(col("lang") === "en", 40)
        .when(col("lang") === "zh", 25)
        .when(col("lang") === "de", 15)
        .when(col("lang") === "es", 10)
        .when(col("lang") === "fr", 10).otherwise(0)
      val rkh = conv(substring(
        md5(concat(lit("mix1:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), rkh.as("rkh"), wPct.as("w_pct"))
      val ranked = graft.ops.Ids.densePerKey(
        docs, Seq("lang"), Seq(col("rkh"), col("doc_id")), "rk")
      val cnt = docs.groupBy("lang").agg(count(lit(1)).as("n_d"))
      val tot = docs.agg(count(lit(1)).as("t"))
      ranked.join(broadcast(cnt), "lang")
        .crossJoin(broadcast(tot))
        .withColumn("quota", expr("(w_pct * t) div 100"))
        .withColumn("copies",
          expr("quota div n_d") +
            when(col("rk") <= expr("quota % n_d"), 1).otherwise(0))
        .filter(col("copies") >= 1)
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1L), col("copies"))).as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rkh,
               CASE lang WHEN 'en' THEN 40 WHEN 'zh' THEN 25 WHEN 'de' THEN 15
                         WHEN 'es' THEN 10 WHEN 'fr' THEN 10 ELSE 0 END AS w_pct
        FROM documents),
      r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rkh, doc_id) AS rk FROM d),
      cnt AS (SELECT lang, count(*) AS n_d FROM d GROUP BY lang),
      tot AS (SELECT count(*) AS t FROM documents),
      c AS (
        SELECT r.doc_id, r.lang,
               (r.w_pct * tot.t) // 100 // cnt.n_d
                 + CASE WHEN r.rk <= ((r.w_pct * tot.t) // 100) % cnt.n_d
                        THEN 1 ELSE 0 END AS copies
        FROM r JOIN cnt USING (lang) CROSS JOIN tot)
      SELECT doc_id, lang,
             unnest(generate_series(1, CAST(copies AS BIGINT))) AS epoch
      FROM c WHERE copies >= 1
      ORDER BY doc_id, epoch"""))

  /** Unigram-LM QUALITY SCORE — the perplexity-filter primitive
    * (KenLM-style scoring reduced to its unigram core, which is the
    * part that is pure relational algebra): per-token
    * logp = ln(count(w)/total_tokens) from the corpus's own vocabulary,
    * per-doc mean log-probability, and a keep/drop gate at a literal
    * threshold. Cross-engine float discipline: ln is the single
    * libm-backed step, rounded to 6 digits per token BEFORE the
    * per-doc sum (t16's rule), the sum runs in DECIMAL so Spark's
    * partial-aggregation tree and DuckDB's sequential fold agree
    * bit-for-bit, and the mean rounds to 4.
    *
    * Plan at scale: vocabulary counts go through the salted two-phase
    * aggregate (ops/Salt — heavy-hitter words like "the" would
    * otherwise serialize one reducer); the corpus total joins as a
    * broadcast scalar; the token→vocab annotate is a word-keyed
    * equi-join (the same shape t16's df join takes); per-doc state is
    * one decimal + one long. */
  val t19 = QueryDef(
    "t19_unigram_logprob",
    (s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
      val vocab = graft.ops.Salt.saltedCount(
        w, Seq(col("word")), col("doc_id"), 16, "n_w")
      val tot = vocab.agg(sum(col("n_w")).as("n_tok_total"))
      w.join(vocab, "word")
        .crossJoin(broadcast(tot))
        .withColumn("logp",
          round(log(col("n_w").cast("double") / col("n_tok_total")), 6))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(sum(col("logp").cast(DecimalType(18, 6))).cast("double") /
            count(lit(1)), 4).as("avg_logp"))
        .withColumn("keep", col("avg_logp") >= -3.55)
        .select(col("doc_id"), col("n_tok"), col("avg_logp"), col("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents),
      w AS (SELECT doc_id, word FROM toks WHERE word <> ''),
      vocab AS (SELECT word, count(*) AS n_w FROM w GROUP BY word),
      tot AS (SELECT count(*) AS n_tok_total FROM w),
      lp AS (
        SELECT w.doc_id,
               round(ln(CAST(vocab.n_w AS DOUBLE) / tot.n_tok_total), 6) AS logp
        FROM w JOIN vocab USING (word) CROSS JOIN tot)
      SELECT doc_id, count(*) AS n_tok,
             round(CAST(sum(CAST(logp AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_logp,
             (round(CAST(sum(CAST(logp AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) >= -3.55) AS keep
      FROM lp GROUP BY doc_id
      ORDER BY doc_id"""))

  // ASCII-punctuation class shared by both engines (Java regex ∩ RE2,
  // the t12 discipline): the four printable-ASCII punct ranges. Unicode
  // letters pass through untouched so non-Latin text is not destroyed.
  private val punctRe = "[!-/:-@\\[-`{-~]"

  /** CANONICAL-text dedup — the aggressive near-exact pass (C4/Gopher
    * style) one notch past d01's whitespace normalization: lowercase,
    * strip ASCII punctuation, collapse whitespace, then group on the
    * md5 of the canonical form. The testdata corpus has no
    * punctuation-variant duplicates, so (t12's precedent) each doc
    * gains a deterministically perturbed twin — padded, punctuated,
    * id-offset by 10^9 — and the operator provably collapses every
    * pair: the oracle equality *is* the proof the canonicalization
    * fires.
    *
    * Plan at scale: union + narrow codegen'd projections + one
    * hash-groupBy on the 128-bit fingerprint — identical linear shape
    * to d01, bucketable on fp. */
  val d08 = QueryDef(
    "d08_canonical_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val twins = docs.select(
        (col("doc_id") + 1000000000L).as("doc_id"),
        concat(lit("  "), col("text"), lit(" !!! -- ??? ")).as("text"))
      val canon = trim(regexp_replace(
        regexp_replace(lower(col("text")), punctRe, " "), "\\s+", " "))
      docs.unionAll(twins)
        .select(col("doc_id"), md5(canon).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("canonical_id"))
    },
    Some("""
      WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000 AS doc_id,
               '  ' || text || ' !!! -- ??? ' AS text
        FROM documents),
      canon AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[!-/:-@\[-`{-~]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM all_docs)
      SELECT fp, min(doc_id) AS canonical_id, count(*) AS n_copies
      FROM canon GROUP BY fp
      ORDER BY canonical_id"""))
}
