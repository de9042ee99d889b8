package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextQuality]] — the native one-pass Gopher repetition/quality
  * signals — must be value-IDENTICAL to the composable array-HOF
  * formulation it replaced in t13 (same trigram identity, same IEEE
  * divisions), including the n < 3 and all-duplicate edge shapes.
  * Random corpora cover collision-heavy small vocabularies (trigram
  * repeats guaranteed) and wide ones (mostly distinct). */
class TextQualitySpec extends SparkSpec {

  private def hofFormulation(df: org.apache.spark.sql.DataFrame) = {
    val words = split(col("text"), " ")
    val n = size(words)
    val tg = when(n >= 3,
      transform(sequence(lit(1), n - 2), i => concat_ws(" ",
        element_at(words, i), element_at(words, i + 1),
        element_at(words, i + 2))))
      .otherwise(array())
    df.select(col("id"), words.as("w"), tg.as("tg"))
      .select(col("id"),
        when(size(col("tg")) > 0,
          lit(1.0) - size(array_distinct(col("tg"))).cast("double") /
            size(col("tg")).cast("double"))
          .otherwise(lit(0.0)).as("rep3_ratio"),
        (size(array_distinct(col("w"))).cast("double") /
          size(col("w")).cast("double")).as("distinct_word_ratio"))
  }

  test("native expression equals the HOF formulation on random corpora") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def doc(vocab: Int, len: Int): String =
      Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" ")
    val docs =
      // tiny vocab (heavy trigram repetition) + wide vocab (mostly
      // distinct) + degenerate lengths incl. below the trigram floor
      (0 until 150).map(i => (i.toLong, doc(vocab = 4, len = 3 + rnd.nextInt(80)))) ++
      (150 until 300).map(i => (i.toLong, doc(vocab = 5000, len = 3 + rnd.nextInt(80)))) ++
      Seq((300L, "a"), (301L, "a b"), (302L, "a a a a a a"),
        (303L, "x y z"), (304L, "x x x"))
    val df = spark.createDataFrame(docs).toDF("id", "text")
    val q = call_function("graft_text_quality", split(col("text"), " "))
    val native = df.select(col("id"), q.as("q"))
      .select(col("id"), col("q.rep3_ratio").as("rep3_ratio"),
        col("q.distinct_word_ratio").as("distinct_word_ratio"))
    val hof = hofFormulation(df)
    val n = native.orderBy("id").collect()
    val h = hof.orderBy("id").collect()
    assert(n.length === h.length)
    n.zip(h).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      // exact double equality: both paths run the identical IEEE
      // divisions over identical integer counts
      assert(a.getDouble(1) === b.getDouble(1), s"rep3 for id ${a.getLong(0)}")
      assert(a.getDouble(2) === b.getDouble(2), s"dwr for id ${a.getLong(0)}")
    }
  }

  test("degenerate values are exact") {
    GraftFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
      (0L, "a a a a a"),   // all trigrams identical: rep3 = 1 - 1/3, dwr = 1/5
      (1L, "a b c d e"),   // all distinct: rep3 = 0.0, dwr = 1.0
      (2L, "a b")          // below trigram floor: rep3 = 0.0 by definition
    )).toDF("id", "text")
    val q = call_function("graft_text_quality", split(col("text"), " "))
    val out = df.select(col("id"), q.as("q"))
      .select(col("id"), col("q.rep3_ratio"), col("q.distinct_word_ratio"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) === 1.0 - 1.0 / 3.0)
    assert(out(0).getDouble(2) === 1.0 / 5.0)
    assert(out(1).getDouble(1) === 0.0)
    assert(out(1).getDouble(2) === 1.0)
    assert(out(2).getDouble(1) === 0.0)
    assert(out(2).getDouble(2) === 1.0)
  }
}
