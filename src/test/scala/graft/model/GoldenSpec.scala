package graft.model

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden parity against the reference's OWN committed data: running
  * our builders on /root/reference/data_raw must reproduce its
  * data_processed outputs (the de-facto goldens — SURVEY §5).
  *
  * Comparisons are on NATURAL keys (game string, team name), not
  * surrogate ids: the reference numbers ids by raw-file encounter
  * order (a pandas artifact), while this engine declares a
  * deterministic sort — both are bijections over the same rows.
  * captain_id is excluded: the reference's dim_player also ingests
  * player_match stats, whose raw file is absent from the snapshot.
  *
  * Scope: dim_match and fact_team_match_clean — the two tables whose
  * full raw lineage ships in the snapshot (team_point/stadium raws are
  * absent).
  */
class GoldenSpec extends SparkSpec {

  private val refRaw = "/root/reference/data_raw"
  private val refProcessed = "/root/reference/data_processed"
  private def available = new java.io.File(refRaw).isDirectory

  private lazy val rawTeamMatch: DataFrame =
    Sources.csvRaw(spark, s"$refRaw/fbref_fact_team_match.csv")

  test("dim_match built from raw team-match equals the committed golden (natural keys)") {
    assume(available)
    val ours = Dims.matchDim(rawTeamMatch.select("game", "date", "round", "day"))
      .select(col("game"), col("date").cast("string").as("date"), col("round"), col("day"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val golden = Sources.csvRaw(spark, s"$refProcessed/dim_match.csv")
      .select("game", "date", "round", "day")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(ours.size === golden.size, s"row counts: ours=${ours.size} golden=${golden.size}")
    val missing = golden -- ours
    val extra = ours -- golden
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(3)} extra=${extra.take(3)}")
  }

  test("fact_team_match built from raw equals the committed golden (natural keys, all stat columns)") {
    assume(available)
    val dimTeam = Dims.team(Sources.csvRaw(spark, s"$refRaw/dim_team.csv"))
    val dimMatch = Dims.matchDim(rawTeamMatch.select("game", "date", "round", "day"))
    val dimPlayer = Dims.player(
      Sources.csvRaw(spark, s"$refRaw/fbref_fact_player_season_stats.csv"),
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("player", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("nation", org.apache.spark.sql.types.StringType)))))
    val fact = Facts.teamMatch(rawTeamMatch, dimTeam, dimMatch, dimPlayer)

    // natural-key view of OUR fact: join ids back to names/games
    def naturalized(f: DataFrame, teams: DataFrame, games: DataFrame): Set[Seq[String]] = {
      val t = teams.select(col("team_id"), col("team_name"))
      val o = teams.select(col("team_id").as("opponent_id"), col("team_name").as("opp_name"))
      val g = games.select(col("game_id"), col("game"))
      f.join(t, Seq("team_id")).join(o, Seq("opponent_id"), "left").join(g, Seq("game_id"))
        .select(
          lower(col("game")).as("game"), lower(col("team_name")).as("team"),
          lower(coalesce(col("opp_name"), lit("?"))).as("opp"),
          col("season").cast("string"), col("round"), col("venue"), col("result"),
          col("GF").cast("double").cast("string"), col("GA").cast("double").cast("string"),
          col("xG").cast("double").cast("string"), col("xGA").cast("double").cast("string"),
          col("Poss").cast("double").cast("string"), col("Formation"))
        .collect().map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) "∅" else r.getString(i))).toSet
    }
    val ourRows = naturalized(fact, dimTeam, dimMatch)

    val goldenTeams = Sources.csvRaw(spark, s"$refProcessed/dim_team.csv")
      .select(col("team_id").cast("int").as("team_id"), col("team_name"))
    val goldenGames = Sources.csvRaw(spark, s"$refProcessed/dim_match.csv")
      .select(col("game_id").cast("int").as("game_id"), col("game"))
    val goldenFact = Sources.csvRaw(spark, s"$refProcessed/fact_team_match_clean.csv")
      .select(col("game_id").cast("int").as("game_id"),
        col("team_id").cast("int").as("team_id"),
        col("opponent_id").cast("int").as("opponent_id"),
        col("season").cast("int").as("season"), col("round"), col("venue"), col("result"),
        col("GF").cast("double").as("GF"), col("GA").cast("double").as("GA"),
        col("xG").cast("double").as("xG"), col("xGA").cast("double").as("xGA"),
        col("Poss").cast("double").as("Poss"), col("Formation"))
    val goldenRows = naturalized(goldenFact, goldenTeams, goldenGames)

    assert(ourRows.size === goldenRows.size,
      s"row counts: ours=${ourRows.size} golden=${goldenRows.size}")
    val missing = goldenRows -- ourRows
    val extra = ourRows -- goldenRows
    assert(missing.isEmpty && extra.isEmpty,
      s"${missing.size} missing, ${extra.size} extra; first missing=${missing.take(2)} first extra=${extra.take(2)}")
  }
}
