package graft.model

import graft.ops.{Dedup, Ids, Normalize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension builders — the reference's Transform.py dim stage
  * (scr/Transform.py:69-375) as composable DataFrame pipelines over the
  * ops library. Inputs are raw-tier DataFrames in the FIXTURES.md
  * shapes; outputs are the processed star-schema dims.
  *
  * The SURVEY §7.4 correctness traps are preserved deliberately:
  *  - dim_player keep-FIRST dedup with season-source priority (trap 1)
  *  - dim_match re-assigns game_id AFTER date filtering (trap 2)
  *  - null-tolerant casts everywhere (trap 4)
  *  - dim_season ships as a static seed — the reference never builds it
  *    (trap 9)
  *
  * Dims are small (≤ thousands of rows): the sequential-id windows are
  * single-partition by design, exactly like the reference's
  * np.arange — see Ids.scaladoc for the 100 TB alternatives.
  */
object Dims {

  /** dim_player (Transform.py:69-130): season-stats players ∪
    * match-stats players (born only in season source), keep-first with
    * season priority, alphabetical sequential ids. */
  def player(seasonStats: DataFrame, matchStats: DataFrame): DataFrame = {
    val season = seasonStats
      .select(col("player"), col("pos"), col("nation"),
        Normalize.tryInt(col("born")).as("born"))
    val matches = matchStats.select(col("player"), col("pos"), col("nation"))
    val deduped = Dedup
      .unionKeepFirst(season, matches, Seq("player"), Seq(col("player")))
      .na.drop(Seq("player"))
      .filter(col("player") =!= "player") // embedded duplicate header row (P4)
    Ids.sequential(deduped, Seq(col("player")), "player_id")
      .select(col("player_id"), col("player"), col("pos"), col("nation"), col("born"))
  }

  /** dim_team (Transform.py:245-264): strip wiki 'Q' ids, clean club
    * suffixes, null-tolerant year cast. */
  def team(rawTeam: DataFrame): DataFrame =
    rawTeam.select(
      Normalize.stripQ(col("team_id")).as("team_id"),
      Normalize.cleanClubName(col("team_name")).as("team_name"),
      Normalize.tryInt(col("founded_year")).as("founded_year"),
      Normalize.stripQ(col("stadium_id")).as("stadium_id"),
      col("short_name"))
      .na.drop(Seq("team_id"))

  /** dim_stadium (Transform.py:267-340): full-row completeness filter
    * (P5), repeated-header blacklist (P6), coerced capacity. Keeps the
    * reference's `statium_name` [sic] output column. */
  def stadium(rawStadium: DataFrame): DataFrame =
    rawStadium
      .na.drop("any")
      .filter(lower(col("capacity")) =!= "capacity")
      .select(
        Normalize.stripQ(col("stadium_id")).as("stadium_id"),
        col("stadium_name").as("statium_name"),
        Normalize.tryInt(col("capacity")).as("capacity"))
      .na.drop(Seq("stadium_id"))

  /** dim_match (Transform.py:343-375): dedup games keep-first, parse
    * the date part, THEN drop undated rows and re-assign game_id — the
    * reference's two-phase id assignment (ids shift after the filter;
    * SURVEY §7.4 trap 2). */
  def matchDim(teamMatch: DataFrame): DataFrame = {
    val games = Dedup.keepFirst(
      teamMatch.select(col("game"), col("date"), col("round"), col("day")),
      Seq("game"), Seq(col("date").asc_nulls_last, col("game")))
    // phase 1: provisional ids over all games (reproduces :351).
    // round stays RAW here ("Matchweek 23") — the reference zero-fills
    // only in the fact builder (:482); their committed dim_match.csv
    // carries the raw label.
    val phase1 = Ids.sequential(games, Seq(col("game")), "game_id")
      .withColumn("date", Normalize.datePart(col("date")))
    // phase 2: date filter then RE-assign (reproduces :364-372)
    Ids.sequential(phase1.na.drop(Seq("date")).drop("game_id"),
        Seq(col("game")), "game_id")
      .select(col("game_id"), col("game"), col("date"), col("round"), col("day"))
  }

  /** dim_season: static seed — the reference has NO builder for it
    * (dags/football_etl_dag.py:68-69 probes and skips; the CSV is
    * hand-authored). Single authoritative encoding table. */
  def season(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (2021, "2020-2021", 2020, 2021),
      (2122, "2021-2022", 2021, 2022),
      (2223, "2022-2023", 2022, 2023),
      (2324, "2023-2024", 2023, 2024),
      (2425, "2024-2025", 2024, 2025),
      (2526, "2025-2026", 2025, 2026))
      .toDF("season_id", "season_name", "start_year", "end_year")
  }
}
