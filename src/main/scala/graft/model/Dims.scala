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
  * Ids are assigned with [[Ids.dense]] — contiguous 1..N in sort
  * order, output-identical to the reference's np.arange, but computed
  * as a two-phase partition-offset scan instead of a single-partition
  * window. The football dims are small enough that the window would
  * also work, but these builders are the template consumers reuse on
  * SF-scaling inputs (StarGate derives its dims from customer/orders),
  * so the builders themselves must not embed a serial bottleneck.
  * One bound remains by CHOICE: ids are cast to int for reference
  * schema parity (the processed CSVs carry int32 ids), capping a dim
  * at 2^31 rows — under ANSI mode an overflow fails fast, not
  * silently. A consumer with a >2B-row dimension drops the cast and
  * keeps Ids.dense's native longs (or moves to Ids.hashed).
  */
object Dims {

  /** dim_player (Transform.py:69-130): season-stats players ∪
    * match-stats players (born only in season source), keep-first with
    * season priority, alphabetical dense ids (int, 1..N — the exact
    * values the reference's np.arange assigns, without its serial
    * bottleneck). */
  def player(seasonStats: DataFrame, matchStats: DataFrame): DataFrame = {
    val season = seasonStats
      .select(col("player"), col("pos"), col("nation"),
        Normalize.tryInt(col("born")).as("born"))
    val matches = matchStats.select(col("player"), col("pos"), col("nation"))
    val deduped = Dedup
      .unionKeepFirst(season, matches, Seq("player"), Seq(col("player")))
      .na.drop(Seq("player"))
      .filter(col("player") =!= "player") // embedded duplicate header row (P4)
    Ids.dense(deduped, Seq(col("player")), "player_id")
      .select(col("player_id").cast("int").as("player_id"),
        col("player"), col("pos"), col("nation"), col("born"))
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
    // phase 1 (reproduces :351): parse the date part over ALL games.
    // The reference also assigns provisional np.arange ids here, but
    // drops them before phase 2 re-assigns — they are unobservable, so
    // no id pass runs over the unfiltered set. round stays RAW
    // ("Matchweek 23") — the reference zero-fills only in the fact
    // builder (:482); their committed dim_match.csv carries the raw
    // label.
    val phase1 = games.withColumn("date", Normalize.datePart(col("date")))
    // phase 2: date filter then assign — ids shift AFTER the filter
    // (trap 2), dense 1..N by game exactly like the re-run np.arange
    Ids.dense(phase1.na.drop(Seq("date")), Seq(col("game")), "game_id")
      .select(col("game_id").cast("int").as("game_id"),
        col("game"), col("date"), col("round"), col("day"))
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
