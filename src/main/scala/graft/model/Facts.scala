package graft.model

import graft.ops.Normalize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fact builders — Transform.py's fact stage (scr/Transform.py:378-798)
  * as broadcast-join pipelines against the dims.
  *
  * Join-key normalization (J9) runs on BOTH sides before every dim
  * join; dims are tiny so every join hints broadcast — at the 100 TB
  * north-star the fact side streams through map-side hash joins with
  * zero fact shuffle.
  *
  * SURVEY §7.4 traps preserved: unplayed fixtures survive until the
  * final result-null drop (trap 6); the round label is normalized to
  * the zero-filled string the reference writes (trap 7).
  */
object Facts {

  /** The reference's team-name variant map (Transform.py:407-423),
    * applied after lowercasing and BEFORE suffix cleaning — the exact
    * order its fact builder uses. */
  private[model] val teamNameVariants: Map[String, String] = Map(
    "brighton & hove albion" -> "brighton",
    "manchester united" -> "manchester utd",
    "newcastle united" -> "newcastle utd",
    "sheffield united" -> "sheffield utd",
    "tottenham hotspur" -> "tottenham",
    "west bromwich albion" -> "west brom",
    "west ham united" -> "west ham",
    "wolverhampton wanderers" -> "wolves",
    "nottingham forest" -> "nott'ham forest",
    "sunderland a." -> "sunderland",
    "sunderland a f c" -> "sunderland")

  private def normed(c: String): org.apache.spark.sql.Column =
    Normalize.normKey(Normalize.cleanClubName(
      Normalize.mapValues(Normalize.normKey(col(c)), teamNameVariants)))

  /** fact_team_match (Transform.py:378-508): captain→player, team and
    * opponent→role-playing dim_team joins, game→dim_match; two-stage
    * null filtering — rows missing join keys drop EARLY, rows missing
    * stats (unplayed fixtures) drop only at the final result filter. */
  def teamMatch(raw: DataFrame, dimTeam: DataFrame, dimMatch: DataFrame,
                dimPlayer: DataFrame): DataFrame = {
    val base = raw
      .na.drop(Seq("team", "opponent", "game")) // early: join keys only (P9)
      .withColumn("team_key", normed("team"))
      .withColumn("opp_key", normed("opponent"))
    val teams = dimTeam.select(col("team_id"),
      Normalize.normKey(col("team_name")).as("team_key"))
    val opps  = dimTeam.select(col("team_id").as("opponent_id"),
      Normalize.normKey(col("team_name")).as("opp_key"))
    val players = dimPlayer.select(col("player_id").as("captain_id"),
      col("player").as("captain_name"))
    val games = dimMatch.select(col("game_id"), col("game"))
    base
      .join(broadcast(teams), Seq("team_key"), "left")
      .join(broadcast(opps), Seq("opp_key"), "left")
      .join(broadcast(games), Seq("game"), "left")
      .join(broadcast(players), base("Captain") === players("captain_name"), "left")
      .select(
        Normalize.tryInt(col("season")).as("season"),
        col("game_id"), col("team_id"), col("opponent_id"),
        Normalize.roundLabel(col("round")).as("round"),
        col("venue"),
        col("result"),
        Normalize.tryInt(col("GF")).as("GF"),
        Normalize.tryInt(col("GA")).as("GA"),
        Normalize.tryDouble(col("xG")).cast("decimal(4,2)").as("xG"),
        Normalize.tryDouble(col("xGA")).cast("decimal(4,2)").as("xGA"),
        Normalize.tryInt(col("Poss")).as("Poss"),
        col("captain_id"),
        col("Formation"))
      .na.drop(Seq("result")) // late: unplayed fixtures drop HERE (trap 6)
  }

  /** fact_team_point (Transform.py:703-798): season-code conversion,
    * dotted-rank cleaning, "GF:GA" composite split, normalized join to
    * dim_team (J5 left join + null-drop ≈ inner). */
  def teamPoint(raw: DataFrame, dimTeam: DataFrame): DataFrame = {
    val (gf, ga) = Normalize.splitPair(col("gf_ga"))
    val teams = dimTeam.select(col("team_id"),
      Normalize.normKey(col("team_name")).as("team_key"))
    raw
      .withColumn("team_key", normed("Team"))
      .join(broadcast(teams), Seq("team_key"), "left")
      .na.drop(Seq("team_id"))
      .select(
        Normalize.convertSeason(col("season_label")).as("season_id"),
        lower(col("Match_Category")).as("Match_Category"),
        Normalize.rankClean(col("Rank")).as("Rank"),
        col("team_id"),
        Normalize.tryInt(col("MP")).as("MP"),
        Normalize.tryInt(col("W")).as("W"),
        Normalize.tryInt(col("D")).as("D"),
        Normalize.tryInt(col("L")).as("L"),
        gf.as("GF"), ga.as("GA"),
        Normalize.tryInt(col("GD")).as("GD"),
        Normalize.tryInt(col("Pts")).as("Pts"),
        col("Recent_Form"))
      .na.drop(Seq("Rank"))
  }
}
