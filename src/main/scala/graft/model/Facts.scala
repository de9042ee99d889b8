package graft.model

import graft.ops.Normalize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fact builders — Transform.py's fact stage (scr/Transform.py:378-798)
  * as join pipelines against the dims.
  *
  * Join-key normalization (J9) runs on BOTH sides before every dim
  * join. Whether the dim side carries a HARD broadcast hint is the
  * CALLER's call (`hintDims`): the football pipeline's dims are
  * bounded (teams/players/games of a league), so it hints and the
  * fact side streams through map-side hash joins with zero fact
  * shuffle; a caller whose "dims" scale with the data (StarGate
  * derives them from customer/orders) passes `hintDims = false` and
  * lets Spark pick — auto-broadcast below the threshold, shuffle join
  * beyond it. A pinned broadcast on an unbounded relation is the one
  * 100 TB failure mode no runtime stat can undo.
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

  /** Caller-gated dim hint: `broadcast(df)` only when the caller
    * vouches the dim is bounded at scale (PlanQualitySpec allowlists
    * this one site on that contract). */
  private def bc(df: DataFrame, hintDims: Boolean): DataFrame =
    if (hintDims) broadcast(df) else df

  /** fact_team_match (Transform.py:378-508): captain→player, team and
    * opponent→role-playing dim_team joins, game→dim_match; two-stage
    * null filtering — rows missing join keys drop EARLY, rows missing
    * stats (unplayed fixtures) drop only at the final result filter. */
  def teamMatch(raw: DataFrame, dimTeam: DataFrame, dimMatch: DataFrame,
                dimPlayer: DataFrame, hintDims: Boolean = true): DataFrame = {
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
      .join(bc(teams, hintDims), Seq("team_key"), "left")
      .join(bc(opps, hintDims), Seq("opp_key"), "left")
      .join(bc(games, hintDims), Seq("game"), "left")
      .join(bc(players, hintDims), base("Captain") === players("captain_name"), "left")
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
  def teamPoint(raw: DataFrame, dimTeam: DataFrame,
                hintDims: Boolean = true): DataFrame = {
    val (gf, ga) = Normalize.splitPair(col("gf_ga"))
    val teams = dimTeam.select(col("team_id"),
      Normalize.normKey(col("team_name")).as("team_key"))
    raw
      .withColumn("team_key", normed("Team"))
      .join(bc(teams, hintDims), Seq("team_key"), "left")
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

  /** The 29 logical columns of fact_player_match as the reference's
    * `_get_column(level0, level1, single)` triples
    * (Transform.py:520-556) — resolution survives both the flattened
    * MultiIndex header ("Performance_Gls") and single-level drift. */
  private[model] val playerMatchColumns: Seq[(String, String, String)] = Seq(
    ("season", "Unnamed: 1_level_1", "season"),
    ("game", "Unnamed: 2_level_1", "game"),
    ("team", "Unnamed: 3_level_1", "team"),
    ("player", "Unnamed: 4_level_1", "player"),
    ("min", "Unnamed: 9_level_1", "min"),
    ("Performance", "Gls", "Performance_Gls"),
    ("Expected", "xG", "Expected_xG"),
    ("Expected", "xAG", "Expected_xAG"),
    ("Performance", "Ast", "Performance_Ast"),
    ("Performance", "PK", "Performance_PK"),
    ("Performance", "PKatt", "Performance_PKatt"),
    ("Performance", "Sh", "Performance_Sh"),
    ("Performance", "SoT", "Performance_SoT"),
    ("Performance", "CrdY", "Performance_CrdY"),
    ("Performance", "CrdR", "Performance_CrdR"),
    ("Performance", "Touches", "Performance_Touches"),
    ("Performance", "Tkl", "Performance_Tkl"),
    ("Performance", "Int", "Performance_Int"),
    ("Performance", "Blocks", "Performance_Blocks"),
    ("SCA", "SCA", "SCA_SCA"),
    ("SCA", "GCA", "SCA_GCA"),
    ("Passes", "Cmp", "Passes_Cmp"),
    ("Passes", "Att", "Passes_Att"),
    ("Passes", "Cmp%", "Passes_Cmp%"),
    ("Passes", "PrgP", "Passes_PrgP"),
    ("Carries", "Carries", "Carries_Carries"),
    ("Carries", "PrgC", "Carries_PrgC"),
    ("Take-Ons", "Att", "Take-Ons_Att"),
    ("Take-Ons", "Succ", "Take-Ons_Succ"))

  private val playerMatchNames = Seq(
    "season", "game", "team", "player", "min_played", "goals", "xG", "xA",
    "assists", "penalty_made", "penalty_attempted", "shots", "shots_on_target",
    "yellow_cards", "red_cards", "touches", "tackles", "interceptions",
    "blocks", "shot_creating_actions", "goal_creating_actions",
    "passes_completed", "passes_attempted", "pass_completion_percent",
    "progressive_passes", "carries", "progressive_carries",
    "take_ons_attempted", "take_ons_successful")

  /** fact_player_match (Transform.py:507-697): per-player match stats
    * resolved through [[graft.ops.Resolve]] (26 flexible stat lookups
    * + 4 key columns), embedded duplicate header row dropped
    * set-based (the reference drops row 0 iff season=='season'; real
    * seasons are numeric so the predicate form is equivalent and
    * partition-safe), then three normalized broadcast dim joins:
    * game→dim_match, team→dim_team (variant map + club-suffix clean +
    * Q-strip, null-dropped), player→dim_player (null-dropped with
    * game_id — the reference's two-stage filter order preserved).
    *
    * 100 TB shape: with `hintDims` (bounded dims) the fact side is
    * never shuffled — all three dims broadcast; stat typing is
    * codegen'd try_cast projections. */
  def playerMatch(raw: DataFrame, dimTeam: DataFrame, dimMatch: DataFrame,
                  dimPlayer: DataFrame, hintDims: Boolean = true): DataFrame = {
    val resolved = graft.ops.Resolve.columns(raw, playerMatchColumns) match {
      case Left(missing) =>
        sys.error(s"fact_player_match: unresolvable columns: ${missing.mkString(", ")}")
      case Right(cols) => cols
    }
    val picked = raw
      .select(resolved.zip(playerMatchNames).map { case (c, n) => col(c).as(n) }: _*)
      // embedded header rows (P4). Null-tolerant: pandas `!= "season"`
      // is True for NaN, so NULL-season rows must pass through, not be
      // dropped by three-valued logic.
      .filter(col("season").isNull || lower(col("season")) =!= "season")
    val base = picked
      .withColumn("team_key", normed("team"))
      .withColumn("game_key", Normalize.normKey(col("game")))
      .withColumn("player_key", Normalize.normKey(col("player")))
    val teams = dimTeam.select(col("team_id"),
      Normalize.normKey(col("team_name")).as("team_key"))
    val games = dimMatch.select(col("game_id"),
      Normalize.normKey(col("game")).as("game_key"))
    val players = dimPlayer.select(col("player_id"),
      Normalize.normKey(col("player")).as("player_key"))
    base
      .join(bc(games, hintDims), Seq("game_key"), "left")
      .join(bc(teams, hintDims), Seq("team_key"), "left")
      .na.drop(Seq("team_id")) // unmatched team names (reference warns + filters)
      .withColumn("team_id", Normalize.stripQ(col("team_id").cast("string")))
      .na.drop(Seq("team_id")) // second pass after Q-strip coercion
      .join(bc(players, hintDims), Seq("player_key"), "left")
      .na.drop(Seq("player_id", "game_id"))
      .select(
        (Normalize.tryInt(col("season")).as("season") ::
          col("game_id") :: col("team_id") :: col("player_id") ::
          Normalize.tryInt(col("min_played")).as("min_played") ::
          Normalize.tryInt(col("goals")).as("goals") ::
          Normalize.tryDouble(col("xG")).cast("decimal(5,2)").as("xG") ::
          Normalize.tryDouble(col("xA")).cast("decimal(5,2)").as("xA") ::
          Normalize.tryInt(col("assists")).as("assists") ::
          Normalize.tryInt(col("penalty_made")).as("penalty_made") ::
          Normalize.tryInt(col("penalty_attempted")).as("penalty_attempted") ::
          Normalize.tryInt(col("shots")).as("shots") ::
          Normalize.tryInt(col("shots_on_target")).as("shots_on_target") ::
          Normalize.tryInt(col("yellow_cards")).as("yellow_cards") ::
          Normalize.tryInt(col("red_cards")).as("red_cards") ::
          Normalize.tryInt(col("touches")).as("touches") ::
          Normalize.tryInt(col("tackles")).as("tackles") ::
          Normalize.tryInt(col("interceptions")).as("interceptions") ::
          Normalize.tryInt(col("blocks")).as("blocks") ::
          Normalize.tryInt(col("shot_creating_actions")).as("shot_creating_actions") ::
          Normalize.tryInt(col("goal_creating_actions")).as("goal_creating_actions") ::
          Normalize.tryInt(col("passes_completed")).as("passes_completed") ::
          Normalize.tryInt(col("passes_attempted")).as("passes_attempted") ::
          Normalize.tryDouble(col("pass_completion_percent"))
            .cast("decimal(5,2)").as("pass_completion_percent") ::
          Normalize.tryInt(col("progressive_passes")).as("progressive_passes") ::
          Normalize.tryInt(col("carries")).as("carries") ::
          Normalize.tryInt(col("progressive_carries")).as("progressive_carries") ::
          Normalize.tryInt(col("take_ons_attempted")).as("take_ons_attempted") ::
          Normalize.tryInt(col("take_ons_successful")).as("take_ons_successful") ::
          Nil): _*)
  }
}
