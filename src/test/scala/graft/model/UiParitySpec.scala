package graft.model

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** "A user of the reference could switch": the reference's own
  * dashboard queries (scr/ui.py), run as SQL text over its committed
  * warehouse tables, must produce exactly what our DataFrame pipelines
  * produce on the same inputs. SQL is adapted only in dialect
  * (Postgres `"W"` quoting → backticks, %s params → literals).
  * Row ORDER is canonicalized in the comparison; ordering semantics
  * themselves are oracle-checked by the registry queries (O1–O4). */
class UiParitySpec extends SparkSpec {

  private val ref = "/root/reference/data_processed"
  private def available = new java.io.File(ref).isDirectory

  private val season = "2024-2025"
  private val team = "Arsenal"

  private def view(name: String, casts: Map[String, String] = Map.empty,
                   file: String = ""): DataFrame = {
    val f = if (file.nonEmpty) file else name
    val raw = Sources.csvRaw(spark, s"$ref/$f.csv")
    val typed = casts.foldLeft(raw) { case (df, (c, t)) =>
      df.withColumn(c, col(c).cast(t)) }
    typed.createOrReplaceTempView(name)
    typed
  }

  private def load(): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ftp = view("fact_team_point", Map("season_id" -> "int", "team_id" -> "int",
      "Rank" -> "int", "MP" -> "int", "W" -> "int", "D" -> "int", "L" -> "int",
      "GF" -> "int", "GA" -> "int", "GD" -> "int", "Pts" -> "int"))
    val ftm = view("fact_team_match", Map("season" -> "int", "game_id" -> "int",
      "team_id" -> "int", "opponent_id" -> "int", "GF" -> "double", "GA" -> "double"),
      file = "fact_team_match_clean") // the warehouse name Load.py gives it
    val dt = view("dim_team", Map("team_id" -> "int"))
    val ds = view("dim_season", Map("season_id" -> "int"))
    (ftp, ftm, dt, ds)
  }

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) "∅"
      else r.get(i) match {
        // canonicalize doubles: SQL-text and DF plans may partial-sum
        // in different orders (same engine, different plan shapes)
        case d: java.lang.Double => f"$d%.6f"
        case v => v.toString
      })).sortBy(_.mkString("|"))

  test("get_teams (ui.py:133-141): distinct participating teams") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    val sql = spark.sql(s"""
      SELECT DISTINCT dt.team_name
      FROM fact_team_point ftp
      JOIN dim_team dt ON ftp.team_id = dt.team_id
      JOIN dim_season ds ON ftp.season_id = ds.season_id
      WHERE ds.season_name = '$season'
      ORDER BY dt.team_name""")
    val ours = ftp
      .join(broadcast(dt), "team_id")
      .join(broadcast(ds), "season_id")
      .filter(col("season_name") === season)
      .select("team_name").distinct().orderBy("team_name")
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 20) // a full EPL season
  }

  test("get_team_kpis (ui.py:145-155): overall KPIs for one team") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    val sql = spark.sql(s"""
      SELECT ftp.`W`, ftp.`D`, ftp.`L`, ftp.`GF`, ftp.`GA`, ftp.`Pts`, ftp.`Rank`
      FROM fact_team_point ftp
      JOIN dim_team dt ON ftp.team_id = dt.team_id
      JOIN dim_season ds ON ftp.season_id = ds.season_id
      WHERE ds.season_name = '$season' AND dt.team_name = '$team'
        AND LOWER(ftp.`Match_Category`) = 'overall'""")
    val ours = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season && col("team_name") === team &&
        lower(col("Match_Category")) === "overall")
      .select("W", "D", "L", "GF", "GA", "Pts", "Rank")
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 1)
  }

  test("home/away performance (ui.py:196-217): conditional-sum pivot") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    val sql = spark.sql(s"""
      SELECT * FROM (
        SELECT dt.team_name,
               SUM(CASE WHEN LOWER(ftp.`Match_Category`) = 'home' THEN ftp.`Pts` ELSE 0 END) as home_pts,
               SUM(CASE WHEN LOWER(ftp.`Match_Category`) = 'away' THEN ftp.`Pts` ELSE 0 END) as away_pts,
               SUM(CASE WHEN LOWER(ftp.`Match_Category`) = 'home' THEN ftp.`W` ELSE 0 END) as home_wins,
               SUM(CASE WHEN LOWER(ftp.`Match_Category`) = 'away' THEN ftp.`W` ELSE 0 END) as away_wins
        FROM fact_team_point ftp
        JOIN dim_team dt ON ftp.team_id = dt.team_id
        JOIN dim_season ds ON ftp.season_id = ds.season_id
        WHERE ds.season_name = '$season' AND LOWER(ftp.`Match_Category`) IN ('home', 'away')
        GROUP BY dt.team_name
      ) AS performance_summary
      ORDER BY (performance_summary.home_pts + performance_summary.away_pts) DESC""")
    def csum(cat: String, c: String) =
      sum(when(lower(col("Match_Category")) === cat, col(c)).otherwise(0))
    val ours = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season &&
        lower(col("Match_Category")).isin("home", "away"))
      .groupBy("team_name")
      .agg(csum("home", "Pts").as("home_pts"), csum("away", "Pts").as("away_pts"),
        csum("home", "W").as("home_wins"), csum("away", "W").as("away_wins"))
      .orderBy((col("home_pts") + col("away_pts")).desc)
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 20)
  }

  test("get_defensive_stats (ui.py:221-238): ROUND/CAST/NULLIF ratios") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    val sql = spark.sql(s"""
      SELECT dt.team_name,
             ftp.`GA` as goals_conceded,
             ftp.`MP` as matches_played,
             ROUND(CAST(ftp.`GA` AS DECIMAL) / NULLIF(ftp.`MP`, 0), 2) as avg_goals_conceded
      FROM fact_team_point ftp
      JOIN dim_team dt ON ftp.team_id = dt.team_id
      JOIN dim_season ds ON ftp.season_id = ds.season_id
      WHERE ds.season_name = '$season' AND LOWER(ftp.`Match_Category`) = 'overall'
      ORDER BY avg_goals_conceded ASC""")
    val ours = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season && lower(col("Match_Category")) === "overall")
      .select(col("team_name"), col("GA").as("goals_conceded"),
        col("MP").as("matches_played"),
        round(col("GA").cast("decimal(10,0)") /
          when(col("MP") === 0, lit(null)).otherwise(col("MP")), 2).as("avg_goals_conceded"))
      .orderBy(col("avg_goals_conceded").asc)
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 20)
  }

  test("get_seasons (ui.py:45-48): season list") {
    assume(available)
    val (_, _, _, ds) = load()
    val sql = spark.sql("SELECT season_name FROM dim_season ORDER BY season_name DESC")
    val ours = ds.select("season_name").orderBy(col("season_name").desc)
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 6)
  }

  test("get_league_table (ui.py:51-72): full standings projection") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    val sql = spark.sql(s"""
      SELECT ftp.`Rank`, dt.team_name AS team, ftp.`MP`, ftp.`W`, ftp.`D`,
             ftp.`L`, ftp.`GF`, ftp.`GA`, ftp.`GD`, ftp.`Pts`
      FROM fact_team_point ftp
      JOIN dim_team dt ON ftp.team_id = dt.team_id
      JOIN dim_season ds ON ftp.season_id = ds.season_id
      WHERE ds.season_name = '$season' AND ftp.`Match_Category` = 'overall'
      ORDER BY ftp.`Rank`""")
    val ours = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season && col("Match_Category") === "overall")
      .select(col("Rank"), col("team_name").as("team"), col("MP"), col("W"),
        col("D"), col("L"), col("GF"), col("GA"), col("GD"), col("Pts"))
      .orderBy("Rank")
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 20)
  }

  test("get_top_bottom_performers (ui.py:296-316): points-ordered stat sheet") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    val sql = spark.sql(s"""
      SELECT dt.team_name, ftp.`Pts`, ftp.`GF`, ftp.`GA`, ftp.`GD`,
             ftp.`W`, ftp.`D`, ftp.`L`
      FROM fact_team_point ftp
      JOIN dim_team dt ON ftp.team_id = dt.team_id
      JOIN dim_season ds ON ftp.season_id = ds.season_id
      WHERE ds.season_name = '$season' AND LOWER(ftp.`Match_Category`) = 'overall'
      ORDER BY ftp.`Pts` DESC""")
    val ours = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season && lower(col("Match_Category")) === "overall")
      .select(col("team_name"), col("Pts"), col("GF"), col("GA"), col("GD"),
        col("W"), col("D"), col("L"))
      .orderBy(col("Pts").desc)
    assert(rows(ours) === rows(sql))
  }

  test("get_xg_vs_goals_data (ui.py:176-191): grouped sums + pandas-derived column") {
    assume(available)
    val (_, ftm, dt, ds) = load()
    ftm.withColumn("xG", col("xG").cast("double")).createOrReplaceTempView("fact_team_match")
    val sql = spark.sql(s"""
      SELECT dt.team_name,
             SUM(ftm.`GF`) as total_goals,
             SUM(ftm.`xG`) as total_xg
      FROM fact_team_match ftm
      JOIN dim_team dt ON ftm.team_id = dt.team_id
      JOIN dim_season ds ON ftm.season = ds.season_id
      WHERE ds.season_name = '$season'
      GROUP BY dt.team_name""")
      .withColumn("performance", col("total_goals") - col("total_xg")) // ui.py:190 pandas step
    val ours = ftm.withColumn("xG", col("xG").cast("double"))
      .join(broadcast(dt), "team_id")
      .join(broadcast(ds), ftm("season") === ds("season_id"))
      .filter(col("season_name") === season)
      .groupBy("team_name")
      .agg(sum("GF").as("total_goals"), sum("xG").as("total_xg"))
      .withColumn("performance", col("total_goals") - col("total_xg"))
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 20)
  }

  test("get_team_recent_form (ui.py:273-292): last-5 matches via warehouse-named dims") {
    assume(available)
    val (_, ftm, dt, ds) = load()
    // Load.py renames dim_match columns at the warehouse boundary
    // (game_id→match_id, game→match_name, date→match_date; :137-146)
    Sources.csvRaw(spark, s"$ref/dim_match.csv")
      .select(col("game_id").cast("int").as("match_id"),
        col("game").as("match_name"), col("date").cast("date").as("match_date"))
      .createOrReplaceTempView("dim_match")
    val sql = spark.sql(s"""
      SELECT dm.match_date, o_dt.team_name as opponent_name, ftm.venue,
             ftm.result, ftm.`GF` as goals_for, ftm.`GA` as goals_against
      FROM fact_team_match ftm
      JOIN dim_team dt ON ftm.team_id = dt.team_id
      JOIN dim_team o_dt ON ftm.opponent_id = o_dt.team_id
      JOIN dim_season ds ON ftm.season = ds.season_id
      JOIN dim_match dm ON ftm.game_id = dm.match_id
      WHERE ds.season_name = '$season' AND dt.team_name = '$team'
      ORDER BY dm.match_date DESC
      LIMIT 5""")
    val dm = spark.table("dim_match")
    val odt = dt.select(col("team_id").as("opponent_id"), col("team_name").as("opponent_name"))
    val ours = ftm
      .join(broadcast(dt), "team_id")
      .join(broadcast(odt), "opponent_id")
      .join(broadcast(ds), ftm("season") === ds("season_id"))
      .join(broadcast(dm), ftm("game_id") === dm("match_id"))
      .filter(col("season_name") === season && col("team_name") === team)
      .select(col("match_date"), col("opponent_name"), col("venue"),
        col("result"), col("GF").as("goals_for"), col("GA").as("goals_against"))
      .orderBy(col("match_date").desc)
      .limit(5)
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 5)
  }

  test("get_season_comparison (ui.py:256-271): per-season totals over the fact table") {
    assume(available)
    val (_, ftm, _, ds) = load()
    val sql = spark.sql("""
      SELECT ds.season_name,
             COUNT(DISTINCT ftm.game_id) as total_matches,
             SUM(ftm.`GF`) as total_goals,
             ROUND(CAST(SUM(ftm.`GF`) AS DECIMAL) / NULLIF(COUNT(DISTINCT ftm.game_id), 0), 2) as avg_goals_per_match
      FROM fact_team_match ftm
      JOIN dim_season ds ON ftm.season = ds.season_id
      GROUP BY ds.season_name
      ORDER BY ds.season_name DESC""")
    val ours = ftm
      .join(broadcast(ds), ftm("season") === ds("season_id"))
      .groupBy("season_name")
      .agg(countDistinct("game_id").as("total_matches"),
        sum("GF").as("total_goals"))
      .select(col("season_name"), col("total_matches"), col("total_goals"),
        round(col("total_goals").cast("decimal(10,0)") /
          when(col("total_matches") === 0, lit(null)).otherwise(col("total_matches")), 2)
          .as("avg_goals_per_match"))
      .orderBy(col("season_name").desc)
    assert(rows(ours) === rows(sql))
    assert(sql.count() >= 5)
  }

  test("get_season_overview_stats (ui.py:118-129): season match/goal totals") {
    assume(available)
    val (_, ftm, _, ds) = load()
    val sql = spark.sql(s"""
      SELECT COALESCE(COUNT(DISTINCT ftm.game_id), 0) as total_matches,
             COALESCE(SUM(ftm.`GF`), 0) as total_goals
      FROM fact_team_match ftm
      JOIN dim_season ds ON ftm.season = ds.season_id
      WHERE ds.season_name = '$season'""")
    val ours = ftm
      .join(broadcast(ds), ftm("season") === ds("season_id"))
      .filter(col("season_name") === season)
      .agg(coalesce(countDistinct("game_id"), lit(0)).as("total_matches"),
        coalesce(sum("GF"), lit(0)).as("total_goals"))
    assert(rows(ours) === rows(sql))
    assert(sql.collect()(0).getLong(0) === 380L) // a full EPL season
  }

  test("get_offensive_stats (ui.py:238-253): scoring-rate ratios") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    val sql = spark.sql(s"""
      SELECT dt.team_name,
             ftp.`GF` as goals_scored,
             ftp.`MP` as matches_played,
             ROUND(CAST(ftp.`GF` AS DECIMAL) / NULLIF(ftp.`MP`, 0), 2) as avg_goals_scored
      FROM fact_team_point ftp
      JOIN dim_team dt ON ftp.team_id = dt.team_id
      JOIN dim_season ds ON ftp.season_id = ds.season_id
      WHERE ds.season_name = '$season' AND LOWER(ftp.`Match_Category`) = 'overall'
      ORDER BY avg_goals_scored DESC""")
    val ours = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season && lower(col("Match_Category")) === "overall")
      .select(col("team_name"), col("GF").as("goals_scored"),
        col("MP").as("matches_played"),
        round(col("GF").cast("decimal(10,0)") /
          when(col("MP") === 0, lit(null)).otherwise(col("MP")), 2).as("avg_goals_scored"))
      .orderBy(col("avg_goals_scored").desc)
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 20)
  }

  /** The snapshot ships NO fbref_fact_player_match_stats.csv raw and
    * no fact_player_match_clean.csv golden, so full data-level parity
    * for the three fact_player_match dashboard queries is impossible
    * against reference data. What CAN be proven, and is here:
    * [[Facts.playerMatch]] runs end-to-end against the reference's
    * committed dims (real dim_player/dim_team/dim_match rows), and the
    * ui.py SQL text is row-identical to our DataFrame formulation over
    * that fact. Warehouse naming follows Load.py:161-181
    * (dim_player.player → player_name). */
  private def loadPlayerFact(): org.apache.spark.sql.DataFrame = {
    val dimTeam = Sources.csvRaw(spark, s"$ref/dim_team.csv")
      .select(col("team_id").cast("int").as("team_id"), col("team_name"))
    val dimMatch = Sources.csvRaw(spark, s"$ref/dim_match.csv")
      .select(col("game_id").cast("int").as("game_id"), col("game"))
    val dimPlayer = Sources.csvRaw(spark, s"$ref/dim_player.csv")
      .select(col("player_id").cast("int").as("player_id"), col("player"))
    val game = "2026-01-24 Arsenal-Manchester Utd" // committed game_id 1
    import PlayerMatchFixture.{headerRow, row}
    val raw = PlayerMatchFixture.raw(spark, Seq(
      headerRow,
      row("2425", game, "Arsenal", "Aaron Connolly", gls = "2", ast = "0"),
      row("2425", game, "Arsenal", "Aaron Cresswell", gls = "1", ast = "2"),
      row("2425", game, "Manchester United", "Aaron Hickey", gls = "0", ast = "1"),
      row("2324", game, "Arsenal", "Aaron Connolly", gls = "5", ast = "3")))
    val fpm = Facts.playerMatch(raw, dimTeam, dimMatch, dimPlayer)
    fpm.createOrReplaceTempView("fact_player_match")
    dimPlayer.select(col("player_id"), col("player").as("player_name"))
      .createOrReplaceTempView("dim_player")
    fpm
  }

  /** ui.py:620-621 — the dashboard's pandas tail after
    * get_home_away_performance: derive
    * `home_advantage = home_pts - away_pts` (:620) and take
    * `nlargest(10, 'home_advantage')` (:621). pandas `nlargest` uses
    * keep='first': descending by value, TIES broken by position in
    * the frame (the SQL's total-points order). Replayed two ways on
    * the same deterministically-ordered base — a driver-side stable
    * sort (Scala `sortBy` is stable, exactly pandas keep='first')
    * and our distributed formulation (row_number position as the
    * tie-break) — which must agree row-for-row, order included. */
  test("home-advantage nlargest tail (ui.py:620-621)") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    def csum(cat: String, c: String) =
      sum(when(lower(col("Match_Category")) === cat, col(c)).otherwise(0))
    // the ui.py:196-217 base, with team_name appended to its ORDER BY
    // as a deterministic tie-break (the SQL leaves total-points ties
    // engine-ordered; pinning them makes the pandas replay exact)
    val base = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season &&
        lower(col("Match_Category")).isin("home", "away"))
      .groupBy("team_name")
      .agg(csum("home", "Pts").as("home_pts"), csum("away", "Pts").as("away_pts"))
      .orderBy((col("home_pts") + col("away_pts")).desc, col("team_name"))
    // pandas replay: frame order = base order; stable sort, head(10)
    val frame = base.collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = frame.map { case (t, h, a) => (t, h - a) }
      .sortBy { case (_, adv) => -adv }.take(10)
    // our formulation: position window over the SAME base order
    import org.apache.spark.sql.expressions.Window
    val pos = row_number().over(Window.orderBy(
      (col("home_pts") + col("away_pts")).desc, col("team_name")))
    val ours = base.withColumn("position", pos)
      .withColumn("home_advantage", col("home_pts") - col("away_pts"))
      .orderBy(col("home_advantage").desc, col("position"))
      .limit(10)
      .select(col("team_name"), col("home_advantage"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(ours === expected)
    assert(ours.size === 10)
  }

  /** ui.py:697-698 — the quadrant-chart pandas tail: after merging
    * offensive and defensive stats on team_name (:685-688),
    * `avg_attack = attack_defense['avg_goals_scored'].mean()` and
    * `avg_defense = attack_defense['avg_goals_conceded'].mean()`.
    * The pinned semantics: the means run over the PER-TEAM ROUNDED
    * ratios (each ROUND(GF/MP, 2) from get_offensive_stats /
    * get_defensive_stats), i.e. round-then-mean — NOT a mean of raw
    * ratios and NOT a league-total ratio. Replayed driver-side from
    * the two stat queries' collected rows vs our distributed
    * join + avg formulation. */
  test("quadrant means tail (ui.py:697-698)") {
    assume(available)
    val (ftp, _, dt, ds) = load()
    def statQuery(valueCol: String, alias: String) = ftp
      .join(broadcast(dt), "team_id").join(broadcast(ds), "season_id")
      .filter(col("season_name") === season && lower(col("Match_Category")) === "overall")
      .select(col("team_name"),
        round(col(valueCol).cast("decimal(10,0)") /
          when(col("MP") === 0, lit(null)).otherwise(col("MP")), 2).as(alias))
    val off = statQuery("GF", "avg_goals_scored")
    val deff = statQuery("GA", "avg_goals_conceded")
    // pandas replay: merge on team_name, column means over the frame
    val offRows = off.collect().map(r =>
      r.getString(0) -> r.getDecimal(1).doubleValue).toMap
    val defRows = deff.collect().map(r =>
      r.getString(0) -> r.getDecimal(1).doubleValue).toMap
    val merged = offRows.keySet.intersect(defRows.keySet)
    assert(merged.size === 20)
    val expAttack = merged.toSeq.map(offRows).sum / merged.size
    val expDefense = merged.toSeq.map(defRows).sum / merged.size
    // our formulation: inner join (pandas merge default) + avg
    val ours = off.join(deff, "team_name")
      .agg(avg(col("avg_goals_scored")).cast("double").as("avg_attack"),
        avg(col("avg_goals_conceded")).cast("double").as("avg_defense"))
      .collect()(0)
    assert(math.abs(ours.getDouble(0) - expAttack) < 1e-9)
    assert(math.abs(ours.getDouble(1) - expDefense) < 1e-9)
  }

  test("get_top_scorers (ui.py:76-93): goal sums + HAVING over our built fact") {
    assume(available)
    val (_, _, dt, ds) = load()
    val fpm = loadPlayerFact()
    val dp = spark.table("dim_player")
    val sql = spark.sql(s"""
      SELECT dp.player_name, dt.team_name, SUM(fpm.goals) as total_goals
      FROM fact_player_match fpm
      JOIN dim_player dp ON fpm.player_id = dp.player_id
      JOIN dim_team dt ON fpm.team_id = dt.team_id
      JOIN dim_season ds ON fpm.season = ds.season_id
      WHERE ds.season_name = '$season'
      GROUP BY dp.player_name, dt.team_name
      HAVING SUM(fpm.goals) > 0
      ORDER BY total_goals DESC
      LIMIT 10""")
    val ours = fpm
      .join(broadcast(dp), "player_id")
      .join(broadcast(dt), "team_id")
      .join(broadcast(ds), fpm("season") === ds("season_id"))
      .filter(col("season_name") === season)
      .groupBy("player_name", "team_name")
      .agg(sum("goals").as("total_goals"))
      .filter(col("total_goals") > 0)
      .orderBy(col("total_goals").desc)
      .limit(10)
    assert(rows(ours) === rows(sql))
    // other-season goals excluded by the filter; zero-goal players by HAVING
    assert(sql.collect().map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("Aaron Connolly", 2L), ("Aaron Cresswell", 1L)))
  }

  test("get_top_assisters (ui.py:97-114): assist sums + HAVING") {
    assume(available)
    val (_, _, dt, ds) = load()
    val fpm = loadPlayerFact()
    val dp = spark.table("dim_player")
    val sql = spark.sql(s"""
      SELECT dp.player_name, dt.team_name, SUM(fpm.assists) as total_assists
      FROM fact_player_match fpm
      JOIN dim_player dp ON fpm.player_id = dp.player_id
      JOIN dim_team dt ON fpm.team_id = dt.team_id
      JOIN dim_season ds ON fpm.season = ds.season_id
      WHERE ds.season_name = '$season'
      GROUP BY dp.player_name, dt.team_name
      HAVING SUM(fpm.assists) > 0
      ORDER BY total_assists DESC
      LIMIT 10""")
    val ours = fpm
      .join(broadcast(dp), "player_id")
      .join(broadcast(dt), "team_id")
      .join(broadcast(ds), fpm("season") === ds("season_id"))
      .filter(col("season_name") === season)
      .groupBy("player_name", "team_name")
      .agg(sum("assists").as("total_assists"))
      .filter(col("total_assists") > 0)
      .orderBy(col("total_assists").desc)
      .limit(10)
    assert(rows(ours) === rows(sql))
    assert(sql.collect().map(_.getString(0)).toSet ===
      Set("Aaron Cresswell", "Aaron Hickey"))
  }

  test("get_team_top_scorers (ui.py:159-174): one team's scorers") {
    assume(available)
    val (_, _, dt, ds) = load()
    val fpm = loadPlayerFact()
    val dp = spark.table("dim_player")
    val sql = spark.sql(s"""
      SELECT dp.player_name, SUM(fpm.goals) as total_goals
      FROM fact_player_match fpm
      JOIN dim_player dp ON fpm.player_id = dp.player_id
      JOIN dim_team dt ON fpm.team_id = dt.team_id
      JOIN dim_season ds ON fpm.season = ds.season_id
      WHERE ds.season_name = '$season' AND dt.team_name = '$team'
      GROUP BY dp.player_name
      HAVING SUM(fpm.goals) > 0
      ORDER BY total_goals DESC
      LIMIT 5""")
    val ours = fpm
      .join(broadcast(dp), "player_id")
      .join(broadcast(dt), "team_id")
      .join(broadcast(ds), fpm("season") === ds("season_id"))
      .filter(col("season_name") === season && col("team_name") === team)
      .groupBy("player_name")
      .agg(sum("goals").as("total_goals"))
      .filter(col("total_goals") > 0)
      .orderBy(col("total_goals").desc)
      .limit(5)
    assert(rows(ours) === rows(sql))
    assert(sql.count() === 2) // both Arsenal scorers, Hickey (MU) excluded
  }
}
