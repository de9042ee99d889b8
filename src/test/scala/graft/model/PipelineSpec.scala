package graft.model

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end ETL: build the star schema from synthetic raw inputs,
  * load twice, prove idempotence and the two conflict modes. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def rawInputs(captain: String) = Pipeline.RawInputs(
    playerSeasonStats = Seq(("Bukayo Saka", "FW", "ENG", "2001"),
      ("Declan Rice", "MF", "ENG", "1999")).toDF("player", "pos", "nation", "born"),
    playerMatchStats = PlayerMatchFixture.raw(spark, Seq(
      PlayerMatchFixture.headerRow,
      PlayerMatchFixture.row("2526", "2026-01-24 Arsenal-Manchester Utd",
        "Arsenal", "Bukayo Saka", gls = "2", ast = "1"),
      PlayerMatchFixture.row("2526", "2026-01-24 Arsenal-Manchester Utd",
        "Manchester United", "Erling Haaland", pos = "FW", nation = "NOR", gls = "1"))),
    teamMatch = Seq(
      ("2526", "2026-01-24 Arsenal-Manchester Utd", "Arsenal", "Manchester Utd",
        "2026-01-24 15:00", "Matchweek 3", "Sat", "Home", "W", "3", "1", "2.1", "0.9", "61", captain, "4-3-3"))
      .toDF("season", "game", "team", "opponent", "date", "round", "day", "venue",
        "result", "GF", "GA", "xG", "xGA", "Poss", "Captain", "Formation"),
    teamPoint = Seq(("2020-2021", "Overall", "1.", "Arsenal", "38", "26", "8", "4", "86:41", "45", "86", "WWDLD"))
      .toDF("season_label", "Match_Category", "Rank", "Team", "MP", "W", "D", "L", "gf_ga", "GD", "Pts", "Recent_Form"),
    teamSeed = Seq(("Q1", "Arsenal F.C.", "1886", "Q10", "ARS"),
      ("Q2", "Manchester Utd F.C.", "1878", "Q11", "MUN"))
      .toDF("team_id", "team_name", "founded_year", "stadium_id", "short_name"),
    stadiumSeed = Seq(("Q10", "Emirates", "60704"), ("Q11", "Old Trafford", "74310"))
      .toDF("stadium_id", "stadium_name", "capacity"))

  test("full ETL: build + load produces all 8 tables; reload is idempotent") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val star = Pipeline.buildStar(spark, rawInputs("Bukayo Saka"))
    Pipeline.load(spark, wh, star)
    val counts1 = star.keys.map(t => t -> spark.read.parquet(s"$wh/$t").count()).toMap
    assert(counts1.size === 8)
    assert(counts1("dim_player") === 3L)
    assert(counts1("fact_team_match") === 1L)
    assert(counts1("fact_team_point") === 1L)
    assert(counts1("fact_player_match") === 2L)
    // re-load the SAME increment: every table unchanged
    Pipeline.load(spark, wh, Pipeline.buildStar(spark, rawInputs("Bukayo Saka")))
    val counts2 = star.keys.map(t => t -> spark.read.parquet(s"$wh/$t").count()).toMap
    assert(counts2 === counts1)
  }

  test("facts are written partitioned by season and prune on a season filter") {
    val wh = Files.createTempDirectory("graft-wh3").toString
    Pipeline.load(spark, wh, Pipeline.buildStar(spark, rawInputs("Bukayo Saka")))
    val dirs = new java.io.File(s"$wh/fact_team_match").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("season=")), dirs.mkString(","))
    val read = spark.read.parquet(s"$wh/fact_team_match").filter($"season" === 2526)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(season"), plan.take(800))
    assert(read.count() === 1)
  }

  test("dims update-wins, facts ignore-new across loads") {
    val wh = Files.createTempDirectory("graft-wh2").toString
    Pipeline.load(spark, wh, Pipeline.buildStar(spark, rawInputs("Bukayo Saka")))
    // second load: same keys, changed captain (fact attr) and team seed
    val changed = rawInputs("Declan Rice").copy(
      teamSeed = Seq(("Q1", "Arsenal F.C.", "1886", "Q10", "AFC"), // short_name changed
        ("Q2", "Manchester Utd F.C.", "1878", "Q11", "MUN"))
        .toDF("team_id", "team_name", "founded_year", "stadium_id", "short_name"))
    Pipeline.load(spark, wh, Pipeline.buildStar(spark, changed))
    // dim update-wins: new short_name visible
    val ars = spark.read.parquet(s"$wh/dim_team")
      .filter($"team_id" === 1).collect()(0)
    assert(ars.getAs[String]("short_name") === "AFC")
    // fact ignore-new: original captain (Saka, id 1) retained
    val fact = spark.read.parquet(s"$wh/fact_team_match").collect()(0)
    assert(fact.getAs[Int]("captain_id") === 1)
  }
}
