package graft.model

import graft.ops.Upsert
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's end-to-end ETL composition
  * (Extract → Transform → Load, docker-compose.yml:38-41 /
  * dags/football_etl_dag.py:142-166) as ONE lazy Spark program.
  *
  * Where the reference runs three OS processes exchanging CSVs on a
  * shared volume, here each output table is a single logical plan
  * (scan → clean → join → write) optimized whole by Catalyst; the
  * dims-before-facts ordering survives as dataframe dependencies, not
  * process scheduling.
  *
  * Load semantics (scr/Load.py): dims upsert update-wins, facts
  * insert-only — both as set-based anti-join merges, both idempotent
  * (re-running a load is a no-op; see PipelineSpec).
  */
object Pipeline {

  final case class RawInputs(
      playerSeasonStats: DataFrame,
      playerMatchStats: DataFrame,
      teamMatch: DataFrame,
      teamPoint: DataFrame,
      teamSeed: DataFrame,
      stadiumSeed: DataFrame)

  /** Transform stage: raw tier → full star schema (5 dims + 2 facts). */
  def buildStar(spark: SparkSession, raw: RawInputs): Map[String, DataFrame] = {
    val dimPlayer  = Dims.player(raw.playerSeasonStats, raw.playerMatchStats)
    val dimTeam    = Dims.team(raw.teamSeed)
    val dimStadium = Dims.stadium(raw.stadiumSeed)
    val dimMatch   = Dims.matchDim(raw.teamMatch)
    val dimSeason  = Dims.season(spark)
    Map(
      "dim_player"  -> dimPlayer,
      "dim_team"    -> dimTeam,
      "dim_stadium" -> dimStadium,
      "dim_match"   -> dimMatch,
      "dim_season"  -> dimSeason,
      "fact_team_match"  -> Facts.teamMatch(raw.teamMatch, dimTeam, dimMatch, dimPlayer),
      "fact_team_point"  -> Facts.teamPoint(raw.teamPoint, dimTeam),
      "fact_player_match" -> Facts.playerMatch(raw.playerMatchStats, dimTeam, dimMatch, dimPlayer))
  }

  /** Primary keys per table (scr/Load.py DDL). */
  val keys: Map[String, Seq[String]] = Map(
    "dim_player"  -> Seq("player_id"),
    "dim_team"    -> Seq("team_id"),
    "dim_stadium" -> Seq("stadium_id"),
    "dim_match"   -> Seq("game_id"),
    "dim_season"  -> Seq("season_id"),
    "fact_team_match" -> Seq("season", "game_id", "team_id"),
    "fact_team_point" -> Seq("season_id", "team_id", "Match_Category"),
    "fact_player_match" -> Seq("season", "game_id", "team_id", "player_id"))

  /** Load stage: merge each table into the warehouse directory with
    * the reference's per-tier conflict semantics. The merge reads the
    * existing table lazily, so it is written to a temp dir and swapped
    * in (SURVEY §3.3) — never collected to the driver, never
    * overwritten while still being read. */
  def load(spark: SparkSession, warehouseDir: String,
           tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, incoming) =>
      val merge: (DataFrame, DataFrame) => DataFrame =
        if (name.startsWith("dim_")) Upsert.updateWins(_, _, keys(name))
        else Upsert.ignoreNew(_, _, keys(name))
      // facts are laid out partitioned by season: incremental seasons
      // land in their own directories and season-filtered reads prune
      // to one partition (SURVEY §7.3 (7); asserted in PipelineSpec)
      val partitionCols =
        if (!name.startsWith("dim_") && incoming.columns.contains("season"))
          Seq("season")
        else if (!name.startsWith("dim_") && incoming.columns.contains("season_id"))
          Seq("season_id")
        else Nil
      mergeSwap(spark, warehouseDir, name, incoming, merge, partitionCols)
    }

  /** Merge `incoming` with the live table (if any) via `merge`, write
    * the result to a temp dir, and swap it in failure-safely: a crash
    * or failed rename at any step leaves either the old or the new
    * table readable. Shared by the batch [[load]] and the streaming
    * incremental load ([[graft.streaming.Streams.incrementalLoad]]'s
    * foreachBatch). */
  def mergeSwap(spark: SparkSession, warehouseDir: String, name: String,
                incoming: DataFrame, merge: (DataFrame, DataFrame) => DataFrame,
                partitionCols: Seq[String] = Nil): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(s"$warehouseDir/$name")
    val fs = path.getFileSystem(conf)
    val merged =
      if (!fs.exists(path)) incoming
      else merge(spark.read.parquet(path.toString), incoming)
    val tmp = new org.apache.hadoop.fs.Path(s"$warehouseDir/.${name}_tmp")
    val writer = merged.write.mode("overwrite")
    val partitioned =
      if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer
    partitioned.parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(s"$warehouseDir/.${name}_old")
    if (fs.exists(old) && !fs.delete(old, true))
      sys.error(s"load: failed to clear stale backup $old")
    val hadPrev = fs.exists(path)
    if (hadPrev && !fs.rename(path, old))
      sys.error(s"load: failed to move live table $path aside")
    if (!fs.rename(tmp, path)) {
      if (hadPrev) fs.rename(old, path) // restore previous table
      sys.error(s"load: failed to swap $tmp into $path")
    }
    // the swap has SUCCEEDED at this point — a failed backup cleanup
    // must not abort the remaining tables; the stale-backup sweep at
    // the top of the next load clears it (advisor, round 2)
    if (hadPrev && !fs.delete(old, true))
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"load: swapped $name but could not remove backup $old; " +
          "next load's stale-backup sweep will clear it")
  }
}
