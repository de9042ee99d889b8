package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared materialized intermediate for the dedup family: the distinct
  * `(doc_id, shingle)` word-3-gram table that d02 (n-gram Jaccard),
  * d03 (minhash-LSH) and d06 (minhash signatures) all start from.
  *
  * Persisted once per corpus dir and reused across operators via the
  * CacheManager's canonical-plan matching — the single-node analog of
  * what a 100 TB deployment does explicitly: write the shingle table
  * to parquet once per corpus snapshot and feed every dedup job from
  * it, instead of re-deriving the explode+distinct lineage per job.
  */
object Shingles {

  /** Whitespace tokens of the lower-cased trimmed text. */
  private[queries] val tokens = split(lower(trim(col("text"))), "\\s+")

  /** One cached plan per (session, corpus dir): repeated calls reuse
    * the same persisted DataFrame instead of registering a fresh
    * equivalent plan each time, and [[release]] can free them all —
    * cached shingle tables no longer accumulate for the session
    * lifetime (advisor, round 2). */
  private val cached = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** Distinct (doc_id, shingle) word-3-grams of docs with ≥3 tokens. */
  def shingled(s: SparkSession, d: String): DataFrame =
    cached.computeIfAbsent((s, d), { _ =>
      Tables.documents(s, d)
        .select(col("doc_id"), tokens.as("w")).filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("shingle"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    })

  /** Unpersist every cached shingle table (end-of-run cleanup —
    * Verify calls this after the query sweep; Bench's clearCache()
    * drops the storage too, and this also clears the registry). */
  def release(): Unit = {
    cached.values.forEach(df => { df.unpersist(); () })
    cached.clear()
  }
}
