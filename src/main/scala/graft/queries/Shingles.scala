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

  /** Distinct (doc_id, shingle) word-3-grams of docs with ≥3 tokens. */
  def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), tokens.as("w")).filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("shingle"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
}
