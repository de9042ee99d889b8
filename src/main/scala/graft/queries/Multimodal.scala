package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary`
  * columns + typed metadata, processed in batches via typed
  * `Dataset.mapPartitions` (the JVM analog of `mapInPandas` — one
  * iterator per partition, constant memory, no per-row UDF overhead).
  *
  * REAL DECODE IS STUBBED: this container has no image/audio codecs,
  * so [[graft.ops.MediaDecode.decodeStub]] is a clearly-marked
  * deterministic fake (dimensions derived from the payload's sha-256).
  * The Spark-side plumbing — binary schema, partition batching, typed
  * row shape — is real and oracle-checked; swapping the stub for a
  * JNI/codec call changes nothing else.
  *
  * Scale: mapPartitions over binary columns streams batches; payloads
  * never hit the driver. Partition sizing for 100 TB media comes from
  * `spark.sql.files.maxPartitionBytes`, not row counts.
  */
object Multimodal {

  def defs: Seq[QueryDef] = Seq(m01)

  /** Decode metadata for a batch of media payloads (documents.text
    * bytes stand in for image blobs). */
  val m01 = QueryDef(
    "m01_media_decode_meta",
    (s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
        .as[(Long, Array[Byte])]
      media.mapPartitions { batch =>
        batch.map { case (id, bytes) => graft.ops.MediaDecode.decodeStub(id, bytes) }
      }.toDF()
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH m AS (SELECT doc_id, sha256(text) AS sha, octet_length(encode(text)) AS n_bytes FROM documents)
      SELECT doc_id, n_bytes, sha AS sha256,
             CAST(64 + CAST(concat('0x', substr(sha, 1, 8)) AS BIGINT) % 960 AS INT) AS width,
             CAST(64 + CAST(concat('0x', substr(sha, 9, 8)) AS BIGINT) % 960 AS INT) AS height,
             CASE CAST(concat('0x', substr(sha, 17, 1)) AS BIGINT) % 3
               WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
      FROM m
      ORDER BY doc_id"""))
}
