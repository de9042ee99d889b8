package graft.ops

import java.security.MessageDigest

/** Decoded media metadata row (multimodal pipeline). */
final case class MediaMeta(
    doc_id: Long, n_bytes: Int, sha256: String,
    width: Int, height: Int, format: String)

/** Media decoding for binary columns.
  *
  * ==== STUB ====
  * A real implementation would hand `bytes` to an image/audio codec
  * (javax.imageio / ffmpeg-JNI). Those libraries are not in this
  * container, so `decodeStub` fabricates deterministic metadata from
  * the payload's sha-256 — same signature, same batch shape, fully
  * reproducible, and replayable in the SQL oracle. Swap the body for
  * the codec call to go live; nothing upstream changes.
  */
object MediaDecode {

  private def sha256Hex(bytes: Array[Byte]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val sha = sha256Hex(bytes)
    val width  = 64 + (java.lang.Long.parseLong(sha.substring(0, 8), 16) % 960).toInt
    val height = 64 + (java.lang.Long.parseLong(sha.substring(8, 16), 16) % 960).toInt
    val format = (java.lang.Long.parseLong(sha.substring(16, 17), 16) % 3) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    MediaMeta(id, bytes.length, sha, width, height, format)
  }

  /** Extracted feature row: 8 pseudo-embedding dims in [0,1). */
  final case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** ==== STUB ==== Feature extraction (the embed step of a multimodal
    * retrieval pipeline). A real implementation runs a vision/audio
    * encoder over the decoded payload; the stub derives 8 deterministic
    * dims from sha-256 32-bit slices scaled to [0,1) — replayable in
    * SQL, so the decode→embed→search composition is oracle-checked.
    */
  def featureStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val sha = sha256Hex(bytes)
    val feats = Array.tabulate(8) { i =>
      java.lang.Long.parseLong(sha.substring(i * 8, i * 8 + 8), 16).toDouble / 4294967296.0
    }
    MediaFeatures(id, feats)
  }

  /** Resized-image metadata row. */
  final case class ResizedMeta(
      doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, scale_pct: Int)

  /** ==== STUB ==== Aspect-preserving resize plan to fit a maxDim box.
    * A real implementation hands pixels to the codec; the geometry
    * arithmetic (integer, replayable in SQL) and the batch shape are
    * the real product. No-op (scale 100%) when already inside the box.
    */
  def resizeStub(m: MediaMeta, maxDim: Int): ResizedMeta = {
    val longest = math.max(m.width, m.height)
    if (longest <= maxDim)
      ResizedMeta(m.doc_id, m.width, m.height, m.width, m.height, 100)
    else {
      // integer arithmetic only — mirrored exactly in the oracle SQL
      val outW = m.width * maxDim / longest
      val outH = m.height * maxDim / longest
      ResizedMeta(m.doc_id, m.width, m.height, outW, outH, maxDim * 100 / longest)
    }
  }
}
