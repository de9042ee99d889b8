package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The k smallest distinct 60-bit md5 fingerprints of every
  * `width`-char rolling window of a string, as ONE scalar expression —
  * the whole t07 document-fingerprint pipeline
  * (explode windows → md5 → conv hex→long → groupBy doc → k-min
  * aggregate) collapsed into a per-row projection.
  *
  * Why: the explode form materializes one row per window (O(text
  * length) rows through the aggregation) — at sf0.1 that is ~2.5M
  * exploded rows for 5k docs, and at 100 TB the fingerprint stage
  * becomes a full extra shuffle of window hashes. Here the windows
  * never leave the JVM loop: no explode, no aggregation, no shuffle —
  * fingerprinting is embarrassingly parallel per document, and the
  * plan shape finally says so.
  *
  * Exact value parity with the expression pipeline it replaces (and
  * with the DuckDB oracle): windows are code-point substrings
  * (Spark `substring` semantics), hashed as their UTF-8 bytes, and
  * the fingerprint is the first 15 hex chars of the digest — bytes
  * 0..6 and the high nibble of byte 7. Inputs shorter than `width`
  * yield an empty array (t07 filters them out upstream).
  */
case class RollingMinHash(child: Expression, width: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_minhash requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String], width, k)

  /** Generated code stays inside whole-stage codegen: one static call
    * per row, like Spark's own md5 (which calls DigestUtils). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingMinHash$$.MODULE$$.compute($c, $width, $k);")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Tight per-document loop: UTF-8 byte offsets of code points once,
    * then each window digests its byte range directly — no per-window
    * String or substring allocation. */
  def compute(s: UTF8String, width: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    // code-point start offsets (Spark substring counts code points)
    var nCp = 0
    var off = 0
    val starts = new Array[Int](bytes.length + 1)
    while (off < bytes.length) {
      starts(nCp) = off
      val b = bytes(off) & 0xFF
      off += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      nCp += 1
    }
    starts(nCp) = bytes.length
    if (nCp < width) return new GenericArrayData(Array.emptyLongArray)

    val digest = md5.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= nCp - width) {
      digest.reset()
      digest.update(bytes, starts(i), starts(i + width) - starts(i))
      val d = digest.digest()
      // first 15 hex chars = bytes 0..6 + high nibble of byte 7
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
      v = (v << 4) | ((d(7) & 0xFFL) >>> 4)
      // insert-sorted k-min with dedup (same scheme as TopKMinAgg)
      if (v < mins(k - 1)) {
        var p = 0
        while (p < k && mins(p) < v) p += 1
        if (p >= k || mins(p) != v) {
          var q = k - 1
          while (q > p) { mins(q) = mins(q - 1); q -= 1 }
          mins(p) = v
        }
      }
      i += 1
    }
    var n = 0
    while (n < k && mins(n) != Long.MaxValue) n += 1
    new GenericArrayData(java.util.Arrays.copyOf(mins, n))
  }

  /** Column API. */
  def rollingMinHash(c: Column, width: Int, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      RollingMinHash(org.apache.spark.sql.GraftBridge.expr(c), width, k))
}
