package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined span-gram selection for dd9 (DedupOps.spanGrams): all
  * `gramLen`-char grams of a document are md5-hashed and the 1-in-16 whose
  * first hex nibble is '0' come back as (off, hex) rows — identical
  * semantics to the SQL form
  * `filter(transform(sequence(..), i -> (i, md5(substring(text, i, G)))),
  * first_nibble = '0')` the DuckDB oracle evaluates.
  *
  * Why an expression: transform/filter lambdas are interpreted
  * HigherOrderFunctions — per-element closure dispatch, a struct allocation
  * per gram, and a full hex string for every gram including the 15/16 the
  * filter then discards (measured 4.6 s at sf0.1). This is one tight loop
  * per document over the text's UTF-8 bytes: a single reused MessageDigest,
  * `update(bytes, off, len)` windows with no substring copies on the ASCII
  * fast path, selection tested on the digest's FIRST BYTE (high nibble == 0
  * ⇔ hex starts with '0'), and hex encoding only for selected grams.
  * Non-ASCII text falls back to character-correct substring slicing —
  * Spark's substring is character-based, so byte windows are only valid
  * when chars are single-byte.
  */
case class SpanGramHits(child: Expression, gramLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("gh", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "span_gram_hits"

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val md = java.security.MessageDigest.getInstance("MD5")
    val hits = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val bytes = u.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) {
      val n = bytes.length
      val count = math.max(n - gramLen + 1, 1)
      var off = 0
      while (off < count) {
        md.update(bytes, off, math.min(gramLen, n - off))
        val d = md.digest() // digest() resets for the next window
        if ((d(0) & 0xf0) == 0)
          hits += org.apache.spark.sql.catalyst.InternalRow(off + 1, hex(d))
        off += 1
      }
    } else {
      // character-correct path: md5(substring(text, i, G)) hashes the
      // SUBSTRING's UTF-8 encoding, and char offsets != byte offsets here
      val s = u.toString
      val n = s.length
      val count = math.max(n - gramLen + 1, 1)
      var off = 0
      while (off < count) {
        val d = md.digest(s.substring(off, math.min(off + gramLen, n))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((d(0) & 0xf0) == 0)
          hits += org.apache.spark.sql.catalyst.InternalRow(off + 1, hex(d))
        off += 1
      }
    }
    new GenericArrayData(hits.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanGramHits {
  /** Register `span_gram_hits(text)` with the given gram length. */
  def register(spark: SparkSession, gramLen: Int,
      name: String = "span_gram_hits"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => SpanGramHits(exprs.head, gramLen), "scala_udf")
}

/** The 100 TB form of [[SpanGramHits]]: a Karp-Rabin ROLLING hash makes
  * gram hashing O(len) per document instead of O(len·G) — at G=50 that is
  * the difference between hashing the corpus once and hashing it fifty
  * times. Same content-defined selection contract (a selected gram is
  * selected wherever it sits, so cross-doc span agreement needs no offset
  * alignment); the hash VALUE differs from the md5 form, so dd9's DuckDB
  * oracle stays on [[SpanGramHits]] and this form is gated by properties
  * instead (rolling == direct recompute at every offset; identical
  * selected-gram sets for a shared span; ~1/2^selBits selection rate) —
  * the same accepted-structure pattern as v5's float-order nondeterminism.
  *
  * Hash: polynomial over UTF-16 char values mod 2^64 (Long wraparound),
  * odd base so every position influences the low bits, then a murmur3
  * finalizer before both the selection test and the emitted value — the
  * raw polynomial's low bits are dominated by the trailing chars, and
  * selection keys on the low `selBits`. The ASCII fast path rolls over
  * the UTF8String's bytes without materializing a String; char==byte for
  * ASCII, so both paths compute the identical hash.
  */
case class RollingGramHits(child: Expression, gramLen: Int, selBits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("gh", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "rolling_gram_hits"

  private val B = 1000003L
  /** B^(G-1) mod 2^64, the outgoing-char eviction multiplier. */
  private val BPow: Long = {
    var p = 1L; var i = 0
    while (i < gramLen - 1) { p *= B; i += 1 }
    p
  }
  private val selMask: Long = (1L << selBits) - 1

  @inline private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val hits = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val bytes = u.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) { ascii = bytes(i) >= 0; i += 1 }
    @inline def emit(off: Int, raw: Long): Unit = {
      val f = fmix(raw)
      if ((f & selMask) == 0L)
        hits += org.apache.spark.sql.catalyst.InternalRow(off, f)
    }
    if (ascii) {
      val n = bytes.length
      if (n < gramLen) {
        var h = 0L; var j = 0
        while (j < n) { h = h * B + bytes(j); j += 1 }
        emit(1, h)
      } else {
        var h = 0L; var j = 0
        while (j < gramLen) { h = h * B + bytes(j); j += 1 }
        emit(1, h)
        var off = 1
        while (off + gramLen <= n) {
          h = (h - bytes(off - 1) * BPow) * B + bytes(off + gramLen - 1)
          emit(off + 1, h)
          off += 1
        }
      }
    } else {
      val s = u.toString
      val n = s.length
      if (n < gramLen) {
        var h = 0L; var j = 0
        while (j < n) { h = h * B + s.charAt(j); j += 1 }
        emit(1, h)
      } else {
        var h = 0L; var j = 0
        while (j < gramLen) { h = h * B + s.charAt(j); j += 1 }
        emit(1, h)
        var off = 1
        while (off + gramLen <= n) {
          h = (h - s.charAt(off - 1) * BPow) * B + s.charAt(off + gramLen - 1)
          emit(off + 1, h)
          off += 1
        }
      }
    }
    new GenericArrayData(hits.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingGramHits {
  /** Register `rolling_gram_hits(text)` with the given gram length and
    * selection width (1-in-2^selBits grams selected). */
  def register(spark: SparkSession, gramLen: Int, selBits: Int = 4,
      name: String = "rolling_gram_hits"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => RollingGramHits(exprs.head, gramLen, selBits), "scala_udf")
}
