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
