package graft.lifecycle

import java.nio.{ByteBuffer, ByteOrder}

import scala.util.{Random, Try}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.lifecycle.TransformerEmbedder.{MiniJson, SafeTensors}

/** Generative coverage for the safetensors container and its hand-rolled
  * JSON header reader — the last example-tested-only parsers in the
  * model-loading path. The generator builds the document AST first (the
  * ground truth), serializes it with an INDEPENDENT writer that sprinkles
  * the freedoms the format allows (whitespace between tokens, short vs
  * `\\uXXXX` escapes, hex case, `\\/`, header space-padding, tensor
  * order), and requires the parser to recover the AST exactly — the same
  * build-the-truth-first discipline that found real holes in the WARC,
  * TTL, SQL-gate, multipart, and MJPEG parsers.
  *
  * Properties:
  *  1. JSON round-trip: parse(write(ast)) == ast with TYPE fidelity
  *     (a Long stays a Long — Scala's cooperative numeric equality
  *     would hide an integer arriving as a Double, so the compare
  *     checks boxes, and doubles compare by bit pattern).
  *  2. prefix loudness: every strict prefix of an object-rooted
  *     document fails the parse — nothing truncated ever parses
  *     quietly (the root's closing brace is its last byte).
  *  3. safetensors round-trip: every planted tensor comes back
  *     bit-identical (shape, offsets, F32 payload) regardless of
  *     tensor order, `__metadata__`, unicode names, or header padding.
  *  4. safetensors truncation: for ANY byte-prefix of a valid
  *     container, each tensor read either throws or returns exactly
  *     the planted floats — corruption is loud, never silent.
  */
class MiniJsonPropSpec extends AnyFunSuite {

  private def holds(p: Prop, n: Int = 150): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- independent writer ------------------------------------------------

  /** Random inter-token whitespace (the JSON grammar's `ws`). */
  private def ws(rnd: Random): String =
    if (rnd.nextInt(4) == 0) {
      val c = " \t\n\r".charAt(rnd.nextInt(4)).toString
      c * (1 + rnd.nextInt(2))
    } else ""

  private def escape(s: String, rnd: Random): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append(if (rnd.nextBoolean()) "\\n" else "\\u000a")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '/' if rnd.nextInt(4) == 0 => sb.append("\\/")
      case c if c < 0x20 =>
        val hex = f"${c.toInt}%04x"
        sb.append("\\u").append(if (rnd.nextBoolean()) hex.toUpperCase else hex)
      case c if rnd.nextInt(10) == 0 =>
        // any char may be \u-escaped, one code UNIT at a time (surrogate
        // halves individually — the JSON convention for astral chars)
        val hex = f"${c.toInt}%04x"
        sb.append("\\u").append(if (rnd.nextBoolean()) hex.toUpperCase else hex)
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Serializes exactly the value shapes MiniJson is specified to return:
    * Map[String, Any] / Seq[Any] / String / Long / Double / Boolean / null. */
  private def write(v: Any, rnd: Random): String = v match {
    case null       => "null"
    case b: Boolean => b.toString
    case l: Long    => l.toString
    case d: Double  => d.toString // Java repr always carries '.' or 'E'
    case s: String  => escape(s, rnd)
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].iterator
        .map { case (k, mv) =>
          ws(rnd) + escape(k, rnd) + ws(rnd) + ":" + ws(rnd) + write(mv, rnd) }
        .mkString("{", ",", ws(rnd) + "}")
    case q: Seq[_] =>
      q.iterator.map(x => ws(rnd) + write(x, rnd) + ws(rnd))
        .mkString("[", ",", "]")
    case other => sys.error(s"unexpected AST node: $other")
  }

  /** Type-faithful deep equality: (5L, 5.0) must NOT compare equal (the
    * parser's Long-vs-Double split is part of its contract), and doubles
    * compare by bits so -0.0 stays distinguishable from 0.0. */
  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Map[_, _], y: Map[_, _]) =>
      val xm = x.asInstanceOf[Map[String, Any]]
      val ym = y.asInstanceOf[Map[String, Any]]
      xm.size == ym.size && xm.forall { case (k, v) =>
        ym.contains(k) && deepEq(v, ym(k)) }
    case (x: Seq[_], y: Seq[_]) =>
      x.size == y.size && x.iterator.zip(y.iterator).forall {
        case (u, w) => deepEq(u, w) }
    case (x: java.lang.Long, y: java.lang.Long)       => x == y
    case (x: java.lang.Double, y: java.lang.Double)   =>
      java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x == y
    case (x: String, y: String)                       => x == y
    case _ => false
  }

  // ---- AST generators ------------------------------------------------------

  private val jsonChar: Gen[String] = Gen.frequency(
    10 -> Gen.choose(32, 126).map(_.toChar.toString),
    2  -> Gen.oneOf("\"", "\\", "\n", "\t", "\r", "\b", "\f", "/", ""),
    2  -> Gen.oneOf("é", "中", "한", "𝕊", "😀", " ", " "),
    1  -> Gen.choose(0x20, 0xffff).suchThat(cp =>
      !Character.isSurrogate(cp.toChar)).map(_.toChar.toString))

  private val genStr: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, jsonChar)).map(_.mkString)

  private val genLong: Gen[Any] = Gen.frequency(
    4 -> Gen.chooseNum(-1000L, 1000L),
    1 -> Gen.oneOf(0L, -1L, Long.MaxValue, Long.MinValue + 1,
      4611686018427387904L)).map(x => x: Any)

  private val genDouble: Gen[Any] = Gen.frequency(
    4 -> Gen.chooseNum(-1e30, 1e30),
    1 -> Gen.oneOf(0.0, -0.0, 1.5e-12, 6.62607015e-34, 1.0e300))
    .map(x => x: Any)

  private val genLeaf: Gen[Any] = Gen.frequency(
    3 -> genStr.map(x => x: Any),
    3 -> genLong,
    2 -> genDouble,
    1 -> Gen.oneOf(true: Any, false: Any),
    1 -> Gen.const(null: Any))

  private def genValue(depth: Int): Gen[Any] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      2 -> genObj(depth - 1).map(x => x: Any),
      2 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, genValue(depth - 1))).map(xs => xs: Any))

  private def genObj(depth: Int): Gen[Map[String, Any]] = for {
    n  <- Gen.choose(0, 4)
    ks <- Gen.listOfN(n, genStr).map(_.distinct)
    vs <- Gen.listOfN(ks.size, genValue(depth))
  } yield ks.zip(vs).toMap

  private val genSeed: Gen[Long] = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  // ---- properties: MiniJson ------------------------------------------------

  test("round-trip: parse(write(ast)) recovers the AST with type fidelity") {
    holds(Prop.forAll(genValue(3), genSeed) { (ast, seed) =>
      val parsed = MiniJson.parse(write(ast, new Random(seed)))
      deepEq(ast, parsed)
    })
  }

  test("prefix loudness: every strict prefix of an object root fails") {
    holds(Prop.forAll(genObj(2), genSeed) { (ast, seed) =>
      val doc = write(ast, new Random(seed))
      (0 until doc.length).forall(cut =>
        Try(MiniJson.parse(doc.substring(0, cut))).isFailure)
    }, n = 80)
  }

  // ---- properties: SafeTensors ----------------------------------------------

  import MiniJsonPropSpec.PlantedTensor

  private val tensorName: Gen[String] = for {
    base <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumStr.map(_.take(6)),
      1 -> Gen.oneOf("层", "k.v", "a b", "q\"x", "e\\y"))))
  } yield base.mkString(".")

  private val genTensor: Gen[PlantedTensor] = for {
    name  <- tensorName
    rank  <- Gen.choose(0, 3)
    shape <- Gen.listOfN(rank, Gen.choose(1, 4))
    seed  <- genSeed
  } yield {
    val n = shape.product
    val rnd = new Random(seed)
    // finite bit patterns only: FloatBuffer round-trips those exactly,
    // while NaN payloads may legally canonicalize in intBitsToFloat
    val bits = Array.fill(n)(
      java.lang.Float.floatToRawIntBits(
        (rnd.nextDouble() * 2e8 - 1e8).toFloat))
    PlantedTensor(name, shape, bits)
  }

  private val genContainer: Gen[(Array[Byte], List[PlantedTensor])] = for {
    k       <- Gen.choose(1, 5)
    raw     <- Gen.listOfN(k, genTensor)
    meta    <- Gen.option(genObj(0).map(_.map { case (mk, _) => mk -> "v" }))
    pad     <- Gen.choose(0, 7)
    seed    <- genSeed
  } yield {
    val ts = raw.groupBy(_.name).map(_._2.head).toList // distinct names
    val rnd = new Random(seed)
    var cur = 0L
    val entries: Map[String, Any] = ts.map { t =>
      val sz = t.bits.length * 4L
      val e: (String, Any) = t.name -> Map[String, Any](
        "dtype" -> "F32",
        "shape" -> t.shape.map(_.toLong: Any),
        "data_offsets" -> Seq[Any](cur, cur + sz))
      cur += sz
      e
    }.toMap ++ meta.map(m => "__metadata__" -> (m: Any)).toMap
    val headerBytes =
      (write(entries, rnd) + (" " * pad)).getBytes("UTF-8")
    val buf = ByteBuffer.allocate(8 + headerBytes.length + cur.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(headerBytes.length.toLong).put(headerBytes)
    ts.foreach(_.bits.foreach(b => buf.putInt(b)))
    (buf.array(), ts)
  }

  test("safetensors round-trip: every planted tensor reads back bit-exact") {
    holds(Prop.forAll(genContainer) { case (bytes, planted) =>
      val st = new SafeTensors(bytes)
      st.tensors.keySet == planted.map(_.name).toSet &&
        planted.forall { t =>
          val got = st(t.name)
          st.tensors(t.name).shape == t.shape &&
            got.length == t.bits.length &&
            got.indices.forall(i =>
              java.lang.Float.floatToRawIntBits(got(i)) == t.bits(i))
        }
    })
  }

  test("safetensors truncation: a cut anywhere is loud or exact, never wrong") {
    holds(Prop.forAll(genContainer, genSeed) { case ((bytes, planted), seed) =>
      val rnd = new Random(seed)
      val cuts = (Seq(0, 4, 8, 9, bytes.length - 1) ++
        Array.fill(12)(rnd.nextInt(bytes.length))).filter(_ < bytes.length)
      cuts.forall { cut =>
        val prefix = java.util.Arrays.copyOf(bytes, cut)
        planted.forall { t =>
          Try(new SafeTensors(prefix)).flatMap(st => Try(st(t.name))) match {
            case scala.util.Failure(_) => true
            case scala.util.Success(got) =>
              got.length == t.bits.length && got.indices.forall(i =>
                java.lang.Float.floatToRawIntBits(got(i)) == t.bits(i))
          }
        }
      }
    }, n = 60)
  }
}

private object MiniJsonPropSpec {
  final case class PlantedTensor(name: String, shape: Seq[Int],
      bits: Array[Int])
}
