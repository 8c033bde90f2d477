package graft

import graft.multimodal.Multimodal.MjpegCodec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Generative coverage for the MJPEG marker walker (round 14) — the one
  * substantial hand-rolled binary parser still example-tested only. The
  * generator builds frames from the marker grammar UP (segments, scan
  * data with FF-stuffing and restart markers, EXIF-style nested
  * thumbnails, progressive multi-scan bodies), so every stream carries
  * its own ground-truth frame list independent of the walker's walk —
  * the same build-the-AST-first discipline that found real holes in the
  * WARC, TTL, SQL-gate, and multipart parsers.
  *
  * Properties:
  *  1. delimitation is exact: `frames` returns precisely the planted
  *     frame byte ranges — no split at a thumbnail's embedded EOI, no
  *     merge across adjacent frames, junk between frames ignored.
  *  2. truncation is prefix-safe at EVERY cut: for any prefix of the
  *     stream, `frames` returns exactly the planted frames that end at
  *     or before the cut — never a corrupt or partial frame.
  */
class MjpegFramesPropSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def holds(p: Prop, n: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Length-prefixed segment: FF <marker> <len-hi> <len-lo> <payload>,
    * len counts its own two bytes (the JPEG convention). */
  private def segment(marker: Int, payload: Array[Byte]): Array[Byte] =
    bytes(0xff, marker, (payload.length + 2) >> 8, (payload.length + 2) & 0xff) ++
      payload

  /** A complete minimal nested JPEG — the EXIF-thumbnail payload whose
    * raw SOI/EOI bytes sit INSIDE an APP1 segment of the outer frame. */
  private val thumbnail: Array[Byte] =
    bytes(0xff, 0xd8) ++ segment(0xda, bytes(0x01, 0x00)) ++
      bytes(0x11, 0x22) ++ bytes(0xff, 0xd9)

  private val rawByte: Gen[Byte] = Gen.chooseNum(0, 255).map(_.toByte)
  private val nonFf: Gen[Byte] = Gen.chooseNum(0, 254).map(_.toByte)

  // header payloads plant raw FF D8 / FF D9 / whole thumbnails — the
  // length skip must never look inside a segment
  private val headerPayload: Gen[Array[Byte]] = for {
    n    <- Gen.choose(0, 24)
    body <- Gen.containerOfN[Array, Byte](n, rawByte)
    trap <- Gen.oneOf(Array.empty[Byte], bytes(0xff, 0xd9), bytes(0xff, 0xd8),
      thumbnail)
  } yield body ++ trap

  /** One pre-scan segment: APPn / DQT / DHT / SOF0 / COM with arbitrary
    * payload (including planted SOI/EOI bytes), a standalone TEM, or a
    * fill-byte run before a DQT. */
  private val preScanSegment: Gen[Array[Byte]] = Gen.frequency(
    4 -> Gen.zip(Gen.oneOf(0xe0, 0xe1, 0xee, 0xdb, 0xc4, 0xc0, 0xfe),
      headerPayload).map { case (m, p) => segment(m, p) },
    1 -> Gen.const(bytes(0xff, 0x01)), // TEM, standalone
    1 -> headerPayload.map(p => bytes(0xff) ++ segment(0xdb, p))) // fill byte

  /** Entropy-coded tokens: non-FF bytes, stuffed FF00, restart markers.
    * By the coding contract these are the ONLY bytes legal in scan data. */
  private val entropy: Gen[Array[Byte]] = Gen.listOf(Gen.frequency(
    6 -> nonFf.map(b => Array(b)),
    1 -> Gen.const(bytes(0xff, 0x00)),
    1 -> Gen.choose(0xd0, 0xd7).map(r => bytes(0xff, r))))
    .map(_.flatten.toArray)

  /** A complete frame: SOI, 0-3 header segments, then one scan — or a
    * progressive pair of scans separated by a DHT — then EOI. */
  private val frame: Gen[Array[Byte]] = for {
    heads <- Gen.choose(0, 3).flatMap(Gen.listOfN(_, preScanSegment))
    sosH  <- headerPayload
    e1    <- entropy
    extra <- Gen.option(Gen.zip(headerPayload, headerPayload, entropy))
  } yield {
    val scan1 = segment(0xda, sosH) ++ e1
    val scan2 = extra.fold(Array.empty[Byte]) { case (dht, h2, e2) =>
      segment(0xc4, dht) ++ segment(0xda, h2) ++ e2
    }
    bytes(0xff, 0xd8) ++ heads.flatten.toArray ++ scan1 ++ scan2 ++
      bytes(0xff, 0xd9)
  }

  /** Inter-frame junk: FF-free so it can neither start a frame nor
    * extend one (ground truth stays exactly the planted frames). */
  private val junk: Gen[Array[Byte]] = Gen.choose(0, 12).flatMap(n =>
    Gen.containerOfN[Array, Byte](n, nonFf))

  /** A stream of junk-separated planted frames; ground truth carries each
    * frame's bytes AND its end offset (computed while assembling, so the
    * truncation property needs no re-search). */
  private val stream: Gen[(Array[Byte], Seq[(Array[Byte], Int)])] = for {
    fs   <- Gen.choose(0, 4).flatMap(Gen.listOfN(_, frame))
    gaps <- Gen.listOfN(fs.length + 1, junk)
  } yield {
    val out = Array.newBuilder[Byte]
    var pos = gaps.head.length
    out ++= gaps.head
    val truth = fs.zip(gaps.tail).map { case (f, g) =>
      out ++= f; pos += f.length
      val end = pos
      out ++= g; pos += g.length
      (f, end)
    }
    (out.result(), truth)
  }

  private def sameFrames(got: Seq[Array[Byte]],
      want: Seq[Array[Byte]]): Boolean =
    got.length == want.length &&
      got.zip(want).forall { case (a, b) => a.sameElements(b) }

  test("delimitation returns exactly the planted frames") {
    holds(Prop.forAll(stream) { case (s, truth) =>
      sameFrames(MjpegCodec.frames(s), truth.map(_._1))
    })
  }

  test("every truncation point yields exactly the complete planted frames") {
    holds(Prop.forAll(stream) { case (s, truth) =>
      (0 to s.length).forall { cut =>
        val want = truth.takeWhile(_._2 <= cut).map(_._1)
        sameFrames(MjpegCodec.frames(s.take(cut)), want)
      }
    }, n = 60)
  }
}
