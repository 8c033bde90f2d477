package graft.lifecycle

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the byte-level multipart parser: RFC 7578 bodies
  * whose part CONTENT is adversarial — bare `--boundary` bytes mid-stream,
  * truncated anchored-delimiter prefixes, CRLF runs, high bytes — must
  * round-trip the file part byte-for-byte. (Content containing the full
  * CRLF-anchored `\r\n--boundary` line is genuinely ambiguous per RFC 2046
  * — senders must pick collision-free boundaries — so the generator plants
  * everything SHORT of that.) */
class MultipartFormPropSpec extends AnyFunSuite {

  private val boundary = "----GraftBoundary7MA4YWxk"

  // adversarial content pieces: everything the parser must NOT mistake
  // for a delimiter, including the bare boundary and every proper prefix
  // of the anchored form
  private def contentGen: Gen[Array[Byte]] = {
    val piece: Gen[Array[Byte]] = Gen.frequency(
      4 -> Gen.listOfN(6, Gen.choose(0, 255)).map(_.map(_.toByte).toArray),
      2 -> Gen.const(("--" + boundary).getBytes("ISO-8859-1")),
      2 -> Gen.const(("\r\n--" + boundary.dropRight(1)).getBytes("ISO-8859-1")),
      1 -> Gen.const("\r\n\r\n".getBytes("ISO-8859-1")),
      1 -> Gen.const("\r\n".getBytes("ISO-8859-1")),
      1 -> Gen.const("\r\n--".getBytes("ISO-8859-1")),
      1 -> Gen.const(Array[Byte](0, -1, 13, 10, 45, 45)))
    for {
      ps <- Gen.listOf(piece)
      tail <- Gen.oneOf(Array.emptyByteArray,
        "\r\n".getBytes("ISO-8859-1"), ("--" + boundary).getBytes("ISO-8859-1"))
    } yield {
      // a piece ending "\r\n" followed by the bare-boundary piece would
      // compose the FULL anchored delimiter (the RFC-ambiguous case this
      // test deliberately excludes) — guard \n→- seams with one byte so
      // pieces stay adversarial but never compose it
      val all = ps :+ tail
      val out = new java.io.ByteArrayOutputStream()
      all.filter(_.nonEmpty).foldLeft(Option.empty[Byte]) { (last, p) =>
        if (last.contains('\n'.toByte) && p.head == '-'.toByte)
          out.write('x'.toInt)
        out.write(p, 0, p.length)
        Some(p.last)
      }
      out.toByteArray
    }
  }

  private def build(parts: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    parts.foreach { case (name, filename, content) =>
      w(s"--$boundary\r\n")
      val fn = if (filename.nonEmpty) s"""; filename="$filename"""" else ""
      w(s"""Content-Disposition: form-data; name="$name"$fn\r\n""")
      w("Content-Type: application/octet-stream\r\n\r\n")
      out.write(content)
      w("\r\n")
    }
    w(s"--$boundary--\r\n")
    out.toByteArray
  }

  // a piece ending "\r\n" followed by the bare-boundary piece composes the
  // FULL anchored delimiter inside content — the one genuinely ambiguous
  // case (RFC 2046: the sender must pick a collision-free boundary), so
  // such compositions are excluded rather than asserted on
  private def unambiguous(c: Array[Byte]): Boolean = {
    val anchored = ("\r\n--" + boundary).getBytes("ISO-8859-1")
    !c.indices.exists(i => i + anchored.length <= c.length &&
      anchored.indices.forall(j => c(i + j) == anchored(j)))
  }

  test("file part round-trips byte-for-byte under adversarial content") {
    val cases = Gen.listOfN(200, for {
      pre <- contentGen
      fileContent <- contentGen
      post <- contentGen
      nPre <- Gen.choose(0, 2)
      nPost <- Gen.choose(0, 1)
    } yield (pre, fileContent, post, nPre, nPost))
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
      .getOrElse(sys.error("gen failed"))
    var kept = 0
    cases.foreach { case (pre, fileContent, post, nPre, nPost) =>
      if (Seq(pre, fileContent, post).forall(unambiguous)) {
      kept += 1
      val parts =
        Seq.fill(nPre)(("df_id", "", pre)) ++
          Seq(("file", "data.parquet", fileContent)) ++
          Seq.fill(nPost)(("note", "", post))
      val body = build(parts)
      MultipartForm.filePart(body, boundary) match {
        case Some((fn, got)) =>
          assert(fn == "data.parquet")
          assert(java.util.Arrays.equals(got, fileContent),
            s"content mismatch: got ${got.length} bytes, " +
              s"expected ${fileContent.length}")
        case None => fail(s"no file part parsed (${body.length} byte body)")
      }
      }
    }
    // the exclusion must not hollow the test out: the adversarial pieces
    // compose the ambiguous form rarely
    assert(kept >= 150, s"only $kept/200 cases unambiguous")
  }

  test("header states: random part order, casing, extra headers, attribute " +
      "order, preamble/epilogue — planted part always parses exactly") {
    // the round-13 verdict's generative item: the parser was example-tested
    // only at the RFC-anchored form; this drives the header STATE space.
    // RFC 7578/7230: header NAMES are case-insensitive, disposition
    // attributes may come in any order, unknown part headers must be
    // skipped, and a body may carry a preamble before the first delimiter
    // and an epilogue after the last.
    val rng = new scala.util.Random(11)
    def randCase(s: String): String = s.map(c =>
      if (rng.nextBoolean()) Character.toUpperCase(c)
      else Character.toLowerCase(c))
    def buildFancy(parts: Seq[(String, String, Array[Byte])],
        preamble: String, epilogue: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      if (preamble.nonEmpty) w(preamble + "\r\n")
      var first = preamble.isEmpty
      parts.foreach { case (name, filename, content) =>
        if (first) { w(s"--$boundary\r\n"); first = false }
        else w(s"--$boundary\r\n") // delimiter line always CRLF-terminated
        val fn = if (filename.nonEmpty) s"""; filename="$filename"""" else ""
        // attribute order flips; header name casing is randomized; 0-2
        // extra headers land before and/or after the disposition line
        val disp =
          if (rng.nextBoolean())
            s"""${randCase("Content-Disposition")}: form-data; name="$name"$fn"""
          else if (filename.nonEmpty)
            s"""${randCase("Content-Disposition")}: form-data; filename="$filename"; name="$name""""
          else
            s"""${randCase("Content-Disposition")}: form-data; name="$name""""
        val extras = Seq(
          s"${randCase("Content-Type")}: application/octet-stream",
          s"${randCase("Content-Transfer-Encoding")}: binary",
          s"X-Custom-${rng.nextInt(100)}: v")
        val headers = rng.shuffle(disp +: rng.shuffle(extras).take(rng.nextInt(3)))
        headers.foreach(h => w(h + "\r\n"))
        w("\r\n")
        out.write(content)
        w("\r\n")
      }
      w(s"--$boundary--")
      if (epilogue.nonEmpty) w("\r\n" + epilogue)
      out.toByteArray
    }
    (1 to 200).foreach { i =>
      val fileBytes = Array.tabulate(rng.nextInt(64))(j => (i * 31 + j).toByte)
      val others = rng.shuffle(Seq(
        ("df_id", "", s"tbl$i".getBytes("ISO-8859-1")),
        ("note", "n.txt", Array.fill(rng.nextInt(16))(7.toByte)),
        ("filename_trap", "", """name="file"""".getBytes("ISO-8859-1"))))
        .take(rng.nextInt(4))
      val at = rng.nextInt(others.length + 1)
      val parts = (others.take(at) :+ (("file", s"d$i.parquet", fileBytes))) ++
        others.drop(at)
      val preamble = if (rng.nextBoolean()) "This is a preamble. Ignore." else ""
      val epilogue = if (rng.nextBoolean()) "epilogue bytes" else ""
      val body = buildFancy(parts, preamble, epilogue)
      MultipartForm.filePart(body, boundary) match {
        case Some((fn, got)) =>
          assert(fn == s"d$i.parquet", s"case $i: wrong part $fn")
          assert(java.util.Arrays.equals(got, fileBytes),
            s"case $i: ${got.length} vs ${fileBytes.length} bytes")
        case None => fail(s"case $i: planted file part not found")
      }
    }
  }

  test("truncated bodies never parse a phantom part (and never throw)") {
    val full = build(Seq(
      ("df_id", "", "x".getBytes("ISO-8859-1")),
      ("file", "t.bin", Array.tabulate(40)(_.toByte)),
      ("note", "", "y".getBytes("ISO-8859-1"))))
    // cutting ANYWHERE may only yield (a) the complete planted part when
    // the cut lands past its closing delimiter, or (b) None — never a
    // truncated/corrupted content array, and never an exception (the
    // /upload route turns None into its 400)
    val want = Array.tabulate(40)(_.toByte)
    (0 to full.length).foreach { cut =>
      MultipartForm.filePart(java.util.Arrays.copyOf(full, cut), boundary) match {
        case Some((fn, got)) =>
          assert(fn == "t.bin" && java.util.Arrays.equals(got, want),
            s"cut=$cut parsed a corrupted part (${got.length} bytes)")
        case None => ()
      }
    }
  }

  test("missing file part yields None; empty file content yields empty bytes") {
    val none = build(Seq(("df_id", "", "sales".getBytes("ISO-8859-1"))))
    assert(MultipartForm.filePart(none, boundary).isEmpty)
    val empty = build(Seq(("file", "e.csv", Array.emptyByteArray)))
    val got = MultipartForm.filePart(empty, boundary)
    assert(got.exists { case (fn, c) => fn == "e.csv" && c.isEmpty })
  }
}
