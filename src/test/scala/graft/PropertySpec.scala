package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.ScalarExtras
import graft.operators.Profile

/** Property tests (SURVEY §5.3): invariants over generated inputs, run with
  * raw ScalaCheck (fixed seed count, assertion on the aggregate result). */
class PropertySpec extends SparkSpec {

  private def holds(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("wrap: no line exceeds width unless a single word does; words preserved") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val text = Gen.listOf(word).map(_.mkString(" "))
    holds(Prop.forAll(text, Gen.choose(3, 30)) { (t, w) =>
      val lines = ScalarExtras.wrap(t, w)
      lines.forall(l => l.length <= w || !l.contains(" ")) &&
        lines.flatMap(_.split(" ")).filter(_.nonEmpty) ==
          t.split("\\s+").filter(_.nonEmpty).toSeq
    })
  }

  test("ordinal: valid suffix, preserves the number, 11-13 are th") {
    holds(Prop.forAll(Gen.choose(1, 10000)) { n =>
      val o = Profile.ordinal(n)
      o.startsWith(n.toString) &&
        Seq("st", "nd", "rd", "th").contains(o.drop(n.toString.length)) &&
        (!(n % 100 >= 11 && n % 100 <= 13) || o.endsWith("th"))
    })
  }

  test("truncateLabel: bounded length, identity under the bound") {
    holds(Prop.forAll(Gen.alphaStr, Gen.choose(1, 60)) { (s, n) =>
      val t = ScalarExtras.truncateLabel(s, n)
      t.length <= n + 3 && (s.length > n || t == s)
    })
  }

  test("yaml map parse: round-trips flat string pairs") {
    val key = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val value = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    holds(Prop.forAll(Gen.mapOf(Gen.zip(key, value))) { m =>
      val text = m.map { case (k, v) => s"$k: $v" }.mkString("\n")
      graft.lifecycle.Agents.parseYamlMap(text) == m
    }, n = 50)
  }

  test("session-store eviction: retained window never exceeds 2*max-1") {
    val store = new graft.lifecycle.SessionStore(
      java.nio.file.Paths.get("target/test_sessions_prop"))
    holds(Prop.forAll(Gen.choose(1, 40)) { n =>
      val tid = s"t$n"
      (1 to n).foreach { i =>
        store.append(tid, "user", s"q$i"); store.append(tid, "assistant", s"a$i")
      }
      store.messages(tid).length <= 2 * store.MaxConversations - 1
    }, n = 30)
  }

  test("TTL roundtrip: generated ontologies parse back structure-identical") {
    val name = for {
      h <- Gen.alphaUpperChar
      t <- Gen.listOfN(5, Gen.alphaLowerChar)
    } yield (h :: t).mkString
    val label = Gen.option(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
    val klass = Gen.zip(name, label)
    val prop = for {
      n <- name.map(_.toLowerCase)
      l <- label
      d <- name; r <- name
      obj <- Gen.oneOf(true, false)
    } yield (n, l, d, r, obj)
    val onto = for {
      cs <- Gen.listOfN(3, klass)
      ps <- Gen.listOfN(3, prop)
      // distinct subject names — TTL statements about one subject merge
      if (cs.map(_._1) ++ ps.map(_._1)).distinct.size == 6
    } yield (cs, ps)
    holds(Prop.forAll(onto) { case (cs, ps) =>
      val ttl = "@prefix ex: <http://example.org/x#> .\n" +
        cs.map { case (n, l) =>
          s"ex:$n a owl:Class" +
            l.map(s => s" ;\n  rdfs:label \"$s\"").getOrElse("") + " ."
        }.mkString("\n") + "\n" +
        ps.map { case (n, l, d, r, obj) =>
          val kind = if (obj) "ObjectProperty" else "DatatypeProperty"
          s"ex:$n a owl:$kind" +
            l.map(s => s" ;\n  rdfs:label \"$s\"").getOrElse("") +
            s" ;\n  rdfs:domain ex:$d ;\n  rdfs:range ex:$r ."
        }.mkString("\n")
      graft.lifecycle.Ontology.parseTtl(ttl) match {
        case Right(parsed) =>
          parsed.classes.map(c => (c.name, c.label)) == cs &&
            parsed.properties.map(p =>
              (p.name, p.label, p.domain.get, p.range.get, p.objectProperty)) == ps
        case Left(_) => false
      }
    }, n = 50)
  }

  test("cosine similarity bounded in [-1,1] and 1 on self for random vectors") {
    graft.functions.CosineSimilarity.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = Seq.tabulate(200) { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    }.toDF("i", "v")
    val stats = vecs.as("a").crossJoin(vecs.as("b")).limit(5000)
      .select(expr("cosine_sim(a.v, b.v)").as("s"))
      .agg(min("s"), max("s")).collect()(0)
    assert(stats.getDouble(0) >= -1.0 - 1e-9 && stats.getDouble(1) <= 1.0 + 1e-9)
    val self = vecs.select(expr("cosine_sim(v, v)").as("s"))
      .agg(min("s")).collect()(0).getDouble(0)
    assert(self > 1.0 - 1e-9)
  }

  test("sq8: roundtrip within half a step, re-encode is an identity, " +
      "quantized cosine tracks exact — random signs and magnitudes") {
    graft.functions.Sq8.register(spark)
    graft.functions.CosineSimilarity.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // magnitudes spanning 1e-6..1e6, signs mixed, plus an all-zero vector
    val vecs = (Seq.tabulate(200) { i =>
      val rnd = new scala.util.Random(i)
      val mag = math.pow(10.0, rnd.nextInt(13) - 6)
      (i.toLong, Seq.fill(16)((rnd.nextDouble() * 2 - 1) * mag))
    } :+ ((200L, Seq.fill(16)(0.0)))).toDF("i", "v")
    val bad = vecs.select(col("v"),
        expr("sq8_decode(sq8_encode(v))").as("w"),
        expr("array_max(transform(v, x -> abs(x)))").as("scale"))
      .select(expr(
        "aggregate(zip_with(v, w, (a, b) -> abs(a - b)), 0D, " +
          "(acc, d) -> greatest(acc, d))").as("maxerr"), col("scale"))
      .filter(col("maxerr") > col("scale") / 254.0 + lit(1e-18)).count()
    assert(bad == 0, s"$bad vectors exceed the half-step roundtrip bound")
    // re-encode stability: the CODES are an identity (the max-abs element
    // always lands on ±127, so integer codes re-round to themselves); the
    // 8-byte scale header may shift one ulp ((127·s)/127 double-rounds),
    // which changes no decoded value beyond that ulp — so compare codes
    // exactly and scales relatively. (Nothing at rest depends on binary
    // identity: retrainIvfIndex preserves stored payloads verbatim.)
    val reenc = vecs.select(
        expr("substring(sq8_encode(sq8_decode(sq8_encode(v))), 9)").as("r2"),
        expr("substring(sq8_encode(v), 9)").as("r1"),
        expr("sq8_decode(sq8_encode(v))").as("w"), col("v")).collect()
    reenc.foreach { r =>
      assert(r.getAs[Array[Byte]](0).toSeq == r.getAs[Array[Byte]](1).toSeq,
        "codes changed on re-encode")
      val s1 = r.getSeq[Double](3).map(math.abs).max
      val s2 = r.getSeq[Double](2).map(math.abs).max
      assert(s1 == 0.0 && s2 == 0.0 ||
        math.abs(s2 - s1) <= math.ulp(s1), s"scale drifted: $s1 vs $s2")
    }
    // quantized-vs-exact cosine error small at uniform per-vector scale
    val probe = Seq.fill(16)(0.5)
    val worst = vecs.filter(col("i") =!= 200)
      .select(abs(expr(s"cosine_sim_q8(sq8_encode(v), " +
        s"array(${probe.map(_ + "D").mkString(",")})) - " +
        s"cosine_sim(v, array(${probe.map(_ + "D").mkString(",")}))")).as("d"))
      .agg(max("d")).collect()(0).getDouble(0)
    assert(worst < 0.03, s"worst quantized-cosine error $worst")
  }

  test("pq: codes stay below kc and ADC matches the driver-side LUT sum") {
    graft.functions.Pq.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val m = 4; val kc = 4; val dsub = 4
    val rnd = new scala.util.Random(7)
    val cb = Array.fill(m * kc * dsub)(rnd.nextDouble() * 2 - 1)
    val vecs = Seq.tabulate(100) { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Seq.fill(m * dsub)(r.nextDouble() * 2 - 1))
    }.toDF("i", "v")
    val q = Seq.fill(m * dsub)(0.3)
    val qnorm = math.sqrt(q.map(x => x * x).sum)
    val dotLut = new Array[Double](m * kc)
    val normLut = new Array[Double](m * kc)
    for (mi <- 0 until m; ki <- 0 until kc) {
      var dot = 0.0; var n2 = 0.0
      for (d <- 0 until dsub) {
        val c = cb((mi * kc + ki) * dsub + d)
        dot += q(mi * dsub + d) * c; n2 += c * c
      }
      dotLut(mi * kc + ki) = dot / qnorm; normLut(mi * kc + ki) = n2
    }
    val rows = vecs.select(col("i"),
        call_function("pq_encode", col("v"), typedLit(cb),
          lit(m), lit(kc)).as("code"))
      .select(col("i"), col("code"),
        call_function("pq_adc_sim", col("code"), typedLit(dotLut),
          typedLit(normLut), lit(kc)).as("adc"))
      .collect()
    rows.foreach { r =>
      val code = r.getAs[Array[Byte]](1)
      assert(code.length == m && code.forall(b => (b & 0xff) < kc), r.toString)
      // driver recomputation of the same ADC formula
      var dot = 0.0; var n2 = 0.0
      code.zipWithIndex.foreach { case (b, mi) =>
        dot += dotLut(mi * kc + (b & 0xff)); n2 += normLut(mi * kc + (b & 0xff))
      }
      val want = if (n2 == 0) 0.0 else dot / math.sqrt(n2)
      assert(math.abs(r.getDouble(2) - want) < 1e-12, s"adc mismatch: $r vs $want")
    }
  }
}
