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
}
