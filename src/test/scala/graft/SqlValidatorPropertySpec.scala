package graft

import graft.plans.SqlValidator
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

/** Generative coverage for the security-load-bearing gate (round-13
  * verdict #4): [[SqlValidator]] replaces the reference's exec
  * sanitization, so a hole here is an escape, not a wrong number. The
  * generators build a mini-AST first and render SQL from it, so every
  * case carries its own ground truth — which relations it references
  * outside CTE scope, which functions it calls, whether anything denied
  * or unknown was planted — independent of the validator's own walk.
  *
  * Properties:
  *  1. accepted ⇒ clean: a query that validates carries NO unknown
  *     relation, NO denied builtin, NO non-allow-listed function — and a
  *     clean query is never falsely rejected (the generators emit only
  *     parseable SQL).
  *  2. accepted ⇒ faithful report: `Validated.relations` equals the
  *     ground-truth out-of-scope relation set, and every planted function
  *     appears in `Validated.functions`.
  *  3. write-shaped statements (INSERT/CREATE/DROP/UPDATE/DELETE/SET/
  *     CACHE/EXECUTE IMMEDIATE/...) are rejected for every generated
  *     payload, wherever the payload query itself would validate.
  */
class SqlValidatorPropertySpec extends SparkSpec {

  private val Allowed = Set("lineitem", "orders", "documents")
  private val BadRels = Seq("secrets", "etl_tmp", "staging9")
  private val ExtraFns = Set("cosine_sim")

  /** One generated query: its SQL, the relations it references outside
    * any CTE scope, the function names it calls, and whether anything
    * denied/unknown was planted (the expected-rejection bit). */
  private final case class Q(sql: String, rels: Set[String],
      fns: Set[String], dirty: Boolean)

  // --- expression generators -------------------------------------------
  // each yields (exprSql, fnNames, dirty)
  private val cleanScalar: Gen[(String, Set[String], Boolean)] = Gen.oneOf(
    ("abs(-3)", Set("abs"), false),
    ("upper('ab')", Set("upper"), false),
    ("length('xyz')", Set("length"), false),
    ("coalesce(1, 2)", Set("coalesce"), false),
    ("concat('a', 'b')", Set("concat"), false),
    ("cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))",
      Set("cosine_sim", "array"), false),
    ("1 + 2", Set.empty[String], false))
  private val deniedScalar: Gen[(String, Set[String], Boolean)] = Gen.oneOf(
    ("reflect('java.lang.System', 'getenv')", Set("reflect"), true),
    ("java_method('java.lang.System', 'getenv')", Set("java_method"), true),
    // paren-less bareword forms the analyzer would resolve post-hoc
    ("current_user", Set.empty[String], true),
    ("session_user", Set.empty[String], true),
    ("input_file_name()", Set("input_file_name"), true))
  private val unknownScalar: Gen[(String, Set[String], Boolean)] = Gen.oneOf(
    ("load_secrets(1)", Set("load_secrets"), true),
    ("exfiltrate('x')", Set("exfiltrate"), true))
  private def scalar(dirtyBias: Int): Gen[(String, Set[String], Boolean)] =
    if (dirtyBias <= 0) cleanScalar
    else Gen.frequency(10 -> cleanScalar, dirtyBias -> deniedScalar,
      dirtyBias -> unknownScalar)

  // --- relation generators ----------------------------------------------
  // (relSql, out-of-scope ground truth, dirty) given the CTE names in scope
  private def relation(scope: Set[String]): Gen[(String, Set[String], Boolean)] =
    Gen.frequency(
      6 -> Gen.oneOf(Allowed.toSeq).map(r => (r, Set(r), false)),
      2 -> Gen.oneOf(scope.toSeq :+ "zzz_never").map { r =>
        if (r == "zzz_never") ("lineitem", Set("lineitem"), false)
        else (r, Set.empty[String], false) // in-scope CTE: exempt
      },
      // a "bad" name that is ALSO an in-scope CTE alias is a legitimate
      // scoped reference (the shadow case) — clean, contributes nothing
      2 -> Gen.oneOf(BadRels).map { r =>
        if (scope.contains(r)) (r, Set.empty[String], false)
        else (r, Set(r), true)
      })

  // --- query generator ---------------------------------------------------
  private def query(depth: Int, scope: Set[String], dirtyBias: Int): Gen[Q] = {
    val leaf: Gen[Q] = for {
      (e, efns, edirty) <- scalar(dirtyBias)
      (r, rels, rdirty) <- relation(scope)
      agg <- Gen.oneOf(true, false)
    } yield
      if (agg) Q(s"SELECT sum(1) AS s, $e AS x FROM $r GROUP BY $e",
        rels, efns + "sum", edirty || rdirty)
      else Q(s"SELECT $e AS x FROM $r", rels, efns, edirty || rdirty)
    val values: Gen[Q] = scalar(dirtyBias).map { case (e, efns, ed) =>
      Q(s"SELECT $e AS x FROM VALUES (1), (2) t(v)", Set.empty, efns, ed)
    }
    if (depth <= 0) Gen.oneOf(leaf, values)
    else {
      val sub = Gen.lzy(query(depth - 1, scope, dirtyBias))
      val fromSubquery = sub.map(q =>
        Q(s"SELECT x FROM (${q.sql}) sq", q.rels, q.fns, q.dirty))
      val scalarSubquery = for {
        q <- sub; (r, rels, rd) <- relation(scope)
      } yield Q(s"SELECT (SELECT max(x) FROM (${q.sql}) i) AS m FROM $r",
        q.rels ++ rels, q.fns + "max", q.dirty || rd)
      val existsSubquery = for {
        q <- sub; (r, rels, rd) <- relation(scope)
      } yield Q(
        s"SELECT 1 AS one FROM $r WHERE EXISTS (SELECT 1 FROM (${q.sql}) i)",
        q.rels ++ rels, q.fns, q.dirty || rd)
      val inSubquery = for {
        q <- sub; (r, rels, rd) <- relation(scope)
      } yield Q(
        s"SELECT 1 AS one FROM $r WHERE 1 IN (SELECT x FROM (${q.sql}) i)",
        q.rels ++ rels, q.fns, q.dirty || rd)
      val lateral = for {
        q <- sub; (r, rels, rd) <- relation(scope)
      } yield Q(s"SELECT x FROM $r, LATERAL (${q.sql}) l",
        q.rels ++ rels, q.fns, q.dirty || rd)
      val union = for { a <- sub; b <- sub } yield
        Q(s"(${a.sql}) UNION ALL (${b.sql})",
          a.rels ++ b.rels, a.fns ++ b.fns, a.dirty || b.dirty)
      val cte = for {
        name <- Gen.oneOf("cte_a", "cte_b", "secrets") // 'secrets' = shadow case
        defn <- Gen.lzy(query(depth - 1, scope, dirtyBias))
        body <- Gen.lzy(query(depth - 1, scope + name, dirtyBias))
      } yield {
        // a body that is ITSELF a WITH query cannot follow this clause
        // directly — `WITH a AS (...) WITH b AS (...) SELECT` does not
        // parse (generator bug found by a full-suite run, round 14: the
        // composed "clean" query was a parse error). Nest such a body in a
        // FROM subquery instead; the outer CTE stays in scope inside it
        // and SELECT * adds no functions or relations.
        val bodySql =
          if (body.sql.startsWith("WITH ")) s"SELECT * FROM (${body.sql}) w"
          else body.sql
        Q(s"WITH $name AS (${defn.sql}) $bodySql",
          defn.rels ++ body.rels, defn.fns ++ body.fns,
          defn.dirty || body.dirty)
      }
      Gen.frequency(3 -> leaf, 1 -> values, 2 -> fromSubquery,
        2 -> scalarSubquery, 1 -> existsSubquery, 1 -> inSubquery,
        1 -> lateral, 1 -> union, 2 -> cte)
    }
  }

  private def holds(p: Prop, n: Int = 200): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("property: accepted ⇔ clean, and the report is faithful " +
      "(relations exact, planted functions all collected)") {
    holds(Prop.forAll(query(3, Set.empty, 4)) { q =>
      SqlValidator.validate(spark, q.sql, Allowed, ExtraFns) match {
        case Right(v) =>
          // 1. nothing dirty slipped through
          (!q.dirty) :| s"accepted a dirty query: ${q.sql}" &&
          // 2. faithful relation report (exact) + function superset
          (v.relations == q.rels) :|
            s"relations ${v.relations} != ${q.rels} for: ${q.sql}" &&
          q.fns.subsetOf(v.functions) :|
            s"functions ${v.functions} missing some of ${q.fns}: ${q.sql}"
        case Left(err) =>
          // a clean generated query must never be falsely rejected
          q.dirty :| s"rejected a clean query: ${q.sql} -- $err"
      }
    })
  }

  test("property: write-shaped statements are rejected for every payload") {
    val payload = query(2, Set.empty, 0).map(_.sql)
    val stmt = for {
      p <- payload
      rel <- Gen.oneOf(Allowed.toSeq ++ BadRels)
      s <- Gen.oneOf(
        s"INSERT INTO $rel $p",
        s"INSERT OVERWRITE TABLE $rel $p",
        s"CREATE TABLE $rel AS $p",
        s"CREATE OR REPLACE VIEW v_$rel AS $p",
        s"CREATE TEMPORARY VIEW tv_$rel AS $p",
        s"DROP TABLE $rel",
        s"DELETE FROM $rel WHERE 1 = 1",
        s"UPDATE $rel SET x = 1",
        s"TRUNCATE TABLE $rel",
        s"ALTER TABLE $rel ADD COLUMNS (zz INT)",
        s"CACHE TABLE ct_$rel AS $p",
        s"REFRESH TABLE $rel",
        s"ANALYZE TABLE $rel COMPUTE STATISTICS",
        s"SET spark.sql.shuffle.partitions=1",
        s"EXECUTE IMMEDIATE 'SELECT 1'")
    } yield s
    holds(Prop.forAll(stmt) { s =>
      SqlValidator.validate(spark, s, Allowed, ExtraFns).isLeft :|
        s"accepted write-shaped: $s"
    })
  }
}
