package graft

/** The multiset digest is what makes IndependentVerify's "expected ==
  * actual" claims meaningful at 400M-row scale — pin its two load-bearing
  * properties: order independence (so no sort is ever needed) and
  * sensitivity (a single changed/missing/duplicated row changes the
  * digest, so agreement is evidence, not coincidence). */
class IndependentVerifySpec extends SparkSpec {
  import IndependentVerify.Digest

  private def digestOf(rows: Seq[String]): Digest = {
    val d = new Digest
    rows.foreach(d.add)
    d
  }

  test("digest: order-independent over permutations, merge-associative") {
    val rows = (1 to 500).map(i => s"row-$i|${i * 3.14}|${i % 7 == 0}")
    val a = digestOf(rows)
    val b = digestOf(scala.util.Random.shuffle(rows))
    assert(a.same(b))
    // split + merge equals the whole
    val (l, r) = rows.splitAt(137)
    assert(digestOf(l).merge(digestOf(r)).same(a))
  }

  test("digest: sensitive to a changed, missing, or duplicated row") {
    val rows = (1 to 100).map(i => s"r$i")
    val base = digestOf(rows)
    assert(!digestOf(rows.updated(42, "r43 ")).same(base)) // one row changed
    assert(!digestOf(rows.drop(1)).same(base))             // one row missing
    assert(!digestOf(rows :+ rows.head).same(base))        // one duplicated
    // a swap of two DIFFERENT rows' contents still detected (sum of
    // per-row folds is content-based, not position-based — swapping
    // contents between positions is a no-op to a multiset, so equal)
    assert(digestOf(rows.updated(1, rows(2)).updated(2, rows(1))).same(base))
  }
}
