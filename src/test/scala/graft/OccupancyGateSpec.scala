package graft

/** The sweep scripts' occupancy gate must PASS the healthy operating point
  * and FAIL a perturbed one — the verdict's "negative test of the assert
  * itself": a gate that can't fire is not a gate. */
class OccupancyGateSpec extends SparkSpec {

  private lazy val e = operators.VectorOps.vecsCheckpointed(spark, sf)

  test("healthy auto point passes the gate on the fixture") {
    val st = OccupancyGate.stats(e, bands = 4)
    val r = OccupancyGate.check(st, bands = 4, capPerN = 500L)
    info(r.merge)
    assert(r.isRight, r.merge)
  }

  test("perturbed blocking (planes=1: two buckets per band) fails the " +
      "candidates check loudly") {
    // candidates ≈ n²/4 per band at planes=1 — the quadratic regime the
    // gate exists to catch (the r15 entropy collapse had this shape).
    // sf0.1 (n=2000): n²/4 × 4 bands ≈ 4e6 ≫ 500·n = 1e6, so the STANDARD
    // cap fires; the sf0.001 fixture is too small for quadratic to exceed
    // a linear budget (n²/4 < 500·n below n = 2000)
    val big = operators.VectorOps.vecsCheckpointed(spark, "/root/testdata/sf0.1")
    val st = OccupancyGate.stats(big, bands = 4, planesIn = 1)
    val r = OccupancyGate.check(st, bands = 4, capPerN = 500L)
    assert(r.isLeft, s"gate passed a quadratic configuration: $st")
    assert(r.left.exists(_.contains("candidates")), r.merge)
  }

  test("hot-bucket signature fails the occupancy envelope even when " +
      "totals look linear") {
    val st = OccupancyGate.Stats(n = 2000000L, planes = 14,
      buckets = 60000L, maxOcc = 90000L, candidates = 100L * 2000000L)
    val r = OccupancyGate.check(st, bands = 4, capPerN = 500L)
    assert(r.isLeft && r.left.exists(_.contains("occupancy")), r.merge)
  }
}
