package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{DedupOps, GraphOps}

/** Connected components (large-star/small-star) — correctness against a
  * driver-side union-find reference, transitivity through missing edges,
  * plan shape (hash joins only), and the dd7 pipeline end-to-end. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(nodes.toDF("id"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find, the independent reference implementation. */
  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def root(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (root(a), root(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> root(n)).toMap
  }

  test("chain: component only reachable transitively resolves to the min") {
    // 3's only edge is to 2; reaching 1 requires transitivity
    assert(cc(Seq(1L, 2L, 3L, 9L), Seq((2L, 3L), (1L, 2L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("long path, two components, duplicate/reversed/self edges") {
    val path = (1L to 40L).sliding(2).map(w => (w(1), w(0))).toSeq // reversed
    val other = Seq((100L, 101L), (101L, 102L), (100L, 102L), (102L, 102L))
    val got = cc((1L to 40L) ++ Seq(100L, 101L, 102L, 200L),
      path ++ other ++ path.map(_.swap))
    assert((1L to 40L).forall(got(_) == 1L))
    assert(Seq(100L, 101L, 102L).forall(got(_) == 100L))
    assert(got(200L) == 200L)
  }

  test("random graphs: local and distributed paths both match union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 80
      val nodes = (0L until n).map(i => i * 13 + trial) // non-contiguous ids
      val edges = Seq.fill(70)((nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n))))
      val expected = unionFind(nodes, edges)
      assert(cc(nodes, edges) == expected, s"trial $trial (local)")
      val dist = GraphOps.componentsDistributed(nodes.toDF("id"),
          canonicalize(edges))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == expected, s"trial $trial (distributed)")
    }
  }

  private def canonicalize(edges: Seq[(Long, Long)]) =
    edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct.toDF("a", "b")

  test("star rounds plan hash joins, never a cartesian/nested-loop") {
    val e = (1L to 200L).sliding(2).map(w => (w(0), w(1))).toSeq.toDF("a", "b")
    Seq(GraphOps.largeStar(e), GraphOps.smallStar(e)).foreach { out =>
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }

  test("non-convergence inside maxIter fails loudly (distributed path)") {
    val e = (1L to 600L).sliding(2).map(w => (w(0), w(1))).toSeq
    val ex = intercept[IllegalStateException] {
      GraphOps.componentsDistributed((1L to 600L).toDF("id"),
        canonicalize(e), maxIter = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("dd8 retention: exactly one keeper per component — the most complete member") {
    val rows = DedupOps.clusterRetention(spark, sf).collect()
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (c, rs) =>
      val keepers = rs.filter(_.getBoolean(3))
      assert(keepers.length == 1, s"component $c")
      val k = keepers.head
      assert(rs.forall(_.getLong(4) == k.getLong(0)), s"canonical of $c")
      // the keeper maximizes (n_words, then min doc_id)
      val best = rs.maxBy(r => (r.getInt(2), -r.getLong(0)))
      assert(k.getLong(0) == best.getLong(0), s"keep policy of $c")
    }
    assert(byComp.exists(_._2.length >= 2), "no multi-member cluster at this sf")
  }

  test("c1 funnel: survivors are kept, above the floor, inside their quota; plan is join-clean") {
    val out = DedupOps.curationFunnel(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val quota = Map("en" -> 60, "fr" -> 30).withDefaultValue(10)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.5, s"quality floor: $r")
      assert(r.getLong(5) < quota(r.getString(1)), s"mixture quota: $r")
    }
    // survivors are unique per component (dd8 keeps exactly one)
    val comps = rows.map(_.getLong(2))
    assert(comps.length == comps.distinct.length)
  }

  test("dd7 pipeline: matches union-find over its own kept edges; chains resolve transitively") {
    val comp = DedupOps.dupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: union-find over the pipeline's own edge set
    val edges = DedupOps.dupClusterEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(comp == unionFind(comp.keys.toSeq, edges))
    // the planted A-B-C chains where LSH found both hops must resolve C to
    // A's component purely transitively (the A-C edge is dropped by design)
    val es = edges.toSet
    val chains = comp.keys.filter(id => id < 100000 && id % 17 == 0).filter {
      id => es((id, id + 100000)) && es((id + 100000, id + 200000)) &&
        !es((id, id + 200000))
    }
    assert(chains.nonEmpty, "no fully-found planted chain at this sf")
    chains.foreach { id =>
      assert(comp(id + 100000) == comp(id) && comp(id + 200000) == comp(id),
        s"chain rooted at $id")
    }
  }
}
