package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.componentsAdaptive]] contract: the driver union-find
  * (edge count under the cap) and the distributed star alternation
  * (over the cap, or cap forced to 0) produce IDENTICAL labels — every
  * node labeled by its component's minimum id — so the runtime choice
  * between them is invisible to callers. Exercised on adversarial
  * shapes: a long chain (diameter = n), near-cliques, an isolated
  * node, and self/duplicate edges. */
class AdaptiveComponentsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("local union-find matches the star alternation on adversarial shapes") {
    import spark.implicits._
    // chain 0-1-2-...-9 (diameter 9), clique {20..24}, pair {30,31},
    // duplicate + reversed edges, one isolated node 99
    val chain = (0L until 9L).map(i => (i, i + 1))
    val clique = for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)
    val extra = Seq((30L, 31L), (31L, 30L), (30L, 31L), (24L, 24L))
    val pairs = (chain ++ clique ++ extra).toDF("da", "db")
    val nodes = ((0L to 9L) ++ (20L to 24L) ++ Seq(30L, 31L, 99L))
      .toDF("doc_id")
    val local = labelsOf(Dedup.componentsAdaptive(nodes, pairs))
    val dist = graft.Conf.withConf(spark,
        "spark.graft.dedup.localSolveMaxEdges", "0") {
      labelsOf(Dedup.componentsAdaptive(nodes, pairs))
    }
    assert(local == dist, "local vs distributed label mismatch")
    // spot-check the fixpoint semantics themselves
    val byNode = local.toMap
    assert((0L to 9L).forall(byNode(_) == 0L), "chain must root at 0")
    assert((20L to 24L).forall(byNode(_) == 20L), "clique must root at 20")
    assert(byNode(30L) == 30L && byNode(31L) == 30L)
    assert(byNode(99L) == 99L, "isolated node labels itself")
  }

  test("random graphs: local and distributed solves agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 400L
    val pairs = Seq.fill(300)((rnd.nextLong(n), rnd.nextLong(n)))
      .toDF("da", "db")
    val nodes = (0L until n).toDF("doc_id")
    val local = labelsOf(Dedup.componentsAdaptive(nodes, pairs))
    val dist = graft.Conf.withConf(spark,
        "spark.graft.dedup.localSolveMaxEdges", "0") {
      labelsOf(Dedup.componentsAdaptive(nodes, pairs))
    }
    assert(local == dist)
    assert(local.size == n)
  }

  test("the default edge cap's driver footprint bound is <= 128 MB") {
    // Pins the documented arithmetic (SCALE.md / localSolveMaxEdges
    // scaladoc) to the SHIPPED constant so doc and code cannot drift:
    // capEdges edges touch <= 2*capEdges nodes; the open-addressing
    // parent map stores them in two long arrays (16 B/slot) at a
    // power-of-two capacity kept under 75% load, so worst-case bytes
    // = 16 * nextPow2(ceil(nodes / 0.75)).
    val capEdges = Dedup.localSolveMaxEdges(spark)
    assert(capEdges == 2000000L, s"cap drifted to $capEdges — update SCALE.md")
    val maxNodes = 2L * capEdges
    def nextPow2(x: Long): Long = java.lang.Long.highestOneBit(x - 1) * 2
    val slots = nextPow2(maxNodes * 4L / 3L + 1)
    val bytes = 16L * slots
    assert(bytes <= 128L * 1024 * 1024,
      s"driver union-find worst case $bytes B exceeds the documented 128 MB")
  }
}
