package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Hand-computed fixture graphs for the GraphOps kernels. The declared
  * queries' DuckDB oracles prove Spark ≡ DuckDB on the same arithmetic;
  * these fixtures prove the arithmetic IS the advertised algorithm —
  * PageRank mass flows where the power method says it should, and the
  * census counts the triangles a person can count by hand.
  */
class GraphOpsSpec extends AnyFunSuite with SparkFixture {

  test("scaled-integer PageRank on a 4-leaf star: hand-computed two-iteration ranks") {
    import spark.implicits._
    // center 1, leaves 2..5, isolated 6. All start at 1,000,000.
    // iter1: center = 150000 + 850·(4·1000000 div 1) div 1000 = 3,550,000
    //        leaf   = 150000 + 850·(1000000 div 4) div 1000  =   362,500
    // iter2: center = 150000 + 850·(4·362500) div 1000       = 1,382,500
    //        leaf   = 150000 + 850·(3550000 div 4) div 1000  =   904,375
    // isolated keeps teleport mass 150,000 from iter1 on.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("vec_id")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("vec_a", "vec_b")
    val ranks = GraphOps.rankOverPairs(nodes, pairs, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(1L) === 1382500L)
    Seq(2L, 3L, 4L, 5L).foreach(l => assert(ranks(l) === 904375L, s"leaf $l"))
    assert(ranks(6L) === 150000L, "isolated node keeps only the teleport mass")
  }

  test("triangle census on K4: 4 triangles, 12 wedges, closure 1.0") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("vec_a", "vec_b")
    val row = GraphOps.censusOverPairs(k4).collect().head
    assert(row.getLong(0) === 4L, "n_nodes")
    assert(row.getLong(1) === 6L, "n_edges")
    assert(row.getLong(2) === 12L, "n_wedges")
    assert(row.getLong(3) === 4L, "n_triangles")
    assert(row.getDouble(4) === 1.0, "closure ratio")
  }

  test("triangle census on a path: one wedge, zero triangles") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L)).toDF("vec_a", "vec_b")
    val row = GraphOps.censusOverPairs(path).collect().head
    assert(row.getLong(0) === 3L, "n_nodes touching an edge")
    assert(row.getLong(1) === 2L, "n_edges")
    assert(row.getLong(2) === 1L, "the center's single wedge")
    assert(row.getLong(3) === 0L, "no closing edge, no triangle")
    assert(row.getDouble(4) === 0.0, "closure ratio")
  }
}
