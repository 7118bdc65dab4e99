package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** C121 label_propagation: synchronous LPA with deterministic
  * plurality/tie semantics, checked on closed-form graphs where the
  * community structure is known.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], undirected: Seq[(Long, Long)],
                  iters: Int): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    try Graph.labelPropagation(n, e, "id", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally graft.util.CacheRegistry.releaseAll()
  }

  test("two triangles joined by a bridge stay two communities (CC would merge them)") {
    // 1-2-3 triangle, 4-5-6 triangle, bridge 3-4: each triangle's
    // plurality pulls to its own min id; the single bridge edge is
    // outvoted on both ends
    val got = run(Seq(1L, 2L, 3L, 4L, 5L, 6L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)),
      iters = 4)
    assert(got(1L) == got(2L) && got(2L) == got(3L), s"left triangle split: $got")
    assert(got(4L) == got(5L) && got(5L) == got(6L), s"right triangle split: $got")
    assert(got(1L) != got(4L), s"bridge merged the triangles: $got")
  }

  test("isolated node keeps its own label; ties break to the smallest label") {
    // star 1-2, 1-3 plus isolated 9: after round 1, node 1's neighbors
    // are {2, 3} (tie -> 2); nodes 2 and 3 adopt 1
    val got = run(Seq(1L, 2L, 3L, 9L), Seq((1L, 2L), (1L, 3L)), iters = 1)
    assert(got(9L) == 9L, s"isolated node must keep its label: $got")
    assert(got(1L) == 2L && got(2L) == 1L && got(3L) == 1L, s"got $got")
  }

  test("fixed-iteration synchronous semantics are deterministic across reruns") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L), (2L, 5L))
    val a = run(1L to 5L, edges, iters = 3)
    val b = run(1L to 5L, edges, iters = 3)
    assert(a == b)
  }
}
