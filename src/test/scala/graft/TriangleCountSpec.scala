package graft

/** Hand-checkable graphs for the degree-oriented triangle count
  * (`DedupQueries.triangleCount`): a K4 clique (4 triangles), a hub star
  * (high-degree center, 0 triangles — exercises the orientation making
  * the hub everyone's DST so no wedge enumerates its neighborhood), a
  * chain (0), and a triangle sharing an edge with the clique (counted
  * once per distinct vertex set). The sf corpus only yields 1 natural
  * triangle, so this spec is where the counting logic is actually
  * stressed.
  */
class TriangleCountSpec extends SparkSpec {
  import SharedSpark.spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = graft.queries.DedupQueries
      .triangleCount(edges.toDF("doc_a", "doc_b"))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("K4 clique has exactly 4 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(k4) === ((6L, 4L)))
  }

  test("hub star and chain are triangle-free") {
    val star = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L))
    assert(count(star) === ((5L, 0L)))
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(count(chain) === ((4L, 0L)))
  }

  test("triangle attached to K4 by a shared edge adds exactly one") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    // {3, 4, 9} shares edge (3, 4) with the clique
    val g = k4 ++ Seq((3L, 9L), (4L, 9L))
    assert(count(g) === ((8L, 5L)))
  }
}
