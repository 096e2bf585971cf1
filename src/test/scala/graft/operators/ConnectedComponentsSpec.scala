package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("label propagation finds min-id components, isolated vertices keep their id") {
    val vertices = (1L to 8L).toDF("id")
    // components: {1,2,3,4} (chain), {5,6} — 7 and 8 isolated
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L)).toDF("a", "b")
    val out = ConnectedComponents.components(spark, vertices, edges, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("a long chain converges within the diameter bound") {
    val n = 12L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val out = ConnectedComponents.components(spark, vertices, edges, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(1L))
  }
}
