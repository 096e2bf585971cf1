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

  test("edge endpoints absent from vertices still conduct connectivity") {
    // 2 and 4 are connected only THROUGH absent vertex 1: dropping its
    // propagation row would leave them in separate components
    val vertices = Seq(2L, 4L, 9L).toDF("id")
    val edges = Seq((2L, 1L), (1L, 4L)).toDF("a", "b")
    val out = ConnectedComponents.components(spark, vertices, edges, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    // min REACHABLE id labels the component even when absent from vertices;
    // absent ids emit no output row of their own
    assert(out === Map(2L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("pointer jumping converges a chain in ~log2(diameter) rounds") {
    val n = 64L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    // localEdgeLimit=0 forces the distributed iteration — this test pins
    // the ROUNDS behavior, which the local union-find fallback bypasses
    val (out, rounds) = ConnectedComponents.componentsAndRounds(
      spark, vertices, edges, "id", "a", "b", localEdgeLimit = 0)
    assert(out.as[(Long, Long)].collect().toMap.values.toSet === Set(1L))
    // diameter 63: plain propagation needs 63 rounds; each jump round at
    // least doubles reach, so log2(63)≈6 plus slack for the convergence scan
    assert(rounds > 0 && rounds <= 9, s"expected ~log2 rounds, took $rounds")
    // and without the jump it degrades to the diameter (sanity check the
    // rounds counter itself)
    val (_, plainRounds) = ConnectedComponents.componentsAndRounds(
      spark, vertices, edges, "id", "a", "b", maxIter = 70,
      pointerJump = false, localEdgeLimit = 0)
    assert(plainRounds > rounds)
  }

  test("local union-find fallback: identical labels, zero rounds, crossover at the limit") {
    val vertices = (1L to 8L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L)).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L)
    // under the limit: the local path serves the call (rounds == 0)
    val (local, lr) = ConnectedComponents.componentsAndRounds(
      spark, vertices, edges, "id", "a", "b", localEdgeLimit = 100)
    assert(lr === 0)
    assert(local.as[(Long, Long)].collect().toMap === expected)
    // over the limit: falls through to the distributed iteration (rounds
    // > 0) with the identical result
    val (dist, dr) = ConnectedComponents.componentsAndRounds(
      spark, vertices, edges, "id", "a", "b", localEdgeLimit = 2)
    assert(dr > 0)
    assert(dist.as[(Long, Long)].collect().toMap === expected)
  }

  test("local fallback: null endpoints conduct nothing, as in the distributed path") {
    val vertices = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((Some(1L), Some(2L)), (Some(3L), None), (None, None))
      .toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
    val local = ConnectedComponents.components(spark, vertices, edges,
      "id", "a", "b").as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.components(spark, vertices, edges,
      "id", "a", "b", localEdgeLimit = 0).as[(Long, Long)].collect().toMap
    assert(local === expected)
    assert(dist === expected)
  }

  test("reliable checkpointing produces identical components") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt_").toString
    val vertices = (1L to 8L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L)).toDF("a", "b")
    val out = ConnectedComponents.components(spark, vertices, edges, "id", "a", "b",
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
    // rounds actually hit the reliable checkpoint dir
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("reliable mode reclaims scratch rounds and returns labels at a stable path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_labels_").toString
    val vertices = (1L to 4L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val out = ConnectedComponents.components(spark, vertices, edges, "id", "a", "b",
      checkpointDir = Some(dir))
    assert(out.count() === 4L)
    val runDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cc-"))
    assert(runDirs.length === 1)
    // every intermediate step-N dir is reclaimed; only the documented
    // caller-owned labels dir remains, and the result reads from it
    assert(runDirs.head.listFiles().map(_.getName).toSet === Set("labels"))
    assert(out.inputFiles.nonEmpty && out.inputFiles.forall(_.contains("/labels/")))
  }

  test("reliable mode never touches the context-global checkpoint dir") {
    val callers = java.nio.file.Files.createTempDirectory("graft_cc_callers_").toString
    spark.sparkContext.setCheckpointDir(callers)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_cc_mine_").toString
      val vertices = (1L to 4L).toDF("id")
      val edges = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
      ConnectedComponents.components(spark, vertices, edges, "id", "a", "b",
        checkpointDir = Some(dir)).collect()
      // the caller's configured dir is untouched — CC materializes rounds
      // under its own per-run subdir, not via the context-global mechanism
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
        new java.io.File(callers).getName)))
      assert(new java.io.File(callers).listFiles().forall(_.listFiles().isEmpty))
    } finally {
      // other suites don't expect a checkpoint dir; the context-global
      // setting has no unset API, so leave the empty dir in place
    }
  }
}
