package graft.operators

/** Seeded, deterministic k-means for DRIVER-SIDE training on bounded
  * samples (PQ codebooks, IVF coarse centroids). The sample is bounded by
  * construction (`Ivf.boundedSample`), so fitting is plain driver math —
  * no per-fit distributed job round-trips, no MLlib session warmup.
  * k-means++ (D²-weighted) seeding, Lloyd iterations, first-index
  * tie-breaks, empty clusters keep their previous center.
  */
private[operators] object Lloyd {

  def fit(pts: Array[Array[Double]], k: Int, iters: Int,
          seed: Long): Array[Array[Double]] = {
    require(pts.nonEmpty, "cannot fit k-means on an empty sample")
    val d = pts.head.length
    val rnd = new scala.util.Random(seed)

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val diff = a(i) - b(i); s += diff * diff; i += 1 }
      s
    }

    // k-means++ seeding: first center uniform, then D²-weighted picks
    val centers = new Array[Array[Double]](k)
    centers(0) = pts(rnd.nextInt(pts.length)).clone()
    val minD = pts.map(p => dist2(p, centers(0)))
    var c = 1
    while (c < k) {
      val total = minD.sum
      val pick =
        if (total <= 0.0) rnd.nextInt(pts.length) // degenerate: all covered
        else {
          var r = rnd.nextDouble() * total; var i = 0
          while (i < pts.length - 1 && r > minD(i)) { r -= minD(i); i += 1 }
          i
        }
      centers(c) = pts(pick).clone()
      var i = 0
      while (i < pts.length) {
        val dd = dist2(pts(i), centers(c))
        if (dd < minD(i)) minD(i) = dd
        i += 1
      }
      c += 1
    }

    val assign = new Array[Int](pts.length)
    for (_ <- 0 until iters) {
      var p = 0
      while (p < pts.length) {
        var best = 0; var bestD = Double.MaxValue; var ci = 0
        while (ci < k) {
          val dd = dist2(pts(p), centers(ci))
          if (dd < bestD) { bestD = dd; best = ci }
          ci += 1
        }
        assign(p) = best; p += 1
      }
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      p = 0
      while (p < pts.length) {
        val ci = assign(p); counts(ci) += 1
        var i = 0
        while (i < d) { sums(ci)(i) += pts(p)(i); i += 1 }
        p += 1
      }
      var ci = 0
      while (ci < k) {
        if (counts(ci) > 0) {
          var i = 0
          while (i < d) { centers(ci)(i) = sums(ci)(i) / counts(ci); i += 1 }
        }
        ci += 1
      }
    }
    centers
  }
}
