package graft

/** Specs for [[sim.Pca]] (power-iteration top component) and
  * [[sim.Eval]] (ANN recall harness).
  */
class PcaEvalSpec extends SparkSpec {
  import spark.implicits._

  test("embed_pca_power: unit loadings that match an independent driver eigensolve") {
    val out = sim.Pca.pcaPower(spark, sf).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("loading"),
        r.getAs[Double]("pc_var")))
      .sortBy(_._1)
    assert(out.length == sim.Pca.Dim)
    val loadings = out.map(_._2)
    val norm2 = loadings.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"loadings not unit: $norm2")
    assert(out.forall(_._3 > 0.0))
    // independent check: plain-double power iteration on the collected
    // vectors, SAME iteration count — verifies the distributed
    // exact-grid matvec computes the algorithm it claims (the fixture
    // embeddings are near-isotropic, lambda2/lambda1 ~ 0.99, so no
    // iteration count "converges"; the operator contract is exactly
    // PowerIters deterministic rounds)
    val vecs = Tables.embeddings(spark, sf)
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    val dim = sim.Pca.Dim
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val c = vecs.map(v => Array.tabulate(dim)(i => v(i) - mean(i)))
    def variance(w: Array[Double]): Double =
      c.map { row =>
        var t = 0.0
        var i = 0
        while (i < dim) { t += row(i) * w(i); i += 1 }
        t * t
      }.sum / (n - 1)
    var w = Array.fill(dim)(1.0 / 8)
    val v0 = w
    for (_ <- 1 to sim.Pca.PowerIters) {
      val s = Array.fill(dim)(0.0)
      for (row <- c) {
        var t = 0.0
        var i = 0
        while (i < dim) { t += row(i) * w(i); i += 1 }
        i = 0
        while (i < dim) { s(i) += row(i) * t; i += 1 }
      }
      val nrm = math.sqrt(s.map(x => x * x).sum)
      w = s.map(_ / nrm)
    }
    val cos = loadings.zip(w).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.9999,
      s"operator diverged from same-count reference iteration: cos=$cos")
    // power iteration must increase captured variance over the start
    assert(variance(loadings) > variance(v0),
      "Rayleigh quotient did not grow over the uniform start")
  }

  test("embed_pca_residuals: Pythagoras closes against the centered norms") {
    val res = sim.Pca.pcaResiduals(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Double]("proj"), r.getAs[Double]("resid_norm"))).toSeq
    val n = Tables.embeddings(spark, sf).count()
    assert(res.length == n)
    // centered squared norms recomputed independently
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = sim.Pca.Dim
    val mean = Array.tabulate(dim)(i =>
      vecs.values.map(_(i)).sum / vecs.size)
    for ((id, proj, resid) <- res) {
      assert(resid >= 0.0)
      val c = vecs(id).zip(mean).map { case (a, b) => a - b }
      val cc = c.map(x => x * x).sum
      assert(math.abs(proj * proj + resid * resid - cc) < 1e-2,
        s"vec $id: proj^2+resid^2=${proj * proj + resid * resid} vs cc=$cc")
    }
  }

  test("embed_silhouette: totals close, scores bounded, separated clusters score high") {
    val rows = sim.Similarity.silhouetteEval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == total, "every vector lands in exactly one cell")
    rows.foreach { case (cell, n, s) =>
      assert(n > 0 && s >= -1.0 && s <= 1.0, s"cell $cell: n=$n sil=$s")
    }
    // planted over-clustering: two true balls under a 64-cell quantizer —
    // every ball shatters into micro-cells whose nearest OTHER centroid
    // sits in the same ball, so the score must report ~0 (the "k too
    // large" diagnostic this eval exists to give), never spuriously high
    val tmp = java.nio.file.Files.createTempDirectory("graftsil")
    val rnd = new scala.util.Random(3)
    val planted = (0 until 200).map { i =>
      val base = if (i % 2 == 0) 100.0f else -100.0f
      (i.toLong,
        Array.fill(64)(base + rnd.nextFloat() * 0.01f), i % 2)
    }
    planted.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val sep = sim.Similarity.silhouetteEval(spark, tmp.toString).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(sep.map(_._1).sum == 200)
    val weighted = sep.map { case (n, s) => n * s }.sum / 200.0
    assert(weighted < 0.5, s"over-clustered corpus scored $weighted — " +
      "centroid silhouette failed to flag k >> true clusters")
    sep.foreach { case (n, s) => assert(s >= -1.0 && s <= 1.0, s"($n, $s)") }
  }

  test("embed_recall_eval: complete per-(query, method) grid with recalls in [0,1]") {
    val rows = sim.Eval.recallEval(spark, sf).collect()
    assert(rows.length == 2 * sim.Similarity.NumQueries)
    val keys = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[String]("method"))).toSet
    assert(keys.size == rows.length)
    assert(keys.map(_._2) == Set("lsh", "ivf"))
    for (r <- rows) {
      val hits = r.getAs[Long]("hits")
      val rec = r.getAs[Double]("recall_at_k")
      assert(hits >= 0 && hits <= sim.Similarity.K)
      assert(rec == hits.toDouble / sim.Similarity.K)
    }
  }
}
