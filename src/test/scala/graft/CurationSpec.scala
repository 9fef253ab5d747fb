package graft

import graft.pipeline.Curation

/** Stratified sampling: the draw must track the fitted mixture rates
  * statistically AND be a pure per-document function (rerun-stable,
  * verdict-stable under corpus growth) — the properties that make it
  * safe to re-execute on a failed 100 TB stage.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratified_sample: kept fraction tracks the fitted rate per source") {
    val rates = Curation.mixtureRates(spark, sf)
      .select($"source", $"sample_rate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val totals = Tables.documents(spark, sf)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.stratifiedSample(spark, sf)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, n) <- totals if n >= 200) {
      val got = kept.getOrElse(src, 0L).toDouble / n
      val want = rates(src)
      // a 60-bit hash-uniform over n>=200 draws: generous 3-sigma-ish bar
      assert(math.abs(got - want) <= 0.1,
        s"$src kept $got vs rate $want over $n docs")
    }
  }

  test("stratified_sample verdicts are per-document pure: subsetting the corpus never flips them") {
    val full = Curation.stratifiedSample(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    // same rates applied to a half-corpus: every surviving doc's verdict
    // must match the full run (u is a pure function of doc_id; rates are
    // held fixed — the corpus-growth-stability property rand() loses)
    val rates = Curation.mixtureRates(spark, sf)
      .select($"source", $"sample_rate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val half = Tables.documents(spark, sf)
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"source").collect()
    for (r <- half.take(500)) {
      val id = r.getLong(0)
      val u = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
          .substring(0, 15), 16).toDouble / 1152921504606846976e0
      assert((u < rates(r.getString(1))) == full.contains(id),
        s"doc $id verdict drifted")
    }
  }

  test("quality classifier recovers the heuristic rule (accuracy > 0.9) without copying it") {
    val rows = graft.pipeline.Classifier.qualityClassifier(spark, sf).collect()
    assert(rows.nonEmpty)
    val acc = rows.count(r => r.getLong(3) == r.getLong(1)).toDouble / rows.length
    assert(acc > 0.9, s"classifier accuracy $acc")
    // the discriminant must be a real learned boundary, not the label
    // rule itself: both classes appear, and at least one doc disagrees
    // (nearest-centroid geometry != the 5*x2+50*x3 threshold)
    val preds = rows.map(_.getLong(3)).toSet
    assert(preds == Set(1L, -1L), s"degenerate predictions: $preds")
    assert(rows.exists(r => r.getLong(3) != r.getLong(1)),
      "suspiciously perfect: the scorer should differ from the label rule somewhere")
  }

  test("gated sample = mixture draw ∩ classifier acceptance, exactly") {
    val gated = graft.pipeline.Classifier.qualityGatedSample(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val drawn = Curation.stratifiedSample(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val accepted = graft.pipeline.Classifier.qualityClassifier(spark, sf)
      .filter($"pred" === 1L).select($"doc_id").as[Long].collect().toSet
    assert(gated == drawn.intersect(accepted))
    assert(gated.nonEmpty && gated.size < drawn.size,
      s"gate did nothing: ${gated.size} of ${drawn.size} drawn docs survived")
  }

  test("calibration bins partition the corpus and agree with the scorer") {
    val rows = graft.pipeline.Classifier.qualityCalibration(spark, sf).collect()
    val scored = graft.pipeline.Classifier.qualityClassifier(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == scored.length, "bins must partition all docs")
    assert(rows.map(_.getLong(0)).forall(b => b >= 0 && b <= 9))
    assert(rows.map(_.getLong(4)).sum ==
      scored.count(r => r.getLong(3) == r.getLong(1)),
      "per-bin correct counts must sum to global accuracy count")
  }

  test("pr_curve: recall monotone in threshold, counts tie out to the scorer") {
    val rows = graft.pipeline.Classifier.prCurve(spark, sf)
      .orderBy("j").collect()
    assert(rows.length == graft.pipeline.Classifier.PrSteps)
    val scored = graft.pipeline.Classifier.qualityClassifier(spark, sf).collect()
    val nPos = scored.count(_.getLong(1) == 1L)
    rows.foreach { r =>
      // tp + fn is the label-positive count at EVERY threshold
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == nPos)
      val (p, rec, f1) = (r.getAs[Double]("precision"),
        r.getAs[Double]("recall"), r.getAs[Double]("f1"))
      assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1 && f1 >= 0 && f1 <= 1)
    }
    // raising the threshold can only shrink the accepted set
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("tp") <= a.getAs[Long]("tp"))
      assert(b.getAs[Double]("recall") <= a.getAs[Double]("recall"))
      assert(b.getAs[Long]("tp") + b.getAs[Long]("fp") <=
        a.getAs[Long]("tp") + a.getAs[Long]("fp"))
    }
    // per-threshold counts replay exactly against the scored corpus
    rows.foreach { r =>
      val thr = r.getAs[Long]("thr")
      val tp = scored.count(s => s.getLong(2) >= thr && s.getLong(1) == 1L)
      val fp = scored.count(s => s.getLong(2) >= thr && s.getLong(1) == -1L)
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp)
    }
  }

  test("kappa == naive confusion-matrix recomputation, bounded by accuracy") {
    val r = graft.pipeline.Classifier.kappa(spark, sf).collect()(0)
    val scored = graft.pipeline.Classifier.qualityClassifier(spark, sf).collect()
      .map(s => (s.getLong(1), s.getLong(3)))
    val n = scored.length.toDouble
    val tp = scored.count { case (y, p) => y == 1 && p == 1 }
    val fp = scored.count { case (y, p) => y == -1 && p == 1 }
    val fn = scored.count { case (y, p) => y == 1 && p == -1 }
    val tn = scored.count { case (y, p) => y == -1 && p == -1 }
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((tp, fp, fn, tn)))
    val po = (tp + tn) / n
    val pe = ((tp + fp) / n) * ((tp + fn) / n) + ((fn + tn) / n) * ((fp + tn) / n)
    val want = BigDecimal((po - pe) / (1 - pe))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("kappa") == want)
    assert(r.getAs[Double]("kappa") > 0.5,
      "classifier should beat chance agreement decisively on the fixture")
  }

  test("isotonic calibration == naive minimax PAV, monotone, pooling where violated") {
    val rows = graft.pipeline.Classifier.isotonicCalibration(spark, sf)
      .orderBy("bin").collect()
    val bins = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive minimax over the same floored micro averages
    val micro = 1000000L
    val want = bins.indices.map { i =>
      bins.indices.filter(_ <= i).map { j =>
        bins.indices.filter(_ >= i).map { k =>
          val seg = bins.slice(j, k + 1)
          seg.map(_._3).sum * micro / seg.map(_._2).sum
        }.min
      }.max
    }
    assert(rows.map(_.getAs[Long]("iso_micro")).toSeq == want)
    // the fit is monotone nondecreasing even where raw rates are not
    val iso = rows.map(_.getAs[Long]("iso_micro"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // and each fitted value stays inside the observed rate envelope
    val rates = rows.map(_.getAs[Long]("rate_micro"))
    assert(iso.forall(v => v >= rates.min && v <= rates.max))
  }

  test("brier + ece == naive micro-integer recomputation over the scored corpus") {
    val r = graft.pipeline.Classifier.brierEce(spark, sf).collect()(0)
    val scored = graft.pipeline.Classifier.qualityClassifier(spark, sf)
      .collect().map(s => (s.getLong(1), s.getLong(2)))
    val (mn, mx) = (scored.map(_._2).min, scored.map(_._2).max)
    val w = BigInt(mx - mn + 1)
    val micro = BigInt(1000000)
    val enr = scored.map { case (y, s) =>
      val p = (BigInt(s - mn) * micro / w).toLong
      val bin = ((s - mn) * 10L) / (mx - mn + 1L)
      (bin, p, if (y == 1L) 1000000L else 0L)
    }
    val n = enr.length
    assert(r.getAs[Long]("n") == n.toLong)
    val sq = enr.map { case (_, p, y) => BigInt(p - y) * BigInt(p - y) }.sum
    // same IEEE shape as the query: exact-integer sums -> ONE double div
    val wantBrier = BigDecimal(sq.toDouble / (n.toDouble * 1e12))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ecenum = enr.groupBy(_._1).values.map { g =>
      val nb = g.length
      val conf = g.map(e => BigInt(e._2)).sum / nb
      val acc = BigInt(g.count(_._3 == 1000000L)) * micro / nb
      BigInt(nb) * (acc - conf).abs
    }.sum
    val wantEce = BigDecimal(ecenum.toDouble / (n.toDouble * 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("brier") == wantBrier)
    assert(r.getAs[Double]("ece") == wantEce)
    assert(wantBrier >= 0.0 && wantBrier <= 1.0 && wantEce >= 0.0 && wantEce <= 1.0)
  }

  test("classifier_roc_auc == naive pairwise concordance with tie halving") {
    val r = graft.pipeline.Classifier.rocAuc(spark, sf).collect()(0)
    val scored = graft.pipeline.Classifier.qualityClassifier(spark, sf)
      .collect().map(s => (s.getLong(1), s.getLong(2)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == -1L).map(_._2)
    assert(r.getAs[Long]("np") == pos.length)
    assert(r.getAs[Long]("nn") == neg.length)
    // naive via midranks (O(n log n); the pairwise definition squared
    // is too slow even at sf0.001)
    val ranked = scored.map(_._2).sorted.zipWithIndex
      .groupBy(_._1).map { case (s, xs) =>
        s -> (xs.map(_._2.toLong + 1).sum.toDouble / xs.length)
      }
    val rankSum = pos.map(ranked).sum
    val u = rankSum - pos.length.toDouble * (pos.length + 1.0) / 2.0
    val want = u / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(r.getAs[Double]("auc") - want) < 1e-6,
      s"auc ${r.getAs[Double]("auc")} vs naive $want")
    // the learned score should rank the heuristic label far above chance
    assert(r.getAs[Double]("auc") > 0.9,
      s"discriminant AUC suspiciously low: ${r.getAs[Double]("auc")}")
  }

  test("quality classifier fit is rerun-exact (scores bit-identical across runs)") {
    val a = graft.pipeline.Classifier.qualityClassifier(spark, sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val b = graft.pipeline.Classifier.qualityClassifier(spark, sf)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(a.sameElements(b))
  }
}
