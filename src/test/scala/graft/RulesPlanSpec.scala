package graft

import org.apache.spark.sql.functions._

/** Specs for [[pipeline.QualityRules]] (planted adversarial docs per
  * rule), [[pipeline.SplitAudit]], [[text.LshPlan]] (S-curve
  * monotonicity), [[relational.BasketRules]] (rule algebra from its
  * own integers) and [[relational.Hits]] (normalization + node set).
  */
class RulesPlanSpec extends SparkSpec {
  import spark.implicits._

  test("gopher_quality_rules: each planted document fails exactly its rule") {
    val good = ("good", (Seq.fill(60)("data") ++ Seq("the", "a")).mkString(" "))
    val short = ("short", "the a data table")
    val longWords = ("longw",
      (Seq.fill(60)("verylongtokenword") ++ Seq("the", "a")).mkString(" "))
    val symbols = ("sym",
      (Seq.fill(60)("data#") ++ Seq("the", "a")).mkString(" "))
    // each bullet line carries enough alpha words that ONLY the
    // bullet-fraction rule trips (the "-" token itself is non-alpha
    // and 1 char, so sparse lines would also fail R2/R5)
    val bullets = ("bull",
      "the a\n" + Seq.fill(30)("- data rows here again extra").mkString("\n"))
    val digits = ("digits",
      (Seq.fill(60)("12345") ++ Seq("the", "a")).mkString(" "))
    val nostop = ("nostop", Seq.fill(60)("data").mkString(" "))
    val docs = Seq(good, short, longWords, symbols, bullets, digits, nostop)
      .toDF("source", "text")
    val out = pipeline.QualityRules.gopherRulesOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    def fails(src: String): Seq[String] =
      Seq("fail_wordcount", "fail_wordlen", "fail_symbols", "fail_bullets",
        "fail_alpha", "fail_stopwords").filter(c => out(src).getAs[Long](c) == 1L)
    assert(fails("good").isEmpty && out("good").getAs[Long]("n_pass") == 1L)
    assert(fails("short") == Seq("fail_wordcount"))
    assert(fails("longw") == Seq("fail_wordlen"))
    assert(fails("sym") == Seq("fail_symbols"))
    assert(fails("bull") == Seq("fail_bullets"))
    assert(fails("digits") == Seq("fail_alpha"))
    assert(fails("nostop") == Seq("fail_stopwords"))
  }

  test("gopher_quality_rules: per-source totals cover the corpus") {
    val rows = pipeline.QualityRules.gopherRules(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    for (r <- rows) {
      val nPass = r.getAs[Long]("n_pass")
      val nDocs = r.getAs[Long]("n_docs")
      assert(nPass <= nDocs)
      val expected = BigDecimal(nPass.toDouble / nDocs)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("pass_rate") - expected) < 1e-9)
    }
  }

  test("split_leakage_audit: split partition and leak bounds") {
    val r = pipeline.SplitAudit.splitLeakageAudit(spark, sf).collect()(0)
    val total = Tables.documents(spark, sf).count()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_eval") == total)
    assert(r.getAs[Long]("leaked_gram_types") <= r.getAs[Long]("eval_gram_types"))
    assert(r.getAs[Long]("exact_cross_pairs") >= 0L)
    val rate = r.getAs[Double]("gram_leak_rate")
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("lsh_band_plan: S-curve monotonicity across factorizations") {
    val rows = text.LshPlan.lshBandPlan(spark, sf).collect()
    assert(rows.length == text.LshPlan.Plans.length)
    val byB = rows.sortBy(_.getAs[Long]("b"))
    for (r <- byB) {
      assert(r.getAs[Long]("b") * r.getAs[Long]("r") == text.Dedup.NumHashes)
      val rec = r.getAs[Double]("expected_recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // for fixed H, more bands = lower threshold = higher recall
    val recalls = byB.map(_.getAs[Double]("expected_recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b + 1e-9 })
    val s50s = byB.map(_.getAs[Double]("s50"))
    assert(s50s.zip(s50s.tail).forall { case (a, b) => a >= b - 1e-9 })
    // the catalog's own (16, 4) banding is one of the plans
    assert(byB.exists(r =>
      r.getAs[Long]("b") == text.Dedup.Bands &&
        r.getAs[Long]("r") == text.Dedup.Rows))
    // all-pairs-in-one-band (b=1) must be the strictest plan
    assert(s50s.head == byB.map(_.getAs[Double]("s50")).max)
  }

  test("basket_rules: metric algebra from the row's own integers") {
    val rows = relational.BasketRules.basketRules(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= relational.Analytics.BasketTopK)
    val topPairs = relational.Analytics.basketPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) ->
        r.getAs[Long]("n_orders")).toMap
    for (r <- rows) {
      val (nab, na, nb, n) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_baskets"))
      assert(nab <= math.min(na, nb))
      assert(topPairs((r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))) == nab,
        "rule table must cover exactly the basket_pairs top pairs")
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("conf_ab") == r6(nab.toDouble / na))
      assert(r.getAs[Double]("conf_ba") == r6(nab.toDouble / nb))
      assert(r.getAs[Double]("support") == r6(nab.toDouble / n))
      assert(math.abs(r.getAs[Double]("lift") -
        n.toDouble * nab / (na.toDouble * nb)) < 1e-4)
    }
  }

  test("graph_hits_nations: L1 normalization and pagerank's node set") {
    val rows = relational.Hits.hitsNations(spark, sf).collect()
    assert(rows.nonEmpty)
    val hubSum = rows.map(_.getAs[Double]("hub")).sum
    val authSum = rows.map(_.getAs[Double]("authority")).sum
    assert(math.abs(hubSum - 1.0) < 1e-4, s"hub mass $hubSum")
    assert(math.abs(authSum - 1.0) < 1e-4, s"authority mass $authSum")
    assert(rows.forall(r => r.getAs[Double]("hub") >= 0.0 &&
      r.getAs[Double]("authority") >= 0.0))
    val prNodes = relational.Graph.pagerankNations(spark, sf).collect()
      .map(_.getAs[String]("node")).toSet
    assert(rows.map(_.getAs[String]("node")).toSet == prNodes)
  }
}
