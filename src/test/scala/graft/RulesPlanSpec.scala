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

  test("gopher_repetition_rules: each planted document fails exactly its rule") {
    // varied lines, varied tokens — passes all four repetition rules
    val pass = (1L, "pass",
      "alpha beta gamma delta\nepsilon zeta eta theta\niota kappa lambda mu")
    // P1 (dup-line fraction): two tiny duplicate lines + one long unique
    // line — dup fraction 1/3 > 0.30 but dup CHARS 3/86 pass P2; the
    // tiny line's tokens repeat as "a b" (f=2) which is far under the
    // top-2-gram char threshold
    val dupl = (2L, "dupl",
      "a b\na b\n" + (1 to 16).map(i => s"w$i").mkString(" "))
    // P2 (dup-line chars): ONE duplicated 100-char single-token line
    // among 7 short distinct lines — dup lines 1/8 pass P1, dup chars
    // 100/298 of length(text) fail P2; the giant token forms no
    // repeated n-grams, and
    // the most frequent 2-gram is an f=1 short one (the packed-key
    // arg-max keeps the giant f=1 2-gram from tripping P3)
    val duplc = (3L, "duplc",
      ("Z" * 100) + "\n" + ("Z" * 100) + "\n" +
        (1 to 6).map(i => s"line$i has words\n").mkString)
    // P3 (top 2-gram chars): "x y" riding every third token pair —
    // f=20, coverage 60/~170 chars > 0.20; the unique fillers keep
    // every 5-gram distinct
    val top2 = (4L, "top2",
      (1 to 20).map(i => s"x y q$i").mkString(" "))
    // P4 (dup 5-gram chars): "p q r s t" x8 with unique 3-token
    // separators — dup5 = 7*9 = 63 chars of ~190 > 0.15; each 2-gram of
    // the phrase has f=8, coverage 24 < 0.20*190 so P3 passes
    val dup5 = (5L, "dup5",
      (1 to 8).map(i => s"p q r s t u$i v$i w$i").mkString(" "))
    val docs = Seq(pass, dupl, duplc, top2, dup5)
      .toDF("doc_id", "source", "text")
    val out = pipeline.QualityRules.gopherRepetitionOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    def fails(src: String): Seq[String] =
      Seq("fail_dup_lines", "fail_dup_line_chars", "fail_top2gram",
        "fail_dup5gram").filter(c => out(src).getAs[Long](c) == 1L)
    assert(fails("pass").isEmpty && out("pass").getAs[Long]("n_pass") == 1L)
    assert(fails("dupl") == Seq("fail_dup_lines"))
    assert(fails("duplc") == Seq("fail_dup_line_chars"))
    assert(fails("top2") == Seq("fail_top2gram"))
    assert(fails("dup5") == Seq("fail_dup5gram"))
  }

  test("gopher_repetition_rules: per-source totals cover the corpus") {
    val rows = pipeline.QualityRules.gopherRepetition(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    for (r <- rows)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
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
