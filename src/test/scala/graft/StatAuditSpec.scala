package graft

import org.apache.spark.sql.functions._
import graft.relational.StatAudit

/** Distribution-audit invariants. */
class StatAuditSpec extends SparkSpec {
  import spark.implicits._

  test("benford_audit: digits 1-9 partition the table; permilles consistent") {
    val rows = StatAudit.benfordAudit(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.orders(spark, sf).count())
    for (r <- rows) {
      assert(r.getAs[Long]("gap_permille") ==
        math.abs(r.getAs[Long]("obs_permille") - r.getAs[Long]("exp_permille")))
      assert(r.getAs[Long]("obs_permille") >= 0L &&
        r.getAs[Long]("obs_permille") <= 1000L)
    }
    // the Benford expectation column must itself be a distribution
    assert(rows.map(_.getAs[Long]("exp_permille")).distinct.sum >= 995L)
  }

  test("chisq_source_lang: margins reconstruct, independence expectation sums to ~N per row") {
    val out = StatAudit.chisqSourceLang(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum == n)
    // per source: sum of expected cells ≈ row total (integer div loses
    // < #cells per row)
    val bySource = out.groupBy(_.getAs[String]("source"))
    for ((_, cells) <- bySource) {
      val rowN = cells.map(_.getAs[Long]("n")).sum
      val expSum = cells.map(_.getAs[Long]("exp_e3")).sum
      assert(math.abs(expSum - rowN * 1000L) <= cells.length.toLong * 1000L,
        s"expectation margin drifted: $expSum vs ${rowN * 1000L}")
    }
  }

  test("chisq detects a planted dependence") {
    // independent grid: dev small; planted diagonal: dev large
    val tmp = java.nio.file.Files.createTempDirectory("graftchi")
    val planted = (0 until 400).map { i =>
      val s = s"s${i % 4}"
      val l = s"l${i % 4}" // perfectly dependent: lang == f(source)
      (i.toLong, "x", s, l)
    }
    planted.toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dev = StatAudit.chisqSourceLang(spark, tmp.toString)
      .agg(sum($"dev_e3")).head().getLong(0)
    // perfect dependence: observed 100 vs expected 25 per live cell →
    // large total deviation (≥ 4 cells × 75k e3)
    assert(dev >= 300000L, s"planted dependence under-detected: $dev")
  }

  test("mi_source_lang == naive driver MI; NMI in [0,1]; planted extremes") {
    val r = StatAudit.miSourceLang(spark, sf).collect()(0)
    val cells = Tables.documents(spark, sf)
      .groupBy($"source", $"lang").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    val rowm = cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val colm = cells.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
    val mi = cells.map { case ((s, l), c) =>
      (c / n) * math.log(c * n / (rowm(s).toDouble * colm(l).toDouble))
    }.sum
    val hs = rowm.values.map(c => -(c / n) * math.log(c / n)).sum
    val hl = colm.values.map(c => -(c / n) * math.log(c / n)).sum
    assert(r.getAs[Long]("n_docs") == n.toLong)
    assert(r.getAs[Long]("n_cells") == cells.size)
    assert(math.abs(r.getAs[Double]("mi_nats") - mi) < 1e-5)
    assert(math.abs(r.getAs[Double]("h_source") - hs) < 1e-5)
    assert(math.abs(r.getAs[Double]("h_lang") - hl) < 1e-5)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= 0.0 && nmi <= 1.0, s"NMI out of [0,1]: $nmi")

    // planted independence (lang constant): MI == 0 exactly, +0.0
    val tmp = java.nio.file.Files.createTempDirectory("graftmi")
    (0 until 400).map(i => (i.toLong, "x", s"s${i % 4}", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val indep = StatAudit.miSourceLang(spark, tmp.toString).collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(
      indep.getAs[Double]("mi_nats")) == 0L)
    // planted perfect dependence (lang == f(source)): NMI == 1
    (0 until 400).map(i => (i.toLong, "x", s"s${i % 4}", s"l${i % 4}"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dep = StatAudit.miSourceLang(spark, tmp.toString).collect()(0)
    assert(dep.getAs[Double]("nmi") == 1.0, s"got ${dep.getAs[Double]("nmi")}")
  }
}
