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
}
