package graft

import graft.text.Phrases

/** Collocation mining invariants on planted corpora. */
class PhrasesSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graftphr")
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'t' AS source", "'en' AS lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp.toString
  }

  test("phrase_detect promotes a planted collocation and not its frequent parts") {
    // "new york" always together (score high); "of the" both frequent
    // but independent (score ~ N*n12/(n1*n2) small)
    val filler = (1 to 30).map(i => s"w$i of the w${i + 1}").mkString(" ")
    val d = corpusDir(Seq(
      (1L, ("new york " * 10) + filler),
      (2L, ("new york " * 10) + filler),
      (3L, filler + " of the of the")))
    val out = Phrases.phraseDetect(spark, d).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r.getAs[Long]("score_e6"))
      .toMap
    assert(out.contains(("new", "york")), s"planted phrase missing: ${out.keys}")
    // the independent frequent pair must score strictly below the
    // collocation (if it clears the integer floor at all)
    val ny = out(("new", "york"))
    assert(out.getOrElse(("of", "the"), 0L) < ny,
      s"'of the' ${out.get(("of", "the"))} vs 'new york' $ny")
  }

  test("rake scores a long stopword-free collocation above scattered singles") {
    val d = corpusDir(Seq(
      (1L, "deep neural network training of the deep neural network training " +
        "a deep neural network training to cats on dogs in birds"),
      (2L, "the cats a dogs of birds to fish is mice on lions")))
    val rows = Phrases.rakeKeywords(spark, d).collect()
    assert(rows.nonEmpty)
    val top = rows.maxBy(r =>
      (r.getAs[Long]("score_e6"), -r.getAs[Long]("doc_id")))
    assert(top.getAs[String]("phrase") == "deep neural network training",
      s"top keyword was '${top.getAs[String]("phrase")}'")
    // RAKE degree favors longer phrases: top phrase length >= any other
    assert(rows.forall(_.getAs[Long]("plen") <= top.getAs[Long]("plen")))
  }
}
