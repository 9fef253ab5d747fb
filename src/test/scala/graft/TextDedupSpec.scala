package graft

import graft.text.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics of the text-analysis and dedup operators. The oracled
  * queries — since round 2 INCLUDING the minhash/simhash pair
  * pipelines, whose md5-based hashes replay in DuckDB — are
  * value-checked by check_oracle.py; these tests additionally pin the
  * sketch MATH (signature/est-Jaccard/hamming behavior, native-agg
  * parity) independent of any oracle.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsWithDup = {
    // Append an exact duplicate and a near-duplicate of doc 0.
    val d = Tables.documents(spark, sf).select("doc_id", "text")
    val base = d.filter($"doc_id" === 0).collect().head.getString(1)
    val near = {
      val t = base.split(" ")
      (t.take(t.length - 2) :+ "zzz").mkString(" ") // drop 2 tokens, add 1
    }
    d.union(Seq((100001L, base), (100002L, near)).toDF("doc_id", "text"))
  }

  test("minhash est_jaccard tracks exact jaccard (sketch error < 0.25)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftdup")
    docsWithDup
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.minhashPairs(spark, tmp.toString)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the exact duplicate pair must be found with est ~1.0
    assert(pairs.contains((0L, 100001L)), s"exact dup pair missing: ${pairs.keys}")
    assert(pairs((0L, 100001L)) === 1.0)
    // the near-duplicate should surface with high estimated similarity
    assert(pairs.contains((0L, 100002L)) || pairs.contains((100001L, 100002L)),
      "near-dup pair not surfaced by LSH")
    // every surfaced estimate within sketch tolerance of exact jaccard
    val toks = docsWithDup.withColumn("t", TextAnalysis.toks($"text"))
      .select($"doc_id", array_distinct(Dedup.shingles($"t")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    pairs.foreach { case ((a, b), est) =>
      val (sa, sb) = (toks(a), toks(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(est - exact) < 0.25, s"pair ($a,$b): est $est vs exact $exact")
    }
  }

  test("native minhash_agg == local (a*h+b) mod P recompute (bit-for-bit)") {
    val sigs = Dedup.signatures(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // independent shingle-hash recompute via the retained array formulation
    val hashes = Tables.documents(spark, sf)
      .withColumn("t", TextAnalysis.toks($"text"))
      .filter(size($"t") >= 3)
      .select($"doc_id",
        transform(Dedup.shingles($"t"),
          s => conv(substring(md5(s), 1, 8), 16, 10).cast("long")).as("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(hashes.nonEmpty)
    hashes.take(50).foreach { case (id, hs) =>
      val want = Dedup.permConstants.map { case (a, b) =>
        hs.map(h => (h * a + b) % Dedup.MinhashPrime).min
      }
      assert(sigs(id) == want, s"minhash signature mismatch for doc $id")
    }
  }

  test("native simhash_agg == local bit-balance recompute") {
    val docs = Dedup.simhashDocs(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val toks = Tables.documents(spark, sf)
      .withColumn("t", TextAnalysis.toks($"text"))
      .filter(size($"t") >= 1)
      .select($"doc_id", array_distinct($"t").as("dt"))
      .withColumn("lo", transform($"dt",
        x => conv(substring(md5(x), 1, 8), 16, 10).cast("long")))
      .withColumn("hi", transform($"dt",
        x => conv(substring(md5(x), 9, 8), 16, 10).cast("long")))
      .select($"doc_id", $"lo", $"hi").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    assert(toks.nonEmpty)
    def pack(hs: Seq[Long]): Long = {
      val bal = new Array[Long](32)
      hs.foreach { h =>
        (0 until 32).foreach(b => bal(b) += ((h >>> b) & 1L) * 2L - 1L)
      }
      (0 until 32).map(b => if (bal(b) > 0) 1L << b else 0L).sum
    }
    toks.take(50).foreach { case (id, lo, hi) =>
      assert(docs(id) == ((pack(lo), pack(hi))), s"simhash mismatch for doc $id")
    }
  }

  test("simhash: identical docs collide, near-dup within small hamming") {
    val tmp = java.nio.file.Files.createTempDirectory("graftsim")
    docsWithDup
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sims = Dedup.simhashDocs(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sims(0L) == sims(100001L), "identical docs must have identical simhash")
    val hamNear = java.lang.Long.bitCount(sims(0L)._1 ^ sims(100002L)._1) +
      java.lang.Long.bitCount(sims(0L)._2 ^ sims(100002L)._2)
    assert(hamNear <= 16, s"near-dup hamming unexpectedly large: $hamNear")
  }

  test("dedup_exact groups exact duplicates under one fingerprint") {
    val fp = Dedup.exact(spark, sf)
    assert(fp.agg(sum($"n_dups")).head.getLong(0) ==
      Tables.documents(spark, sf).count())
  }

  test("language ID picks en for stopword-rich text, fixed tie-break") {
    val preds = TextAnalysis.langId(spark, sf).collect()
    assert(preds.nonEmpty)
    preds.foreach { r =>
      val (en, de, fr, es) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val pred = r.getString(5)
      val max = Seq(en, de, fr, es).max
      assert(Seq("en", "de", "fr", "es").zip(Seq(en, de, fr, es))
        .find(_._2 == max).map(_._1).contains(pred))
    }
  }

  test("winnowing guarantee: a shared run of k+w-1 tokens always shares a fingerprint") {
    import graft.text.Dedup
    val run = (1 to (Dedup.WinnowK + Dedup.WinnowW - 1)).map(i => s"shared$i")
    // two docs with entirely different surroundings but one common run
    val docA = (1 to 20).map(i => s"alpha$i") ++ run ++ (1 to 20).map(i => s"omega$i")
    val docB = (1 to 20).map(i => s"beta$i") ++ run ++ (1 to 20).map(i => s"gamma$i")
    val docC = (1 to 50).map(i => s"unrelated$i")
    val toks = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "t")
    val fps = Dedup.winnowFingerprints(toks)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "shared k+w-1 run must produce a shared fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "disjoint docs must not collide")
    // fingerprints are content-derived: same tokens => same fingerprint set
    val again = Dedup.winnowFingerprints(toks.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == fps.toSet)
  }

  test("token stats: ttr in (0,1], bpe count >= whitespace token count") {
    val st = TextAnalysis.textStats(spark, sf).collect()
    st.foreach { r =>
      val ttr = r.getDouble(3)
      assert(ttr > 0 && ttr <= 1.0)
    }
    val joined = TextAnalysis.textStats(spark, sf).select($"doc_id", $"n_tokens")
      .join(TextAnalysis.tokenCount(spark, sf), "doc_id").collect()
    joined.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }
}
