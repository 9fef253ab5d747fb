package graft

import org.apache.spark.sql.functions._

/** Specs for the round-8 additions: DSIR importance weighting
  * ([[pipeline.Dsir]]), reciprocal-rank fusion ([[sim.Fusion]]), and
  * multi-source BFS reachability ([[relational.Graph.reachHops]]).
  */
class DsirFusionReachSpec extends SparkSpec {
  import spark.implicits._

  test("dsir_weights: target-language docs separate from the rest") {
    val top = pipeline.Dsir.dsirWeights(spark, sf)
    val rows = top.collect()
    assert(rows.length == pipeline.Dsir.TopDocs)
    // weights are sorted desc with doc_id tiebreak
    val ws = rows.map(_.getAs[Double]("weight"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // the selector's point: the top slice is enriched in the target
    // language relative to the corpus base rate
    val langs = Tables.documents(spark, sf).select($"doc_id", $"lang")
    val topLangs = top.join(langs, "doc_id")
    val topEn = topLangs.filter($"lang" === pipeline.Dsir.TargetLang).count()
    val baseEn = langs.filter($"lang" === pipeline.Dsir.TargetLang).count()
    val baseAll = langs.count()
    assert(topEn.toDouble / rows.length > baseEn.toDouble / baseAll,
      s"top-${rows.length} en fraction ${topEn.toDouble / rows.length} " +
        s"not above base rate ${baseEn.toDouble / baseAll}")
  }

  test("embed_rrf_fusion: per-query top-k is complete, ranks consistent") {
    val out = sim.Fusion.rrfFusion(spark, sf).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == sim.Similarity.NumQueries)
    for ((q, rows) <- byQuery) {
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to sim.Fusion.TopK), s"query $q fused ranks not 1..K")
      for (r <- rows) {
        // the fused score must equal its definition on the three ranks
        val expect = BigDecimal(
          1.0 / (r.getAs[Long]("rk_cos") + sim.Fusion.RrfC) +
            1.0 / (r.getAs[Long]("rk_ip") + sim.Fusion.RrfC) +
            1.0 / (r.getAs[Long]("rk_l2") + sim.Fusion.RrfC))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("rrf") == expect, s"query $q rrf mismatch")
      }
      // an item cannot be fused-top-1 without beating the others on at
      // least one geometry's reciprocal sum; weaker invariant that is
      // always true: top-1's rrf is the max in the group
      val top1 = rows.minBy(_.getAs[Long]("rk"))
      assert(rows.forall(_.getAs[Double]("rrf") <= top1.getAs[Double]("rrf")))
    }
  }

  test("graph_reach_hops: BFS layering is sound against the edge list") {
    val hops = relational.Graph.reachHops(spark, sf)
      .select($"doc_id", $"hops").localCheckpoint()
    // seeds are exactly the zh docs at distance 0
    val seeds = Tables.documents(spark, sf)
      .filter($"lang" === relational.Graph.SeedLang).select($"doc_id")
    val zero = hops.filter($"hops" === 0).select($"doc_id")
    assert(zero.exceptAll(seeds).isEmpty && seeds.exceptAll(zero).isEmpty)
    // each doc appears once, within the cap
    assert(hops.groupBy($"doc_id").count().filter($"count" > 1).isEmpty)
    assert(hops.filter($"hops" > relational.Graph.HopCap).isEmpty)
    // BFS invariant: every layer-k>0 vertex has a neighbor at k-1
    val e = text.Dedup.jaccardPairs(spark, sf).filter($"jacc" >= 0.5)
      .select($"doc_a".as("a"), $"doc_b".as("b"))
    val und = e.union(e.select($"b".as("a"), $"a".as("b")))
    val parentless = hops.filter($"hops" > 0)
      .join(und, hops("doc_id") === und("a"))
      .join(hops.select($"doc_id".as("nb"), $"hops".as("nb_hops")),
        und("b") === $"nb")
      .groupBy(hops("doc_id"), hops("hops"))
      .agg(min($"nb_hops").as("best"))
      .filter($"best" =!= $"hops" - 1)
    assert(parentless.isEmpty,
      s"BFS layering violated: ${parentless.collect().mkString(", ")}")
  }
}
