package graft

import graft.sim.Similarity

/** MMR diversified retrieval invariants: the greedy contract (first pick
  * = max relevance; later picks maximize the integer MMR objective over
  * the remaining shortlist) and the DIVERSITY property the operator
  * exists for — on a corpus where the top relevance band is a clone
  * cluster, plain top-k drowns in clones while MMR escapes to the
  * diverse runner-up.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("fixture: ranks are 1..K per query, picks distinct, rank-1 is max relevance") {
    val rows = Similarity.mmrDiversified(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    for ((q, rs) <- byQ) {
      val ranks = rs.map(_.getAs[Long]("mmr_rank")).sorted
      assert(ranks.sameElements(1L to ranks.length),
        s"query $q ranks not contiguous: ${ranks.mkString(",")}")
      assert(rs.map(_.getAs[Long]("vec_id")).distinct.length == rs.length)
      val first = rs.find(_.getAs[Long]("mmr_rank") == 1L).get
      assert(first.getAs[Long]("rel_e4") == rs.map(_.getAs[Long]("rel_e4")).max ||
        // rank-1 is max relevance BY CONSTRUCTION; equal rel ties break by id
        rs.count(_.getAs[Long]("rel_e4") == first.getAs[Long]("rel_e4")) > 1)
    }
  }

  test("planted clone cluster: MMR escapes it, plain top-k does not") {
    // the scenario MMR exists for: the probe straddles four equally
    // relevant topics; one topic's results are 6 mutual near-clones,
    // the other three topics have one result each. Plain top-5 fills
    // with clones (they tie the diverse vectors on relevance and win
    // low-id tie-breaks); MMR's redundancy penalty (clone-clone sim
    // ≈ 1, clone-other sim ≈ 0) must pull the diverse topics in.
    val rnd = new scala.util.Random(11)
    def jitter(base: Array[Float], eps: Float) =
      base.map(x => x + (rnd.nextGaussian() * eps).toFloat)
    val probe = Array.tabulate(64)(j => if (j < 32) 1f else 0f)
    def block(b: Int) =
      Array.tabulate(64)(j => if (j >= b * 8 && j < (b + 1) * 8) 1f else 0f)
    val rows =
      Seq((0L, probe, 0)) ++
        (1 to 6).map(i => (i.toLong, jitter(block(0), 0.01f), 0)) ++
        (1 to 3).map(b => (9L + b, block(b), 1))
    val tmp = java.nio.file.Files.createTempDirectory("graftmmr")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val out = Similarity.mmrDiversified(spark, tmp.toString)
      .filter($"query_id" === 0L).collect()
      .sortBy(_.getAs[Long]("mmr_rank"))
    val picked = out.map(_.getAs[Long]("vec_id")).toSet
    // plain top-5 by relevance would be 5 clones (ids 1..6 dominate);
    // MMR must bring in at least one diverse vector by rank 5
    assert(picked.exists(_ >= 10L),
      s"MMR never escaped the clone cluster: picked ${picked.mkString(",")}")
    // and the first pick is still the most relevant clone
    assert(out.head.getAs[Long]("vec_id") <= 6L)
  }
}
