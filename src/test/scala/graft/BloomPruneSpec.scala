package graft

import graft.relational.BloomPrune

/** Bloom pruning invariants: the guarantees that make a bloom filter
  * safe to plant in front of a join — zero false negatives, bounded
  * filter size, measured FP rate consistent with the load factor.
  */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom_prune: no false negatives, sane false-positive rate") {
    val r = BloomPrune.bloomPrune(spark, sf).head()
    val nProbe = r.getAs[Long]("n_probe")
    val nPass = r.getAs[Long]("n_pass")
    val nHit = r.getAs[Long]("n_build_hit")
    val nFp = r.getAs[Long]("n_false_pos")
    // completeness: every probe key that IS in the build set must pass
    // (pass count >= true-positive count, and fp accounts for the rest)
    assert(nPass == nHit + nFp, s"pass $nPass != hit $nHit + fp $nFp")
    assert(nHit > 0L, "urgent orders exist at every sf — build set empty?")
    // with n build keys in m=16384 bits / k=3, FP rate must stay far
    // below 50% at fixture load factors; a broken hash slice would send
    // it toward 100% (all-pass) or break completeness above
    assert(nFp.toDouble / math.max(nProbe - nHit, 1L) < 0.5,
      s"fp rate implausible: $nFp of ${nProbe - nHit}")
  }

  test("the packed filter is bounded at 512 words regardless of build cardinality") {
    // the broadcastability contract: rebuild the filter the same way the
    // operator does and count its rows
    val words = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .selectExpr("o_orderkey AS _k")
      .selectExpr(
        "explode(array( conv(substring(md5(cast(_k AS string)), 1, 4), 16, 10) % 16384, conv(substring(md5(cast(_k AS string)), 5, 4), 16, 10) % 16384, conv(substring(md5(cast(_k AS string)), 9, 4), 16, 10) % 16384)) AS pos")
      .selectExpr("CAST(pos AS LONG) div 32 AS word").distinct().count()
    assert(words <= 512L, s"filter words $words > 512")
  }
}
