package graft

import graft.relational.FreqSelect
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FreqSelect (iterative histogram narrowing over frequency tables)
  * against naive multiset expansion — the med2 paths were previously
  * covered only through theilsen's fixture tests; this pins the
  * selector itself on shapes the fixture cannot produce: negatives,
  * heavy ties, one value holding most of the mass, DECIMAL(38,0)
  * magnitudes beyond Long, and multi-rank narrowing with shared and
  * disjoint segments.
  */
class FreqSelectSpec extends SparkSpec {
  import spark.implicits._

  // via strings: the implicit BigDecimal encoder is decimal(38,18),
  // which overflows on 30-digit integers before the cast can run
  private def freqOf(pairs: Seq[(BigInt, Long)]): DataFrame =
    pairs.map { case (v, c) => (v.toString, c) }
      .toDF("v", "cnt")
      .select($"v".cast("decimal(38,0)").as("v"), $"cnt")

  private def naive(pairs: Seq[(BigInt, Long)], ranks: Seq[Long]): Map[Long, BigInt] = {
    val sorted = pairs.sortBy(_._1)
    val n = pairs.map(_._2).sum
    ranks.map { k =>
      var cum = 0L
      val v = sorted.collectFirst {
        case (value, c) if { cum += c; cum > k } => value
      }.get
      require(k >= 0 && k < n)
      k -> v
    }.toMap
  }

  test("orderStats == naive expansion: negatives, ties, skewed mass") {
    val pairs: Seq[(BigInt, Long)] = Seq(
      BigInt(-1000000) -> 3L, BigInt(-17) -> 1L, BigInt(0) -> 5L,
      BigInt(1) -> 1L, BigInt(2) -> 100000L, // one value holds the mass
      BigInt(999) -> 7L, BigInt(123456789) -> 2L)
    val n = pairs.map(_._2).sum
    val ranks = Seq(0L, 1L, n / 2, n - 2, n - 1)
    val (gotN, got) = FreqSelect.orderStats(freqOf(pairs), "v", "cnt", _ => ranks)
    assert(gotN == n)
    assert(got === naive(pairs, ranks))
  }

  test("orderStats: DECIMAL(38,0) magnitudes beyond Long") {
    val big = BigInt("9" * 30)
    val pairs: Seq[(BigInt, Long)] = Seq(
      -big -> 2L, BigInt(-42) -> 1L, big - 1 -> 3L, big -> 4L)
    val ranks = Seq(0L, 2L, 3L, 5L, 9L)
    val (gotN, got) = FreqSelect.orderStats(freqOf(pairs), "v", "cnt", _ => ranks)
    assert(gotN == 10L)
    assert(got === naive(pairs, ranks))
  }

  test("med2 parity with naive for odd and even multiset sizes") {
    val odd: Seq[(BigInt, Long)] =
      Seq(BigInt(5) -> 2L, BigInt(-3) -> 1L, BigInt(10) -> 2L) // n=5
    val even: Seq[(BigInt, Long)] =
      Seq(BigInt(1) -> 2L, BigInt(7) -> 1L, BigInt(9) -> 1L) // n=4
    for (pairs <- Seq(odd, even)) {
      val n = pairs.map(_._2).sum
      val want = naive(pairs, Seq((n - 1) / 2, n / 2))
      val (gotN, med2) = FreqSelect.med2(freqOf(pairs), "v", "cnt")
      assert(gotN == n)
      assert(med2 === want((n - 1) / 2) + want(n / 2))
    }
  }

  test("single-value and single-row tables converge without passes") {
    val (n, med2) = FreqSelect.med2(freqOf(Seq(BigInt(42) -> 9L)), "v", "cnt")
    assert(n == 9L && med2 == BigInt(84))
  }

  test("empty frequency table fails loudly") {
    val e = intercept[IllegalArgumentException] {
      FreqSelect.med2(freqOf(Nil), "v", "cnt")
    }
    assert(e.getMessage.contains("empty frequency table"))
  }
}
