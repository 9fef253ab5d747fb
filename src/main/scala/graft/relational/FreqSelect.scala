package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics over a (value, count) FREQUENCY table without
  * a global sort or an unpartitioned window — [[Quantiles]]'s iterative
  * histogram narrowing lifted from raw rows to frequency tables whose
  * value column lives on any integer grid up to DECIMAL(38,0).
  *
  * Why it exists: the catalog's med2 spelling (cumulative counts over
  * `Window.orderBy(v)`) is exact but runs the whole frequency table
  * through ONE task — fine for domain-bounded grids (anomaly_mad's
  * ≤49k cents/type), but the calendar-bounded tables it was also used
  * on (theilsen_trend's C(days,2) slope grid, ~2.9M rows per 6.5
  * fixture-years) made it the catalog's only multi-process spiller
  * (698 MB at the r11 cluster bench). Narrowing replaces that with
  * ⌈log_B(range)⌉ map-side-combined histogram passes over the cached
  * table; every exchange payload is ≤ B·segments rows and driver state
  * is O(#ranks) BigInts.
  *
  * Exactness: values are BIGINT/DECIMAL(38,0) grid points; counts are
  * BIGINT; bucket assignment is integral `div` (exact; run on BIGINT
  * when the observed [min, max] fits int64 — see the fast path below —
  * and on DECIMAL otherwise); the located statistic is the grid value
  * itself — no FP anywhere.
  */
object FreqSelect {

  /** Histogram width per pass. 2^16 makes the pass count
    * ⌈log_65536(range)⌉ — 3-4 passes for the catalog's e6-grid ranges
    * (~2^50-2^55) where 1024 took 6 — while the per-pass driver
    * collect stays bounded at B·segments rows (≤ ~128k rows / ~3 MB
    * for the med2 callers; the r13 measurement put the per-PASS fixed
    * cost at ~0.2 s, so passes, not histogram width, are the term
    * worth buying down). Map-side combine bounds every exchange at
    * B·segments rows regardless of input size.
    */
  val Buckets = 65536

  private final class Stat(val rank: Long, var lo: BigInt, var hi: BigInt,
      var below: Long)

  /** Values at the requested 0-indexed ranks of the multiset a
    * frequency table describes. `ranksOf` maps the multiset size n to
    * the wanted ranks (each in [0, n)). Returns (n, rank → value).
    * The input is localCheckpoint'd internally: each narrowing pass
    * re-scans it, and the caller's lineage (e.g. a pair join) must not
    * be replayed per pass.
    */
  def orderStats(freq0: DataFrame, vCol: String, cntCol: String,
      ranksOf: Long => Seq[Long]): (Long, Map[Long, BigInt]) = {
    val freq = freq0
      .select(col(vCol).cast("decimal(38,0)").as("v"),
        col(cntCol).cast("long").as("cnt"))
      .transform(graft.Ckpt.cut)
    val head = freq.agg(sum(col("cnt")), min(col("v")), max(col("v"))).head()
    require(!head.isNullAt(0) && head.getLong(0) > 0,
      "orderStats over an empty frequency table")
    val n = head.getLong(0)
    def big(i: Int): BigInt = BigInt(head.getDecimal(i).toBigInteger)
    val (lo0, hi0) = (big(1), big(2))
    val ranks = ranksOf(n)
    require(ranks.forall(k => k >= 0 && k < n), s"ranks $ranks out of [0, $n)")
    val stats = ranks.distinct.sorted.map(new Stat(_, lo0, hi0, 0L))

    // BIGINT fast path: when the OBSERVED value range fits comfortably
    // in int64 (both bounds in range and the span below Long.Max/2, so
    // v−lo can never wrap), run every per-row comparison and the bucket
    // division on primitive longs instead of Decimal(38,0) — the same
    // integral floor divisions on the same grid points, so the chosen
    // buckets and the located values are identical by construction;
    // only the physical representation changes. The decimal path stays
    // for callers whose grid genuinely exceeds int64 (theilsen's
    // residual grid at the 100× corpus). Measured at the 2.9M-row
    // slope table: decimal compares + divs were the dominant per-pass
    // row cost.
    val useLong = lo0 >= BigInt(Long.MinValue) && hi0 <= BigInt(Long.MaxValue) &&
      (hi0 - lo0) < BigInt(Long.MaxValue / 2)
    val vv: Column = if (useLong) col("v").cast("long") else col("v")
    def bound(x: BigInt): Column =
      if (useLong) lit(x.toLong)
      else lit(new java.math.BigDecimal(x.bigInteger))
    def bucketExpr(l: BigInt, w: BigInt): Column =
      if (useLong) expr(s"(CAST(v AS BIGINT) - ${l.toLong}L) div ${w.toLong}L")
      else expr(s"(v - ${l}BD) div ${w}BD")

    val B = BigInt(Buckets)
    var cur = freq
    var pass = 0
    while (stats.exists(s => s.hi > s.lo)) {
      pass += 1
      require(pass <= 64, s"orderStats failed to converge after $pass passes")
      val segs = stats.filter(s => s.hi > s.lo).map(s => (s.lo, s.hi))
        .distinct.sortBy(_._1)
      // After pass 1 the active segments cover ≤ 1/B of the original
      // value range, so prepend a LAZY range filter: pass 2+ still scan
      // the cached table but drop ~(1−1/B) of the rows after two cheap
      // comparisons instead of running every row through the full
      // seg/bucket/div chain and the histogram aggregate. (An eager
      // re-checkpoint of the filtered rows was measured to cost MORE
      // than it saves — its materialization job is itself a full pass.)
      // Segments only ever narrow, so each pass's filter keeps every
      // row any later pass can touch.
      if (pass >= 2) {
        val inSeg = segs.map { case (l, h) =>
          vv >= bound(l) && vv <= bound(h)
        }.reduce(_ || _)
        cur = cur.filter(inSeg)
      }
      val bw = segs.map { case (l, h) => (h - l + 1 + B - 1) / B }
      val segId = segs.zipWithIndex.foldRight(lit(-1): Column) {
        case (((l, h), i), els) =>
          when(vv >= bound(l) && vv <= bound(h), lit(i)).otherwise(els)
      }
      // integral `div` is exact and returns BIGINT; the quotient is
      // < Buckets by construction of the segment width
      val bCol = segs.indices.foldRight(lit(0L): Column) { (i, els) =>
        when(col("seg") === i, bucketExpr(segs(i)._1, bw(i))).otherwise(els)
      }
      val hist = cur
        .withColumn("seg", segId)
        .filter(col("seg") >= 0)
        .withColumn("b", bCol)
        .groupBy(col("seg"), col("b")).agg(sum(col("cnt")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      stats.filter(s => s.hi > s.lo).foreach { s =>
        val si = segs.indexWhere(seg => seg._1 == s.lo && seg._2 == s.hi)
        val w = bw(si)
        var cum = s.below
        var b = 0L
        var found = false
        while (!found) {
          val cnt = hist.getOrElse((si, b), 0L)
          if (cum + cnt > s.rank) {
            s.below = cum
            s.lo = segs(si)._1 + BigInt(b) * w
            s.hi = (s.lo + w - 1).min(segs(si)._2)
            found = true
          } else { cum += cnt; b += 1 }
        }
      }
    }
    (n, stats.map(s => s.rank -> s.lo).toMap)
  }

  /** Median x2 (the catalog's med2 convention: v(⌊(n−1)/2⌋) + v(⌊n/2⌋),
    * carrying twice the value so even counts stay on the integer grid).
    */
  def med2(freq: DataFrame, vCol: String, cntCol: String): (Long, BigInt) = {
    val (n, vals) = orderStats(freq, vCol, cntCol,
      n => Seq((n - 1) / 2, n / 2))
    (n, vals((n - 1) / 2) + vals(n / 2))
  }
}
