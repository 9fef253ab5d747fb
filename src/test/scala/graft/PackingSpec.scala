package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Packing

/** Sequence packing + split assignment: parity against a driver-side
  * re-implementation of the greedy fold (sf data is small enough to
  * replay exactly), plus the invariants that must hold at any scale.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def md5Shard(id: Long, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
        .substring(0, 8), 16) % mod

  test("pack_sequences matches a sequential driver-side replay") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
    // replay: group by (source, shard), docs in doc_id order, greedy fill
    val expected = docs
      .groupBy(r => (r._1, md5Shard(r._2, Packing.PackShards)))
      .map { case ((src, _), rs) =>
        var n = 1L; var cur = 0L
        rs.sortBy(_._2).foreach { case (_, _, c) =>
          if (cur + c <= Packing.SeqBudget) cur += c else { n += 1; cur = c }
        }
        (src, rs.length.toLong, n, rs.map(_._3).sum)
      }
      .groupBy(_._1)
      .map { case (src, gs) =>
        src -> ((gs.map(_._2).sum, gs.map(_._3).sum, gs.map(_._4).sum))
      }
    val got = Packing.packSequences(spark, sf)
      .select($"source", $"n_docs", $"n_seqs", $"sum_chars")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
  }

  test("packing fill ratio is in (0, 1] when no doc exceeds the budget") {
    val over = Tables.documents(spark, sf)
      .filter($"n_chars" > Packing.SeqBudget).count()
    assert(over == 0) // precondition of the bound at this sf
    val rows = Packing.packSequences(spark, sf)
      .select($"fill_ratio").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(r => r > 0 && r <= 1.0))
  }

  test("train_split partitions every document exactly once") {
    val split = Packing.trainSplit(spark, sf)
    val total = split.agg(sum($"n_docs")).as[Long].head()
    assert(total == Tables.documents(spark, sf).count())
    val bySplit = split.groupBy($"split").agg(sum($"n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    // 98/1/1 by construction; at sf scale just require train dominance
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
  }
}
