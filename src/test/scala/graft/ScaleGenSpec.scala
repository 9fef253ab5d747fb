package graft

import org.apache.spark.sql.functions._

/** Guards the scale-rehearsal generator: the sf1/sf3 evidence is only
  * as good as ScaleGen's invariants, so they are pinned here on a
  * small factor — FK consistency (same ceil on both sides of every
  * key domain), schema equality with the source, exact row scaling,
  * near-dup (never byte-equal) replica content, and a timestamp-typed
  * events.ts.
  */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val outDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graftscale").toString
    graft.ScaleGen.main(Array(sf, tmp, "3"))
    tmp
  }

  private def src(t: String) = spark.read.parquet(s"$sf/$t.parquet")
  private def out(t: String) = spark.read.parquet(s"$outDir/$t.parquet")

  test("row counts scale exactly Rx for scaled tables, 1x for dims") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings"))
      assert(out(t).count() == 3 * src(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(out(t).count() == src(t).count(), t)
  }

  test("every foreign key resolves after scaling (no dangling references)") {
    def dangling(fact: String, fk: String, dim: String, pk: String): Long =
      out(fact).select(col(fk).as("k"))
        .join(out(dim).select(col(pk).as("k")), Seq("k"), "left_anti").count()
    assert(dangling("orders", "o_custkey", "customer", "c_custkey") == 0L)
    assert(dangling("lineitem", "l_orderkey", "orders", "o_orderkey") == 0L)
    assert(dangling("lineitem", "l_partkey", "part", "p_partkey") == 0L)
    assert(dangling("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0L)
    // events.user_id is an FK to customer.c_custkey (segment-enrich joins);
    // shifting it by its own ceil instead of custCeil left it resolvable
    // (user_id's domain is a strict subset of custkey's) but re-wired to
    // the WRONG replica's customers — so a left-anti check alone is not
    // enough; the histogram test below pins the wiring
    assert(dangling("events", "user_id", "customer", "c_custkey") == 0L)
  }

  test("key shifts preserve per-replica join fan-out (FK ceils move in lockstep)") {
    // the orders-per-customer distribution must be EXACTLY the source's,
    // replicated: a mismatched ceil on one side would re-wire orders to
    // the wrong replica's customers and change the histogram
    val want = src("orders").groupBy($"o_custkey").count()
      .groupBy($"count").count().as[(Long, Long)].collect()
      .map { case (k, n) => k -> 3 * n }.toMap
    val got = out("orders").groupBy($"o_custkey").count()
      .groupBy($"count").count().as[(Long, Long)].collect().toMap
    assert(got == want, s"orders-per-customer histogram drifted: $got vs $want")
    // same lockstep requirement for events: user_id must shift by the
    // CUSTOMER ceil, so each customer replica keeps exactly the source's
    // events-per-user distribution
    val wantEv = src("events").groupBy($"user_id").count()
      .groupBy($"count").count().as[(Long, Long)].collect()
      .map { case (k, n) => k -> 3 * n }.toMap
    val gotEv = out("events").groupBy($"user_id").count()
      .groupBy($"count").count().as[(Long, Long)].collect().toMap
    assert(gotEv == wantEv, s"events-per-customer histogram drifted: $gotEv vs $wantEv")
  }

  test("document replicas are near-duplicates, never byte twins; n_chars consistent") {
    val texts = out("documents").select($"text").as[String].collect()
    assert(texts.distinct.length == texts.length, "byte-equal replica text defeats the dedup workload")
    val badChars = out("documents")
      .filter(length($"text").cast("long") =!= $"n_chars").count()
    assert(badChars == 0L, "n_chars out of sync with transformed text")
    // replica of doc 0 shares its prefix (near-dup, not unrelated)
    val base = src("documents").filter($"doc_id" === 0).select($"text").as[String].head()
    val ceil = src("documents").agg(max($"doc_id")).as[Long].head() + 1
    val rep = out("documents").filter($"doc_id" === ceil).select($"text").as[String].head()
    assert(rep.startsWith(base) && rep != base)
  }

  // ---- skew mode: the planted hot keys, fractions, and invariants ----

  private lazy val skewDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graftskew").toString
    graft.ScaleGen.main(Array(sf, tmp, "3", "skew"))
    tmp
  }
  private def sk(t: String) = spark.read.parquet(s"$skewDir/$t.parquet")

  test("skew mode: one customer owns ~20% of orders AND events, FKs still resolve") {
    val hot = src("customer").agg(min($"c_custkey")).as[Long].head()
    val o = sk("orders")
    val oTot = o.count()
    val oHot = o.filter($"o_custkey" === hot).count()
    // 20% planted + the hot customer's own organic orders
    assert(oHot >= oTot / 5 && oHot < oTot / 3, s"hot customer owns $oHot of $oTot orders")
    val ev = sk("events")
    val eTot = ev.count()
    val eHot = ev.filter($"user_id" === hot).count()
    assert(eHot >= eTot / 5 && eHot < eTot / 3, s"hot user owns $eHot of $eTot events")
    // planting must never break FK resolution
    def dangling(fact: String, fk: String, dim: String, pk: String): Long =
      sk(fact).select(col(fk).as("k"))
        .join(sk(dim).select(col(pk).as("k")), Seq("k"), "left_anti").count()
    assert(dangling("orders", "o_custkey", "customer", "c_custkey") == 0L)
    assert(dangling("events", "user_id", "customer", "c_custkey") == 0L)
  }

  test("skew mode: hot token rides half the docs, n_chars stays consistent") {
    val d = sk("documents")
    val n = d.count()
    val hot = d.filter($"text".endsWith("graftskewhot")).count()
    assert(hot * 2 >= n - 1 && hot * 2 <= n + 1, s"hot token in $hot of $n docs")
    assert(d.filter(length($"text").cast("long") =!= $"n_chars").count() == 0L)
  }

  test("skew mode: one embedding ball holds 20% of vectors within epsilon") {
    val base = src("embeddings").filter($"vec_id" === 0)
      .select($"embedding").as[Seq[Float]].head().map(_.toDouble)
    val vecs = sk("embeddings").select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val inBall = vecs.count { case (_, v) =>
      v.zip(base).map { case (a, b) => math.abs(a - b) }.max <= 5e-4
    }
    assert(inBall >= vecs.length / 5, s"ball holds $inBall of ${vecs.length}")
    // exactly the vec_id % 5 == 0 rows were collapsed
    vecs.foreach { case (id, v) =>
      val near = v.zip(base).map { case (a, b) => math.abs(a - b) }.max <= 5e-4
      assert(near == (id % 5 == 0), s"vec $id ball membership wrong")
    }
  }

  test("embedding replicas are perturbed, probe set intact, events.ts is a timestamp") {
    val vecs = out("embeddings").select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(vecs.map(_._2).distinct.length == vecs.length, "byte-equal embedding replicas")
    // probe contract: vec_id < NumQueries exists only in replica 0
    assert(vecs.count(_._1 < graft.sim.Similarity.NumQueries) ==
      graft.sim.Similarity.NumQueries)
    assert(out("events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      "events.ts must be a real timestamp for the DuckDB oracle")
  }
}
