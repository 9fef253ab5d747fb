package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** No query may emit IEEE -0.0 (VERDICT r7 item 2): the driver's
  * correctness gate hashes result BYTES, and -0.0 != +0.0 there. Spark's
  * BigDecimal-based `round` normalizes to +0.0 by construction, and every
  * DuckDB oracle leaf that can round a tiny negative now adds `+ 0.0` —
  * this spec pins the Spark half of that contract over the WHOLE catalog
  * (the oracle half is swept by scripts/check_oracle.py's NEGZ check each
  * verify run), so a future query whose double leaf skips the normalized
  * rounding discipline fails here instead of shipping a latent
  * hash-mismatch that only fires when some SF's data rounds to zero from
  * below.
  */
class NegZeroSpec extends SparkSpec {

  test("no catalog query emits -0.0 in any double/float column at sf0.001") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf)
      val floatCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
      }
      if (floatCols.nonEmpty) {
        // signbit check: -0.0 == 0.0 in SQL comparisons (and 1/x division
        // traps under ANSI), so go through the string rendering, which
        // preserves the sign ("-0.0")
        val conds = floatCols.map(c =>
          s"coalesce(sum(CASE WHEN CAST(`$c` AS DOUBLE) = 0.0 AND " +
            s"startswith(CAST(CAST(`$c` AS DOUBLE) AS STRING), '-') " +
            s"THEN 1 ELSE 0 END), 0) AS `$c`")
        val row = df.selectExpr(conds: _*).collect().head
        floatCols.zipWithIndex.foreach { case (c, i) =>
          val n = row.getLong(i)
          if (n > 0) offenders += s"$name.$c ($n cells)"
        }
      }
    }
    assert(offenders.isEmpty,
      s"queries emitting -0.0: ${offenders.mkString(", ")}")
  }
}
