package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.mr.{AppLoader, KeyValue, MapReduce, MrApp}

/** The reference's eight pluggable Map/Reduce apps (SURVEY.md §2.2) as
  * idiomatic DataFrame pipelines over the `documents` table (which plays
  * the role of the Gutenberg corpus: doc text + `source` as the file
  * name). Each app also exposes its (mapFn, reduceFn) pair so the tests
  * can prove the generic [[graft.mr.MapReduce]] core computes the same
  * result as the declarative pipeline.
  *
  * Scale notes: every pipeline is scan → narrow transforms → ONE hash
  * aggregate (partial+final, so the shuffle carries pre-combined rows).
  * Tokenization stays inside whole-stage codegen (`split`/`explode`
  * builtins, no UDFs).
  */
object MrApps {

  /** `unicode.IsLetter` tokenizer of the reference wc app
    * (mrapps/wc.go:23-26) — `\p{L}` is the same predicate in Java regex
    * and in DuckDB's RE2.
    */
  val LetterTokenPattern = "[^\\p{L}]+"

  // ---- map/reduce fn pairs (the reference plugin ABI, for MapReduce.run) ----

  val wcMap: (String, String) => IterableOnce[KeyValue] = (_, contents) =>
    contents.split(LetterTokenPattern).iterator.filter(_.nonEmpty).map(KeyValue(_, "1"))
  val wcReduce: (String, Seq[String]) => String = (_, vs) => vs.size.toString

  val indexerMap: (String, String) => IterableOnce[KeyValue] = (name, contents) =>
    contents.split(LetterTokenPattern).iterator.filter(_.nonEmpty).distinct
      .map(KeyValue(_, name))
  val indexerReduce: (String, Seq[String]) => String = (_, vs) =>
    s"${vs.size} ${vs.distinct.sorted.mkString(",")}"

  /** nocrash app semantics (mrapps/nocrash.go:28-49): four fixed pairs per
    * input; reduce sorts values and joins with " ".
    */
  val crashMap: (String, String) => IterableOnce[KeyValue] = (name, contents) =>
    Seq(
      KeyValue("a", name),
      KeyValue("b", name.length.toString),
      KeyValue("c", contents.length.toString),
      KeyValue("d", "xyzzy"))
  val crashReduce: (String, Seq[String]) => String = (_, vs) => vs.sorted.mkString(" ")

  val wcLongMap: (String, String) => IterableOnce[KeyValue] = (_, contents) =>
    contents.split("\\s+").iterator.filter(_.nonEmpty).map(KeyValue(_, "1"))
  val wcLongReduce: (String, Seq[String]) => String = (_, vs) => vs.mkString(",")

  val earlyExitMap: (String, String) => IterableOnce[KeyValue] = (name, _) =>
    Iterator.single(KeyValue(name, "1"))
  val earlyExitReduce: (String, Seq[String]) => String = (_, vs) => vs.size.toString

  // ---- submit-time plugin ABI (the reference's wc.so, mrapps/wc.go) ----

  /** wc packaged as a loadable [[MrApp]]: what a user ships instead of the
    * reference's compiled `wc.so`. Referenced BY NAME through
    * [[AppLoader]] in `mr_wc_plugin` below, so the catalog proves the
    * whole submit-time path (resolve → bind → distribute → reduce).
    */
  object WcApp extends MrApp {
    def map(name: String, contents: String): IterableOnce[KeyValue] = wcMap(name, contents)
    def reduce(key: String, values: Seq[String]): String = wcReduce(key, values)
  }

  /** wc through the generic core with the app resolved at run time from
    * its class name — no compile-time link between the job and the app
    * (main/mrworker.go:33-51). Same answer as `mr_wc`, but `value` is a
    * string: the plugin ABI is untyped, like the reference's.
    */
  def wcPlugin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val app = AppLoader.load("graft.apps.MrApps$WcApp")
    val docs = Tables.documents(spark, sfDir).select("source", "text").as[(String, String)]
    MapReduce.runApp(spark, docs, app, 16).toDF()
  }

  // ---- declarative pipelines (registered in SparkEntry.queries) ----

  private def tokens(spark: SparkSession, sfDir: String, pattern: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), pattern)).as("word"))
      .filter(length(col("word")) > 0)

  /** wc: tokenize on non-letter runes, count per word (mrapps/wc.go:21-42). */
  def wc(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir, LetterTokenPattern)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** indexer: inverted index word -> "<n> doc1,doc2,..." with doc ids
    * deduped per document and sorted (mrapps/indexer.go:21-40).
    */
  def indexer(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir, LetterTokenPattern)
      .select(col("word"), col("doc_id").cast("string").as("doc"))
      .distinct()
      .groupBy("word")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(sort_array(collect_set(col("doc"))), ",").as("docs"))

  /** crash/nocrash pipeline: 4 fixed pairs per document, reduce = sorted
    * space-join (mrapps/crash.go:36-57). `source` plays the file name,
    * `n_chars` the byte length.
    */
  def crashPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.select(explode(array(
        struct(lit("a").as("k"), col("source").as("v")),
        struct(lit("b").as("k"), length(col("source")).cast("string").as("v")),
        struct(lit("c").as("k"), col("n_chars").cast("string").as("v")),
        struct(lit("d").as("k"), lit("xyzzy").as("v")))).as("kv"))
      .select(col("kv.k").as("k"), col("kv.v").as("v"))
      .groupBy("k")
      .agg(array_join(sort_array(collect_list(col("v"))), " ").as("vals"))
  }

  /** wc_long: whitespace tokenizer, values joined with ","
    * (mrapps/wc_long.go:9-22). All values are "1", so collect order is
    * irrelevant.
    */
  def wcLong(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir, "\\s+")
      .groupBy("word")
      .agg(array_join(collect_list(lit("1")), ",").as("ones"))

  /** early_exit: one pair per input file, count per file
    * (mrapps/early_exit.go:18-35).
    */
  def earlyExit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wc" -> (wc _),
    "mr_wc_plugin" -> (wcPlugin _),
    "mr_indexer" -> (indexer _),
    "mr_crash" -> (crashPipeline _),
    "mr_wc_long" -> (wcLong _),
    "mr_early_exit" -> (earlyExit _))

  val oracles: Map[String, String] = Map(
    "mr_wc" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word FROM documents) t
        |WHERE length(word) > 0 GROUP BY word""".stripMargin,
    "mr_wc_plugin" ->
      """SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
        |FROM (SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word FROM documents) t
        |WHERE length(word) > 0 GROUP BY word""".stripMargin,
    "mr_indexer" ->
      """SELECT word, count(*) AS n_docs, string_agg(doc, ',' ORDER BY doc) AS docs
        |FROM (SELECT DISTINCT word, doc FROM
        |       (SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word,
        |               CAST(doc_id AS VARCHAR) AS doc FROM documents) u
        |      WHERE length(word) > 0) t
        |GROUP BY word""".stripMargin,
    "mr_crash" ->
      """SELECT k, string_agg(v, ' ' ORDER BY v) AS vals FROM (
        |  SELECT 'a' AS k, source AS v FROM documents UNION ALL
        |  SELECT 'b' AS k, CAST(length(source) AS VARCHAR) AS v FROM documents UNION ALL
        |  SELECT 'c' AS k, CAST(n_chars AS VARCHAR) AS v FROM documents UNION ALL
        |  SELECT 'd' AS k, 'xyzzy' AS v FROM documents) t
        |GROUP BY k""".stripMargin,
    "mr_wc_long" ->
      """SELECT word, string_agg('1', ',') AS ones
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents) t
        |WHERE length(word) > 0 GROUP BY word""".stripMargin,
    "mr_early_exit" ->
      "SELECT source, count(*) AS cnt FROM documents GROUP BY source")
}
