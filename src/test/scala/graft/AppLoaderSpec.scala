package graft

import graft.apps.MrApps
import graft.mr.{AppLoader, KeyValue, MapReduce}

/** Duck-typed plugin in the Go shape: capitalized `Map`/`Reduce` symbols
  * (main/mrworker.go:39-49), array-valued map, list-valued reduce — no
  * [[graft.mr.MrApp]] inheritance.
  */
object GoShapedWc {
  def Map(name: String, contents: String): Array[KeyValue] =
    contents.split(MrApps.LetterTokenPattern).filter(_.nonEmpty).map(KeyValue(_, "1"))
  def Reduce(key: String, values: java.util.List[String]): String =
    values.size.toString
}

/** Submit-time app loading (the reference's plugin.Open/Lookup path,
  * main/mrworker.go:33-51): resolve-by-name, duck-typed ABI adaptation,
  * an externally-compiled Java plugin, and failure modes.
  */
class AppLoaderSpec extends SparkSpec {
  import spark.implicits._

  private def docsInput =
    Tables.documents(spark, sf).select("source", "text").as[(String, String)]

  private lazy val declarativeWc: Map[String, String] =
    MrApps.wc(spark, sf).collect().map(r => r.getString(0) -> r.getLong(1).toString).toMap

  test("MrApp object loaded by name == declarative wc") {
    val app = AppLoader.load("graft.apps.MrApps$WcApp")
    val got = MapReduce.runApp(spark, docsInput, app, 8)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === declarativeWc)
  }

  test("duck-typed Go-shaped plugin (Map/Reduce symbols, array/list ABI)") {
    val app = AppLoader.load("graft.GoShapedWc")
    val got = MapReduce.runApp(spark, docsInput, app, 8)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === declarativeWc)
  }

  test("Java plugin compiled at submit time, loaded from an external dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plugin")
    val src = dir.resolve("WcJavaPlugin.java")
    java.nio.file.Files.writeString(
      src,
      """import java.util.ArrayList;
        |import java.util.List;
        |public class WcJavaPlugin {
        |  public List<graft.mr.KeyValue> map(String name, String contents) {
        |    List<graft.mr.KeyValue> out = new ArrayList<>();
        |    for (String w : contents.split("[^\\p{L}]+"))
        |      if (!w.isEmpty()) out.add(new graft.mr.KeyValue(w, "1"));
        |    return out;
        |  }
        |  public String reduce(String key, List<String> values) {
        |    return Integer.toString(values.size());
        |  }
        |}
        |""".stripMargin)
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(javac != null, "JDK compiler expected in the test JVM")
    val rc = javac.run(null, null, null,
      "-cp", System.getProperty("java.class.path"),
      "-d", dir.toString, src.toString)
    assert(rc === 0, "plugin compilation failed")

    val app = AppLoader.load("WcJavaPlugin", Some(dir.toString))
    val got = MapReduce.runApp(spark, docsInput, app, 8)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === declarativeWc)
  }

  test("unknown app name fails at submit time") {
    val e = intercept[IllegalArgumentException](AppLoader.load("graft.NoSuchApp"))
    assert(e.getMessage.contains("cannot load app"))
  }

  test("class without the Map/Reduce ABI fails at submit time") {
    val e = intercept[IllegalArgumentException](AppLoader.load("graft.Tables"))
    assert(e.getMessage.contains("cannot find map"))
  }
}
