package graft.mr

import java.lang.reflect.{Method, Modifier}
import java.net.{URL, URLClassLoader}

/** A pluggable Map/Reduce application — the reference's plugin ABI
  * (`Map(string, string) []KeyValue` / `Reduce(string, []string) string`,
  * main/mrworker.go:33-51) as a JVM trait. Apps built against this trait
  * run through [[MapReduce.run]] unchanged.
  */
trait MrApp extends Serializable {
  def map(name: String, contents: String): IterableOnce[KeyValue]
  def reduce(key: String, values: Seq[String]): String
}

/** Submit-time app loading — the JVM analog of the reference worker's
  * `plugin.Open("wc.so")` + `Lookup("Map")/Lookup("Reduce")`
  * (main/mrworker.go:33-51): a job names its app as a string at submit
  * time instead of linking it at compile time.
  *
  * Resolution, in order:
  *   1. a Scala `object` (companion `MODULE$`) or a zero-arg-constructible
  *      class with the given fully-qualified name, from `jar` (a jar or
  *      class-dir URL, loaded in a child [[URLClassLoader]]) or, when
  *      `jar` is empty, from the current context classloader;
  *   2. if the instance implements [[MrApp]], it is used directly;
  *   3. otherwise duck-typed symbol lookup, like the reference's
  *      `Lookup`: a 2-arg `map`/`Map` method returning `IterableOnce`,
  *      `java.lang.Iterable` or `Array` of [[KeyValue]], and a 2-arg
  *      `reduce`/`Reduce` method taking `Seq`/`java.util.List`/`Array` of
  *      String — so plugins may be plain Java classes with no graft
  *      dependency beyond [[KeyValue]].
  *
  * Cluster note (100 TB mindset): the returned app is a thin serializable
  * handle holding only (className, jarUri); the reflective binding is
  * `@transient lazy` and re-resolves per executor JVM. Ship the plugin
  * with `--jars`/`spark.jars` (Spark's executor classloader then serves
  * it via the context classloader), or pass a cluster-visible `jar` URL.
  * That is the same deployment contract as the reference's `.so`, which
  * must exist on every worker host.
  */
object AppLoader {

  /** Load an app by fully-qualified name, optionally from a jar/dir URL. */
  def load(className: String, jar: Option[String] = None): MrApp = {
    val app = new ReflectiveApp(className, jar)
    app.bound // fail fast on the driver: bad name/ABI errors at submit time
    app
  }

  /** Resolve + bind eagerly (driver) or lazily (executor). */
  private[mr] def bind(className: String, jar: Option[String]): MrApp = {
    val parent = Option(Thread.currentThread.getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
    val loader = jar match {
      case Some(u) => new URLClassLoader(Array(toUrl(u)), parent)
      case None    => parent
    }
    instantiate(className, loader) match {
      case app: MrApp => app
      case other      => duckType(className, other)
    }
  }

  private def toUrl(u: String): URL = {
    val hasScheme = u.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")
    val uri =
      if (hasScheme) java.net.URI.create(u)
      else java.nio.file.Paths.get(u).toUri // bare path: jar file or class dir
    uri.toURL
  }

  /** Scala `object` first (`Foo$.MODULE$`), then a no-arg-ctor class. */
  private def instantiate(className: String, loader: ClassLoader): AnyRef = {
    val cls =
      try Class.forName(className + "$", true, loader)
      catch {
        case _: ClassNotFoundException =>
          try Class.forName(className, true, loader)
          catch {
            case _: ClassNotFoundException =>
              throw new IllegalArgumentException(
                s"cannot load app '$className' (cf. plugin.Open, main/mrworker.go:35-38)")
          }
      }
    if (cls.getName.endsWith("$") &&
        cls.getFields.exists(f => f.getName == "MODULE$" && Modifier.isStatic(f.getModifiers)))
      cls.getField("MODULE$").get(null)
    else
      try cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
      catch {
        case e: ReflectiveOperationException =>
          throw new IllegalArgumentException(
            s"app '$className' is neither an object nor zero-arg constructible", e)
      }
  }

  /** `Lookup("Map")`/`Lookup("Reduce")` by reflection, with shape
    * adapters for Java-native plugin signatures.
    */
  private def duckType(className: String, target: AnyRef): MrApp = {
    def lookup(lower: String): Method =
      target.getClass.getMethods
        .filter(m => (m.getName == lower || m.getName == lower.capitalize) &&
          m.getParameterCount == 2 && !Modifier.isStatic(m.getModifiers) &&
          !m.isBridge && !m.isSynthetic &&
          m.getParameterTypes()(0) == classOf[String])
        .headOption
        .getOrElse(throw new IllegalArgumentException(
          s"cannot find $lower in '$className' (cf. Lookup, main/mrworker.go:39-49)"))

    val mapM = lookup("map")
    val reduceM = lookup("reduce")
    val reduceParam = reduceM.getParameterTypes()(1)

    new MrApp {
      def map(name: String, contents: String): IterableOnce[KeyValue] =
        mapM.invoke(target, name, contents) match {
          case i: IterableOnce[_]     => i.iterator.map(_.asInstanceOf[KeyValue])
          case i: java.lang.Iterable[_] =>
            val it = i.iterator(); new Iterator[KeyValue] {
              def hasNext = it.hasNext
              def next() = it.next().asInstanceOf[KeyValue]
            }
          case a: Array[KeyValue]     => a.iterator // []mr.KeyValue, the Go shape
          case other => throw new IllegalArgumentException(
            s"map in '$className' returned unsupported ${if (other == null) "null" else other.getClass}")
        }

      def reduce(key: String, values: Seq[String]): String = {
        val arg: AnyRef =
          if (classOf[scala.collection.Seq[_]].isAssignableFrom(reduceParam)) values
          else if (classOf[java.util.List[_]].isAssignableFrom(reduceParam)) {
            val l = new java.util.ArrayList[String](values.size)
            values.foreach(l.add); l
          } else if (reduceParam.isArray) values.toArray[String]
          else throw new IllegalArgumentException(
            s"reduce in '$className' takes unsupported ${reduceParam.getName}")
        String.valueOf(reduceM.invoke(target, key, arg))
      }
    }
  }
}

/** Serializable handle: only (className, jarUri) cross the wire; the
  * reflective binding re-resolves once per JVM.
  */
private[mr] final class ReflectiveApp(className: String, jar: Option[String])
    extends MrApp {
  @transient private[mr] lazy val bound: MrApp = AppLoader.bind(className, jar)
  def map(name: String, contents: String): IterableOnce[KeyValue] =
    bound.map(name, contents)
  def reduce(key: String, values: Seq[String]): String =
    bound.reduce(key, values)
}
