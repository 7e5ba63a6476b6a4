package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Name → transform registry — the reference's TransformerRegistry
  * (`core/.../transformer/TransformerRegistry.java:28-105`: built-in
  * transformers pre-registered by name, user transformer jars loaded at
  * job start and resolved from the job config's transformer list). Here
  * a registered FACTORY takes the call's string arguments and returns a
  * `DataFrame => DataFrame` built from Catalyst columns, so a
  * config-named chain stays inside whole-stage codegen — unlike the
  * reference's per-record virtual `evaluate()` call
  * (`TransformerExchanger.java:53-127`).
  *
  * A job names its chain declaratively (IngestMain `transforms=`), e.g.
  * {{{ dx_substr(text,0,5),dx_filter(role,like,user.*) }}}
  * Calls split on top-level commas; within a call, the LAST argument
  * takes any remaining commas verbatim, so regex / SQL-expression
  * arguments need no escaping.
  *
  * Extension surface (the reference's runtime-loaded transformer jars):
  * [[TransformerRegistry.register]] a factory programmatically, or
  * [[TransformerRegistry.registerClass]] a [[NamedTransform]]
  * implementation by class name (IngestMain `transformClasses=`).
  */
object TransformerRegistry {

  /** args (length = arity, pre-split) => the transform to apply. */
  type Factory = Seq[String] => DataFrame => DataFrame

  final case class Entry(arity: Int, factory: Factory)

  private val builtins: Map[String, Entry] = Map(
    // in-place column rewrites (reference applies transforms to a column
    // index of the flowing record; the named column is the analogue)
    "dx_substr" -> Entry(3, { case Seq(c, start, len) => df =>
      df.withColumn(c, Transforms.dxSubstr(col(c), start.toInt, len.toInt)) }),
    "dx_pad" -> Entry(4, { case Seq(c, side, len, pad) => df =>
      require(side == "l" || side == "r", s"dx_pad side must be l|r, got $side")
      df.withColumn(c, Transforms.dxPad(col(c), side == "l", len.toInt, pad)) }),
    "dx_replace" -> Entry(4, { case Seq(c, start, len, s) => df =>
      df.withColumn(c, Transforms.dxReplace(col(c), start.toInt, len.toInt, s)) }),
    "dx_filter" -> Entry(3, { case Seq(c, op, v) => df =>
      df.filter(Transforms.keepFilter(col(c), op, v)) }),
    // the dx_groovy / ComplexTransformer analogue, declaratively: assign
    // (or add) a column from any SQL expression — Catalyst-compiled, so
    // it beats a script engine at every scale
    "dx_expr" -> Entry(2, { case Seq(target, sql) => df =>
      df.withColumn(target, expr(sql)) }),
    // dx_groovy parity: the argument IS code (a Java method body over
    // Object[] record, compiled by Janino per executor — see
    // [[ScriptedTransform]]); return null to drop the row. Last-arg
    // verbatim parsing means the body needs no comma escaping.
    "dx_script" -> Entry(1, { case Seq(body) => df =>
      ScriptedTransform.transform(df, body) }),
    "dx_url2base64" -> Entry(1, { case Seq(c) => df =>
      Transforms.urlToBase64(df, c) }))

  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Register a transform under `name`. Built-in names cannot be
    * shadowed; re-registering a user name replaces it (latest wins). */
  def register(name: String, arity: Int, factory: Factory): Unit = {
    require(!builtins.contains(name), s"cannot shadow built-in transform $name")
    registered.put(name, Entry(arity, factory))
  }

  /** The reflection half of the reference's jar loading: resolve a
    * [[NamedTransform]] implementation by class name (no-arg ctor) and
    * register it. The jar itself arrives via the job's normal classpath
    * (`spark-submit --jars`), which Spark already distributes. */
  def registerClass(name: String, className: String): Unit = {
    val t = Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[NamedTransform]
    register(name, t.arity, t.apply)
  }

  def known: Seq[String] =
    (builtins.keys ++ registered.keySet.asScala).toSeq.sorted

  def resolve(name: String): Entry =
    builtins.get(name).orElse(Option(registered.get(name))).getOrElse(
      throw new IllegalArgumentException(
        s"unknown transform $name (known: ${known.mkString(", ")})"))

  /** Parse a chain spec into its transforms, in order. */
  def parseChain(spec: String): Seq[DataFrame => DataFrame] =
    splitCalls(spec).map { call =>
      val open = call.indexOf('(')
      require(open > 0 && call.endsWith(")"), s"malformed transform call: $call")
      val e = resolve(call.substring(0, open).trim)
      e.factory(splitArgs(call.substring(open + 1, call.length - 1), e.arity))
    }

  def applyChain(df: DataFrame, spec: String): DataFrame =
    parseChain(spec).foldLeft(df)((d, f) => f(d))

  /** Split `a(..),b(..)` on commas at paren depth 0. */
  private def splitCalls(spec: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0
    var start = 0
    for (i <- spec.indices) spec.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += spec.substring(start, i).trim; start = i + 1
      case _ =>
    }
    out += spec.substring(start).trim
    out.filter(_.nonEmpty).toSeq
  }

  /** Split an argument list into exactly `arity` parts: the first
    * `arity - 1` commas split, the remainder is the last argument
    * verbatim (so regex/expr args may contain commas). All parts trim. */
  private def splitArgs(argStr: String, arity: Int): Seq[String] = {
    if (arity == 0) {
      require(argStr.trim.isEmpty, s"expected no args, got '$argStr'")
      return Nil
    }
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var rest = argStr
    var i = 0
    while (i < arity - 1) {
      val c = rest.indexOf(',')
      require(c >= 0, s"expected $arity args, got '${argStr}'")
      parts += rest.substring(0, c).trim
      rest = rest.substring(c + 1)
      i += 1
    }
    parts += rest.trim
    parts.toSeq
  }
}

/** User-extension contract for [[TransformerRegistry.registerClass]] —
  * the Spark-side analogue of the reference's `Transformer` base class
  * (`core/.../transformer/Transformer.java`): declare the argument count
  * and build the transform from the configured arguments. */
trait NamedTransform {
  def arity: Int
  def apply(args: Seq[String]): DataFrame => DataFrame
}
