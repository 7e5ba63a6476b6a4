package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Config-text record transform — the reference's GroovyTransformer
  * surface (`core/.../transformer/GroovyTransformer.java:17-95`: the job
  * config carries CODE as a string; it is wrapped into a generated class
  * with an `evaluate(Record)` method, compiled at job start, and applied
  * per record — return null to drop the record).
  *
  * Same contract here, compiled by Janino — the compiler Spark itself
  * ships for whole-stage codegen, so the capability costs no new
  * dependency and exists on every Spark classpath. The config string is
  * a Java method body over `Object[] record` (one slot per column, Spark
  * external types: String / Long / Integer / Double / java.sql.Timestamp
  * …); it may rewrite slots in place and must `return record` (or a
  * same-arity array), or `return null` to drop the row — exactly the
  * reference's dirty/filter semantics.
  *
  * Distribution: the CODE STRING is what ships in the task closure;
  * each executor JVM compiles it once into [[ScriptedTransform.Cache]]
  * (keyed by source text) and reuses the instance across partitions.
  * Nothing non-serializable ever crosses the wire, so the same job spec
  * works identically on local[n] and a 1000-executor cluster.
  *
  * This is the escape hatch, not the default: a transform expressible as
  * SQL belongs in `dx_expr` (Catalyst-compiled, stays inside whole-stage
  * codegen); `dx_script` exits codegen for its stage and pays external
  * row conversion, the same per-record virtual-call price the reference
  * always pays (`TransformerExchanger.java:53-127`).
  */
object ScriptedTransform {

  /** The generated class's contract (public: Janino's generated class
    * lives outside this package). Input = one row as external objects;
    * output = same-arity row, or null to drop. */
  trait RecordScript {
    def evaluate(record: Array[Object]): Array[Object]
  }

  /** Compile a Java method body into a [[RecordScript]]. Fails fast at
    * job-assembly time on syntax errors (the reference compiles Groovy at
    * transformer-build time too) — a bad script never reaches executors. */
  def compile(body: String): RecordScript = {
    val cbe = new org.codehaus.janino.ClassBodyEvaluator()
    cbe.setImplementedInterfaces(Array(classOf[RecordScript]))
    cbe.cook(
      "public Object[] evaluate(Object[] record) {\n" + body + "\n}")
    cbe.getClazz.getDeclaredConstructor().newInstance()
      .asInstanceOf[RecordScript]
  }

  /** Per-JVM compile cache: executors compile each distinct script once,
    * however many partitions they process. */
  private object Cache {
    private val compiled = new ConcurrentHashMap[String, RecordScript]()
    def get(body: String): RecordScript =
      compiled.computeIfAbsent(body, compile(_))
  }

  /** Apply a config-string script to every row. Schema is preserved (the
    * reference's transformers rewrite the flowing record, never reshape
    * it); a script returning a wrong-arity array fails the task with a
    * clear message instead of corrupting rows. */
  def transform(df: DataFrame, body: String): DataFrame = {
    compile(body) // driver-side validation; result discarded
    val arity = df.schema.size
    implicit val enc = Encoders.row(df.schema)
    df.mapPartitions { rows =>
      val script = Cache.get(body)
      rows.flatMap { row =>
        val in = Array.tabulate[Object](arity)(i =>
          row.get(i).asInstanceOf[Object])
        Option(script.evaluate(in)).map { out =>
          require(out.length == arity,
            s"script returned ${out.length} slots for a $arity-column row")
          Row.fromSeq(out.toSeq)
        }
      }
    }
  }
}
