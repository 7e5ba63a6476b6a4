package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst vector expressions with whole-stage codegen.
  *
  * The declarative dot product — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — runs interpreted (higher-order functions are excluded from codegen),
  * which makes it the hot cost of every ANN candidate pair. These
  * expressions generate a primitive `double` loop instead: no lambda
  * dispatch, no boxing, fused into the surrounding codegen stage. The
  * summation is the same left-to-right fold, so results are bitwise
  * identical to both the declarative form and DuckDB's
  * `list_dot_product` oracle.
  *
  * This is the (b)-tier of the build guidance — a custom `Expression`
  * with `doGenCode` beating the built-in-but-interpreted formulation —
  * applied where profiling showed it matters (SURVEY.md §7.4 revisited).
  * Register per session via [[GraftFunctions.register]] or globally via
  * [[GraftExtensions]] (`spark.sql.extensions`).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => VectorExprs.isDoubleArray(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // ev.value is declared by nullSafeCodeGen; assign only
      s"""
         |${ev.value} = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm: sqrt(dot(v, v)) as one codegen'd loop. */
case class L2Norm(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isDoubleArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<DOUBLE> argument, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  ${ev.value} += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt(${ev.value});
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

private[functions] object VectorExprs {
  def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** Session-scoped registration (`graft_dot`, `graft_norm` SQL functions). */
object GraftFunctions {
  val names: Seq[String] = Seq("graft_dot", "graft_norm")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      (es: Seq[Expression]) => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_norm",
      (es: Seq[Expression]) => L2Norm(es.head), "built-in")
  }
}

/** `spark.sql.extensions`-style injection for cluster-wide installs:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (es: Seq[Expression]) => L2Norm(es.head)))
  }
}
