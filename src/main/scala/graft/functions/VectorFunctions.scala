package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding dot product — the hot
  * scalar of every similarity operator. A `zip_with`+`aggregate`
  * composition is semantically identical but runs interpreted
  * (higher-order functions have no codegen); this expression generates
  * a tight primitive loop inside whole-stage codegen — measured ~4x
  * on the sf0.1 near-dup self-join.
  *
  * Accumulation is a left-to-right IEEE double fold in index order —
  * bit-identical to the `aggregate()` formulation it replaces, so
  * oracle parity is unaffected.
  *
  * Elements must be non-null FLOAT or DOUBLE (embedding vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_dot expects array<float>/array<double>, got " +
          s"${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    def get(arr: String, dt: DataType, i: String): String = dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    val lt = elemType(left); val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, lt, i)} * ${get(b, rt, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Registration + Column-level API for the custom expressions. */
object VectorFunctions {

  val name = "graft_dot"

  private val info = new ExpressionInfo(classOf[DotProduct].getName, name)

  /** one-time, idempotent per-session registration */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")

  /** dot(a, b) through the codegen'd native expression */
  def dotF(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(name, a, b)
  }
}

/** `SparkSessionExtensions` hook so deployments can install the
  * function fleet-wide via `spark.sql.extensions=graft.GraftExtensions`
  * instead of calling register() in code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier(VectorFunctions.name),
      new ExpressionInfo(classOf[DotProduct].getName,
        VectorFunctions.name),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier(TextFunctions.trgmName),
      new ExpressionInfo(classOf[TrigramMasks].getName,
        TextFunctions.trgmName),
      (exprs: Seq[Expression]) => TrigramMasks(exprs.head)))
  }
}
