package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for embedding math (SURVEY.md §4.3: the one
  * place reference semantics justify dropping below the DataFrame API).
  *
  * `float_dot(a, b)` / `float_cosine(a, b)` iterate the columnar
  * `ArrayData` buffers directly inside whole-stage codegen — no
  * intermediate array allocation, no lambda-variable plumbing — where the
  * built-in `aggregate(zip_with(...))` chain materializes a product array
  * per row and evaluates two lambdas per element. Same double
  * left-to-right accumulation semantics as that chain.
  *
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or imperatively
  * via [[GraftFunctions.register]]. */
abstract class FloatArrayBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Σ aᵢ·bᵢ over two float vectors, accumulated in double left-to-right
  * (index-exact match with `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`). */
case class FloatDotProduct(left: Expression, right: Expression)
    extends FloatArrayBinary {

  override def prettyName: String = "float_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity: dot and both norms in ONE pass over the buffers
  * (three zip_with/aggregate chains otherwise). Returns NULL only via the
  * null-intolerant inputs; zero-norm vectors yield NaN like the SQL
  * formulation dot/(sqrt(n1)*sqrt(n2)). */
case class FloatCosineSimilarity(left: Expression, right: Expression)
    extends FloatArrayBinary {

  override def prettyName: String = "float_cosine"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two quantized (1e6-scaled BIGINT) vectors — exact 64-bit
  * integer accumulation, value-identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)` but evaluated as one
  * tight loop over the columnar buffers. The interpreted HOF chain costs
  * ~2 lambda evaluations + an array allocation per ELEMENT — measured 7×
  * end-to-end on the IVF probe (q_ivf_topk 18.5s → 2.6s at sf0.1), where
  * the dot sits inside a per-centroid transform() and the join-constraint
  * pushdown re-evaluates it several times per row. */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "long_dot"
  override def dataType: DataType = LongType
  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Imperative registration into an existing session (tests, notebooks). */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> { args => FloatDotProduct(args(0), args(1)) },
    "float_cosine" -> { args => FloatCosineSimilarity(args(0), args(1)) },
    "long_dot" -> { args => LongDotProduct(args(0), args(1)) },
    "graft_hash60" -> Hash60.builder,
    "rolling_hashes" -> RollingHashes.builder)

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.VectorExpressions", name),
      builder)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — injects the vector
  * functions at session build time (the SparkSessionExtensions seam; rules
  * and strategies would be injected here too). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CollapseIdempotentStringFns)
    ext.injectPlannerStrategy(_ => SessionizeStrategy)
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo("graft.plans.VectorExpressions", "float_dot"),
      (args: Seq[Expression]) => FloatDotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("float_cosine"),
      new ExpressionInfo("graft.plans.VectorExpressions", "float_cosine"),
      (args: Seq[Expression]) => FloatCosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo("graft.plans.VectorExpressions", "long_dot"),
      (args: Seq[Expression]) => LongDotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash60"),
      new ExpressionInfo("graft.plans.Hash60Expression", "graft_hash60"),
      Hash60.builder))
    ext.injectFunction((
      FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo("graft.plans.RollingHashExpression", "rolling_hashes"),
      RollingHashes.builder))
  }
}
