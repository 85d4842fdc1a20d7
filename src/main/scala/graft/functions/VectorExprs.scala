package graft.functions

import org.apache.spark.sql.{Column, GraftSqlCompat}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd one-pass vector kernels for embedding columns.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is semantically right but Spark's higher-order functions are
  * CodegenFallback: every pair evaluation allocates a lambda scope and an
  * intermediate product array. On ANN/kNN candidate scoring — the hot path
  * is O(pairs x dim) — that interpreter overhead dominates the actual
  * arithmetic. These expressions generate a tight primitive loop instead
  * (one accumulator pass, no allocation), exactly preserving the original
  * semantics: ascending-index accumulation order (bit-identical sums),
  * null when lengths differ or any element is null, double precision
  * throughout.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null on length mismatch / null element, even for non-null array inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(et, _) => et.isInstanceOf[NumericType]
      case _                => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two numeric array arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def readDouble(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case DoubleType  => arr.getDouble(i)
    case FloatType   => arr.getFloat(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case DecimalType() => arr.get(i, et).asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  protected def javaRead(et: DataType, arr: String, i: String): String = et match {
    case DoubleType  => s"$arr.getDouble($i)"
    case FloatType   => s"(double) $arr.getFloat($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
}

/** Σ a(i)·b(i) in double precision; null if lengths differ or any element
  * is null (the `aggregate(zip_with(...))` null semantics). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (arrA, arrB) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    val (etA, etB) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      acc += readDouble(etA, arrA, i) * readDouble(etB, arrB, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arrA, arrB) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $arrA.numElements();
         |if ($n != $arrB.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arrA.isNullAt($i) || $arrB.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${javaRead(elemType(left), arrA, i)} * ${javaRead(elemType(right), arrB, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in one pass: dot, |a|², |b|² accumulated together;
  * 0.0 when either norm is zero (matching `Ann.cosine`'s guarded form
  * `when(sqrt(aa)*sqrt(bb) === 0, 0)`), null on length mismatch / null
  * element. Denominator is sqrt(aa)*sqrt(bb) — same association as the
  * composable version and the DuckDB oracle, so 5-dp rounding agrees. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (arrA, arrB) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    val (etA, etB) = (elemType(left), elemType(right))
    var dot = 0.0
    var aa  = 0.0
    var bb  = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val x = readDouble(etA, arrA, i)
      val y = readDouble(etB, arrB, i)
      dot += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arrA, arrB) => {
      val n     = ctx.freshName("n")
      val i     = ctx.freshName("i")
      val dot   = ctx.freshName("dot")
      val aa    = ctx.freshName("aa")
      val bb    = ctx.freshName("bb")
      val x     = ctx.freshName("x")
      val y     = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $arrA.numElements();
         |if ($n != $arrB.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arrA.isNullAt($i) || $arrB.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${javaRead(elemType(left), arrA, i)};
         |    final double $y = ${javaRead(elemType(right), arrB, i)};
         |    $dot += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |    ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  def vecDot(a: Column, b: Column): Column =
    GraftSqlCompat.toColumn(VecDot(GraftSqlCompat.toExpr(a), GraftSqlCompat.toExpr(b)))

  def vecCosine(a: Column, b: Column): Column =
    GraftSqlCompat.toColumn(VecCosine(GraftSqlCompat.toExpr(a), GraftSqlCompat.toExpr(b)))
}
