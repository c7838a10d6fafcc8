package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math. Same rationale as
  * [[TextExpressions]]: `zip_with`/`aggregate` lambdas are interpreted
  * per-element; these run the dot/norm loops as compiled code over the
  * underlying ArrayData without boxing. Inputs may be array<float> or
  * array<double>. */
object VectorExpressions {
  @inline def readVec(a: ArrayData, elemIsFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    if (elemIsFloat) while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }
    else while (i < n) { out(i) = a.getDouble(i); i += 1 }
    out
  }
  def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
}

abstract class VecBinaryExpression extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  private lazy val leftFloat = VectorExpressions.elemIsFloat(left.dataType)
  private lazy val rightFloat = VectorExpressions.elemIsFloat(right.dataType)
  protected def ofVecs(a: Array[Double], b: Array[Double]): Any
  override def nullSafeEval(l: Any, r: Any): Any = ofVecs(
    VectorExpressions.readVec(l.asInstanceOf[ArrayData], leftFloat),
    VectorExpressions.readVec(r.asInstanceOf[ArrayData], rightFloat))
}

case class DotProductExpr(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def ofVecs(a: Array[Double], b: Array[Double]): Any = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity; 0.0 for zero vectors (no NaN). */
case class CosineSimExpr(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def ofVecs(a: Array[Double], b: Array[Double]): Any = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class EuclideanDistExpr(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def ofVecs(a: Array[Double], b: Array[Double]): Any = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane sign signature: bit p set iff dot(v, planes(p)) >= 0.
  * Planes ship as compiled constants inside the expression. */
case class HyperplaneSigExpr(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  private lazy val isFloat = VectorExpressions.elemIsFloat(child.dataType)
  private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray
  override def nullSafeEval(input: Any): Any = {
    val v = VectorExpressions.readVec(input.asInstanceOf[ArrayData], isFloat)
    var sig = 0L
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      var dot = 0.0; var i = 0
      val n = math.min(v.length, plane.length)
      while (i < n) { dot += v(i) * plane(i); i += 1 }
      if (dot >= 0.0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF helper: ids of the `nprobe` nearest centroids by euclidean distance
  * (ties by centroid order). With nprobe=1 this is the cell assignment. */
case class NearestCellsExpr(child: Expression, centroids: Seq[(Long, Seq[Double])], nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val isFloat = VectorExpressions.elemIsFloat(child.dataType)
  private lazy val cents: Array[(Long, Array[Double])] =
    centroids.map { case (id, v) => (id, v.toArray) }.toArray
  override def nullSafeEval(input: Any): Any = {
    val v = VectorExpressions.readVec(input.asInstanceOf[ArrayData], isFloat)
    val dists = cents.map { case (id, c) =>
      var s = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val d = v(i) - c(i); s += d * d; i += 1 }
      (s, id)
    }
    val top = dists.sortBy(x => (x._1, x._2)).take(math.min(nprobe, dists.length))
    new GenericArrayData(top.map(t => java.lang.Long.valueOf(t._2).asInstanceOf[Any]))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
