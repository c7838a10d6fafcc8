package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Int8 embedding quantization — the at-rest storage lever for ANN corpora
  * (4× smaller than float32; at the 100 TB design point the embedding table
  * is usually the largest artifact after raw text). Symmetric per-vector
  * scheme: scale = max|x|/127, q_i = round(x_i/scale) ∈ [−127, 127].
  * Cosine similarity is invariant to any per-vector positive scale, so
  * ranking by cosine over the int8 codes loses only rounding precision —
  * bounded in SimilaritySpec (recall vs full precision). Native expressions
  * for the same reason as the rest of graft.functions: per-element lambdas
  * are interpreted in Spark. */
object QuantExpressions {
  val QuantType: StructType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
}

/** array<float|double> → struct<scale: float, q: array<tinyint>>. Zero
  * vectors quantize to scale 0 + zero codes (dequantizes to zeros). */
case class QuantizeExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = QuantExpressions.QuantType
  private lazy val isFloat = VectorExpressions.elemIsFloat(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val v = VectorExpressions.readVec(input.asInstanceOf[ArrayData], isFloat)
    var maxAbs = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val scale = if (maxAbs == 0.0) 0.0f else (maxAbs / 127.0).toFloat
    val q = new Array[Byte](v.length)
    if (scale != 0.0f) {
      i = 0
      while (i < v.length) {
        val r = math.round(v(i) / scale).toInt
        q(i) = math.max(-127, math.min(127, r)).toByte
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(q.map(java.lang.Byte.valueOf(_).asInstanceOf[Any])))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** struct<scale, q> → array<float> (q_i × scale). */
case class DequantizeExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val scale = row.getFloat(0)
    val q = row.getArray(1)
    val n = q.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = java.lang.Float.valueOf(q.getByte(i) * scale); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine similarity straight over two quantized structs — integer dot and
  * norms over the int8 codes (the per-vector scales cancel out of cosine);
  * 0.0 for zero vectors. */
case class CosineSimQExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val qa = l.asInstanceOf[InternalRow].getArray(1)
    val qb = r.asInstanceOf[InternalRow].getArray(1)
    val n = math.min(qa.numElements(), qb.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = qa.getByte(i).toLong
      val y = qb.getByte(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (denom == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot.toDouble / denom)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
