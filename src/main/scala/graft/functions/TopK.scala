package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One (id, score) candidate for top-k ranking. */
final case class Scored(id: Long, cosine: Double)

/** Fixed-size insertion buffer holding the k best (score desc, id asc)
  * entries seen so far. Plain parallel arrays — zero per-row allocation on
  * the hot insert path; serialized (Java) only at partial→final aggregation
  * boundaries, i.e. once per (group × map task), never per row. */
final class TopKBuffer(val k: Int) extends Serializable {
  var n: Int = 0
  val cos: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  @inline private def better(c1: Double, id1: Long, c2: Double, id2: Long): Boolean =
    c1 > c2 || (c1 == c2 && id1 < id2)

  def insert(c: Double, id: Long): Unit = {
    if (n == k && !better(c, id, cos(k - 1), ids(k - 1))) return
    var j = math.min(n, k - 1)
    while (j > 0 && better(c, id, cos(j - 1), ids(j - 1))) {
      cos(j) = cos(j - 1); ids(j) = ids(j - 1); j -= 1
    }
    cos(j) = c; ids(j) = id
    if (n < k) n += 1
  }
}

/** Bounded-heap top-k aggregate: the scale-safe replacement for
  * `row_number().over(Window.partitionBy(query))` ranking. As a typed
  * imperative aggregate it gets MAP-SIDE partial aggregation — each input
  * partition forwards at most k entries per group to the shuffle, so a
  * query's candidate set never funnels through one reducer task and the
  * shuffle payload is O(partitions × groups × k), independent of corpus
  * size. Ordering matches the window formulation exactly: cosine desc,
  * ties broken by ascending id. */
final class TopKByScore(k: Int) extends Aggregator[Scored, TopKBuffer, Seq[Scored]] {
  override def zero: TopKBuffer = new TopKBuffer(k)
  override def reduce(b: TopKBuffer, a: Scored): TopKBuffer = { b.insert(a.cosine, a.id); b }
  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.cos(i), b2.ids(i)); i += 1 }
    b1
  }
  override def finish(b: TopKBuffer): Seq[Scored] =
    (0 until b.n).map(i => Scored(b.ids(i), b.cos(i)))
  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.javaSerialization[TopKBuffer]
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {
  /** DataFrame-callable top-k aggregate: `topKAgg(k)(col("id"), col("cosine"))`
    * → array<struct<id,cosine>> sorted best-first. */
  def topKAgg(k: Int): UserDefinedFunction =
    udaf(new TopKByScore(k))
}
