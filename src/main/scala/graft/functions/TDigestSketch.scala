package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Merging t-digest (Dunning's algorithm, simplified k1 weight bound) as a
  * native mergeable aggregate — the custom-sketch counterpart of
  * `percentile_approx` (SURVEY M17v2): centroids carry (mean, weight); the
  * buffer is O(compression) regardless of group size; partial buffers merge
  * associatively, so map-side combine works like any built-in aggregate and
  * a 100 TB group never sorts.
  *
  * Accuracy concentrates at the tails (the q(1−q) weight bound keeps tail
  * centroids small); the unit test holds the median/p90 within 2% of exact.
  */
case class TDigestSketch(
    child: Expression,
    quantiles: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestSketch.Digest] {

  import TDigestSketch.Digest

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_tdigest"

  override def createAggregationBuffer(): Digest = new Digest(compression)

  override def update(buf: Digest, input: InternalRow): Digest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Number].doubleValue(), 1.0)
    buf
  }

  override def merge(a: Digest, b: Digest): Digest = { a.mergeWith(b); a }

  override def eval(buf: Digest): Any =
    new GenericArrayData(quantiles.map(buf.quantile).toArray)

  override def serialize(buf: Digest): Array[Byte] = {
    buf.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.means(i)); out.writeDouble(buf.weights(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Digest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val d = new Digest(compression)
    var i = 0
    while (i < n) { d.add(in.readDouble(), in.readDouble()); i += 1 }
    d
  }

  override def withNewMutableAggBufferOffset(n: Int): TDigestSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TDigestSketch =
    copy(child = c.head)
}

object TDigestSketch {

  /** Mutable centroid set. Unmerged points accumulate in the same arrays
    * and are folded in by [[compress]] once the buffer passes 8×δ.
    */
  final class Digest(val delta: Int) {
    private val cap = 8 * delta
    var means = new Array[Double](cap + 16)
    var weights = new Array[Double](cap + 16)
    var size = 0
    private var total = 0.0

    def add(x: Double, w: Double): Unit = {
      if (size == means.length) {
        compress()
        // the k1 steady-state centroid count grows ~ln(total); if compress
        // couldn't free a slot, grow the arrays rather than overflow
        if (size == means.length) {
          means = java.util.Arrays.copyOf(means, means.length * 2)
          weights = java.util.Arrays.copyOf(weights, weights.length * 2)
        }
      }
      means(size) = x; weights(size) = w; size += 1; total += w
    }

    def mergeWith(o: Digest): Unit = {
      var i = 0
      while (i < o.size) { add(o.means(i), o.weights(i)); i += 1 }
    }

    /** Sort centroids and greedily merge under the q(1−q) weight bound. */
    def compress(): Unit = {
      if (size <= 1) return
      val idx = (0 until size).sortBy(means)
      val ms = idx.map(means).toArray
      val ws = idx.map(weights).toArray
      val outM = new ArrayBuffer[Double](delta * 2)
      val outW = new ArrayBuffer[Double](delta * 2)
      var curM = ms(0); var curW = ws(0)
      var leftW = 0.0 // cumulative weight before the current centroid
      var i = 1
      while (i < size) {
        val qMid = (leftW + (curW + ws(i)) / 2) / total
        val bound = 4.0 * total * qMid * (1 - qMid) / delta
        if (curW + ws(i) <= bound) {
          val w = curW + ws(i)
          curM = (curM * curW + ms(i) * ws(i)) / w
          curW = w
        } else {
          outM += curM; outW += curW; leftW += curW
          curM = ms(i); curW = ws(i)
        }
        i += 1
      }
      outM += curM; outW += curW
      size = outM.length
      if (means.length < size) {
        means = new Array[Double](size + cap)
        weights = new Array[Double](size + cap)
      }
      var j = 0
      while (j < size) { means(j) = outM(j); weights(j) = outW(j); j += 1 }
    }

    /** Interpolated quantile over centroid midpoints. */
    def quantile(q: Double): Double = {
      compress()
      if (size == 0) return Double.NaN
      if (size == 1) return means(0)
      val target = q * total
      var cum = 0.0
      var i = 0
      while (i < size) {
        val mid = cum + weights(i) / 2
        if (target <= mid) {
          if (i == 0) return means(0)
          val prevMid = cum - weights(i - 1) / 2
          val t = (target - prevMid) / (mid - prevMid)
          return means(i - 1) + t * (means(i) - means(i - 1))
        }
        cum += weights(i)
        i += 1
      }
      means(size - 1)
    }
  }

  /** Registers `graft_tdigest(col)` → [q25, q50, q90] for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tdigest", exprs => TDigestSketch(exprs.head, Seq(0.25, 0.5, 0.9)),
      "built-in")
}
