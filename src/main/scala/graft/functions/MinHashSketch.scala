package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable MinHash sketch as a native aggregate (SURVEY §4 "MinHash
  * signatures for dedup at scale", v2 item): one pass over exploded
  * shingles producing k signature minima per group.
  *
  * The buffer is a k-slot array of current minima — constant size, so
  * partial aggregation (map-side combine) and AQE coalescing work exactly
  * as for built-in aggregates; at 100 TB the shuffle carries k strings per
  * document, not the shingle stream. Hashes are `md5(i + "|" + shingle)`
  * hex — bit-identical to the SQL formulation (and DuckDB), so results
  * hash-match the pure-SQL signature query.
  */
case class MinHashSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[String] =
    Array.fill[String](k)(null)

  private def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < k) {
        val h = md5Hex(s"$i|$s")
        if (buf(i) == null || h.compareTo(buf(i)) < 0) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i).compareTo(a(i)) < 0)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s => if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buf: Array[String]): Array[Byte] =
    buf.map(s => if (s == null) "" else s).mkString("\n").getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val parts = new String(bytes, StandardCharsets.UTF_8).split("\n", -1)
    parts.map(s => if (s.isEmpty) null else s)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSketch =
    copy(child = c.head)
}

object MinHashSketch {
  /** Registers `graft_minhash(col)` (k=4) for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSketch(exprs.head, 4), "built-in")
}
