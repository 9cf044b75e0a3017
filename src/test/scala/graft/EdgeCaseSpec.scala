package graft

import graft.ops.{Multimodal, Streaming}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Edge-exercising specs for the three round-5 divergence fixes (commit
  * 006052a; VERDICT r5 "What's wrong" #3/#4/#5): each fix gets a test that
  * drives the exact input the fix defends against, so a regression cannot
  * stay latent just because the driver corpus happens not to contain it.
  */
class EdgeCaseSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("mm_chunk_dedup: empty documents emit zero chunks, not phantom [0,-1] blocks") {
    // Synthetic corpus with an empty doc: sequence(0, -1) would emit a
    // DESCENDING two-element range unless the loader filters n_chars = 0;
    // DuckDB's range(0, 0) emits nothing, so a phantom chunk = divergence.
    val dir = tmp("graft_mm_empty")
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "a" * 100, "en", "web", 100L),
      (3L, "a" * 100, "en", "web", 100L) // duplicate content of doc 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Multimodal.chunkDedup(s, dir).collect()
    assert(!out.exists(_.getLong(0) == 1L), "empty doc must vanish, not emit phantom chunks")
    val d2 = out.find(_.getLong(0) == 2L).get
    // 100 chars -> ceil(100/64) = 2 chunks, both shared with doc 3
    assert(d2.getLong(1) == 2L && d2.getLong(2) == 2L && d2.getDouble(3) == 1.0)
  }

  test("streaming OHLC: equal-timestamp events resolve open/close deterministically") {
    // Three events in the same (hour, type) bucket sharing one timestamp:
    // a pick keyed on ts alone would be partition-order-dependent. The
    // composite struct(ts, user_id, value) key makes the pick a total
    // order, so repeated runs (and any partitioning) agree.
    val ts0 = Timestamp.valueOf("2024-01-01 00:10:00")
    val data = Seq(
      Ev(ts0, 3, 7.0, "view"),
      Ev(ts0, 1, 9.0, "view"),
      Ev(ts0, 2, 4.0, "view"))
    val results = (1 to 3).map { _ =>
      Streaming.ohlcAgg(data.toDF().repartition(4))
        .selectExpr("event_type", "open", "high", "low", "close", "n_events")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    }
    assert(results.distinct.size == 1, s"OHLC pick not deterministic: $results")
    val bar = results.head.head
    // min/max over struct(ts, user_id, value): user 1 opens (9.0), user 3 closes (7.0)
    assert(bar == (("view", 9.0, 9.0, 4.0, 7.0, 3L)), s"unexpected bar: $bar")
  }

  test("wk_q3/wk_q10: Spark-side top-k ordering keys on the exact decimal, not its double image") {
    // The fix aligned the ORACLE's ORDER BY into the decimal domain; this
    // gate pins the Spark side of the same contract. Two distinct
    // DECIMAL(12,2) revenues whose DOUBLE images collide must still order
    // by their exact values. 2^53+1 is the first integer a double cannot
    // hold; near 1.4e15 the double ulp is 0.25 > one cent.
    val a = new java.math.BigDecimal("1441151880758558.73")
    val b = new java.math.BigDecimal("1441151880758558.72")
    assert(a.doubleValue() == b.doubleValue(), "test premise: doubles must collide")
    val df = Seq((1L, a), (2L, b)).toDF("k", "rev")
      .withColumn("rev", col("rev").cast("decimal(18,2)"))
    val got = df.orderBy(desc("rev"), asc("k")).limit(1).head()
    assert(got.getLong(0) == 1L, "exact decimal order must break the double collision")
  }
}
