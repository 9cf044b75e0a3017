package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

/** Determinism under task retry (VERDICT r4 #5): on a real cluster tasks
  * die and re-run mid-shuffle as a matter of course, so the engine's
  * determinism protocol (exact decimal sums, md5 fingerprints, total
  * orders) must hold when a partition's work executes TWICE — once
  * killed, once retried. A first-attempt failure is injected into a
  * pass-through mapPartitions (the fixture's `local[4,2]` master gives
  * every task a second attempt, as any production config does) and the
  * faulted run must be bit-identical to the clean run.
  */
class TaskRetrySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** Pass-through that throws on the FIRST attempt of partition 0 and
    * counts injections, proving the retry actually happened. The counter
    * is a JVM-static (driver and executor share the JVM in local mode) —
    * an accumulator cannot witness this: updates from FAILED attempts are
    * discarded by design.
    */
  private def faultOnce(ds: org.apache.spark.sql.Dataset[(Long, String, Double)]) = {
    ds.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        TaskRetrySpec.injected.incrementAndGet()
        throw new RuntimeException("injected first-attempt task failure")
      }
      it
    }
  }

  // tuple-named columns so the clean run and the post-mapPartitions run
  // (whose encoder emits _1/_2/_3) share one schema
  private def source = Tables.lineitem(spark, sf)
    .select(col("l_orderkey").as("_1"), col("l_returnflag").as("_2"),
      col("l_extendedprice").cast("double").as("_3"))
    .as[(Long, String, Double)]

  /** Decimal-sum + md5-fingerprint aggregate — the exact protocol every
    * money/hash query in the registry relies on.
    */
  private def protocolAgg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("_2").as("flag"))
    .agg(
      sum(col("_3").cast("decimal(12,2)")).cast("double").as("rev"),
      count(lit(1)).as("n"),
      // order-independent content fingerprint over md5 of each row
      expr("bit_xor(xxhash64(md5(concat(_1, '|', _2, '|', _3))))").as("fp"))
    .orderBy(col("flag"))
    .collect()
    .toSeq

  test("md5/decimal aggregates are bit-identical when a task fails and retries") {
    val clean = protocolAgg(source.toDF())
    val before = TaskRetrySpec.injected.get()
    val got = protocolAgg(faultOnce(source).toDF())
    assert(TaskRetrySpec.injected.get() > before,
      "the injected failure must actually fire")
    assert(got == clean,
      s"retry changed results:\nclean:  $clean\nfaulted: $got")
  }

  test("shuffled two-stage result identical under mid-shuffle retry") {
    // fault BELOW a shuffle: the retried map task re-produces shuffle
    // blocks; the reduce side must see identical content
    val clean = source.toDF()
      .repartition(col("_2"))
      .groupBy(col("_2")).agg(sum(col("_1")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val before = TaskRetrySpec.injected.get()
    val got = faultOnce(source).toDF()
      .repartition(col("_2"))
      .groupBy(col("_2")).agg(sum(col("_1")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(TaskRetrySpec.injected.get() > before,
      "the injected failure must actually fire")
    assert(got == clean)
  }
}

object TaskRetrySpec {
  /** Injection witness — see faultOnce. */
  val injected = new java.util.concurrent.atomic.AtomicLong(0)
}
