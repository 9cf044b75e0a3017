package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression fence for fixture drift (VERDICT r5 #1/#2/#3).
  *
  * Round 5 lost 61 queries to a single environmental change: the driver
  * regenerated `events.parquet` with `ts` as tz-naive `timestamp[us]` where
  * the loader assumed TIMESTAMP(NANOS)-as-int64. This spec writes the same
  * logical events rows in every plausible physical layout and asserts
  * `Tables.events` normalizes all of them to identical `(ts, ts_us)` —
  * plus proves one broken source no longer detonates unrelated SQL.
  */
class IngestionContractSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Three known-good instants incl. a sub-ms component, as epoch-µs. */
  private val micros = Seq(
    1704067200000000L, // 2024-01-01 00:00:00
    1704067200123456L, // 2024-01-01 00:00:00.123456
    1735689599999999L  // 2024-12-31 23:59:59.999999
  )

  private def writeLayout(dir: String, tsCol: org.apache.spark.sql.Column,
                          tsType: DataType): Unit = {
    val s = spark
    import s.implicits._
    micros.zipWithIndex.toDF("us", "event_id")
      .withColumn("ts", tsCol.cast(tsType))
      .withColumn("user_id", lit(7L))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.5))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loaded(dir: String): Seq[(Long, java.sql.Timestamp, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id").cast("long"), col("ts").cast(TimestampType), col("ts_us"))
      .orderBy("event_id")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))

  test("events loader normalizes ns-as-long, timestamp[us], and TIMESTAMP_NTZ to identical (ts, ts_us)") {
    val dirLong = tmp("graft_evt_long")
    val dirTz = tmp("graft_evt_tz")
    val dirNtz = tmp("graft_evt_ntz")

    // Layout 1: int64 ns-since-epoch (what TIMESTAMP(NANOS) reads as under
    // the legacy nanosAsLong flag; +500 ns exercises the truncation).
    writeLayout(dirLong, col("us") * 1000L + 500L, LongType)
    // Layout 2: tz-adjusted TIMESTAMP (instant semantics).
    writeLayout(dirTz, timestamp_micros(col("us")), TimestampType)
    // Layout 3: tz-naive TIMESTAMP_NTZ (the current driver fixture layout).
    writeLayout(dirNtz, timestamp_micros(col("us")), TimestampNTZType)

    val a = loaded(dirLong)
    val b = loaded(dirTz)
    val c = loaded(dirNtz)

    assert(a == b, s"ns-as-long vs timestamp layout diverged:\n$a\n$b")
    assert(b == c, s"timestamp vs ntz layout diverged:\n$b\n$c")
    assert(a.map(_._3) == micros, s"ts_us wrong: ${a.map(_._3)} vs $micros")
  }

  test("loader rejects an unsupported ts physical type with a clear error") {
    val dir = tmp("graft_evt_bad")
    writeLayout(dir, col("us").cast(StringType), StringType)
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("a broken events source does not detonate SQL queries that never read it") {
    // A dir with every table EXCEPT a readable events fixture: registerAll
    // must still register the nine good tables so non-events SQL works.
    val dir = tmp("graft_isolation")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings")) {
      val p = java.nio.file.Paths.get(s"$dir/$t.parquet")
      java.nio.file.Files.createSymbolicLink(p, java.nio.file.Paths.get(s"$sf/$t.parquet"))
    }
    writeLayout(s"$dir", col("us").cast(StringType), StringType) // broken events

    // Order-independence: another spec may have registered a good events
    // view already; drop it so this test observes THIS registration only.
    spark.catalog.dropTempView("events")
    Tables.registerAll(spark, dir)
    // subquery_scalar_uncorr-class query: pure lineitem SQL, no events.
    val n = spark.sql(
      "SELECT count(*) AS c FROM lineitem WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)"
    ).head().getLong(0)
    assert(n > 0, "non-events SQL should survive a broken events source")
    // The broken table's own users still see a real failure (view absent):
    assert(intercept[Exception](spark.sql("SELECT * FROM events")).getMessage != null)
    // Registration must NOT have latched (a later call with good fixtures
    // must retry the failed table rather than being memoized away).
    Tables.registerAll(spark, sf)
    assert(spark.sql("SELECT count(*) FROM events").head().getLong(0) > 0)
  }

  test("orders date column normalizes from DATE, TIMESTAMP, and TIMESTAMP_NTZ layouts") {
    val s2 = spark
    import s2.implicits._
    def write(dir: String, t: DataType): Unit =
      Seq((1L, "1996-01-15"), (2L, "1997-06-30")).toDF("o_orderkey", "d")
        .withColumn("o_orderdate", col("d").cast(TimestampNTZType).cast(t))
        .select("o_orderkey", "o_orderdate")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def loaded(dir: String) = {
      val df = Tables.orders(spark, dir)
      assert(df.schema("o_orderdate").dataType == TimestampNTZType,
        s"expected NTZ, got ${df.schema("o_orderdate").dataType}")
      df.orderBy("o_orderkey").collect().map(_.get(1).toString).toSeq
    }
    val dirs = Seq(DateType, TimestampType, TimestampNTZType).map { t =>
      val d = tmp(s"graft_ord_${t.simpleString}"); write(d, t); d
    }
    val vals = dirs.map(loaded)
    assert(vals.distinct.size == 1, s"date layouts diverged: $vals")
  }

  test("embeddings array column normalizes from double[] to the float[] contract") {
    val s2 = spark
    import s2.implicits._
    val dir = tmp("graft_emb_dbl")
    Seq((0L, Seq(1.5, -2.25), 0), (1L, Seq(0.5, 3.0), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true))
    val v = df.orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq
    assert(v == Seq(Seq(1.5f, -2.25f), Seq(0.5f, 3.0f)))
  }
}
