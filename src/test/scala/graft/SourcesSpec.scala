package graft

import org.apache.spark.sql.functions._

/** Source/sink coverage beyond the parquet contract path (SURVEY §2.A):
  * CSV and JSON round-trips with explicit schemas, and bucketed tables
  * joining without a shuffle — the co-located-join story that matters at
  * 100 TB (bucket pruning replaces the exchange).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV sink+source round-trip preserves rows and exact decimal totals") {
    val dir = tmp("graft_csv")
    val orders = Tables.orders(spark, sf)
    orders.write.mode("overwrite").option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(dir)
    val back = spark.read.option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(orders.schema).csv(dir)
    assert(back.count() == 1500)
    val a = orders.agg(sum(expr("cast(o_totalprice as decimal(12,2))"))).head().get(0)
    val b = back.agg(sum(expr("cast(o_totalprice as decimal(12,2))"))).head().get(0)
    assert(a == b, s"CSV round-trip changed totals: $a vs $b")
  }

  test("JSON sink+source round-trip preserves rows and keys") {
    val dir = tmp("graft_json")
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nation.schema).json(dir)
    assert(back.count() == 25)
    assert(back.select("n_nationkey").distinct().count() == 25)
  }

  test("ORC sink+source round-trip preserves rows and schema") {
    val dir = tmp("graft_orc")
    val li = Tables.lineitem(spark, sf)
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == 6000)
    assert(back.schema == li.schema)
  }

  test("bucketed tables join without an Exchange (co-located join)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val p = java.nio.file.Paths.get(s"/tmp/graft_warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    // disable auto-broadcast so the planner must use the bucketing (at
    // 100 TB neither side would broadcast — this simulates that shape)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("A16: maxRecordsPerFile rolls deterministic files; _metadata agrees") {
    // N sorted docs cut every 20 records -> ceil(N/20) files, all of 20
    // rows except a possibly-short last one (the deterministic chunking
    // the registered query's oracle reproduces at 200)
    val dir = tmp("graft_meta")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val n = docs.count()
    docs.coalesce(1).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").option("maxRecordsPerFile", 20).parquet(dir)
    val perFile = spark.read.parquet(dir)
      .select(col("doc_id"), col("_metadata.file_path").as("p"),
        col("_metadata.row_index").as("ri"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), (max(col("ri")) + lit(1L)).as("nIdx"),
        min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .orderBy(col("lo")).collect()
    val expected = Seq.fill(((n + 19) / 20).toInt - 1)(20L) :+
      (if (n % 20 == 0) 20L else n % 20)
    assert(perFile.map(_.getAs[Long]("n")).toSeq == expected,
      s"file sizes: ${perFile.map(_.getAs[Long]("n")).mkString(",")}")
    // the row-index invariant and non-overlapping sorted id ranges
    perFile.foreach(r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("nIdx"), "row_index gap"))
    perFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"), "file ranges overlap")
      case _ =>
    }
  }

  test("A16: the registered query upholds the row-index invariant at sf") {
    val df = run("source_file_metadata")
    assert(df.where("n_rows <> rows_by_index").count() == 0)
    assert(df.selectExpr("sum(n_rows)").head().getLong(0) ==
      Tables.documents(spark, sf).count())
  }

  test("A12: mergeSchema surfaces the evolved column as NULL on old slices") {
    val df = run("source_parquet_schema_merge")
    val o = Tables.orders(spark, sf)
    assert(df.selectExpr("sum(n_rows)").head().getLong(0) == o.count(),
      "merged read must see every row from both slices")
    assert(df.selectExpr("sum(n_with_price)").head().getLong(0) ==
      o.where("o_orderkey % 2 = 1").count(),
      "only the v2 (odd-key) slice carries the evolved column")
    assert(df.where("n_with_price > n_rows").count() == 0)
  }
}
