package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}

/** Round-8 hardening specs (VERDICT r7): skew-stress evidence on a
  * synthesized hot key — AQE's runtime skew-join split observed through
  * its own metric, and the salting rewrite proven row-identical to the
  * plain join on the same skewed input.
  */
class Round8Spec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  /** A hot-key fixture: ONE key carries 10⁴ replicated rows (the verdict's
    * ×10⁴ prescription), 200 cold keys carry one row each. Payload is md5
    * (incompressible — identical longs would LZ4 below any skew threshold)
    * and the map side is forced to >1 task (AQE splits skewed partitions
    * at mapper-block boundaries).
    */
  private def skewedLeft: DataFrame =
    spark.range(10000)
      .select(lit(7L).as("k"), md5(concat(lit("hot"), col("id").cast("string"))).as("payload"))
      .unionAll(spark.range(200)
        .select((col("id") + 100L).as("k"),
          md5(concat(lit("cold"), col("id").cast("string"))).as("payload")))
      .repartition(8)

  private def dimRight: DataFrame =
    spark.range(400)
      .select(col("id").as("k"), (col("id") * 3L).as("price"))

  private def withSkewConfs[A](f: => A): A = {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      f
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("skew: a x10^4 hot key trips the AQE skew-join split — numSkewedPartitions metric > 0") {
    withSkewConfs {
      val df = skewedLeft.join(dimRight, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("b"))
      df.collect()
      val root = df.queryExecution.executedPlan
      val finalPlan = root match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // evidence 1 (the runtime's own counter): at least one AQEShuffleRead
      // reports a skewed partition it split. AQE wraps materialized stages
      // in QueryStageExec leaves, so the walk must step through `.plan`
      // explicitly — TreeNode.collect stops at stage boundaries.
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        p +: kids.flatMap(walk)
      }
      val skewCounts = walk(finalPlan)
        .collect { case r: AQEShuffleReadExec => r }
        .flatMap(_.metrics.get("numSkewedPartitions").map(_.value))
      assert(skewCounts.sum >= 1,
        s"AQE reported no skewed partitions (metrics: $skewCounts):\n$finalPlan")
      // evidence 2 (the plan gate): the split is visible in the plan text
      assert(root.toString.contains("skew=true"),
        s"skew=true missing from the final plan:\n$root")
    }
  }

  test("skew: the salting rewrite is row-identical to the plain join on the hot-key input") {
    // join_skew_salted's shape replayed on the synthesized skew: salt the
    // fact side deterministically, explode the dim side ×S, join on
    // (k, salt) — every plain-join row must appear exactly once
    val S = 8
    val left = skewedLeft
    val right = dimRight
    val plain = left.join(right, Seq("k"))
      .select(col("k"), col("payload"), col("price"))
    val salted = left
      .withColumn("salt", pmod(xxhash64(col("payload")), lit(S.toLong)).cast("int"))
      .join(right.withColumn("salt", explode(array((0 until S).map(lit): _*))),
        Seq("k", "salt"))
      .select(col("k"), col("payload"), col("price"))
    def multiset(df: DataFrame): Map[(Long, String, Long), Int] =
      df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val p = multiset(plain)
    val q = multiset(salted)
    assert(p.nonEmpty && p.values.sum == 10200,
      s"fixture sanity: hot key 7 joins 10^4 rows + 1 cold row each for keys 100..299 — got ${p.values.sum}")
    assert(p == q, {
      val onlyPlain = p.toSeq.filterNot { case (k, n) => q.get(k).contains(n) }.take(5)
      val onlySalt = q.toSeq.filterNot { case (k, n) => p.get(k).contains(n) }.take(5)
      s"salted join diverged: plain-only=$onlyPlain salted-only=$onlySalt"
    })
    // and the aggregate contract the registered query reports is identical
    def agg(df: DataFrame) = df.groupBy("k")
      .agg(count(lit(1)).as("n"), max(col("price")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(agg(plain) == agg(salted))
  }

  test("J27 hybrid RRF: score recomputes from the channel ranks, monotone in fused rank") {
    val rows = run("search_hybrid_rrf").collect()
    assert(rows.length == 80, "8 queries x fused top-10")
    rows.foreach { r =>
      val (rnCos, rnAdc, rrf) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(rnCos >= 0 && rnCos <= 20 && rnAdc >= 0 && rnAdc <= 20)
      assert(rnCos > 0 || rnAdc > 0, "a fused candidate came from at least one channel")
      val expect = (if (rnCos > 0) 1.0 / (60 + rnCos) else 0.0) +
        (if (rnAdc > 0) 1.0 / (60 + rnAdc) else 0.0)
      assert(math.abs(rrf - expect) < 1e-6 + 1e-9,
        s"rrf $rrf must equal the two-term rank score $expect")
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(5)).map(_.getDouble(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "fused score non-increasing in fused rank")
    }
  }

  test("M95 shuffle stripe: balanced shards, exact striping, checksum matches driver-side md5 order") {
    val rows = run("pipeline_shuffle_stripe").collect()
    assert(rows.length == 16)
    val n = rows.map(_.getLong(1)).sum
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"shuffle-then-stripe must balance to +-1: ${sizes.toSeq}")
    // striping law: shard s holds exactly the positions ≡ s+1 (mod 16)
    rows.foreach { r =>
      val (shard, first) = (r.getLong(0), r.getLong(3))
      assert(first == shard + 1, s"shard $shard must start at position ${shard + 1}")
    }
    // independent driver-side recompute of the FULL permutation: java
    // MessageDigest md5 over the same seeded key, plain string sort — no
    // Spark SQL involved — must yield the identical per-shard checksum
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val perm = ids.map(id => (md5hex(s"epoch7|$id"), id)).sortBy(identity).zipWithIndex
    val want = perm.map { case ((_, id), i) => ((i.toLong) % 16, (i + 1).toLong * id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(got == want, "permutation checksum must match the independent md5-order recompute")
    assert(n == ids.length, "positions partition the corpus exactly")
  }
}
