package graft.tools

import graft.Tables
import graft.ops.{IndexStore, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the sf1 index build (round 14 task #1): times each
  * build stage separately so the optimization targets the measured
  * bottleneck, not a guess. Not registered in Queries — a diagnostic main.
  */
object ProfileBuild {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val dir = "/tmp/profile_build"
    def write(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite").parquet(path)

    // one-off: engine-side smallest KMV u values for one event type
    if (args.length > 1 && args(1) == "kmvcheck") {
      graft.Tables.events(spark, sfDir)
        .where(org.apache.spark.sql.functions.col("event_type") === "click")
        .select(org.apache.spark.sql.functions.col("user_id")).distinct()
        .selectExpr("user_id", "md5(CAST(user_id AS STRING)) AS h")
        .selectExpr("user_id", s"${graft.ops.Aggregates.KmvUExpr} AS u")
        .selectExpr("user_id", "u", "u * 4294967296.0 AS v")
        .orderBy("u").limit(9)
        .collect().foreach(println)
      spark.stop()
      return
    }
    // one-off cross-engine hash parity probe
    if (args.length > 1 && args(1) == "hashcheck") {
      import spark.implicits._
      // the raw integer digit sum, taken from its own definition rather
      // than string-stripping KmvUExpr (ADVICE r14: a stripSuffix of the
      // wrong literal silently showed the post-division double)
      val sumExpr = graft.ops.Aggregates.KmvSumExpr
      Seq("hello", "world", "the", "a", "12977").toDF("w")
        .selectExpr("w", "md5(w) AS h")
        .selectExpr("w", "h", s"$sumExpr AS s", s"typeof($sumExpr) AS t",
          s"${graft.ops.Aggregates.KmvUExpr} AS u")
        .collect().foreach(println)
      spark.stop()
      return
    }
    // run any registered query with a per-stage metrics listener
    if (args.length > 1 && args(1) == "query") {
      val lst = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val mm = si.taskMetrics
          if (mm.executorRunTime > 500)
            println(f"[stage] ${si.stageId}%3d tasks=${si.numTasks}%4d " +
              f"run=${mm.executorRunTime / 1000.0}%8.1fs cpu=${mm.executorCpuTime / 1e9}%8.1fs " +
              f"gc=${mm.jvmGCTime / 1000.0}%6.1fs spillDisk=${mm.diskBytesSpilled / 1e6}%8.1fM " +
              f"shufW=${mm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fM")
        }
      }
      spark.sparkContext.addSparkListener(lst)
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(args(2))(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        println(f"[profile] ${args(2)} run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      Thread.sleep(2000)
      spark.stop()
      return
    }
    // one-off: phase row counts / timings of the shortlist pipeline
    if (args.length > 1 && args(1) == "slphases") {
      val cent0 = t("centroids") {
        write(Similarity.centroidsBuild(e), s"$dir/ivf_centroids")
        spark.read.parquet(s"$dir/ivf_centroids")
      }
      t("ivf_assigned") { write(Similarity.ivfAssignBuild(e, cent0), s"$dir/ivf_assigned") }
      val sa = spark.read.parquet(s"$dir/ivf_assigned")
      val (probes, routed, m) = Similarity.knnFullSides(e, sa, cent0)
      println(s"[slphases] m=$m")
      t("probes_count") { println(s"[slphases] probes=${probes.count()}") }
      val keyed = Similarity.knnKeyedDots(e, probes, routed, m)
      t("keyed_count") { println(s"[slphases] keyed=${keyed.count()}") }
      t("keyed_count2") { println(s"[slphases] keyed2=${keyed.count()}") }
      t("cut_noop") { Similarity.knnShortlistCut(keyed, 8)
        .write.mode("overwrite").format("noop").save() }
      t("cut_noop2") { Similarity.knnShortlistCut(keyed, 8)
        .write.mode("overwrite").format("noop").save() }
      spark.stop()
      return
    }
    // one-off: dump the executed shortlist plan + per-stage metrics
    if (args.length > 1 && args(1) == "explain") {
      val cent0 = t("centroids") {
        write(Similarity.centroidsBuild(e), s"$dir/ivf_centroids")
        spark.read.parquet(s"$dir/ivf_centroids")
      }
      t("ivf_assigned") { write(Similarity.ivfAssignBuild(e, cent0), s"$dir/ivf_assigned") }
      val sa = spark.read.parquet(s"$dir/ivf_assigned")
      val sl = Similarity.knnShortlistFull(e, sa, cent0, 8)
      sl.explain("formatted")
      val lst = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          println(f"[stage] ${si.stageId}%3d ${si.name.take(60)}%-60s " +
            f"tasks=${si.numTasks}%4d run=${m.executorRunTime / 1000.0}%8.1fs " +
            f"cpu=${m.executorCpuTime / 1e9}%8.1fs gc=${m.jvmGCTime / 1000.0}%6.1fs " +
            f"spillMem=${m.memoryBytesSpilled / 1e6}%8.1fM spillDisk=${m.diskBytesSpilled / 1e6}%8.1fM " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fM")
        }
      }
      spark.sparkContext.addSparkListener(lst)
      t("shortlist_write") { write(sl, s"$dir/knn_candidates_full") }
      Thread.sleep(2000)
      spark.stop()
      return
    }
    for (round <- 1 to 4) {
      println(s"=== round $round ===")
      if (round == 3) { System.gc(); Thread.sleep(2000); System.gc() }
      t("centroids") { write(Similarity.centroidsBuild(e), s"$dir/ivf_centroids") }
      val cent = spark.read.parquet(s"$dir/ivf_centroids")
      t("ivf_assigned") { write(Similarity.ivfAssignBuild(e, cent), s"$dir/ivf_assigned") }
      t("pq") {
        val (codebook, codes) = Similarity.pqIndex(e)
        write(codebook, s"$dir/pq_codebook")
        write(codes.select(col("vec_id"), col("s"), col("code"), col("qerr")),
          s"$dir/pq_codes")
      }
      t("knn_bounded") {
        val eb = e.where(col("vec_id") < 500)
          .select(col("vec_id"), col("embedding"), col("label"))
        write(Similarity.knnCandidates(eb, 2), s"$dir/knn_candidates")
      }
      val storedAssigned = spark.read.parquet(s"$dir/ivf_assigned")
      val raw = t("knn_full_raw_count") {
        val c = Similarity.knnCandidatesFull(e, storedAssigned, cent).count()
        println(s"[profile] raw candidate rows: $c")
        c
      }
      t("knn_full_topk_write") {
        write(Similarity.knnShortlistFull(e, storedAssigned, cent, 8),
          s"$dir/knn_candidates_full")
      }
      val _ = raw
    }
    spark.stop()
  }
}
