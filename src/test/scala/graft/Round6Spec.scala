package graft

import graft.ops.{Dedup, Streaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Property specs for the round-6 operator batch: CDC last-image apply,
  * exact dyadic EWMA, Matryoshka truncation eval, BM25, banded-Hamming
  * media near-dup, and the bloom-prefiltered incremental dedup.
  */
class Round6Spec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  test("L22 stream_cdc_apply: tombstoned keys drop, survivors carry their true last image") {
    val df = run("stream_cdc_apply").collect()
    assert(df.nonEmpty)
    assert(!df.exists(_.getString(1) == "error"), "tombstoned users must not surface")
    // cross-check one surviving user against a direct rank query
    val ev = Tables.events(spark, sf)
    val expect = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(desc("ts_us"), desc("event_id"))))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(df.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet == expect)
  }

  test("L22 twin: streaming CDC aggregate equals batch under micro-batch splits") {
    implicit val ctx = s.sqlContext
    val data = Seq(
      Ev(Timestamp.valueOf("2024-01-01 00:01:00"), 1, 10.0, "view"),
      Ev(Timestamp.valueOf("2024-01-01 00:02:00"), 1, 20.0, "purchase"),
      Ev(Timestamp.valueOf("2024-01-01 00:03:00"), 2, 5.0, "click"),
      Ev(Timestamp.valueOf("2024-01-01 00:04:00"), 2, 6.0, "error"), // tombstone
      Ev(Timestamp.valueOf("2024-01-01 00:05:00"), 3, 7.0, "signup"))
    def withIds(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("event_id", col("user_id") * 100 + col("ts_us") % 100)
    val ms = MemoryStream[Ev]
    val q = Streaming.cdcApplyAgg(withIds(ms.toDF())).writeStream
      .format("memory").queryName("t_cdc").outputMode("complete").start()
    ms.addData(data.take(2): _*); q.processAllAvailable()
    ms.addData(data.drop(2): _*); q.processAllAvailable()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "last_type", "last_value", "n_ops").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    val streamed = canon(s.table("t_cdc"))
    q.stop()
    assert(streamed == canon(Streaming.cdcApplyAgg(withIds(data.toDF()))))
    assert(streamed.exists(t => t._1 == 2 && t._2 == "error"), "agg keeps the tombstone image")
  }

  test("F13 win_ewma: day-1 equals its count; constant series reproduces the constant") {
    val rows = run("win_ewma").collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getString(0))
    assert(first.getDouble(2) == first.getLong(1).toDouble,
      "first day's EWMA is its own count (single-lag window)")
    // bounds: ewma lies within [min, max] of the trailing-31 window
    val xs = rows.map(_.getLong(1))
    rows.zipWithIndex.foreach { case (r, i) =>
      val w = xs.slice(math.max(0, i - 30), i + 1)
      assert(r.getDouble(2) >= w.min - 1e-6 && r.getDouble(2) <= w.max + 1e-6,
        s"ewma out of window bounds at ${r.getString(0)}")
    }
  }

  test("J19 vec_matryoshka_eval: recall in [0,1] over exactly 10 ground-truth rows each") {
    val rows = run("vec_matryoshka_eval").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) == 10L, "full-dim ground truth must have k rows")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10L)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("M58 text_bm25_topk: 10 rows, scores non-increasing, rank keys the rounded score") {
    val rows = run("text_bm25_topk").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores must be sorted")
    assert(scores.forall(_ > 0.0), "top-10 BM25 of high-df terms must be positive")
  }

  test("M59 mm_phash_hamming: pairs within threshold, banding lossless at the pigeonhole bound") {
    val rows = run("mm_phash_hamming").collect()
    assert(rows.nonEmpty, "the fixture's true near-dups sit within hamming 10 at every SF")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical a<b orientation")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 10, "hamming threshold")
    }
    // Cross-check against the direct (unbanded) all-pairs computation over
    // the SHARED signature builder (ADVICE r6 #4: this check validates
    // ONLY the banding step; the signature computation itself is
    // independently verified in Round7Spec against driver-side md5).
    // 60-bit/4×15-band geometry (round 8): banding is LOSSLESS for
    // distance <= 3 (pigeonhole: 3 flips cannot touch all 4 bands) and a
    // SUBSET of the brute threshold set above it — both directions pinned.
    val sig = graft.ops.Multimodal.phashSignatures(Tables.documents(spark, sf))
    val a = sig.select(col("doc_id").as("a_id"), col("sig").as("sa"))
    val b = sig.select(col("doc_id").as("b_id"), col("sig").as("sb"))
    val brute10 = a.join(b, col("a_id") < col("b_id"))
      .where(expr("bit_count(sa ^ sb)") <= 10)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute3 = a.join(b, col("a_id") < col("b_id"))
      .where(expr("bit_count(sa ^ sb)") <= 3)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(brute10), "banding can only prune, never invent pairs")
    assert(brute3.subsetOf(banded), "banding must be lossless at hamming <= 3")
  }

  test("M57 dedup_bloom_prefilter: counts exact and bloom-independent") {
    val rows = run("dedup_bloom_prefilter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), "n_incoming = n_dup + n_new")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // ground truth without any bloom: plain exact two-slice dedup
    val fp = md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)).cast("binary"))
    val docs = Tables.documents(spark, sf).withColumn("fp", fp)
    val truth = docs.where(col("doc_id") % 10 === 0)
      .join(docs.where(col("doc_id") % 10 =!= 0).select(col("fp")).distinct(),
        Seq("fp"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == truth.getOrElse(r.getString(0), 0L),
        s"dup count for ${r.getString(0)} must equal the no-bloom exact answer")
    }
  }

  test("J20 vec_ivf_stats: cells partition the corpus, imbalance averages to 1") {
    val rows = run("vec_ivf_stats").collect()
    assert(rows.length == 10, "one row per quantizer cell")
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n, "cells must partition the corpus")
    val fracs = rows.map(_.getDouble(2))
    assert(math.abs(fracs.sum - 1.0) < 1e-4, "corpus fractions sum to 1")
    val imb = rows.map(_.getDouble(3))
    assert(math.abs(imb.sum / imb.length - 1.0) < 1e-4, "mean imbalance is 1 by construction")
  }

  test("M61 text_decontaminate_13gram: test slice only, hits bounded, short docs clean") {
    val rows = run("text_decontaminate_13gram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 0, "only test-slice docs appear")
      assert(r.getLong(2) <= r.getLong(1), "hits cannot exceed n-gram count")
      assert(r.getBoolean(3) == (r.getLong(2) > 0))
      if (r.getLong(1) == 0) assert(!r.getBoolean(3), "no n-grams -> clean by definition")
    }
  }

  test("M62 text_perplexity_proxy: top-20 surprise scores positive and non-increasing") {
    val rows = run("text_perplexity_proxy").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0.0), "-ln(p) of p<1 is positive")
  }

  test("F14 win_drawdown: peak runs the max, drawdown nonnegative and consistent") {
    val rows = run("win_drawdown").collect()
    assert(rows.nonEmpty)
    var peak = Double.MinValue
    var bal = 0.0
    rows.foreach { r =>
      bal += r.getDouble(1)
      assert(math.abs(r.getDouble(2) - bal) < 1e-6, "balance is the cumulative flow")
      peak = math.max(peak, r.getDouble(2))
      assert(math.abs(r.getDouble(3) - peak) < 1e-6, "peak is the running max")
      assert(r.getDouble(4) >= -1e-9, "drawdown nonnegative")
      assert(math.abs(r.getDouble(4) - (r.getDouble(3) - r.getDouble(2))) < 1e-6)
    }
  }

  test("M63 dedup_lsh_recall_eval: counts consistent, ratios bounded or null when undefined") {
    val r = run("dedup_lsh_recall_eval").head()
    val (nTrue, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nHit <= nTrue && nHit <= nCand, "hits bound by both sets")
    if (nCand > 0) assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) else assert(r.isNullAt(3))
    if (nTrue > 0) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) else assert(r.isNullAt(4))
    // banding with 2 bands over a 4-hash signature catches every pair
    // agreeing on (s0,s1) or (s2,s3); a 0.8-Jaccard pair usually does, so
    // recall should be high on any slice where truth is nonempty
    if (nTrue > 0) assert(r.getDouble(4) >= 0.5, s"suspiciously low LSH recall: $r")
  }

  test("L23 win_retention_cohort: week-0 is full retention, cells bounded by cohort size") {
    val rows = run("win_retention_cohort").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "active users bounded by cohort size")
      assert(r.getLong(1) >= 0, "offsets nonnegative")
      if (r.getLong(1) == 0)
        assert(r.getLong(2) == r.getLong(3) && r.getDouble(4) == 1.0,
          "week 0 contains the whole cohort by definition")
    }
    // cohort sizes partition the user base
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    val sizes = rows.filter(_.getLong(1) == 0).map(_.getLong(3)).sum
    assert(sizes == users, "cohorts partition the user base")
  }

  test("M64 pipeline_packing_efficiency: report consistent with the M49 bin relation") {
    val r = run("pipeline_packing_efficiency").head()
    val (nSeqs, total, ideal) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(ideal == (total + 511) / 512)
    assert(nSeqs >= ideal, "greedy packing can never beat the ideal bin count")
    // a bin holds < 512 + max_doc_tokens, so mean fill sits near 1 but is
    // strictly positive and bounded well under 2 on this corpus
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 2.0, "mean fill out of range")
    val bins = run("pipeline_pack_sequences").collect()
    assert(bins.length.toLong == nSeqs)
    assert(bins.map(_.getLong(2)).sum == total)
    assert(bins.count(_.getLong(2) > 512).toLong == r.getLong(3))
    assert(bins.map(_.getLong(2)).max == r.getLong(4))
  }

  test("N9 dq_ks_test: statistic bounded, equal to the single-window reference form") {
    val r = run("dq_ks_test").head()
    val (nA, nB, dNum) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nA > 0 && nB > 0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    // reference: the classic one-window formulation over the same blocks
    import org.apache.spark.sql.expressions.Window
    val base = Tables.lineitem(spark, sf)
      .where(col("l_returnflag").isin("R", "N"))
      .select(graft.ops.Cols.dec2(col("l_extendedprice")).as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ia"))
    val g = base.groupBy(col("v"))
      .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.withColumn("cumA", sum(col("ca")).over(w))
      .withColumn("cumB", sum(col("cb")).over(w))
    val expect = c.crossJoin(
        g.agg(sum(col("ca")).as("nA"), sum(col("cb")).as("nB")))
      .select(abs(col("cumA") * col("nB") - col("cumB") * col("nA")).as("dev"))
      .agg(max(col("dev"))).head().getLong(0)
    assert(dNum == expect, s"two-pass KS must equal the window form: $dNum vs $expect")
  }
}
