package graft

import org.apache.spark.sql.functions._

/** Round-13 specs (VERDICT r12): the recall lift's spec surface lives in
  * Round11Spec (fence raised 0.30 → 0.50 with the third probe cell + ±2
  * window); this suite pins the NEW surfaces — the serve/update/retrain
  * policy operator (#2), the drift audit's outer-join blind-spot fix
  * (ADVICE r12 #2), the PLANS.md registry gate (#3), and the
  * rounds-to-fixpoint fences for the iterative graph family (#5).
  */
class Round13Spec extends SparkSpec {

  private def sev(d: String): Int =
    d match { case "retrain" => 3; case "reroute" => 2; case "update" => 1
      case "serve" => 0
      case other => fail(s"unknown decision '$other'") }

  test("index_policy_vecsearch: per-cell decisions reproduce the threshold table and the overall row is worst-cell-wins") {
    val rows = run("index_policy_vecsearch").collect()
    val (ovr, cells) = rows.partition(_.getInt(0) == -1)
    assert(ovr.length === 1 && cells.nonEmpty)
    cells.foreach { r =>
      val nBase = r.getLong(1); val nNow = r.getLong(2)
      val deltaFrac = r.getDouble(3)
      val driftHigh = !r.isNullAt(4) && r.getDouble(4) > ops.Similarity.PolicyDriftRetrain
      val driftReroute =
        !r.isNullAt(4) && r.getDouble(4) > ops.Similarity.PolicyDriftReroute
      val expected =
        if (r.getInt(5) == 1 || nNow == 0 || driftHigh ||
          deltaFrac > ops.Similarity.PolicyDeltaRetrain) "retrain"
        else if (driftReroute) "reroute"
        else if (deltaFrac > 0.0) "update"
        else "serve"
      assert(r.getString(6) === expected, s"cell ${r.getInt(0)}")
      // the audit's arithmetic invariants
      assert(nNow <= 0 || math.abs(deltaFrac - (nNow - nBase).toDouble / nNow) < 1e-6)
    }
    val o = ovr.head
    assert(o.getLong(1) === cells.map(_.getLong(1)).sum, "overall n_base is the cell sum")
    assert(o.getLong(2) === cells.map(_.getLong(2)).sum, "overall n_now is the cell sum")
    assert(sev(o.getString(6)) === cells.map(r => sev(r.getString(6))).max,
      "overall decision is the worst per-cell decision")
    // the 10% fixture delta with drift ~0.03-0.06 must EXERCISE the
    // threshold: both actions present, so the oracle hash pins both
    // branches at every fixture size
    val decs = cells.map(_.getString(6)).toSet
    assert(decs.contains("retrain") && decs.contains("update") &&
      decs.contains("reroute"),
      s"decision table lost its mixed fixture: $decs")
  }

  test("driftAudit: a delta-only (untrained) cell and a vanished cell surface instead of being dropped (ADVICE r12 #2)") {
    val ss = spark
    import ss.implicits._
    val baseCent = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("cell", "base_cvec")
    val nowCent = Seq((0, Seq(1.0, 0.0)), (2, Seq(0.5, 0.5))).toDF("cell", "now_cvec")
    val nBase = Seq((0, 10L), (1, 5L)).toDF("cell", "n_base")
    val nNow = Seq((0, 12L), (2, 3L)).toDF("cell", "n_now")
    val out = ops.Similarity.driftAudit(baseCent, nowCent, nBase, nNow)
      .orderBy("cell").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(0, 1, 2), "all three cells surface")
    // trained + current: zero drift, trained
    assert(out(0).getInt(4) === 0 && !out(0).isNullAt(3) && out(0).getDouble(3) === 0.0)
    // vanished cell (base-only): n_now = 0, NULL drift, still trained
    assert(out(1).getLong(1) === 5L && out(1).getLong(2) === 0L &&
      out(1).isNullAt(3) && out(1).getInt(4) === 0)
    // delta-only cell: untrained = 1, n_base = 0, NULL drift — the exact
    // row the round-12 inner join silently dropped
    assert(out(2).getLong(1) === 0L && out(2).getLong(2) === 3L &&
      out(2).isNullAt(3) && out(2).getInt(4) === 1)
  }

  test("oracle constant sync: policy thresholds and the probe-scheme constants interpolate into the SQL") {
    val policy = SparkEntry.oracleSql("index_policy_vecsearch")
    assert(policy.contains(s"> ${ops.Similarity.PolicyDriftRetrain}"))
    assert(policy.contains(s"> ${ops.Similarity.PolicyDeltaRetrain}"))
    // the full chain carries the round-13 probe constants — bumping either
    // engine constant regenerates the oracle with it
    val full = SparkEntry.oracleSql("vec_knn_join_full")
    assert(full.contains(s"BETWEEN 2 AND ${ops.IndexStore.KnnFullProbeCells}"))
    assert(full.contains(s"- ${ops.IndexStore.KnnFullProbeWidth} AND"))
    assert(full.contains(s"+ ${ops.IndexStore.KnnFullProbeWidth} AND"))
  }

  test("vec_probe_adaptive: probe depth genuinely varies with routing density and the candidate floor is honored") {
    val rows = run("vec_probe_adaptive").collect()
    assert(rows.length === 10)
    val n = Tables.embeddings(spark, sf).count()
    val floor = (ops.Similarity.AdaptiveProbePct * n + 99) / 100
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "at least the argmax cell is probed")
      // probed-cell population >= floor (cum-before of the last kept cell
      // was < floor), minus the query's own membership row
      assert(r.getLong(2) >= floor - 1,
        s"query ${r.getLong(0)} scored ${r.getLong(2)} candidates below the floor $floor")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // the knob's reason to exist: at the 22% floor the fixture must yield
    // MIXED depths (dense routing stops at 2 cells, sparse takes a third)
    val depths = rows.map(_.getLong(1)).toSet
    assert(depths.size >= 2, s"probe depths collapsed to $depths — the adaptive knob is inert")
  }

  test("iterative fixpoint budgets: peel and star round counts stay inside the recorded sf0.001 fences (VERDICT r12 #5)") {
    // graph_kcore_full at sf0.001: 8 rounds observed at round 13
    // (BASELINE.md round-13 section); fence at observed + 50% margin so
    // the NEXT data-driven jump in rounds-to-fixpoint is diagnosed by the
    // suite, not discovered in the bench
    val r = run("graph_kcore_full").collect().head
    assert(r.getInt(2) === 1, "peel must reach its fixpoint inside the budget")
    assert(r.getInt(1) <= 12,
      s"kcore rounds ${r.getInt(1)} above the recorded sf0.001 fence (8 observed + margin)")
    // the alternating star loop is O(log² n) rounds by construction; at
    // sf0.001 it has converged in <= 6 rounds every recorded round —
    // fence with the same +margin discipline
    val (_, starRounds) = ops.Dedup.starComponents(
      ops.Similarity.mutualKnnFullEdges(spark, sf)
        .select(col("u").as("a_id"), col("v").as("b_id")))
    assert(starRounds <= 9,
      s"star loop took $starRounds rounds at sf0.001 — above the recorded fence (6 observed + margin)")
  }

  test("PLANS.md covers the full registry — the audit doc can never trail the surface again (VERDICT r12 #3)") {
    val p = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.exists(p), "PLANS.md missing")
    val names = java.nio.file.Files.readString(p).linesIterator
      .filter(l => l.startsWith("| ") && !l.startsWith("| query"))
      .map(_.split("\\|")(1).trim).toSet
    val missing = SparkEntry.queries.keySet -- names
    assert(missing.isEmpty,
      s"PLANS.md is missing ${missing.toSeq.sorted.mkString(", ")} — regenerate: " +
        "sbt 'runMain graft.PlanAudit /root/testdata/sf0.001 PLANS.md'")
  }

  // ---- round-13 late batch: exact-substring dedup, zone-map pruning,
  // ---- residual-PQ recall harness, bounded full-graph BFS

  test("dedup_exact_substring: flags are consistent and match a brute-force recomputation") {
    val out = run("dedup_exact_substring").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_shared <= n_windows")
      assert(r.getBoolean(3) === (r.getLong(2) > 0), "dup_flag = n_shared > 0")
    }
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)),
      "fixture exercises both branches")
    // recompute the dup set independently with a different plan shape
    // (raw-window self-semi-join instead of hash ownership)
    val d = Tables.documents(spark, sf).where(length(col("text")) >= 50)
    val w = d.select(col("doc_id"),
        explode(expr("sequence(1, length(text) - 49, 25)")).as("o"), col("text"))
      .select(col("doc_id"), expr("substring(text, CAST(o AS INT), 50)").as("win"))
    val flagged = w.as("a").join(w.as("b"),
        col("a.win") === col("b.win") && col("b.doc_id") < col("a.doc_id"), "left_semi")
      .select(col("a.doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet === flagged,
      "dup set matches the brute-force recomputation")
  }

  test("layout_zone_map_prune: clustering buys pruning; scan counts are sound") {
    val out = run("layout_zone_map_prune").orderBy("layout").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("arrival", "clustered"))
    val Array(arr, clu) = out
    assert(arr.getLong(1) === 64 && clu.getLong(1) === 64, "64 files per layout")
    assert(arr.getLong(3) === clu.getLong(3), "layouts cover the same rows")
    assert(arr.getLong(5) === clu.getLong(5), "matching rows are layout-invariant")
    Seq(arr, clu).foreach { r =>
      assert(r.getLong(4) >= r.getLong(5), "scanned >= matching (zone maps are sound)")
      assert(r.getLong(4) <= r.getLong(3), "scanned <= total")
    }
    assert(clu.getLong(2) > arr.getLong(2), "the clustered layout prunes strictly more files")
    assert(clu.getDouble(6) < arr.getDouble(6), "and pays lower scan amplification")
  }

  test("vec_pq_residual: the harness is sound — 10 exact truths per query, recall in [0,1], hits consistent") {
    val out = run("vec_pq_residual").collect()
    assert(out.length === 8)
    out.foreach { r =>
      assert(r.getLong(1) === 10)
      val rec = r.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getLong(2) === math.round(rec * 10))
    }
  }

  test("graph_bfs_distance_full: histogram is a partition of the graph nodes with seeds at dist 0") {
    val out = run("graph_bfs_distance_full").collect()
    val dists = out.map(_.getLong(0)).toSeq
    assert(dists === dists.sorted)
    assert(dists.toSet.subsetOf(Set(-1L, 0L, 1L, 2L, 3L, 4L)))
    assert(out.map(_.getLong(1)).forall(_ > 0))
    assert(dists.contains(0L), "seed level present")
  }

  test("agg_countmin_sketch: estimates obey the one-sided CMS guarantee and recover exact counts where rows agree") {
    val out = run("agg_countmin_sketch").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) >= 0L, s"user ${r.getLong(0)}: CMS underestimated")
      assert(r.getLong(2) === r.getLong(1) + r.getLong(3))
    }
  }

  test("ts_holt_linear: the fold matches a direct Scala recurrence on the same daily series") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val daily = Tables.events(spark, sf).where(col("value").isNotNull)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("y"))
      .orderBy(col("event_type"), col("day")).collect()
    val series = daily.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(2)).toVector).toMap
    val out = run("ts_holt_linear").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ys = series(r.getString(0))
      assert(r.getLong(1) === ys.length.toLong)
      var l = ys(0); var b = ys(1) - ys(0); var sse = 0.0
      ys.drop(2).foreach { y =>
        val f = l + b; val e = y - f; sse += e * e
        val ln = 0.5 * y + 0.5 * (l + b)
        b = 0.25 * (ln - l) + 0.75 * b; l = ln
      }
      assert(math.abs(r.getDouble(2) - r6(l)) < 1e-9, "level")
      assert(math.abs(r.getDouble(4) - r6(l + b)) < 1e-9, "forecast_1")
      assert(r.getDouble(6) >= 0.0, "sse")
    }
  }

  test("win_event_paths: every counted path is reproducible from a brute-force session walk") {
    val out = run("win_event_paths").collect()
    assert(out.nonEmpty && out.length <= 15)
    // brute force on the collected event stream
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = scala.collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var sid = 0L
      val tagged = sorted.zipWithIndex.map { case (r, i) =>
        if (i > 0 && r._2 - sorted(i - 1)._2 > 1800000000L) sid += 1
        (sid, r._4)
      }
      tagged.toSeq.sliding(3).foreach {
        case Seq((s1, e1), (s2, e2), (s3, e3)) if s1 == s2 && s2 == s3 =>
          val p = s"$e1>$e2>$e3"
          paths(p) = paths.getOrElse(p, 0L) + 1
        case _ =>
      }
    }
    out.foreach { r =>
      assert(paths.get(r.getString(0)).contains(r.getLong(1)), s"path ${r.getString(0)}")
    }
    val expectedTop = paths.toSeq.sortBy { case (p, n) => (-n, p) }.take(out.length)
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq === expectedTop)
  }

  test("dq_schema_drift: both versions profiled, deltas consistent, volumes partition the stream") {
    val out = run("dq_schema_drift").collect()
    assert(out.length === 6, "six metrics")
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) -
        math.rint(math.abs(r.getDouble(2) - r.getDouble(1)) * 1e6) / 1e6) < 1e-9)
    }
    val nRows = out.find(_.getString(0) == "n_rows").get
    val total = Tables.events(spark, sf).count()
    assert((nRows.getDouble(1) + nRows.getDouble(2)).toLong === total,
      "halves partition the stream")
  }

  test("pipeline_softdedup_weights: effective mass is bounded by raw mass and cluster counts") {
    val out = run("pipeline_softdedup_weights").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(3) <= r.getLong(1).toDouble + 1e-6, "effective_docs <= n_docs")
      assert(r.getDouble(3) >= 1.0 - 1e-6)
      assert(r.getDouble(5) <= r.getLong(4).toDouble + 1e-6, "effective <= raw tokens")
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0 + 1e-9, "retention in (0,1]")
    }
    // Σ effective_docs across sources == number of distinct text clusters
    val totalEff = out.map(_.getDouble(3)).sum
    val nClusters = Tables.documents(spark, sf)
      .select(md5(col("text"))).distinct().count()
    assert(math.abs(totalEff - nClusters.toDouble) < 1e-3,
      s"sum of weights $totalEff must equal cluster count $nClusters")
  }

  test("pipeline_domain_mix_kl: shares sum to 1, KL terms sum >= 0, factors capped") {
    val out = run("pipeline_domain_mix_kl").collect()
    assert(out.nonEmpty)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(out.map(_.getDouble(3)).sum >= -1e-6, "KL(p||q) >= 0 (Gibbs)")
    out.foreach(r => assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 5.0 + 1e-9))
  }

  test("ann_multitable_topk: second-table candidates reach across argmax cells and recall is sane") {
    val out = run("ann_multitable_topk").collect()
    assert(out.length === 8)
    out.foreach { r =>
      assert(r.getLong(1) > 0L, "candidates found")
      assert(r.getLong(2) === 8L, "8 exact truths per query")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 8L)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // two-table candidate lists must be wider than a single argmax cell's
    // share of the corpus alone would give: with 10 cells and crn <= 2
    // membership, each query reaches ~2 cells of members on each table —
    // n_cand must exceed the largest single inverted list
    val asg = ops.IndexStore.read(spark, sf, "ivf_assigned")
    val maxList = asg.groupBy(col("cell")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(out.exists(_.getLong(1) > maxList),
      "some query's two-table candidates exceed the largest single cell")
    val recalls = out.map(_.getDouble(4))
    assert(recalls.sum / recalls.length > 0.0, "nonzero mean recall on the fixture")
  }

  test("dedup_multi_signal: both signals bounded, flags reproduce their thresholds, pairs canonical") {
    val out = run("dedup_multi_signal").collect()
    assert(out.nonEmpty, "LSH candidates exist on the fixture")
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "a < b canonical")
      val j = r.getDouble(2); val c = r.getDouble(3)
      assert(j >= 0.0 && j <= 1.0)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getBoolean(4) === (j >= 0.5))
      assert(r.getBoolean(5) === (c >= 0.2))
      assert(r.getBoolean(6) === (r.getBoolean(4) != r.getBoolean(5)))
    }
  }

  test("vec_dim_variance_prune: a full ranked partition of the dims with a monotone variance curve") {
    val out = run("vec_dim_variance_prune").collect()
    assert(out.length === 64, "all 64 dims audited")
    assert(out.map(r => r.getInt(4)).toSeq === (1 to 64), "rank is a permutation")
    assert(out.count(_.getBoolean(6)) === 16, "exactly 16 kept")
    val vars = out.map(_.getDouble(3))
    vars.foreach(v => assert(v >= -1e-9, "variance nonnegative"))
    assert(vars.toSeq === vars.sortBy(-_).toSeq, "ranked by variance desc")
    val cum = out.map(_.getDouble(5))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a - 1e-9 }, "cum frac monotone")
    assert(math.abs(cum.last - 1.0) < 1e-6, "cumulative fraction ends at 1")
  }

  test("win_conversion_lag: counts partition the purchases and quantiles are ordered") {
    val out = run("win_conversion_lag").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === r.getLong(1) + r.getLong(2), "converted + unconverted = purchases")
    if (r.getLong(1) > 0) {
      assert(r.getDouble(3) >= 0.0, "lags nonnegative")
      assert(r.getDouble(3) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(5),
        "p25 <= p50 <= p90")
    }
  }

  test("pipeline_dedup_funnel: stages partition the removals and the funnel is monotone") {
    val out = run("pipeline_dedup_funnel").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("exact", "paragraph", "substring"))
    val total = Tables.documents(spark, sf).count()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "newly removed <= flagged")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= total)
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0 + 1e-9)
    }
    val kept = out.map(_.getLong(4))
    assert(kept.zip(kept.tail).forall { case (a, b) => b <= a }, "docs_kept monotone")
    val rets = out.map(_.getDouble(6))
    assert(rets.zip(rets.tail).forall { case (a, b) => b <= a + 1e-9 }, "retention monotone")
    assert(kept.head === total - out.head.getLong(2), "exact stage arithmetic")
  }

  test("text_bpe_merge_round: the parity-island merge matches a sequential greedy reference") {
    val out = run("text_bpe_merge_round").collect()
    assert(out.nonEmpty && out.length <= 10)
    val pair = out.head.getString(3)
    assert(pair.length === 2)
    val nApplied = out.head.getLong(4)
    // sequential greedy leftmost-first reference over the collected words
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2).collect().map(_.getString(0))
    var applied = 0L
    val postPairs = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { w =>
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w.substring(i, i + 2) == pair) {
          toks += pair; applied += 1; i += 2
        } else { toks += w.substring(i, i + 1); i += 1 }
      }
      toks.sliding(2).foreach {
        case scala.collection.mutable.ArrayBuffer(a, b) =>
          postPairs((a, b)) = postPairs.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    assert(nApplied === applied, "merge application count matches sequential greedy")
    out.foreach { r =>
      assert(postPairs.get((r.getString(0), r.getString(1))).contains(r.getLong(2)),
        s"post-merge pair (${r.getString(0)}, ${r.getString(1)})")
    }
    val expectedTop = postPairs.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(out.length)
      .map { case ((a, b), n) => (a, b, n) }
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq === expectedTop)
  }

  test("graph_random_walks: walks are replayable from the seed and stay on graph edges") {
    val out = run("graph_random_walks").collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getBoolean(2) === (r.getLong(0) % 100 == 0))
    }
    // replay one walk by hand over the same mutual edge set
    val me = ops.Similarity.mutualKnnFullEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (me.map(e => e._1 -> e._2) ++ me.map(e => e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.keySet.filter(_ % 100 == 0)
    assert(seeds.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val endpoints = seeds.toSeq.map { seed =>
      var cur = seed
      for (step <- 1 to 3)
        cur = adj(cur).toSeq.map(d => (md5hex(s"$seed|$step|$d"), d)).min._2
      cur
    }
    val expected = endpoints.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(expected.get(r.getLong(0)).contains(r.getLong(1)),
        s"endpoint ${r.getLong(0)} replays")
    }
  }

  test("graph_hits_full: integer HITS scores are exact path counts bounded by degree^rounds") {
    val out = run("graph_hits_full").collect()
    assert(out.nonEmpty && out.length <= 20)
    val maxAuth = math.pow(8, 7).toLong
    val maxHub = math.pow(8, 8).toLong
    out.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= maxHub, "hub bounded")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= maxAuth, "authority bounded")
    }
    // ranked by authority desc
    val auths = out.map(_.getLong(2)).toSeq
    assert(auths === auths.sorted.reverse)
  }
}
