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
    d match { case "retrain" => 2; case "update" => 1; case "serve" => 0
      case other => fail(s"unknown decision '$other'") }

  test("index_policy_vecsearch: per-cell decisions reproduce the threshold table and the overall row is worst-cell-wins") {
    val rows = run("index_policy_vecsearch").collect()
    val (ovr, cells) = rows.partition(_.getInt(0) == -1)
    assert(ovr.length === 1 && cells.nonEmpty)
    cells.foreach { r =>
      val nBase = r.getLong(1); val nNow = r.getLong(2)
      val deltaFrac = r.getDouble(3)
      val driftHigh = !r.isNullAt(4) && r.getDouble(4) > ops.Similarity.PolicyDriftRetrain
      val expected =
        if (r.getInt(5) == 1 || nNow == 0 || driftHigh ||
          deltaFrac > ops.Similarity.PolicyDeltaRetrain) "retrain"
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
    assert(decs.contains("retrain") && decs.contains("update"),
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
}
