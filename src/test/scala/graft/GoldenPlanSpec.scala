package graft

/** Golden plan-shape lock (VERDICT r3 #6): PLANS.md is regenerated each
  * round but nothing DIFFED it — a lost pushdown or a new exchange surfaced
  * only on a judge read. This spec pins the operator-name multiset of every
  * contract query's physical plan at the test fixture (sf0.001, local[4],
  * 4 shuffle partitions) against a checked-in golden file, so any plan
  * regression fails `sbt test` at HEAD.
  *
  * The signature is deliberately shape-only — node names (with Exchange
  * split by partitioning kind), not expression ids, paths, or stats — so
  * it is stable across runs while still catching every added/removed
  * exchange, join-strategy flip, lost WindowGroupLimit, or aggregate-mode
  * change.
  *
  * Intentional plan changes: regenerate and commit in the SAME change —
  *   GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenPlanSpec"
  */
class GoldenPlanSpec extends SparkSpec {

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/golden-plans.txt")

  /** Operator multiset of one physical-plan string, rendered canonically. */
  private[graft] def signature(plan: String): String = {
    // AQE repeats the whole tree under "== Initial Plan ==" with fresh
    // plan ids — count only the section above the marker (see the r3
    // plan-gate notes); un-executed plans have no marker and pass through
    val section = plan.split("== Initial Plan ==")(0)
    val node = "^[\\s:+\\-*()0-9]*([A-Za-z][A-Za-z0-9]*)".r
    section.linesIterator.flatMap { line =>
      node.findFirstMatchIn(line).map(_.group(1)).map {
        case "Exchange" if line.contains("rangepartitioning") => "ExchangeRange"
        case "Exchange" if line.contains("SinglePartition")   => "ExchangeSingle"
        case "Exchange"                                       => "ExchangeHash"
        case other                                            => other
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size).toSeq.sorted
      .map { case (n, c) => s"$n:$c" }.mkString(",")
  }

  test("every contract query's plan operator-multiset matches golden-plans.txt") {
    val sigs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val s =
        try signature(fn(spark, sf).queryExecution.executedPlan.toString)
        catch { case e: Throwable => s"ERROR:${e.getClass.getSimpleName}" }
      s"$name|$s"
    }
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.writeString(goldenPath, sigs.mkString("\n") + "\n")
      info(s"regenerated $goldenPath (${sigs.size} queries)")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        s"$goldenPath missing — run GRAFT_REGEN_GOLDEN=1 sbt 'testOnly graft.GoldenPlanSpec'")
      val golden = java.nio.file.Files.readString(goldenPath)
        .linesIterator.filter(_.nonEmpty).toSeq
      val goldenMap = golden.map(l => l.takeWhile(_ != '|') -> l).toMap
      val curMap = sigs.map(l => l.takeWhile(_ != '|') -> l).toMap
      val removed = goldenMap.keySet -- curMap.keySet
      val added = curMap.keySet -- goldenMap.keySet
      val changed = (goldenMap.keySet & curMap.keySet)
        .filter(k => goldenMap(k) != curMap(k)).toSeq.sorted
      val diff = changed.map(k =>
        s"\n  $k\n    golden: ${goldenMap(k)}\n    now:    ${curMap(k)}").mkString
      assert(removed.isEmpty && added.isEmpty && changed.isEmpty,
        s"plan shapes diverged from $goldenPath" +
          (if (added.nonEmpty) s"\nqueries without a golden entry: $added" else "") +
          (if (removed.nonEmpty) s"\ngolden entries with no query: $removed" else "") +
          diff +
          "\nIf intentional, regenerate and commit in the same change: " +
          "GRAFT_REGEN_GOLDEN=1 sbt 'testOnly graft.GoldenPlanSpec'")
    }
  }
}
