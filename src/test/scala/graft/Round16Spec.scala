package graft

import org.apache.spark.sql.functions._

/** Round-16 specs (VERDICT r15 #4/#5): the parallel DE generation must
  * reproduce a sequential reference implementation exactly, and the grid
  * stencil family must be internally consistent (the clean's kept count
  * is the island decomposition's pixel total, image by image).
  */
class Round16Spec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("param_sweep_de_step equals a sequential DE/rand/1/bin reference generation") {
    // the corpus score, collected once as an exact integer histogram
    val hist = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("qty"),
        (col("l_discount") * 100).cast("long").as("d100"))
      .groupBy("qty", "d100").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def err(a: Long, b: Long): Long =
      hist.map { case (q, d, n) => (math.abs(q - a) + math.abs(d - b)) * n }.sum
    // sequential reference: same lattice init, seeded donors/crossover
    val np = 12
    val pop = (0 until np).map(i => (i.toLong, (7L * i + 3) % 50 + 1, (3L * i + 1) % 11))
    val expected = pop.map { case (i, a, b) =>
      val donors = pop.filter(_._1 != i)
        .sortBy { case (j, _, _) => (md5hex(s"de|r|$i|$j"), j) }.take(3)
      val va = math.max(1L, math.min(50L, donors(0)._2 + donors(1)._2 - donors(2)._2))
      val vb = math.max(0L, math.min(10L, donors(0)._3 + donors(1)._3 - donors(2)._3))
      val ta = if (i % 2 == 0 || md5hex(s"de|cx|$i|a").head < 'c') va else a
      val tb = if (i % 2 == 1 || md5hex(s"de|cx|$i|b").head < 'c') vb else b
      val (pe, te) = (err(a, b), err(ta, tb))
      val imp = te < pe
      (i, a, b, ta, tb, pe, te, if (imp) ta else a, if (imp) tb else b, imp)
    }
    val got = run("param_sweep_de_step").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getBoolean(9)))
    assert(got.length === np)
    expected.zip(got).foreach { case (e, g) => assert(e === g, s"member ${e._1}") }
    // the generation must exercise BOTH selection branches to be a test
    assert(got.exists(_._10) && got.exists(!_._10),
      "fixture must produce improved AND rejected trials")
  }

  test("param_sweep_saes_step equals a sequential (mu+lambda) SAES reference generation") {
    val hist = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("qty"),
        (col("l_discount") * 100).cast("long").as("d100"))
      .groupBy("qty", "d100").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def err(a: Long, b: Long): Long =
      hist.map { case (q, d, n) => (math.abs(q - a) + math.abs(d - b)) * n }.sum
    def hexDigit(s: String): Long = "0123456789abcdef".indexOf(md5hex(s).head).toLong
    val parents = (0L until 4L).map(i =>
      (i, i, (11 * i + 7) % 50 + 1, (5 * i + 2) % 11, 1L << i, 1L << ((i + 2) % 4)))
    val offspring = (0L until 16L).map { j =>
      val p = parents((j % 4).toInt)
      def adapt(sig: Long, dim: String): Long = {
        val v = if (hexDigit(s"saes|sig|$j|$dim") % 2 == 0) sig * 2 else sig / 2
        math.max(1L, math.min(16L, v))
      }
      val (sa, sb) = (adapt(p._5, "a"), adapt(p._6, "b"))
      val a = math.max(1L, math.min(50L, p._3 + (hexDigit(s"saes|x|$j|a") % 5 - 2) * sa))
      val b = math.max(0L, math.min(10L, p._4 + (hexDigit(s"saes|x|$j|b") % 5 - 2) * sb))
      (j + 4, p._1, a, b, sa, sb)
    }
    val expected = (parents ++ offspring)
      .map(c => (c, err(c._3, c._4)))
      .sortBy { case (c, e) => (e, c._1) }.take(4).zipWithIndex
      .map { case ((c, e), r) =>
        (r + 1, c._1, c._2, c._3, c._4, c._5, c._6, e, c._1 >= 4) }
    val got = run("param_sweep_saes_step").collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    assert(got.length === 4)
    expected.zip(got).foreach { case (e, g) => assert(e === g, s"rank ${e._1}") }
    // self-adaptation must be visible: a surviving offspring with a
    // step size different from its parent's
    assert(got.exists(_._9), "fixture must promote at least one offspring")
  }

  test("grid island decomposition is consistent with the tailcut clean, image by image") {
    val clean = run("grid_tailcut_clean").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap // vec -> (n_core, n_kept)
    val isl = run("grid_island_largest").collect()
    // islands exist exactly for images with kept pixels, and partition them
    assert(isl.length === clean.count(_._2._2 > 0))
    isl.foreach { r =>
      val (vec, nIsl, nKept, largest, px) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(clean(vec)._2 === nKept, s"vec $vec kept-count drift clean vs islands")
      assert(largest >= 1 && largest <= nKept && nIsl >= 1 && nIsl <= nKept)
      assert(px >= 0 && px < 64)
    }
    // non-degenerate fixture: multi-pixel islands AND singleton islands both occur
    assert(isl.exists(_.getLong(3) >= 2) && isl.exists(_.getLong(3) === 1))
  }

  test("grid_tailcut_clean and grid_stencil_smooth are map-only plans (no join, no shuffle before the final sort)") {
    for (k <- Seq("grid_tailcut_clean", "grid_stencil_smooth")) {
      val plan = run(k).queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$k must not join:\n$plan")
      // exactly the one range exchange the final ORDER BY owns
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"$k must shuffle only for the output sort:\n$plan")
    }
  }
}
