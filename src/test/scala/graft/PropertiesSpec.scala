package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws (SURVEY §5.2-1) run through the actual engine
  * operators on generated data. scalacheck drives generation; each law
  * executes real Spark plans, so these are engine properties, not model
  * properties.
  */
class PropertiesSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  private val smallMultiset: Gen[List[Int]] =
    Gen.listOfN(12, Gen.choose(0, 4))

  test("H-law: exceptAll + intersectAll partition the left multiset") {
    check(Prop.forAll(smallMultiset, smallMultiset) { (a, b) =>
      val da = a.toDF("v")
      val db = b.toDF("v")
      val ex = da.exceptAll(db).count()
      val in = da.intersectAll(db).count()
      ex + in == a.length
    })
  }

  test("H-law: multiset counts match the min/max model") {
    check(Prop.forAll(smallMultiset, smallMultiset) { (a, b) =>
      val da = a.toDF("v")
      val db = b.toDF("v")
      val cntA = a.groupBy(identity).view.mapValues(_.size).toMap
      val cntB = b.groupBy(identity).view.mapValues(_.size).toMap
      val modelEx = cntA.map { case (k, n) => math.max(n - cntB.getOrElse(k, 0), 0) }.sum
      val modelIn = cntA.map { case (k, n) => math.min(n, cntB.getOrElse(k, 0)) }.sum
      da.exceptAll(db).count() == modelEx && da.intersectAll(db).count() == modelIn
    })
  }

  test("F-law: closed-form ntile layout matches Spark's ntile for any N") {
    // the win_ntile_scalable bucket math: first N mod k buckets get
    // ceil(N/k) rows — must agree with Spark's ntile for every N ≥ 1
    val gen = Gen.choose(1, 40)
    check(Prop.forAll(gen) { n =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, expr, ntile, row_number}
      val k = 4
      val df = (1 to n).map(i => Tuple1(i)).toDF("v")
        .withColumn("rn",
          row_number().over(Window.orderBy(col("v"))).cast("bigint"))
        .withColumn("n_total", expr(s"cast($n as bigint)"))
      val closed = df.withColumn("q", expr(
        s"""cast(if(rn - 1 < (n_total % $k) * (n_total div $k + 1),
           |        (rn - 1) div (n_total div $k + 1),
           |        (n_total % $k) + (rn - 1 - (n_total % $k) * (n_total div $k + 1)) div (n_total div $k)
           |       ) + 1 as int)""".stripMargin))
      val sparkNtile = df.withColumn("q", ntile(k).over(Window.orderBy(col("v"))))
      closed.select("v", "q").except(sparkNtile.select("v", "q")).count() == 0
    })
  }

  test("M-law: two-pass distributed prefix sum equals the sequential scan model") {
    // the pipeline_pack_sequences substrate: GlobalRank.withGlobalRunningSum
    // must produce the EXCLUSIVE prefix sum of the doc_id-ordered value
    // sequence for any values and ANY range-partition count (the offsets
    // stitching is where a bug would hide)
    val genVals = Gen.listOfN(17, Gen.choose(0L, 200L))
    val genParts = Gen.choose(1, 6)
    check(Prop.forAll(genVals, genParts) { (vals, parts) =>
      import org.apache.spark.sql.functions.col
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "tokens")
      val got = graft.ops.GlobalRank
        .withGlobalRunningSum(df, parts, col("tokens"), col("id"))
        .select("id", "cum_before").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val model = vals.scanLeft(0L)(_ + _).init.zipWithIndex
        .map { case (c, i) => i.toLong -> c }.toMap
      got == model
    })
  }

  test("P-law: pre-ranged running sums equal the generic form (round 17)") {
    // withGlobalRunningSumsRanged skips the internal repartitionByRange on
    // the contract that its input is already range-partitioned on the
    // order key (the dq_ks_test census shape: repartitionByRange on the
    // raw rows, then a groupBy the range layout satisfies). The law: for
    // any values and partition count, routing the same census through the
    // ranged form after an explicit repartitionByRange+groupBy produces
    // the exact running sums of the generic form.
    val genVals = Gen.listOfN(23, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 50L)))
    val genParts = Gen.choose(1, 5)
    check(Prop.forAll(genVals, genParts) { (rows, parts) =>
      import org.apache.spark.sql.functions.{col, sum => ssum}
      val df = rows.toDF("k", "x")
      val census = df.repartitionByRange(parts, col("k"))
        .groupBy(col("k")).agg(ssum(col("x")).as("cx"))
      val got = graft.ops.GlobalRank
        .withGlobalRunningSumsRanged(census, Seq(col("cx") -> "cum"), col("k"))
        .select("k", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val genericCensus = df.groupBy(col("k")).agg(ssum(col("x")).as("cx"))
      val want = graft.ops.GlobalRank
        .withGlobalRunningSums(genericCensus, parts,
          Seq(col("cx") -> "cum"), col("k"))
        .select("k", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    })
  }

  test("F-law: running total over full partition equals group sum") {
    val gen = Gen.listOfN(10, Gen.zip(Gen.choose(0, 2), Gen.choose(1, 100)))
    check(Prop.forAll(gen) { xs =>
      val df = xs.zipWithIndex.map { case ((g, v), i) => (g, i, v) }
        .toDF("g", "seq", "v")
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("g").orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last = df.withColumn("rt", sum("v").over(w))
        .groupBy("g").agg(max("rt").as("rt_final"), sum("v").as("total"))
      last.where("rt_final <> total").count() == 0
    })
  }

  test("J-law: engine dot product is symmetric and matches model") {
    val vec = Gen.listOfN(6, Gen.choose(-5, 5).map(_.toFloat))
    check(Prop.forAll(vec, vec) { (a, b) =>
      val df = Seq((a, b)).toDF("a_emb", "b_emb")
      import org.apache.spark.sql.functions.expr
      val d = "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
      val fwd = df.select(expr(d)).head().getDouble(0)
      val rev = df.selectExpr("b_emb AS a_emb", "a_emb AS b_emb")
        .select(expr(d)).head().getDouble(0)
      val model = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      fwd == rev && math.abs(fwd - model) < 1e-9
    })
  }

  test("F-law: gaps-and-islands streaks match the brute-force run model") {
    // a few customers, random day sets — compare graft.ops.Windows.streaksOf
    // against a Scala model of longest-consecutive-run / islands
    val gen = Gen.listOfN(3, Gen.nonEmptyListOf(Gen.choose(0, 25)))
    check(Prop.forAll(gen) { custs =>
      val rows = custs.zipWithIndex.flatMap { case (ds, c) =>
        ds.distinct.map(d => (c.toLong, d.toLong))
      }
      val df = rows.toDF("o_custkey", "d")
      val got = graft.ops.Windows.streaksOf(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      custs.zipWithIndex.forall { case (ds, c) =>
        val days = ds.distinct.sorted
        // model: split into runs of consecutive integers
        val runs = days.foldLeft(List.empty[List[Int]]) {
          case (acc, d) if acc.nonEmpty && acc.head.head == d - 1 =>
            (d :: acc.head) :: acc.tail
          case (acc, d) => List(d) :: acc
        }
        got(c.toLong) == ((runs.map(_.size).max.toLong,
          days.size.toLong, runs.size.toLong))
      }
    })
  }

  test("F-law: rolling 7-frame median formula matches the brute-force model") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val series = Gen.listOfN(15, Gen.choose(-50, 50).map(_.toDouble / 2))
    check(Prop.forAll(series) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
      val w = Window.orderBy(col("i")).rowsBetween(-6, Window.currentRow)
      val got = df
        .withColumn("slst", array_sort(collect_list(col("v")).over(w)))
        .withColumn("n", size(col("slst")))
        .select(col("i"),
          ((element_at(col("slst"), (expr("(n - 1) div 2") + 1).cast("int")) +
            element_at(col("slst"), (expr("n div 2") + 1).cast("int"))) / 2.0).as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      xs.indices.forall { i =>
        val frame = xs.slice(math.max(0, i - 6), i + 1).sorted
        val model = (frame((frame.size - 1) / 2) + frame(frame.size / 2)) / 2.0
        got(i.toLong) == model
      }
    })
  }

  test("E-law: cumulative-weight median pick = brute-force weighted median") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows = Gen.listOfN(10,
      Gen.zip(Gen.choose(0, 30), Gen.choose(1L, 9L)))
    check(Prop.forAll(rows) { vw =>
      val df = vw.zipWithIndex
        .map { case ((v, wt), i) => (v.toDouble, wt, i.toLong) }
        .toDF("v", "w", "id")
      val wCum = Window.orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = vw.map(_._2).sum
      val got = df.withColumn("cumw", sum(col("w")).over(wCum))
        .where(col("cumw") * 2 >= tot)
        .agg(min(col("v"))).head().getDouble(0)
      // model: walk the (v, id)-sorted rows until half the mass is covered
      val sorted = vw.zipWithIndex.sortBy { case ((v, _), i) => (v, i) }
      val cums = sorted.map(_._1._2).scanLeft(0L)(_ + _).tail
      val modelV = sorted(cums.indexWhere(_ * 2 >= tot))._1._1.toDouble
      got == modelV
    })
  }

  test("E-law: exact-sums Pearson r equals the naive two-pass model") {
    import org.apache.spark.sql.functions._
    val pairs = Gen.listOfN(12, Gen.zip(Gen.choose(1, 40), Gen.choose(1, 40)))
      .suchThat(l => l.map(_._1).distinct.size > 1 && l.map(_._2).distinct.size > 1)
    check(Prop.forAll(pairs) { xy =>
      val df = xy.map { case (x, y) => (x.toLong, y.toLong) }.toDF("x", "y")
      val a = df.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy")).head()
      val (n, sx, sy, sxy, sxx, syy) =
        (a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4), a.getLong(5))
      val got = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
      val (mx, my) = (xy.map(_._1).sum.toDouble / n, xy.map(_._2).sum.toDouble / n)
      val cov = xy.map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xy.map { case (x, _) => (x - mx) * (x - mx) }.sum
      val vy = xy.map { case (_, y) => (y - my) * (y - my) }.sum
      val model = cov / (math.sqrt(vx) * math.sqrt(vy))
      math.abs(got - model) < 1e-9
    })
  }

  test("L-law: session count = 1 + gaps >= 30min (single user)") {
    // strictly increasing minute offsets over a day
    val gaps = Gen.listOfN(8, Gen.choose(1, 70))
    check(Prop.forAll(gaps) { gs =>
      val times = gs.scanLeft(0)(_ + _) // minutes since base
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val rows = times.map(m =>
        (new java.sql.Timestamp(base.getTime + m * 60000L), 1L, 1.0))
      val df = rows.toDF("ts", "user_id", "value")
      val sessions = graft.ops.Streaming.sessionAgg(df).count()
      // Spark merges an event landing exactly at prev + gap into the
      // session (found by this property!): new session iff gap is STRICTLY
      // greater than the threshold.
      val model = 1 + times.sliding(2).count {
        case Seq(x, y) => (y - x) > 30
        case _         => false
      }
      sessions == model
    })
  }
}
