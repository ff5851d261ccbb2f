package graft

import org.apache.spark.sql.functions._

import graft.rel.Relational
import graft.stats.Survey

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("weightedMean matches closed form") {
    val df = Seq(("a", 1.0, 2.0), ("a", 3.0, 1.0), ("b", 10.0, 4.0))
      .toDF("g", "y", "w")
    val r = Relational.weightedMean(df, Seq("g"), $"y", $"w")
      .orderBy("g").as[(String, Double)].collect()
    assert(math.abs(r(0)._2 - (1.0 * 2 + 3.0 * 1) / 3.0) < 1e-12)
    assert(math.abs(r(1)._2 - 10.0) < 1e-12)
  }

  test("fullOuterChain keeps unmatched keys with nulls (49-vs-51 rule)") {
    val a = Seq(("x", 1.0), ("y", 2.0)).toDF("k", "va")
    val b = Seq(("y", 3.0), ("z", 4.0)).toDF("k", "vb")
    val j = Relational.fullOuterChain(Seq(a, b), "k").orderBy("k")
    assert(j.count() == 3)
    val rows = j.collect()
    assert(rows(0).isNullAt(2) && rows(2).isNullAt(1))
  }

  test("deviationSummary skips nulls like na.rm=TRUE") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(3.0), Some(3.0)),
      (None, Some(9.0))).toDF("est", "act")
    val r = Relational.deviationSummary(df, $"est", $"act").collect()(0)
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12) // mean((1-2)^2,(3-3)^2)
    assert(math.abs(r.getDouble(1) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
  }

  test("productAgg computes product via log space") {
    val df = Seq(2.0, 3.0, 4.0).toDF("x")
    val p = df.agg(Relational.productAgg($"x").as("p")).as[Double].head()
    assert(math.abs(p - 24.0) < 1e-9)
  }

  test("weightedMeanSE matches hand-computed linearized design SE") {
    // svymean with each row its own PSU: mu = sum(wy)/sum(w),
    // var = n/(n-1) * sum(w^2 (y-mu)^2) / (sum w)^2
    val df = Seq(("a", 1.0, 1.0), ("a", 0.0, 2.0), ("a", 1.0, 3.0))
      .toDF("g", "y", "w")
    val mu = (1.0 + 0.0 + 3.0) / 6.0
    val ss = math.pow(1 * (1 - mu), 2) + math.pow(2 * (0 - mu), 2) +
      math.pow(3 * (1 - mu), 2)
    val se = math.sqrt(3.0 / 2.0 * ss / 36.0)
    val r = Survey.weightedMeanSE(df, "g", "y", "w").collect()(0)
    assert(math.abs(r.getDouble(1) - mu) < 1e-12)
    assert(math.abs(r.getDouble(2) - se) < 1e-12)
  }

  test("weightedMeanSE drops null outcomes (na.rm)") {
    val df = Seq(("a", Some(1.0), 1.0), ("a", None, 5.0), ("a", Some(3.0), 1.0))
      .toDF("g", "y", "w")
    val r = Survey.weightedMeanSE(df, "g", "y", "w").collect()(0)
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-12)
  }

  test("skyline keeps exactly the non-dominated set, any partitioning") {
    import graft.ops.Skyline
    // minimize x, maximize y. Expected front: (1,...) dominated rows out;
    // ties on both criteria (id 5/6) both survive (no strict dominance)
    val rows = Seq(
      (1L, 1.0, 9), // front
      (2L, 2.0, 9), // dominated by 1 (worse x, same y)
      (3L, 3.0, 12), // front
      (4L, 5.0, 11), // dominated by 3
      (5L, 2.0, 10), (6L, 2.0, 10), // equal criteria: both front
      (7L, 0.5, 1) // front (cheapest)
    )
    for (parts <- Seq(1, 3, 7)) {
      val df = rows.toDF("id", "x", "y").repartition(parts)
      val r = Skyline.skyline(df, Seq("x"), Seq("y"))
        .select("id").as[Long].collect().toSet
      assert(r == Set(1L, 3L, 5L, 6L, 7L), s"parts=$parts got $r")
    }
  }

  test("skyline guard fails loudly on survivor-heavy anti-correlated data") {
    import graft.ops.Skyline
    // x + y = const with all-distinct coordinates: EVERY row is on the
    // front, so local pruning removes nothing. With a tiny merge bound
    // the operator must refuse the single-task merge, not silently
    // serialize it.
    val anti = (0 until 500).map(i => (i.toLong, i.toDouble, 500.0 - i))
      .toDF("id", "x", "y").repartition(8)
    val e = intercept[IllegalStateException] {
      Skyline.skyline(anti, Seq("x", "y"), Seq(), maxGlobalCandidates = 100L)
    }
    assert(e.getMessage.contains("survivors exceed"))
    // and with the default bound the same input still returns the full
    // (correct) front
    val full = Skyline.skyline(anti, Seq("x", "y"), Seq()).count()
    assert(full == 500L)
  }

  test("skyline grid pre-merge path: survivors over the bound get " +
      "pruned in one grid round and the exact front comes back") {
    import graft.ops.Skyline
    // 100-point anti-correlated TRUE front (i, 100-i) + 2000 interior
    // points (200+j, 200-j): every interior point is dominated by EVERY
    // front point, but interiors are mutually non-dominating, so an
    // interior point survives phase 1 iff its partition holds no front
    // point. Spread thin over 256 partitions most partitions are
    // front-free -> phase-1 survivors far exceed the bound; the grid
    // pre-merge concentrates survivors ~4x, front points reach most
    // grid cells, and the candidate count collapses under the bound.
    val front = (0 until 100).map(i => (i.toLong, i.toDouble, 100.0 - i))
    val interior = (0 until 2000).map(j =>
      (1000L + j, 200.0 + (j % 100), 200.0 - (j % 100)))
    val df = (front ++ interior).toDF("id", "x", "y").repartition(256)
    // replicate phase 1 against the same partitioning to PROVE this
    // dataset actually drives the pre-merge branch (survivors > bound)
    val survivors = df.select("x", "y").rdd.mapPartitions { it =>
      val pts = it.map(r => Array(r.getDouble(0), r.getDouble(1))).toSeq
      def dom(a: Array[Double], b: Array[Double]) =
        b(0) <= a(0) && b(1) <= a(1) && (b(0) < a(0) || b(1) < a(1))
      Iterator.single(pts.count(p => !pts.exists(q => !(q sameElements p) && dom(p, q))))
    }.sum()
    assert(survivors > 1000,
      s"fixture broken: only $survivors phase-1 survivors, pre-merge " +
        "branch would not trigger")
    val r = Skyline.skyline(df, Seq("x", "y"), Seq(),
        maxGlobalCandidates = 1000L)
      .select("id").as[Long].collect().toSet
    assert(r == front.map(_._1).toSet)
  }

  test("asofJoin attaches latest right value at-or-before, per key") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq(
      (1L, "u1", ts(50)),  // before any right row -> null
      (2L, "u1", ts(100)), // exactly at right ts -> 10.0 (at-or-before)
      (3L, "u1", ts(250)), // after both -> latest (20.0)
      (4L, "u2", ts(500))  // other key, no right rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(100), 10.0), ("u1", ts(200), 20.0))
      .toDF("k", "t", "v")
    val r = Relational.asofJoin(left, right, "k", "t", $"v", "asof")
      .orderBy("id").select("id", "asof")
      .as[(Long, Option[Double])].collect().toSeq
    assert(r == Seq((1L, None), (2L, Some(10.0)), (3L, Some(20.0)),
      (4L, None)))
  }

  test("intervalJoin equals the naive theta-join, boundaries inclusive") {
    val rng = new scala.util.Random(7)
    val iv = (1 to 60).map { i =>
      val s = rng.nextInt(200).toLong
      (i.toLong, s, s + rng.nextInt(40))
    }.toDF("iv_id", "s", "e")
    val pts = (1 to 120)
      .map(j => (1000L + j, rng.nextInt(260).toLong - 10)).toDF("p_id", "t")
    val naive = iv.crossJoin(pts).filter($"t".between($"s", $"e"))
      .select("iv_id", "p_id").as[(Long, Long)].collect().toSet
    // several bin widths, including narrower and wider than spans
    for (w <- Seq(4L, 16L, 64L)) {
      val got = Relational.intervalJoin(iv, "s", "e", pts, "t", w)
        .select("iv_id", "p_id").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == naive, s"w=$w")
    }
    // exact boundary stabs on both ends match
    val b = Relational.intervalJoin(
      Seq((1L, 10L, 20L)).toDF("iv_id", "s", "e"),
      "s", "e",
      Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("p_id", "t"),
      "t", 16L)
      .select("p_id").as[Long].collect().toSet
    assert(b == Set(1L, 2L))
  }

  test("sequentialFunnel: greedy first-qualifying advance, strict " +
      "time ordering") {
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      // u1 completes all four in order
      ("u1", "view", t(1)), ("u1", "click", t(2)),
      ("u1", "signup", t(3)), ("u1", "purchase", t(4)),
      // u2: click BEFORE first view -> that click can't count; no
      // later click, so u2 stalls at stage 1
      ("u2", "click", t(1)), ("u2", "view", t(2)),
      // u3: equal timestamps do not advance (strict >)
      ("u3", "view", t(1)), ("u3", "click", t(1)),
      // u4: greedy takes the FIRST view (t1); the click at t2
      // qualifies even though a later view (t3) also exists
      ("u4", "view", t(1)), ("u4", "click", t(2)), ("u4", "view", t(3)),
      // u5: no funnel events at all
      ("u5", "other", t(1))
    ).toDF("user_id", "event_type", "ts")
    val r = Relational.sequentialFunnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "signup", "purchase"))
      .orderBy("stage_idx")
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    // stage 1: u1 u2 u3 u4; stage 2: u1 u4; stages 3, 4: u1
    assert(r == Seq((1, 4L), (2, 2L), (3, 1L), (4, 1L)))
  }

  test("sequentialFunnel: one hot user with 1e6 events completes under " +
      "bounded aggregation state (no per-user event buffer)") {
    // a bot user emitting 10^6 view events plus one full funnel tail;
    // the collect_list formulation would materialize all 10^6 rows in
    // ONE aggregation buffer — the chained-min plan must not contain
    // any list aggregation at all
    val baseSec = 1700000000L // long -> timestamp cast is SECONDS
    val bot = spark.range(1000000).select(
      lit("bot").as("user_id"), lit("view").as("event_type"),
      (col("id") + baseSec).cast("timestamp").as("ts"))
    val tail = Seq( // java.sql.Timestamp ctor takes MILLIS
      ("bot", "click", new java.sql.Timestamp((baseSec + 2000000L) * 1000L)),
      ("bot", "signup", new java.sql.Timestamp((baseSec + 2000001L) * 1000L)),
      ("u9", "view", new java.sql.Timestamp(baseSec * 1000L)))
      .toDF("user_id", "event_type", "ts")
    val funnel = Relational.sequentialFunnel(bot.unionByName(tail),
      "user_id", "ts", "event_type", Seq("view", "click", "signup", "purchase"))
    val plan = funnel.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("sort_array"),
      "funnel plan must not buffer per-user event lists")
    val r = funnel.orderBy("stage_idx")
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r == Seq((1, 2L), (2, 1L), (3, 1L)))
  }

  test("mergeUpsert applies update/delete/insert and passes the rest " +
      "through untouched") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val changes = Seq(
      (2L, "B", 21.0, "U"), // matched update
      (3L, "x", 0.0, "D"),  // matched delete
      (9L, "zz", 0.0, "D"), // unmatched delete: no-op
      (5L, "e", 50.0, "U")) // unmatched insert
      .toDF("k", "s", "v", "op")
    val r = Relational.mergeUpsert(target, changes, "k", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(r == Set((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0),
      (5L, "e", 50.0)))
  }

  test("scd2 collapses runs null-safely and closes intervals in order") {
    val ms = 1000L
    def ts(s: Long) = new java.sql.Timestamp(s * ms)
    val feed = Seq(
      ("u1", ts(1), Some("gold")),
      ("u1", ts(2), Some("gold")),   // same run — collapsed
      ("u1", ts(3), None),           // null is a VALUE: a new version
      ("u1", ts(4), None),           // same (null) run — collapsed
      ("u1", ts(5), Some("silver")),
      ("u2", ts(1), Some("bronze")))
      .toDF("k", "ts", "tier")
    val r = Relational.scd2(feed, "k", "ts", Seq("tier"))
      .select($"k", $"version", $"tier",
        $"valid_from".cast("long"), $"valid_to".cast("long"),
        $"is_current")
      .as[(String, Int, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(r == Set(
      ("u1", 1, Some("gold"), 1L, Some(3L), false),
      ("u1", 2, None, 3L, Some(5L), false),
      ("u1", 3, Some("silver"), 5L, None, true),
      ("u2", 1, Some("bronze"), 1L, None, true)))
  }

  test("saltedJoin equals the plain join under any partitioning") {
    // skewed probe: key 1 holds most rows (the straggler scenario)
    val probe = (1 to 200).map(i => (if (i <= 150) 1L else i.toLong, i))
      .toDF("k", "v")
    val build = Seq((1L, "hot"), (160L, "cold"), (999L, "unmatched"))
      .toDF("bk", "name")
    val truth = probe.join(build, $"k" === $"bk").drop("bk")
      .as[(Long, Int, String)].collect().toSet
    for (parts <- Seq(1, 5)) {
      val r = Relational.saltedJoin(probe.repartition(parts), build,
          "k", "bk", saltFactor = 4).drop("bk")
        .as[(Long, Int, String)].collect().toSet
      assert(r == truth, s"parts=$parts")
    }
    // the salt really spreads the hot key: >1 distinct salt on key 1
    val salts = probe.select(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"k", $"v"),
          org.apache.spark.sql.functions.lit(4)))
      .where($"k" === 1L).distinct().count()
    assert(salts > 1, s"hot key collapsed to $salts salt(s)")
  }

  test("scalableRank equals the textbook row_number window, any " +
      "partitioning, ties and hot group included") {
    import org.apache.spark.sql.expressions.Window
    // group g0 dominates (the case the machinery exists for), with
    // heavy value ties exercising the tie-group path
    val rows = (0 until 300).map(i => (i.toLong, "g0", (i % 7).toDouble)) ++
      (1000 until 1010).map(i => (i.toLong, "g1", (i % 3).toDouble)) ++
      Seq((2000L, "g2", 5.0))
    val df = rows.toDF("id", "g", "v")
    val expected = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v"), col("id"))))
      .withColumn("n_group", count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "g", "v", "rank", "n_group")
      .as[(Long, String, Double, Int, Long)].collect().toSet
    for (parts <- Seq(1, 7)) {
      val got = Relational.scalableRank(df.repartition(parts), "g", "v", "id")
        .select(col("id"), col("g"), col("v"),
          col("rank").cast("int"), col("n_group"))
        .as[(Long, String, Double, Int, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
    // singleton group: rank 1 of 1
    val solo = Relational.scalableRank(df, "g", "v", "id")
      .filter($"g" === "g2").select("rank", "n_group")
      .as[(Long, Long)].head()
    assert(solo == ((1L, 1L)))
  }

  test("fuzz: scalableRank equals row_number over (value, id) on " +
      "random data including null values and heavy ties") {
    import org.scalacheck.{Gen, rng}
    val caseGen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(0, 2)
        id <- Gen.chooseNum(0L, 60L)
        v <- Gen.oneOf(Gen.const(Option.empty[Double]),
          Gen.chooseNum(0, 4).map(x => Some(x.toDouble)))
      } yield (g, id, v))
    } yield rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList
    var seed = rng.Seed(20260814L)
    for (_ <- 1 to 10) {
      val rows = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = rows.toDF("g", "id", "v").repartition(4)
      val got = Relational.scalableRank(df, "g", "v", "id")
        .select($"g", $"id", $"rank", $"n_group")
        .as[(Int, Long, Long, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("v").asc, col("id").asc)
      val wn = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val win = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("n_group", count(lit(1)).over(wn))
        .select($"g", $"id", $"rank", $"n_group")
        .as[(Int, Long, Long, Long)].collect().toSet
      assert(got == win, s"rows=$rows\ngot=$got\nwin=$win")
    }
  }

  test("fuzz: mergeUpsert equals naive map application of the change " +
      "feed (updates, deletes, unmatched inserts, no-op deletes)") {
    import org.scalacheck.{Gen, rng}
    val caseGen = for {
      nt <- Gen.chooseNum(0, 20)
      nc <- Gen.chooseNum(0, 20)
      t <- Gen.listOfN(nt, Gen.zip(Gen.chooseNum(0L, 30L),
        Gen.chooseNum(0, 9)))
      c <- Gen.listOfN(nc, for {
        k <- Gen.chooseNum(0L, 30L)
        v <- Gen.chooseNum(10, 19)
        op <- Gen.oneOf("U", "D")
      } yield (k, v, op))
    } yield (t.distinctBy(_._1), c.distinctBy(_._1))
    var seed = rng.Seed(20260814L)
    for (_ <- 1 to 10) {
      val (t, c) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val target = t.toDF("k", "v")
      val changes = c.toDF("k", "v", "op")
      val got = Relational.mergeUpsert(target, changes, "k", "op")
        .as[(Long, Int)].collect().toSet
      val naive = {
        val m = scala.collection.mutable.Map(t.map(r => r._1 -> r._2): _*)
        c.foreach {
          case (k, _, "D") => m.remove(k)
          case (k, v, _) => m(k) = v
        }
        m.toSet
      }
      assert(got == naive, s"t=$t c=$c\ngot=$got\nnaive=$naive")
    }
  }

  test("fuzz: asofJoin equals the naive latest-at-or-before lookup on " +
      "random data (ties on ts, duplicate right rows, missing keys)") {
    import org.scalacheck.{Gen, rng}
    val rowGen = for {
      k <- Gen.chooseNum(0, 3)
      t <- Gen.chooseNum(0, 20)
      v <- Gen.chooseNum(0, 9)
    } yield (k, t, v)
    val caseGen = for {
      nl <- Gen.chooseNum(1, 25)
      nr <- Gen.chooseNum(0, 25)
      ls <- Gen.listOfN(nl, rowGen)
      rs <- Gen.listOfN(nr, rowGen)
    } yield (ls.map(r => (r._1, r._2)).distinct, rs.distinct)
    var seed = rng.Seed(20260814L)
    for (_ <- 1 to 10) {
      val (ls, rs) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val left = ls.toDF("k", "t")
      val right = rs.toDF("k", "t", "v")
      val got = Relational.asofJoin(left, right, "k", "t", $"v", "asof")
        .select($"k", $"t", $"asof").as[(Int, Int, Option[Int])]
        .collect().toSet
      // naive: max (t', v) over right rows with same key, t' <= t —
      // at equal t' the greatest v wins (the documented tie rule)
      val naive = ls.map { case (k, t) =>
        val cand = rs.filter(r => r._1 == k && r._2 <= t)
        (k, t, if (cand.isEmpty) None
               else Some(cand.maxBy(r => (r._2, r._3))._3))
      }.toSet
      assert(got == naive, s"left=$ls right=$rs\ngot=$got\nnaive=$naive")
    }
  }

  test("fuzz: scd2 intervals tile each key's timeline and replay the " +
      "feed value at every observation") {
    import org.scalacheck.{Gen, rng}
    val caseGen = for {
      n <- Gen.chooseNum(1, 20)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0, 2)
        t <- Gen.chooseNum(0, 30)
        a <- Gen.oneOf(Some("x"), Some("y"), Some("z"), None)
      } yield (k, t, a))
    } yield rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList
    var seed = rng.Seed(20260814L)
    for (_ <- 1 to 10) {
      val rows = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val feed = rows.toDF("k", "ts", "a")
      val hist = Relational.scd2(feed, "k", "ts", Seq("a"))
        .select($"k", $"valid_from", $"valid_to", $"version",
          $"is_current", $"a")
        .as[(Int, Int, Option[Int], Int, Boolean, Option[String])]
        .collect().toSeq
      hist.groupBy(_._1).foreach { case (k, h) =>
        val byV = h.sortBy(_._4)
        // versions are 1..n, intervals chain exactly, one open tail
        assert(byV.map(_._4) == (1 to byV.length))
        byV.sliding(2).foreach {
          case Seq(a, b) => assert(a._3.contains(b._2), s"$k: $a !-> $b")
          case _ =>
        }
        assert(byV.last._3.isEmpty && byV.last._5)
        assert(byV.init.forall(r => !r._5))
        // every feed observation replays to its interval's value
        rows.filter(_._1 == k).foreach { case (_, t, a) =>
          val iv = byV.filter(r => r._2 <= t &&
            r._3.forall(_ > t))
          assert(iv.length == 1 && iv.head._6 == a,
            s"k=$k t=$t a=$a hist=$byV")
        }
      }
    }
  }

  test("tableDiff classifies added/removed/changed/unchanged with " +
      "null-safe value comparison") {
    val old = Seq((1, Some("a"), 10.0), (2, None, 20.0),
      (3, Some("c"), 30.0), (4, Some("d"), 40.0))
      .toDF("k", "v", "x")
    val nw = Seq((1, Some("a"), 10.0), (2, None, 20.0),
      (3, None, 30.0), (5, Some("e"), 50.0))
      .toDF("k", "v", "x")
    val got = Relational.tableDiff(old, nw, Seq("k"), Seq("v", "x"))
      .select($"k", $"status").as[(Int, String)].collect().toMap
    // k=2 has null v on BOTH sides: null-safe compare -> unchanged;
    // k=3 went c -> null: a VALUE change, not a wildcard match
    assert(got == Map(1 -> "unchanged", 2 -> "unchanged",
      3 -> "changed", 4 -> "removed", 5 -> "added"))
  }

  test("tableDiff metrics via the Observation API — no second pass " +
      "over the diff") {
    // the audit counters ride the SAME job that materializes the diff
    // (observe() attaches aggregates to the plan); a separate count()
    // per class would re-run the full-outer join once per metric
    val old = (1 to 100).map(i => (i, i * 2)).toDF("k", "v")
    val nw = (1 to 100).filter(_ % 10 != 0)
      .map(i => (i, if (i % 7 == 0) i * 2 + 1 else i * 2)).toDF("k", "v")
    val obs = new org.apache.spark.sql.Observation("diff_audit")
    val diffed = Relational.tableDiff(old, nw, Seq("k"), Seq("v"))
      .observe(obs,
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.when($"status" === "changed", 1))
          .as("n_changed"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.when($"status" === "removed", 1))
          .as("n_removed"))
    val rows = diffed.collect() // one action drives both data + metrics
    val m = obs.get
    val expectedChanged = (1 to 100)
      .count(i => i % 10 != 0 && i % 7 == 0)
    assert(m("n_changed") == expectedChanged.toLong, m.toString)
    assert(m("n_removed") == 10L, m.toString)
    assert(rows.length == 100)
  }

  test("incrementalJoin delta rule equals the full recompute, " +
      "including delta-delta matches and keys new on both sides") {
    // key 5 exists ONLY in the deltas — the ΔA⋈ΔB term must catch it
    val aOld = Seq((1, "a1"), (2, "a2"), (3, "a3")).toDF("k", "av")
    val aDel = Seq((2, "a2d"), (5, "a5d")).toDF("k", "av")
    val bOld = Seq((1, "b1"), (2, "b2"), (4, "b4")).toDF("k", "bv")
    val bDel = Seq((3, "b3d"), (5, "b5d")).toDF("k", "bv")
    val view = aOld.join(bOld, Seq("k"))
    val maintained = Relational.incrementalJoin(view, aOld, aDel,
        bOld, bDel, "k")
      .as[(Int, String, String)].collect().sorted.toSeq
    val recompute = aOld.unionByName(aDel)
      .join(bOld.unionByName(bDel), Seq("k"))
      .as[(Int, String, String)].collect().sorted.toSeq
    assert(maintained == recompute)
    // the delta-only key made it in
    assert(maintained.contains((5, "a5d", "b5d")))
  }
}
