package graft.operators

import graft.SparkSpecBase

/** Smoke + plan-shape checks for the relational query surface. Value-level
  * correctness is enforced by the DuckDB oracle gate (scripts/check.py /
  * the driver's t2); here we assert each query runs, returns sane shapes,
  * and — for the scale-critical ones — that the physical plan has the
  * properties we designed for (filter pushdown, broadcast join).
  */
class RelationalQueriesSpec extends SparkSpecBase {

  test("percentile_disc follows the SQL-standard cume_dist>=q rule at a boundary") {
    import spark.implicits._
    // n=4, q=0.6: cume_dist is .25/.5/.75/1.0 — the smallest value with
    // cume_dist >= 0.6 is 30 (a floor((n-1)q)-indexed convention would
    // pick 20); this pins the convention the oracle gate relies on
    Seq(10L, 20L, 30L, 40L).toDF("x").createOrReplaceTempView("pctl_probe")
    val got = spark.sql(
      "SELECT CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY x) AS BIGINT) FROM pctl_probe")
      .head().getLong(0)
    assert(got == 30L, s"unexpected discrete-percentile convention: $got")
  }

  for ((name, fn) <- RelationalQueries.queries) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, sfDir)
      val n = df.count()
      // q06 can be legitimately small but must not error; others non-empty.
      assert(n >= 0)
      if (name != "q06_anti_join") assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracle map covers every query") {
    assert(RelationalQueries.oracleSql.keySet == RelationalQueries.queries.keySet)
  }

  test("q02 pushes filters into the parquet scan") {
    val plan = RelationalQueries.q02FilterSum(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
  }

  test("q80 pivot compiles to ONE aggregate pass per stage (PivotFirst), no per-value scans") {
    val plan = RelationalQueries.q80Pivot(spark, sfDir)
      .queryExecution.executedPlan.toString
    // pivotfirst buffers all values in one aggregate; three separate
    // scans of lineitem (one per value) would betray a per-value pass
    assert(plan.contains("pivotfirst") || plan.contains("PivotFirst"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("q82 LATERAL decorrelates to a join — never a per-row subquery or cartesian") {
    val plan = RelationalQueries.q82Lateral(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("q05 uses a broadcast hash join") {
    val plan = RelationalQueries.q05BroadcastPromo(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q68 NOT IN plans the null-aware anti join (isnull disjunct in the condition)") {
    val plan = RelationalQueries.q68NotInNulls(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    // the null-aware form: BroadcastHashJoin's trailing flag is
    // isNullAwareAntiJoin — the three-valued NOT IN machinery
    assert(plan.contains("LeftAnti, BuildRight, true"), plan)
  }

  test("q70 multi-distinct plans the Expand lanes") {
    val plan = RelationalQueries.q70MultiDistinct(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
  }

  test("q04 semi join plans as LeftSemi") {
    val plan = RelationalQueries.q04SemiJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q10 top-k avoids a global sort (TakeOrderedAndProject)") {
    val plan = RelationalQueries.q10TopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q27 evaluates both frames + row_number in ONE Window operator") {
    val plan = RelationalQueries.q27WindowFrames(spark, sfDir)
      .queryExecution.executedPlan.toString
    // Same partition/order spec → Spark fuses all three window functions
    // into a single WindowExec (one sort, one shuffle).
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1, plan)
  }

  test("q28 sessionization reuses one user_id shuffle end-to-end") {
    val plan = RelationalQueries.q28Sessionize(spark, sfDir)
      .queryExecution.executedPlan.toString
    // lag-window, running-sum window, and groupBy(user_id, sess_id) must
    // all ride the same hash(user_id) exchange: exactly one Exchange.
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q29 sketch stays within its asserted bound") {
    val rows = RelationalQueries.q29SketchBounds(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), rows.mkString("\n"))
  }

  test("q30 correlated subquery is decorrelated (no per-row subquery)") {
    val plan = RelationalQueries.q30CorrelatedSubquery(spark, sfDir)
      .queryExecution.executedPlan.toString
    // Catalyst rewrites the correlated aggregate into groupBy + join;
    // a surviving scalar-subquery node would mean per-row re-execution.
    assert(!plan.contains("ScalarSubquery"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q01 reads only the columns it needs") {
    val plan = RelationalQueries.q01PricingSummary(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("l_partkey"), "column pruning failed:\n" + plan)
  }

  test("q35 funnel histogram partitions the user base; depth only shrinks") {
    val rows = RelationalQueries.q35EventFunnel(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.values.sum == users, "every active user lands in exactly one level")
    assert(rows.keys.forall(l => l >= 0 && l <= 3))
    // completion counts (users at level >= k) must be non-increasing in k
    val atLeast = (0 to 3).map(k => rows.filter(_._1 >= k).values.sum)
    assert(atLeast.sliding(2).forall { case Seq(a, b) => a >= b case _ => true })
    assert(rows.getOrElse(2, 0L) + rows.getOrElse(3, 0L) > 0,
      "funnel window must let some users past step 1 on this data")
    // all step joins are user_id equi-joins — no product, no window
    val plan = RelationalQueries.q35EventFunnel(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"funnel went all-pairs:\n$plan")
    assert(!plan.contains("Window"), s"funnel needs no window:\n$plan")
  }

  test("q36 retention triangle: offset-0 row equals each cohort's size") {
    val rows = RelationalQueries.q36RetentionCohort(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n) => assert(off >= 0); assert(n > 0) }
    // every user is active on their own cohort day, so sum of offset-0
    // counts = total distinct users; and no offset row can exceed its
    // cohort's day-0 population
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    val day0 = rows.filter(_._2 == 0L).map(p => p._1 -> p._3).toMap
    assert(day0.values.sum == users)
    rows.foreach { case (cohort, _, n) =>
      assert(n <= day0(cohort), s"cohort $cohort retention exceeds its size")
    }
  }

  test("q37 session paths: valid trigrams, counts ranked, one user exchange") {
    val df = RelationalQueries.q37SessionPaths(spark, sfDir)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 10)
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { case (path, n) =>
      val steps = path.split(">")
      assert(steps.length == 3 && steps.forall(types), s"bad path $path")
      assert(n >= 1)
    }
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => a >= b case _ => true },
      "top-10 must be count-descending")
    // session flag, running session id, and both trigram leads must all
    // ride ONE user_id exchange (the q28 shuffle-reuse pattern); strip
    // AQE's echoed "Initial Plan" section so exchanges aren't double-counted
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1, plan)
  }

  test("q38 range frames: trailing window matches a brute-force recount") {
    import spark.implicits._
    val df = RelationalQueries.q38TimeRangeFrames(spark, sfDir)
    val rows = df.select("event_id", "user_id", "ts_us", "trail_n")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every frame includes at least the current row
    rows.foreach { case (_, _, _, n) => assert(n >= 1) }
    // brute-force recount for the busiest user: |{e' : same user,
    // ts-600s <= ts' <= ts}| must equal trail_n for every event
    val busiest = rows.groupBy(_._2).maxBy(_._2.length)._1
    val times = rows.filter(_._2 == busiest).map(_._3).sorted
    rows.filter(_._2 == busiest).foreach { case (_, _, t, n) =>
      val expect = times.count(t2 => t2 >= t - 600000000L && t2 <= t)
      assert(n == expect, s"user $busiest @ $t: trail_n $n != $expect")
    }
    // both aggregates share one window spec: a single user_id exchange
    // and a single Window node
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1, plan)
    assert("Window".r.findAllIn(plan).size <= 2, s"expected one Window node:\n$plan")
  }

  test("q39 interval join: bucketed equi-join matches brute-force pairing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val W = 24L * 3600 * 1000000
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000"))
      .as[(Long, String, Long)].collect()
    val views = ev.filter(_._2 == "view").groupBy(_._1)
    val purch = ev.filter(_._2 == "purchase").groupBy(_._1)
    val expected = views.keySet.intersect(purch.keySet).flatMap { u =>
      val lags = for {
        v <- views(u).map(_._3); p <- purch(u).map(_._3)
        if p >= v && p <= v + W
      } yield p - v
      if (lags.isEmpty) None
      else Some(u -> (lags.size.toLong, lags.min, lags.max))
    }.toMap
    val got = RelationalQueries.q39IntervalJoin(spark, sfDir)
      .select("user_id", "n_pairs", "min_lag_us", "max_lag_us")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, n, mn, mx) => u -> (n, mn, mx) }.toMap
    assert(got == expected, "interval pairing mismatch")
    assert(got.nonEmpty)
    // the time-bucket trick must keep the join an equi hash join — the
    // whole point is avoiding the inequality nested loop
    val plan = RelationalQueries.q39IntervalJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }

  test("q40 streaks: islands match a brute-force day-scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val days = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts_ns div 86400000000000"))
      .as[(Long, Long)].collect().toSet
    // brute-force per user: sort distinct days, split on gaps > 1
    val expected = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).toSeq.sorted
      val streaks = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, d) =>
        if (d == acc.head.head + 1) (d :: acc.head) :: acc.tail
        else List(d) :: acc
      }
      val gaps = sorted.sliding(2).collect { case Seq(a, b) => b - a - 1 }.toSeq
      u -> (sorted.size.toLong, streaks.size.toLong,
        streaks.map(_.size).max.toLong, if (gaps.isEmpty) 0L else gaps.max)
    }
    val got = RelationalQueries.q40Streaks(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (u, a, n, l, g) => u -> (a, n, l, g) }.toMap
    assert(got == expected, "streak mismatch")
    // row_number and lag share one window spec: a single user_id exchange
    val plan = RelationalQueries.q40Streaks(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size <= 2, plan)
    assert("Window".r.findAllIn(plan).size <= 2, s"expected one Window node:\n$plan")
  }

  test("q42 attribution: window pick matches a brute-force backward scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), expr("ts_ns div 1000"))
      .as[(Long, Long, String, Long)].collect()
    val byUser = ev.groupBy(_._2).map { case (u, g) =>
      u -> g.sortBy(e => (e._4, e._1))
    }
    val expected = byUser.values.flatten.filter(_._3 == "purchase").map { p =>
      val prior = byUser(p._2).takeWhile(e => (e._4, e._1) != ((p._4, p._1)))
        .filter(e => e._3 == "view" || e._3 == "click")
      p._1 -> prior.lastOption.map(_._4)
    }.toMap
    val got = RelationalQueries.q42Attribution(spark, sfDir)
      .select("event_id", "attr_t_us").as[(Long, Option[Long])].collect().toMap
    assert(got == expected, "attribution mismatch")
    assert(got.values.exists(_.isDefined) && got.nonEmpty)
  }

  test("q43 new users: cumulative curve is monotone and ends at |users|") {
    import spark.implicits._
    val rows = RelationalQueries.q43NewUsers(spark, sfDir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == rows.last._3, "cum must equal sum of news")
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 == a._3 + b._2 case _ => true })
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.last._3 == nUsers, "curve must end at total distinct users")
  }

  test("q44 market basket: top-20 matches brute-force lift ranking") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val nOrders = li.map(_._1).distinct.length.toLong
    val df = li.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val support = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (pr, g) => pr -> g.size.toLong }
      .filter(_._2 >= 2)
    val expected = support.toSeq.map { case ((a, b), sup) =>
      val lift = BigInt(sup) * nOrders * 1000000L / (BigInt(df(a)) * df(b))
      (a, b, sup, lift.toLong)
    }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(20)
    val got = RelationalQueries.q44MarketBasket(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"basket ranking drifted:\ngot $got\nexp $expected")
  }

  test("q45 pareto head: ranks, monotone shares, exact revenue recompute") {
    import spark.implicits._
    val rows = RelationalQueries.q45Pareto(spark, sfDir)
      .as[(Long, Int, Double, Double)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._2).sorted.toSeq == (1 to 20))
    val byRank = rows.sortBy(_._2)
    assert(byRank.sliding(2).forall { case Array(a, b) =>
      a._3 >= b._3 && b._4 > a._4 case _ => true },
      "revenue must be non-increasing and cumulative share strictly rising")
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    val o = graft.Tables.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice").as[(Long, Double)].collect()
    val rev = o.groupBy(_._1).map { case (c, g) =>
      c -> g.map(x => BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum }
    val expectedHead = rev.toSeq.sortBy { case (c, r) => (-r, c) }.take(20)
    assert(byRank.map(_._1).toSeq == expectedHead.map(_._1),
      "head membership/order must match the exact decimal recompute")
    byRank.zip(expectedHead).foreach { case (g, (_, r)) =>
      assert(math.abs(g._3 - r.toDouble) < 1e-6, s"revenue drift: ${g._3} vs $r")
    }
  }

  test("q46 rolling dau: cover-set transform equals a brute-force window") {
    import spark.implicits._
    val ud = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts_ns div 86400000000000 AS day")
      .as[(Long, Long)].collect().distinct
    val byDay = ud.groupBy(_._2)
    val days = byDay.keys.toSeq.sorted
    val expected = days.map { d =>
      val dau = byDay(d).length.toLong
      val dau7 = ud.filter { case (_, ad) => ad >= d - 6 && ad <= d }
        .map(_._1).distinct.length.toLong
      (d, dau, dau7)
    }.toSet
    val got = RelationalQueries.q46RollingDau(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected, "rolling DAU drifted from the brute-force window")
    assert(got.forall { case (_, dau, dau7) => dau7 >= dau })
  }

  test("q47 grouped top-k: matches brute force and never plans Sort+Window") {
    import spark.implicits._
    val got = RelationalQueries.q47TopPerGroup(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    val regions = got.map(_._1).distinct
    assert(regions.length == 5 && got.length == 15)
    got.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == Seq(1L, 2L, 3L))
      assert(byRank.sliding(2).forall { case Array(a, b) =>
        a._4 > b._4 || (a._4 == b._4 && a._3 < b._3) case _ => true },
        "rank order must follow (rev desc, partkey asc)")
    }
    // scale path: bounded aggregator, not a per-region window sort
    val plan = RelationalQueries.q47TopPerGroup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"grouped top-k must not plan a Window:\n$plan")
  }

  test("q48 conversion latency: summary matches a brute-force funnel") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "ts_ns div 1000 AS ts_us")
      .as[(Long, String, Long)].collect()
    val perUser = ev.groupBy(_._1).map { case (_, g) =>
      val fv = g.filter(_._2 == "view").map(_._3).minOption
      val fp = g.filter(_._2 == "purchase").map(_._3).minOption
      (fv, fp)
    }.toSeq
    val lags = perUser.collect {
      case (Some(v), Some(p)) if p > v => p - v
    }
    val (row :: Nil) = RelationalQueries.q48ConversionLatency(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toList: @unchecked
    assert(row._1 == perUser.count(_._1.isDefined))
    assert(row._2 == lags.length)
    assert(row._3 == lags.min && row._4 == lags.max)
    assert(row._5 == lags.sum / lags.length)
  }

  test("q49 MoM growth: rates match a BigInt cents recompute") {
    import spark.implicits._
    val o = graft.Tables.orders(spark, sfDir)
      .selectExpr("year(o_orderdate) * 12 + month(o_orderdate) AS mkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .as[(Long, Long)].collect()
    val monthly = o.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val expected = monthly.zipWithIndex.map { case ((mk, cents), i) =>
      val growth = if (i == 0) None
        else Some((BigInt(cents) * 1000000L / monthly(i - 1)._2 - 1000000L).toLong)
      (mk, cents / 100.0, growth)
    }.toSet
    val got = RelationalQueries.q49MomGrowth(spark, sfDir)
      .as[(Long, Double, Option[Long])].collect().toSet
    assert(got == expected, "growth curve drifted from cents recompute")
  }

  test("q50 session histogram: buckets reconcile with q28's sessions") {
    import spark.implicits._
    val sessions = RelationalQueries.q28Sessionize(spark, sfDir)
      .selectExpr("n_events", "end_us - start_us AS dur_us")
      .as[(Long, Long)].collect()
    val expected = sessions.groupBy(s => math.min(s._1, 10L)).map { case (b, g) =>
      (b, g.length.toLong, g.map(_._2).sum / g.length, g.map(_._2).max)
    }.toSet
    val got = RelationalQueries.q50SessionHistogram(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected, "histogram drifted from per-session recompute")
    assert(got.map(_._2).sum == sessions.length.toLong)
  }

  test("q51 weekday profile: integer dow/hour math matches java.time") {
    import spark.implicits._
    val rows = RelationalQueries.q51WeekdayProfile(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.forall(r => r._1 >= 0 && r._1 < 7 && r._2 >= 0 && r._2 < 24))
    assert(rows.map(_._3).sum == graft.Tables.events(spark, sfDir).count())
    // spot-check the integer dow against java.time on real timestamps
    val sample = graft.Tables.events(spark, sfDir)
      .selectExpr("ts_ns div 1000 AS ts_us").as[Long].take(50)
    sample.foreach { us =>
      val ld = java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC)
      val dow = ((us / 86400000000L) + 4) % 7 // epoch day 0 = Thu → Sun=0..Sat=6
      val expected = ld.getDayOfWeek.getValue % 7 // java.time Mon=1..Sun=7 → Sun=0
      assert(dow == expected, s"dow drift at $us: $dow vs $expected (${ld.getDayOfWeek})")
    }
  }

  test("q52 order-size distribution: buckets partition all orders") {
    import spark.implicits._
    val rows = RelationalQueries.q52OrderSizeDist(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    assert(rows.map(_._2).sum == li.map(_._1).distinct.length.toLong,
      "bucket order counts must partition the order set")
    assert(rows.map(r => r._1 * r._2).sum == li.length.toLong,
      "n_lines x n_orders must reconstruct the lineitem row count")
    rows.foreach { case (nLines, _, totalParts, _) =>
      assert(totalParts > 0 && nLines > 0)
    }
  }

  test("q41 gap fill: dense grid covers every hour in each user's span") {
    import spark.implicits._
    val rows = RelationalQueries.q41GapFill(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val hrs = rs.map(_._2).sorted
      // contiguous: exactly every hour between min and max, once
      assert(hrs.length == (hrs.last - hrs.head + 1).toInt, s"user $u grid has holes")
      assert(hrs.distinct.length == hrs.length, s"user $u grid has dupes")
      // endpoints are real activity, zero-filled rows carry (0, 0.0)
      assert(rs.find(_._2 == hrs.head).get._3 > 0)
      assert(rs.find(_._2 == hrs.last).get._3 > 0)
      rs.filter(_._3 == 0).foreach { r => assert(r._4 == 0.0) }
    }
    // silent hours exist at this sf (otherwise the query degenerates)
    assert(rows.exists(_._3 == 0L), "expected at least one gap-filled row")
  }

  test("q53 rfm: segments partition the customer base; scores in range") {
    import spark.implicits._
    val rows = RelationalQueries.q53Rfm(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val nCust = graft.Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust,
      "segment customer counts must partition the customer base")
    rows.foreach { case (r, f, m, n, orders, monetary) =>
      assert(r >= 1 && r <= 3 && f >= 1 && f <= 3 && m >= 1 && m <= 3)
      assert(n > 0 && orders >= n && monetary > 0)
    }
  }

  test("q54 anomaly days: integer 2-sigma test matches a BigInt recompute") {
    import spark.implicits._
    val rows = RelationalQueries.q54AnomalyDays(spark, sfDir)
      .as[(Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val n = BigInt(rows.length)
    val sum = rows.map(r => BigInt(r._2)).sum
    val q = rows.map(r => BigInt(r._2) * r._2).sum
    rows.foreach { case (_, x, flagged) =>
      val dev = n * x - sum
      assert(flagged == (dev * dev > 4 * (n * q - sum * sum)))
    }
  }

  test("q57 latest snapshot: users partition; no window sort in the plan") {
    import spark.implicits._
    val df = RelationalQueries.q57LatestEvent(spark, sfDir)
    // struct-max aggregation, not a row_number window: the plan must
    // carry no Window operator (the one-pass shape is the point)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val rows = df.as[(String, Long, Double, Long)].collect()
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers,
      "every user must contribute exactly one current state")
    // the brute-force argmax agrees on each user's winner
    val brute = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "ts_ns div 1000 as ts_us", "event_id")
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(r => (r._3, r._4))._2)
      .groupBy(_._2).map { case (et, g) => et -> g.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == brute.toMap)
  }

  test("q56 exact corr matches a BigInt moment recompute; |r| <= 1") {
    import spark.implicits._
    val got = RelationalQueries.q56CorrExact(spark, sfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val raw = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[(String, Double, Double)].collect()
    raw.groupBy(_._1).foreach { case (flag, g) =>
      val xs = g.map(r => math.floor(r._2 * 100).toLong)
      val ys = g.map(r => math.floor(r._3 * 100).toLong)
      val n = BigInt(g.length)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxx = xs.map(v => BigInt(v) * v).sum
      val syy = ys.map(v => BigInt(v) * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val r = (n * sxy - sx * sy).doubleValue /
        math.sqrt((n * sxx - sx * sx).doubleValue * (n * syy - sy * sy).doubleValue)
      val (gn, gr) = got(flag)
      assert(gn == g.length && gr == r, s"corr drifted for $flag: $gr vs $r")
      assert(math.abs(gr) <= 1.0)
    }
  }

  test("q55 trade matrix: supplier map broadcasts; totals reconcile") {
    import spark.implicits._
    val df = RelationalQueries.q55TradeMatrix(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val rows = df.as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val expected = graft.Tables.lineitem(spark, sfDir)
      .filter("l_shipdate >= '1996-01-01' and l_shipdate < '1998-01-01'")
      .count()
    assert(rows.map(_._3).sum == expected,
      "per-cell line counts must partition the filtered lineitem rows")
  }

  /** The AQE plan string appends "== Initial Plan ==" after the final plan;
    * scan-count assertions must look only at what actually executed. */
  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan and reuse fires
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q58 grand-total never re-scans the fact table (one lineitem scan)") {
    val plan = finalPlanOf(RelationalQueries.q58RevenueShare(spark, sfDir))
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"second lineitem scan crept in:\n$plan")
  }

  test("q59 dormant-rich is NON-empty and pushes the recency cutoff to the orders scan") {
    val df = RelationalQueries.q59DormantRich(spark, sfDir)
    assert(df.count() > 0, "q59 must yield rows at every SF — vacuous gate otherwise")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("o_orderdate"), s"recency predicate missing from plan:\n$plan")
    assert(plan.contains("PushedFilters"), plan)
  }

  test("q61 reconciliation plans a FULL OUTER join with both date filters pushed") {
    val df = RelationalQueries.q61SnapshotDiff(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"full outer join missing:\n$plan")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findAllIn(plan).size == 2,
      s"both snapshot scans must push their date range:\n$plan")
    import spark.implicits._
    val rows = df.as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum > 0, "categories must cover active customers")
    assert(rows.map(_._1).toSet.subsetOf(Set("added", "removed", "changed", "unchanged")))
  }

  test("q60 max-of-aggregate reuses the revenue exchange (one lineitem scan)") {
    val plan = finalPlanOf(RelationalQueries.q60TopSupplier(spark, sfDir))
    assert(plan.contains("ReusedExchange"), s"exchange reuse did not fire:\n$plan")
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"second lineitem scan crept in:\n$plan")
  }

  test("q63 peak concurrency matches a brute-force day expansion") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.q63PeakConcurrency(spark, sfDir)
      .as[(String, Long, Long)].collect()
      .map { case (p, peak, day) => p -> (peak, day) }.toMap
    assert(got.nonEmpty)
    val epoch = java.time.LocalDate.parse("1992-01-01")
    val lastShip = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("e"))
      .select(col("l_orderkey"), col("e").cast("date"))
      .as[(Long, java.sql.Date)].collect().toMap
    val ivs = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate").cast("date"))
      .as[(Long, String, java.sql.Date)].collect()
      .flatMap { case (k, p, od) =>
        // lineitem-less orders have no interval — the query's inner join drops them
        lastShip.get(k).map { e =>
          val d0 = od.toLocalDate.toEpochDay - epoch.toEpochDay
          // clamp like the query: an order is open at least its order day
          (p, d0, math.max(d0, e.toLocalDate.toEpochDay - epoch.toEpochDay))
        }
      }
    ivs.groupBy(_._1).foreach { case (prio, g) =>
      val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      g.foreach { case (_, d0, d1) =>
        var day = d0
        while (day <= d1) { counts(day) += 1; day += 1 }
      }
      val peak = counts.values.max
      val firstDay = counts.filter(_._2 == peak).keys.min
      assert(got(prio) == (peak, firstDay),
        s"$prio: sweep-line ${got(prio)} != brute-force ($peak, $firstDay)")
    }
  }

  test("q62 gap-fill densifies the calendar and carries revenue forward") {
    import spark.implicits._
    val rows = RelationalQueries.q62GapFill(spark, sfDir)
      .as[(Long, Long, Long, Option[Long], Long)].collect()
    val nations = rows.map(_._1).distinct.length
    val months = rows.map(_._2).max + 1
    assert(rows.length == nations * months,
      s"dense axis must be |nations|x|months|: ${rows.length} != $nations*$months")
    assert(rows.exists(_._5 == 1L), "testdata must contain gap months")
    // per nation: gaps have 0 orders; filled value equals the last
    // non-gap revenue at or before the month (NULL before the first)
    rows.groupBy(_._1).foreach { case (nk, g) =>
      val byMi = g.sortBy(_._2)
      var lastSeen: Option[Long] = None
      byMi.foreach { case (_, mi, n, filled, isGap) =>
        if (isGap == 1L) assert(n == 0L, s"nation $nk month $mi: gap with orders")
        else { assert(n > 0L); lastSeen = filled }
        assert(filled == lastSeen, s"nation $nk month $mi: carry-forward broke")
      }
    }
  }

  test("q71: native session_window reproduces the manual gaps-and-islands sessions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val native = RelationalQueries.q71SessionWindow(spark, sfDir)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect()
    val manual = RelationalQueries.q28Sessionize(spark, sfDir)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect()
    // on data without exact-gap boundary pairs the two conventions agree:
    // same sessions, native end = manual last-event + gap
    assert(native.length == manual.length,
      s"session counts differ: ${native.length} vs ${manual.length}")
    val nset = native.map(r => (r._1, r._2, r._4)).toSet
    val mset = manual.map(r => (r._1, r._2, r._4)).toSet
    assert(nset == mset, "session (user, start, size) sets must agree")
    val gapUs = 30L * 60 * 1000000
    val mEnd = manual.map(r => (r._1, r._2) -> r._3).toMap
    native.foreach { case (u, st, end, _) =>
      assert(end == mEnd((u, st)) + gapUs, s"end arithmetic at ($u, $st)")
    }
  }

  test("q73: the correlated LATERAL decorrelates — one orders scan, no product") {
    val df = RelationalQueries.q73LateralTopk(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"lateral went all-pairs:\n$plan")
    // decorrelation plans ONE pass over orders (grouped top-k + join),
    // never a per-customer re-execution
    assert("Scan parquet".r.findAllIn(plan).size <= 2, s"extra scans:\n$plan")
    // inner-join + LIMIT semantics, exactly: each customer contributes
    // min(2, its order count) rows
    val byCust = df.collect().groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val orderCounts = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).foreach { c =>
        assert(byCust.getOrElse(c, 0L) == math.min(2L, orderCounts.getOrElse(c, 0L)),
          s"customer $c row count")
      }
  }

  test("q72: variant extraction equals the string re-parse path") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaVariant = RelationalQueries.q72VariantJson(spark, sfDir)
      .select("event_type", "n_k", "sum_k", "max_k")
      .as[(String, Long, Long, Long)].collect().toSet
    val viaString = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(viaVariant == viaString, "variant_get must agree with get_json_object")
    assert(viaVariant.nonEmpty && viaVariant.forall(_._2 > 0))
  }

  test("q65: per-order tally form equals the literal semi+anti-join form") {
    // The optimization round replaced the EXISTS/NOT-EXISTS self-joins
    // with one okey-keyed tally (n_supp, n_late); this re-derives the
    // answer through the literal join formulation and requires identity.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    import spark.implicits._
    val got = RelationalQueries.q65SoleLateSupplier(spark, sfDir)
      .as[(Long, String, Long)].collect().toSet
    val perOS = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(graft.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAY")).cast("int")).as("late"))
      .cache()
    val l1 = perOS.filter(col("late") === 1)
      .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
    val others = perOS
      .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"), col("late"))
    val ref = l1
      .join(others, col("okey") === col("o2") && col("skey") =!= col("s2"),
        "left_semi")
      .join(others.filter(col("late") === 1).drop("late"),
        col("okey") === col("o2") && col("skey") =!= col("s2"), "left_anti")
      .groupBy(col("skey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(graft.Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_name"))),
        col("skey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait").cast(LongType))
      .as[(Long, String, Long)].collect().toSet
    perOS.unpersist()
    assert(got == ref, s"tally form diverged: got ${got.size} rows, ref ${ref.size}")
    assert(got.nonEmpty)
  }
}
