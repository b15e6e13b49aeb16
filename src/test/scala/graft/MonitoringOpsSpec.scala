package graft

import org.apache.spark.sql.functions._

/** Independent plain-Scala references for the monitoring/diagnostic
  * queries added in round 6 (sweep-line interval aggregation, IQR
  * outlier screening, leave-one-out corpus drift): each registered
  * query is recomputed from collected sf0.001 rows with naive
  * driver-side logic — sorting whole groups, building full
  * distributions — and must agree exactly. The naive forms are
  * deliberately the shapes the distributed plans avoid (per-group
  * sort, full-outer vocabulary compare), so agreement pins the
  * algebraic rewrites, not just the plumbing.
  */
class MonitoringOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Day of a timestamp row value regardless of whether Spark surfaced
    * it as legacy java.sql.Timestamp or java8 LocalDateTime (the
    * session reads parquet timestamps as NTZ, but arithmetic like
    * `+ INTERVAL` can re-type the column). */
  private def day(v: Any): java.time.LocalDate = v match {
    case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
    case t: java.time.LocalDateTime => t.toLocalDate
    case d: java.sql.Date => d.toLocalDate
    case d: java.time.LocalDate => d
    case other => sys.error(s"unexpected day value: $other")
  }

  test("hourly_anomalies matches a naive trailing-24h z-test and flags real spikes") {
    val ev = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1)))
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hours = {
      val (lo, hi) = (ev.map(_._1).min, ev.map(_._1).max)
      (lo to hi by 3600000L).toSeq
    }
    val types = ev.map(_._2).distinct.sorted
    val expected = types.flatMap { t =>
      val series = hours.map(h => (h, counts.getOrElse((h, t), 0L)))
      series.zipWithIndex.map { case ((h, n), i) =>
        val base = series.slice(math.max(0, i - 24), i).map(_._2)
        val (w, s1) = (base.length.toLong, base.sum)
        val s2 = base.map(x => BigInt(x) * x).sum
        val spike = w == 24 &&
          BigInt(n * w - s1) * (n * w - s1) > 9 * (w * s2 - BigInt(s1) * s1) &&
          n * w > s1
        (h, t, n, w, s1, spike)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("hourly_anomalies")(spark, sf).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    got.toSeq shouldEqual expected
    // the rule is exercised on this slice, and no flag fires before a
    // full baseline exists
    assert(got.count(_._6) > 0)
    got.filter(_._4 < 24).foreach(_._6 shouldBe false)
  }

  test("erasure_audit matches a naive cascade count and finds a non-empty request set") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val subj = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
      .filter(k => java.lang.Long.parseLong(md5hex(s"graft-erase$k").take(4), 16) % 100 < 2)
      .toSet
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val oh = orders.filter(o => subj(o._2)).map(_._1).toSet
    val nLi = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .count(r => oh(r.getLong(0)))
    val got = SparkEntry.queries("erasure_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldEqual Map("customer" -> subj.size.toLong,
      "orders" -> oh.size.toLong, "lineitem" -> nLi.toLong)
    // a 2% draw over this slice is non-empty and cascades all the way
    assert(subj.nonEmpty && oh.nonEmpty && nLi > 0)
  }

  test("event_window_join matches a naive all-pairs scan within the window") {
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = evs.groupBy(_._2)
    val expected = evs.filter(_._3 == "purchase").map { case (id, u, _, us) =>
      val gaps = byUser(u).map(e => us - e._4)
        .filter(g => g > 0 && g <= 1800000000L)
      (id, u, gaps.length.toLong, if (gaps.nonEmpty) Some(gaps.min) else None)
    }.sortBy(_._1)
    val got = SparkEntry.queries("event_window_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    got.toSeq shouldEqual expected.toSeq
    // the window is actually populated on this slice, and bucketization
    // never invents a pair outside the exact range
    assert(expected.exists(_._3 > 0))
    got.flatMap(_._4).foreach { g => assert(g > 0 && g <= 1800000000L) }
  }

  test("build_postings matches a naive sorted-posting-list build") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(
          graft.operators.TextAnalysis.norm(col("text"))).as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val postings = docs.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      .filter { case (_, ps) => ps.length >= 2 && ps.length <= 100 }
    val expected = postings.toSeq.map { case (t, ps) =>
      val gaps = ps.sliding(2).map(p => p(1) - p(0)).toSeq
      val fp = gaps.foldLeft(0L)((h, g) => (h * 31 + g) % 1000000007L)
      (t, ps.length.toLong, ps.head, ps.last, gaps.max, fp)
    }.sortBy(_._1)
    val got = SparkEntry.queries("build_postings")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    got.toSeq shouldEqual expected
    // gap sums reconstruct the span exactly — delta coding is lossless
    got.foreach { case (_, _, mn, mx, maxGap, _) =>
      maxGap should be <= (mx - mn)
    }
  }

  test("open_orders_by_day matches a naive per-day interval count and conserves mass") {
    val out = SparkEntry.queries("open_orders_by_day")(spark, sf)
      .collect()
      .map(r => (day(r.get(0)), r.getLong(1), r.getLong(2), r.getLong(3)))

    // Naive reference: per order span [orderdate, max shipdate], count
    // spans covering each delta day directly.
    val closes = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("close"))
    val spans = Tables.orders(spark, sf)
      .join(closes, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderdate"), col("close"))
      .collect()
      .map { r =>
        val (o, c) = (day(r.get(0)), day(r.get(1)))
        // the query clamps close to at least the open day (synthesized
        // shipdates aren't constrained to follow the order date)
        (o, if (c.isBefore(o)) o else c)
      }

    out.foreach { case (day, nOpened, nClosed, nOpen) =>
      val expOpen = spans.count { case (o, c) => !o.isAfter(day) && !c.isBefore(day) }
      val expOpened = spans.count(_._1 == day)
      val expClosed = spans.count(_._2.plusDays(1) == day)
      (day, nOpen) shouldEqual (day, expOpen.toLong)
      (day, nOpened) shouldEqual (day, expOpened.toLong)
      (day, nClosed) shouldEqual (day, expClosed.toLong)
    }
    // Conservation: every opened order eventually closes, so the final
    // running count is zero and opens equal closes in total.
    out.last._4 shouldEqual 0L
    out.map(_._2).sum shouldEqual spans.length.toLong
    out.map(_._3).sum shouldEqual spans.length.toLong
  }

  test("price_outliers_iqr matches a naive sort-the-group reference with exact fences") {
    val out = SparkEntry.queries("price_outliers_iqr")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))

    val byPrio = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice", "o_orderkey")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)

    out.length shouldEqual byPrio.size
    out.foreach { case (prio, n, q1, q3, nLow, nHigh) =>
      val sorted = byPrio(prio).sortBy(t => (t._2, t._3))
      n shouldEqual sorted.length.toLong
      // percentile_disc ranks (1-based): ⌈n/4⌉ and ⌈3n/4⌉
      val expQ1 = sorted(((n + 3) / 4 - 1).toInt)._2
      val expQ3 = sorted(((3 * n + 3) / 4 - 1).toInt)._2
      (prio, q1) shouldEqual (prio, expQ1)
      (prio, q3) shouldEqual (prio, expQ3)
      // fences in exact BigDecimal — mirrors the query's DECIMAL path
      val (b1, b3) = (BigDecimal(expQ1), BigDecimal(expQ3))
      val lo = b1 - BigDecimal("1.5") * (b3 - b1)
      val hi = b3 + BigDecimal("1.5") * (b3 - b1)
      (prio, nLow) shouldEqual
        (prio, sorted.count(t => BigDecimal(t._2) < lo).toLong)
      (prio, nHigh) shouldEqual
        (prio, sorted.count(t => BigDecimal(t._2) > hi).toLong)
    }
  }

  test("corpus_drift_l1 matches a naive full-distribution reference") {
    val out = SparkEntry.queries("corpus_drift_l1")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tokCounts: Map[String, Map[String, Long]] = docs
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> rows.toSeq
          .flatMap(_._2.trim.replaceAll("\\s+", " ").split(" ").toSeq)
          .groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
      }
    val corpus: Map[String, Long] = tokCounts.values.flatten
      .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
    val nAll = corpus.values.sum

    out.length shouldEqual tokCounts.size
    out.foreach { case (src, nSrc, l1Num, l1) =>
      val mine = tokCounts(src)
      nSrc shouldEqual mine.values.sum
      val n2 = nAll - nSrc
      // naive: iterate the WHOLE vocabulary (the shape the distributed
      // plan's closed-form absent-token term avoids)
      val expNum = corpus.iterator.map { case (t, ct) =>
        val c = mine.getOrElse(t, 0L)
        math.abs(c * n2 - (ct - c) * nSrc)
      }.sum
      (src, l1Num) shouldEqual (src, expNum)
      l1 shouldEqual expNum.toDouble / (nSrc.toDouble * n2.toDouble)
    }
  }

  test("abc_analysis matches a naive sort-and-accumulate and classes are monotone") {
    val rows = Tables.orders(spark, "/root/testdata/sf0.001").join(
        Tables.customer(spark, "/root/testdata/sf0.001"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, "/root/testdata/sf0.001"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "o_totalprice").collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val byNation = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (n, c) => (-c, n) }
    val tt = byNation.map(_._2).sum
    var cum = 0L
    val expected = byNation.map { case (n, c) =>
      cum += c
      val cumPpm = BigInt(cum) * 1000000 / tt
      (n, c, (BigInt(c) * 1000000 / tt).toLong, cumPpm.toLong,
        if (cumPpm <= 800000) "A" else if (cumPpm <= 950000) "B" else "C")
    }
    val got = SparkEntry.queries("abc_analysis")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    got shouldEqual expected
    // classes appear in order and all three exist on 25 nations
    got.map(_._5).distinct shouldEqual Seq("A", "B", "C")
  }

  test("revenue_cusum matches a naive BigInt prefix fold and flags one peak day") {
    val rows = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderdate", "o_totalprice").collect()
      .map(r => (day(r.get(0)),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val daily = rows.groupBy(_._1).toSeq
      .map { case (d, vs) => (d, vs.length.toLong, vs.map(_._2).sum) }
      .sortBy(_._1.toEpochDay)
    val nn = BigInt(daily.map(_._2).sum); val ss = BigInt(daily.map(_._3).sum)
    var p = BigInt(0); var c = BigInt(0)
    val nums = daily.map { case (d, n, s) =>
      p += s; c += n; (d, n, s, nn * p - c * ss)
    }
    val peak = nums.map(_._4.abs).max
    val expected = nums.map { case (d, n, s, num) =>
      (d, n, s, (num / nn).toLong, num.abs == peak)
    }
    val got = SparkEntry.queries("revenue_cusum")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (day(r.get(0)), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    got shouldEqual expected
    // the statistic ends at ~0 (telescoping) and exactly the peak rows flag
    got.last._4 shouldEqual 0L
    assert(got.count(_._5) >= 1)
  }

  test("scan_prune_audit matches a naive overlap check; only the clustered dim prunes") {
    val rows = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderdate", "o_totalprice").collect()
      .map { r =>
        val dd = day(r.get(0))
        ((dd.getYear, dd.getMonthValue),
          dd.toEpochDay - java.time.LocalDate.parse("1992-01-01").toEpochDay,
          BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            .*(100).toLongExact)
      }
    val parts = rows.groupBy(_._1).values.map { vs =>
      (vs.length.toLong, vs.map(_._2).min, vs.map(_._2).max,
        vs.map(_._3).min, vs.map(_._3).max)
    }.toSeq
    val preds = Seq(("day_one_week", true, 1096L, 1102L),
      ("day_q1_1995", true, 1096L, 1185L),
      ("price_low", false, 0L, 2000000L),
      ("price_mid", false, 10000000L, 20000000L)).sortBy(_._1)
    val expected = preds.map { case (p, isDay, lo, hi) =>
      val pruned = parts.filterNot { case (_, ld, hd, lc, hc) =>
        if (isDay) hd >= lo && ld <= hi else hc >= lo && lc <= hi
      }
      val rp = pruned.map(_._1).sum; val tot = parts.map(_._1).sum
      (p, parts.length.toLong, pruned.length.toLong, rp, tot, rp * 1000000L / tot)
    }
    val got = SparkEntry.queries("scan_prune_audit")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    got shouldEqual expected
    // the layout story: a date range prunes almost everything because
    // month partitions have narrow date spans; price ranges prune
    // strictly less (at sf0.1: exactly 0 — each month spans the whole
    // price domain; this tiny slice leaves some narrow months)
    val byPred = got.map(g => g._1 -> g._6).toMap
    assert(byPred("day_one_week") > 900000L)
    assert(byPred("price_low") < byPred("day_q1_1995"))
    assert(byPred("price_mid") < byPred("day_q1_1995"))
  }

  test("ols_trend matches a naive BigInt normal-equations fit") {
    val epoch = java.time.LocalDate.parse("1992-01-01")
    val rows = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderpriority", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val x = BigInt(java.time.temporal.ChronoUnit.DAYS.between(epoch, day(r.get(1))))
        val y = BigInt(BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
        (r.getString(0), x, y)
      }
    val expected = rows.groupBy(_._1).toSeq.map { case (p, vs) =>
      val n = BigInt(vs.length)
      val sx = vs.map(_._2).sum; val sy = vs.map(_._3).sum
      val sxy = vs.map(v => v._2 * v._3).sum
      val sxx = vs.map(v => v._2 * v._2).sum
      val den = n * sxx - sx * sx
      val slope = ((n * sxy - sx * sy) * 1000000 / den).toLong // BigInt / truncates toward zero
      (p, vs.length.toLong, slope, (sy / n).toLong, slope.toDouble / 1e6)
    }.sortBy(_._1)
    val got = SparkEntry.queries("ols_trend")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    got shouldEqual expected
  }

  test("ks_drift matches a naive two-sample KS scan and both flag arms fire") {
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      s1 = srcs(i); s2 = srcs(j)
      v1 = bySrc(s1); v2 = bySrc(s2)
      n1 = v1.length.toLong; n2 = v2.length.toLong
    } yield {
      // naive: ECDF difference at every observed value of either sample
      val dNum = (v1 ++ v2).distinct.map { x =>
        math.abs(v1.count(_ <= x) * n2 - v2.count(_ <= x) * n1)
      }.max
      val reject = BigInt(dNum) * dNum * 1000000 >
        BigInt(1844164) * (n1 + n2) * n1 * n2
      (s1, s2, n1, n2, dNum, dNum * 1000000L / (n1 * n2), reject)
    }).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("ks_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    got shouldEqual expected
    // the 0.05 gate genuinely splits the pair set at this scale
    assert(got.exists(_._7) && got.exists(!_._7))
    // every statistic is a genuine nonzero deviation within [0, 1]
    got.foreach { case (_, _, _, _, d, ks, _) =>
      assert(d > 0 && ks >= 0 && ks <= 1000000L)
    }
  }

  test("ks_x1e6 decimal route is exact past the BIGINT wrap point") {
    // r10 advice: d_num * 1000000L wraps once n1·n2 > ~9.2e12 (Spark
    // non-ANSI wraps silently, DuckDB errors — an engine divergence).
    // Assert the DECIMAL(38,0) DIV route used by ks_drift matches
    // BigInt math on samples past that point, including d_num = n1·n2
    // (ks = exactly 1e6) and the max corpus bound n1·n2 ≈ 1e16.
    import spark.implicits._
    val cases = Seq(
      (99999999999999L, 10000000L, 10000000L), // 1e14, wraps as BIGINT
      (100000000000000L, 10000000L, 10000000L), // d = n1·n2 exactly
      (9999999999999999L, 100000000L, 100000000L), // 1e16 comment bound
      (4611686018427387L, 67108864L, 68719476L)) // near 2^62/1000
    val got = cases.toDF("d_num", "n1", "n2")
      .selectExpr("CAST(d_num AS DECIMAL(38,0)) * 1000000 DIV (CAST(n1 AS DECIMAL(38,0)) * n2) AS ks")
      .collect().map(_.getLong(0)).toSeq
    val expected = cases.map { case (d, n1, n2) =>
      (BigInt(d) * 1000000 / (BigInt(n1) * n2)).toLong }
    got shouldEqual expected
    // and the old BIGINT route really does fail on the first case —
    // ARITHMETIC_OVERFLOW under ANSI (this session), silent wrap
    // under non-ANSI; either way ≠ the exact value. The tripwire
    // keeps this test honest if constants change.
    val oldRoute = scala.util.Try(
      Seq(cases.head).toDF("d_num", "n1", "n2")
        .selectExpr("d_num * 1000000 DIV (n1 * n2) AS ks")
        .collect().head.getLong(0))
    assert(oldRoute.toOption != Some(expected.head))
  }

  test("heaps_law matches a naive prefix re-scan and the curve is monotone") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").toSeq))
    val lo = docs.map(_._1).min
    val hi = docs.map(_._1).max
    val span = hi - lo + 1
    // naive: re-scan the WHOLE prefix per decile (the shape the
    // distributed first-occurrence aggregate avoids); the boundary is
    // the CEILING — the last doc_id whose bucket is ≤ k — so the
    // re-scan agrees with the bucketing on ANY id span, not just
    // spans divisible by 10
    val expected = (1L to 10L).map { k =>
      val cutoff = lo - 1 + (span * k + 9) / 10
      val prefix = docs.filter(_._1 <= cutoff)
      val nTokens = prefix.map(_._2.size.toLong).sum
      val nVocab = prefix.flatMap(_._2).distinct.size.toLong
      (k, cutoff, prefix.length.toLong, nTokens, nVocab,
        if (nTokens == 0) None else Some(nVocab * 1000000L / nTokens))
    }
    val got = SparkEntry.queries("heaps_law")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSeq
    got shouldEqual expected
    // the curve is a genuine growth curve: docs/tokens/vocab all
    // nondecreasing, the final decile covers the whole corpus, and
    // vocabulary density falls as the corpus grows (Heaps' sublinearity
    // — on this bounded-vocabulary corpus the decline is strict from
    // the first to the last decile)
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 <= b._3 && a._4 <= b._4 && a._5 <= b._5)
    }
    assert(got.last._3 == docs.length.toLong)
    assert(got.last._5 == docs.flatMap(_._2).distinct.size.toLong)
    assert(got.head._6.get > got.last._6.get)
  }

  test("heaps_law bucket and cutoff formulas agree on every id span, not just multiples of 10") {
    // the regression class: cutoff_id must be the LAST id whose decile
    // bucket is <= k — a floor boundary excludes a counted doc whenever
    // k·span is not a multiple of 10. Pure algebra over dense ids.
    for (span <- 1L to 101L; lo <- Seq(0L, 7L)) {
      val ids = lo until (lo + span)
      for (k <- 1L to 10L) {
        val byBucket = ids.count(id => (id - lo) * 10 / span + 1 <= k)
        val cutoff = lo - 1 + (span * k + 9) / 10
        val byCutoff = ids.count(_ <= cutoff)
        assert(byBucket == byCutoff,
          s"span=$span lo=$lo k=$k: bucket=$byBucket cutoff=$byCutoff")
      }
    }
  }
}
