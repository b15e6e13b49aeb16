package graft

import org.apache.spark.sql.functions._

/** Independent plain-Scala references for the lakehouse-governance
  * queries (SCD2 dimension build, equi-depth histogram statistics,
  * referential-integrity audit, targeted-domain selection): each
  * registered query is recomputed from collected sf0.001 rows with
  * naive driver-side logic — per-key sorted fold, full global sort,
  * in-memory key sets, whole-corpus token maps — and must agree
  * exactly. The naive forms are deliberately the shapes the
  * distributed plans avoid, so agreement pins the algebraic rewrites,
  * not just the plumbing. */
class GovernanceOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dateOf(v: Any): java.time.LocalDate = v match {
    case d: java.sql.Date => d.toLocalDate
    case d: java.time.LocalDate => d
    case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
    case t: java.time.LocalDateTime => t.toLocalDate
    case other => sys.error(s"unexpected date value: $other")
  }

  test("scd2_dim matches a naive per-customer sorted change fold") {
    val rows = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), dateOf(r.get(2)), r.getLong(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (cust, hist) =>
      val ordered = hist.sortBy(h => (h._3.toEpochDay, h._4))
      val changes = ordered.zipWithIndex.filter { case ((_, prio, _, _), i) =>
        i == 0 || ordered(i - 1)._2 != prio
      }.map(_._1)
      changes.zipWithIndex.map { case ((_, prio, from, _), i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._3) else None
        (cust, prio, (i + 1).toLong, from, to, to.isEmpty)
      }
    }.sortBy(r => (r._1, r._3))
    val got = SparkEntry.queries("scd2_dim")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), dateOf(r.get(3)),
        Option(r.get(4)).map(dateOf), r.getBoolean(5))).toSeq
    got shouldEqual expected
    // the fixture actually exercises multi-version histories and
    // same-day flips stay deterministic under the orderkey tiebreak
    assert(got.count(!_._6) > 0)
    got.groupBy(_._1).foreach { case (_, vs) => vs.count(_._6) shouldBe 1 }
  }

  test("equidepth_hist matches a naive full-sort binning") {
    val cents = Tables.orders(spark, sf)
      .select((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("p_c"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity)
    val n = cents.length.toLong
    val cutoffs = ((1 until 8).map(i => i * (n / 8) + math.min(i.toLong, n % 8)) :+ n)
      .distinct.filter(_ > 0).sorted
    val expected = cutoffs.zipWithIndex.map { case (hi, i) =>
      val lo = if (i == 0) 0L else cutoffs(i - 1)
      ((i + 1).toLong, hi, hi - lo, cents((hi - 1).toInt)._1)
    }
    val got = SparkEntry.queries("equidepth_hist")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldEqual expected
    // equal-depth really holds: bins differ by at most one row
    val sizes = got.map(_._3)
    assert(sizes.max - sizes.min <= 1)
  }

  test("fk_orphans matches naive in-memory key-set membership counts") {
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.select(c).collect().map(_.get(0).asInstanceOf[Number].longValue)
    val nat  = keys(Tables.nation(spark, sf), "n_nationkey").toSet
    val cust = keys(Tables.customer(spark, sf), "c_custkey").toSet
    val ordK = keys(Tables.orders(spark, sf), "o_orderkey").toSet
    val prt  = keys(Tables.part(spark, sf), "p_partkey").toSet
    val supp = keys(Tables.supplier(spark, sf), "s_suppkey").toSet
    def edge(name: String, child: Array[Long], parent: Set[Long]) =
      (name, child.length.toLong, child.count(k => !parent(k)).toLong)
    val li = Tables.lineitem(spark, sf)
    val expected = Seq(
      edge("customer->nation", keys(Tables.customer(spark, sf), "c_nationkey"), nat),
      edge("lineitem->orders", keys(li, "l_orderkey"), ordK),
      edge("lineitem->part", keys(li, "l_partkey"), prt),
      edge("lineitem->supplier", keys(li, "l_suppkey"), supp),
      edge("orders->customer", keys(Tables.orders(spark, sf), "o_custkey"), cust),
      edge("supplier->nation", keys(Tables.supplier(spark, sf), "s_nationkey"), nat))
    val got = SparkEntry.queries("fk_orphans")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldEqual expected
    // TPC-H-shaped data is referentially intact — the audit must report
    // zero orphans here (the spec would catch a join writing false ones)
    got.foreach(_._3 shouldBe 0L)
  }

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(salt: String, k: Long): Long =
    java.lang.Long.parseLong(md5hex(salt + k).take(4), 16) % 100

  test("snapshot_diff matches a naive two-map presence/value compare") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val old = rows.filter(r => bucket("graft-snap-ins", r._1) >= 2)
      .map(r => r._1 -> (r._2,
        if (bucket("graft-snap-upd", r._1) < 3) r._3 - 100 else r._3)).toMap
    val neu = rows.filter(r => bucket("graft-snap-del", r._1) >= 2)
      .map(r => r._1 -> (r._2, r._3)).toMap
    val classes = (old.keySet ++ neu.keySet).toSeq.map { k =>
      (old.get(k), neu.get(k)) match {
        case (None, Some((_, c)))  => ("insert", c)
        case (Some((_, c)), None)  => ("delete", -c)
        case (Some(o), Some(n))    =>
          (if (o != n) "update" else "unchanged", n._2 - o._2)
        case (None, None)          => sys.error("unreachable")
      }
    }
    val expected = classes.groupBy(_._1).toSeq
      .map { case (c, vs) => (c, vs.length.toLong, vs.map(_._2).sum) }
      .sortBy(_._1)
    val got = SparkEntry.queries("snapshot_diff")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldEqual expected
    // every CDC class occurs on the seeded draw rates
    got.map(_._1).toSet shouldEqual Set("insert", "delete", "update", "unchanged")
  }

  test("k_anonymity matches naive class counts with one generalization step") {
    val rows = Tables.customer(spark, sf).select("c_nationkey", "c_mktsegment")
      .collect().map(r => (r.get(0).asInstanceOf[Number].longValue, r.getString(1)))
    val cls = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ok = cls.collect { case ((nk, seg), n) if n >= 5 => (nk, seg, n, 0L, true) }
    val gen = cls.toSeq.collect { case ((nk, _), n) if n < 5 => nk -> n }
      .groupBy(_._1).map { case (nk, vs) =>
        val n = vs.map(_._2).sum
        (nk, "*", n, 1L, n >= 5)
      }
    val expected = (ok ++ gen).toSeq.sortBy(r => (r._4, r._1, r._2))
    val got = SparkEntry.queries("k_anonymity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    got shouldEqual expected
    // the generalization rung is exercised on this slice
    assert(got.exists(_._4 == 1L))
  }

  test("partition_fingerprint matches naive XOR/sum digests and is row-order independent") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate").collect()
      .map { r =>
        val cents = BigDecimal(r.getDouble(3))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
        val rh = java.lang.Long.parseLong(
          md5hex(s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}|$cents|${r.getString(4)}")
            .take(14), 16)
        val m = r.get(5) match {
          case t: java.sql.Timestamp => val d = t.toLocalDateTime; (d.getYear, d.getMonthValue)
          case t: java.time.LocalDateTime => (t.getYear, t.getMonthValue)
          case other => sys.error(s"unexpected: $other")
        }
        (m, rh)
      }
    // fold in REVERSED order: the digest must not care
    val expected = rows.groupBy(_._1).toSeq.map { case (m, vs) =>
      val hs = vs.map(_._2).reverse
      val modSum = (hs.map(BigInt(_)).sum mod BigInt(1L << 56)).toLong
      (m, hs.length.toLong, hs.reduce(_ ^ _), modSum)
    }.sortBy(_._1)
    val got = SparkEntry.queries("partition_fingerprint")(spark, sf).collect()
      .map { r =>
        val m = r.get(0) match {
          case t: java.sql.Timestamp => val d = t.toLocalDateTime; (d.getYear, d.getMonthValue)
          case t: java.time.LocalDateTime => (t.getYear, t.getMonthValue)
          case other => sys.error(s"unexpected: $other")
        }
        (m, r.getLong(1), r.getLong(2), r.getLong(3))
      }.toSeq
    got shouldEqual expected
  }

  test("incremental_agg merge equals a naive direct recompute") {
    val rows = Tables.orders(spark, sf).select("o_orderdate", "o_totalprice")
      .collect().map { r =>
        val m = r.get(0) match {
          case t: java.sql.Timestamp => val d = t.toLocalDateTime; (d.getYear, d.getMonthValue)
          case t: java.time.LocalDateTime => (t.getYear, t.getMonthValue)
          case other => sys.error(s"unexpected: $other")
        }
        (m, BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
      }
    val expected = rows.groupBy(_._1).toSeq
      .map { case (m, vs) => (m, vs.length.toLong, vs.map(_._2).sum) }
      .sortBy(_._1)
    val got = SparkEntry.queries("incremental_agg")(spark, sf).collect()
      .map { r =>
        val m = r.get(0) match {
          case t: java.sql.Timestamp => val d = t.toLocalDateTime; (d.getYear, d.getMonthValue)
          case t: java.time.LocalDateTime => (t.getYear, t.getMonthValue)
          case other => sys.error(s"unexpected: $other")
        }
        (m, r.getLong(1), r.getLong(2))
      }.toSeq
    got shouldEqual expected
  }

  test("compaction_plan matches a naive sequential file packing") {
    val files = Tables.orders(spark, sf).select("o_orderdate").collect()
      .map(r => dateOf(r.get(0)))
      .groupBy(identity).map { case (d, vs) => (d, vs.length.toLong) }.toSeq
    val expected = files.groupBy(d => (d._1.getYear, d._1.getMonthValue)).toSeq
      .flatMap { case (m, fs) =>
        val ordered = fs.sortBy(_._1.toEpochDay)
        val cums = ordered.scanLeft(0L)(_ + _._2)
        ordered.zip(cums).map { case ((day, n), before) =>
          (m, before / 128, day, n)
        }.groupBy(t => (t._1, t._2)).toSeq.map { case ((mm, bin), vs) =>
          (mm, bin, vs.length.toLong, vs.map(_._4).sum,
            vs.map(_._3.toEpochDay).min, vs.map(_._3.toEpochDay).max)
        }
      }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("compaction_plan")(spark, sf).collect()
      .map { r =>
        val m = r.get(0) match {
          case t: java.sql.Timestamp => val d = t.toLocalDateTime; (d.getYear, d.getMonthValue)
          case t: java.time.LocalDateTime => (t.getYear, t.getMonthValue)
          case other => sys.error(s"unexpected: $other")
        }
        (m, r.getLong(1), r.getLong(2), r.getLong(3),
          dateOf(r.get(4)).toEpochDay, dateOf(r.get(5)).toEpochDay)
      }.toSeq
    got shouldEqual expected
    // every non-final bin in a month is at least half the 128-row
    // target — the guarantee sequential packing is chosen for
    got.groupBy(r => r._1).foreach { case (_, bins) =>
      bins.sortBy(_._2).dropRight(1).foreach(b => assert(b._4 >= 64))
    }
  }

  test("join_size_estimate matches naive stats + per-key count products") {
    def keys(t: String, k: String) = Tables.table(spark, sf, t)
      .select(k).collect().map(_.getLong(0)).toSeq
    val edges = Seq(
      ("lineitem-orders", keys("lineitem", "l_orderkey"), keys("orders", "o_orderkey")),
      ("lineitem-part", keys("lineitem", "l_partkey"), keys("part", "p_partkey")),
      ("orders-customer", keys("orders", "o_custkey"), keys("customer", "c_custkey")))
    val expected = edges.map { case (nm, l, r) =>
      val (nl, nr) = (l.length.toLong, r.length.toLong)
      val ndv = math.max(l.distinct.length, r.distinct.length).toLong
      val est = nl * nr / ndv
      val rc = r.groupBy(identity).map { case (k, vs) => (k, vs.length.toLong) }
      val actual = l.groupBy(identity).toSeq
        .map { case (k, vs) => vs.length.toLong * rc.getOrElse(k, 0L) }.sum
      (nm, nl, nr, ndv, est, actual, math.abs(est - actual) * 1000000L / actual)
    }
    val got = SparkEntry.queries("join_size_estimate")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldEqual expected
    // the PK-FK edges estimate well (ndv ≈ parent keys); the point of
    // the error column is that it is measurably nonzero where orphaned
    // keys or skew break the uniformity assumption
    assert(got.forall(_._6 > 0))
  }

  test("domain_select matches a naive whole-corpus token-frequency scoring") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Array[String] = t.replaceAll("\\s+", " ").trim.split(" ", -1)
    val byTok = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { case (_, lang, text) =>
      toks(text).foreach { tk =>
        val (t0, s0) = byTok.getOrElse(tk, (0L, 0L))
        byTok(tk) = if (lang == "en") (t0 + 1, s0) else (t0, s0 + 1)
      }
    }
    val totT = byTok.valuesIterator.map(_._1).sum
    val totS = byTok.valuesIterator.map(_._2).sum
    def sign(tk: String): Int = {
      val (t, s) = byTok(tk)
      (BigInt(t) * totS).compare(BigInt(s) * totT)
    }
    val expected = docs.sortBy(_._1).map { case (id, lang, text) =>
      val tk = toks(text)
      val over = tk.count(sign(_) > 0).toLong
      val under = tk.count(sign(_) < 0).toLong
      val score = (BigInt(over) * 1000000 / tk.length).toLong
      (id, lang, tk.length.toLong, over, under, score, over > under)
    }.toSeq
    val got = SparkEntry.queries("domain_select")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    got shouldEqual expected
    // the sign weighting is non-degenerate on this corpus: both token
    // directions exist and both selection outcomes occur
    assert(got.exists(_._7) && got.exists(!_._7))
    assert(got.exists(_._4 > 0) && got.exists(_._5 > 0))
  }

  test("dedup_method_matrix matches set algebra over its siblings' outputs") {
    // removal sets recomputed from the REGISTERED sibling queries'
    // collected outputs (each of which has its own naive spec), so
    // this pins the matrix assembly independent of the join plumbing
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ex = docs.groupBy(_._2).values.flatMap { g =>
      val ids = g.map(_._1); ids.filter(_ != ids.min)
    }.toSet
    val jr = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
      .collect { case r if r.getLong(0) != r.getLong(1) => r.getLong(0) }.toSet
    val sr = SparkEntry.queries("simhash_neardup")(spark, sf).collect()
      .map(_.getLong(1)).toSet
    val cr = SparkEntry.queries("containment_dup")(spark, sf).collect()
      .map(r => r.getAs[Number]("d2").longValue).toSet
    val sets = Map("exact" -> ex, "jaccard" -> jr, "simhash" -> sr,
      "containment" -> cr)
    val ms = Seq("containment", "exact", "jaccard", "simhash")
    val expected = for (a <- ms; b <- ms if a <= b)
      yield (a, b, (sets(a) intersect sets(b)).size.toLong)
    val got = SparkEntry.queries("dedup_method_matrix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    got shouldEqual expected.sortBy(e => (e._1, e._2))
    // containment: identical-text duplicates are found by EVERY method
    // (Jaccard 1 ≥ threshold; identical simhash → Hamming 0), so the
    // exact set's overlaps equal its size
    val m = got.map(g => (g._1, g._2) -> g._3).toMap
    m(("exact", "jaccard")) shouldEqual m(("exact", "exact"))
    m(("exact", "simhash")) shouldEqual m(("exact", "exact"))
  }

  test("pit_join matches a naive per-customer version scan and self-verifies") {
    def dayOf(v: Any): java.time.LocalDate = v match {
      case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
      case t: java.time.LocalDateTime => t.toLocalDate
      case other => sys.error(s"unexpected date: $other")
    }
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), dayOf(r.get(2)), r.getString(3)))
    val expected = orders.groupBy(_._1).values.flatMap { os =>
      val hist = os.sortBy(o => (o._3.toEpochDay, o._2))
      val changes = hist.zipWithIndex.filter { case (o, i) =>
        i == 0 || hist(i - 1)._4 != o._4
      }.zipWithIndex.map { case ((o, _), v) => (o._3, v + 1L, o._4) }
      os.map { o =>
        // latest valid_from ≤ order date, highest version on ties
        val (_, version, pri) = changes.filter(_._1.toEpochDay <= o._3.toEpochDay)
          .maxBy(c => (c._1.toEpochDay, c._2))
        (version, pri == o._4)
      }
    }.toSeq
    val exp = expected.groupBy(_._1).toSeq
      .map { case (v, vs) => (v, vs.length.toLong, vs.count(_._2).toLong) }
      .sortBy(_._1)
    val got = SparkEntry.queries("pit_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldEqual exp
    // self-verification: every order joined (totals match) and almost
    // all recover their own priority (mismatch ⊆ same-day flips)
    got.map(_._2).sum shouldEqual orders.length.toLong
    val (nAll, nMatch) = (got.map(_._2).sum, got.map(_._3).sum)
    assert(nMatch * 10 > nAll * 9)
  }

  test("merge_apply reconstructs snapshot v2 exactly (all digests match a naive merge)") {
    // naive MERGE: rebuild v2 from v1 + the per-key change classes,
    // entirely in driver-side maps, and digest both sides
    val rows = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val old = rows.filter(r => bucket("graft-snap-ins", r._1) >= 2)
      .map(r => r._1 -> (r._2,
        if (bucket("graft-snap-upd", r._1) < 3) r._3 - 100 else r._3)).toMap
    val neu = rows.filter(r => bucket("graft-snap-del", r._1) >= 2)
      .map(r => r._1 -> (r._2, r._3)).toMap
    val merged = old.filter { case (k, v) => neu.get(k).contains(v) } ++
      neu.filter { case (k, v) => !old.get(k).contains(v) }
    merged shouldEqual neu // the naive merge itself must equal direct v2
    def digest(m: Map[Long, (String, Long)]) =
      m.toSeq.groupBy(_._2._1).view.mapValues { vs =>
        val hs = vs.map { case (k, (_, c)) =>
          java.lang.Long.parseLong(md5hex(s"$k|$c").take(14), 16)
        }
        (vs.length.toLong, vs.map(_._2._2).sum, hs.reduce(_ ^ _))
      }.toMap
    val expected = digest(merged).map { case (st, (n, c, fp)) =>
      (st, n, c, fp, n, c, fp, true)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("merge_apply")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    got shouldEqual expected
    // the reconstruction is exercised: all three CDC classes are drawn
    // on these seeds, yet every per-status digest still matches
    got.foreach(_._8 shouldBe true)
  }
}
