package graft

import org.apache.spark.sql.functions._

/** Independent plain-Scala references for the round-6 data-mixture and
  * measurement operators (weighted corpus mixing, feature hashing,
  * cluster-size dedup weights, source overlap, MinHash estimate error,
  * ANN recall): each registered query is recomputed from collected
  * sf0.001 rows with naive driver-side logic — or cross-checked against
  * the registered queries it composes — and must agree exactly, plus
  * the algebraic invariants a reader should be able to rely on
  * (mixture mass, sign cancellation bounds, per-cluster weight
  * conservation, estimate error bound).
  */
class MixWeightSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("corpus_mix replicates each doc exactly per its weight rule") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, src) =>
      val w10 = 5 + (src.stripPrefix("src").toLong % 5) * 5
      val bucket = java.lang.Long.parseLong(md5hex(s"graft-mix$id").take(4), 16) % 100
      val copies = (w10 / 10 + (if (bucket < (w10 % 10) * 10) 1 else 0)).toInt
      (0 until copies).map(e => (id, src, w10.toInt, e))
    }.sortBy(t => (t._1, t._4))
    val got = q("corpus_mix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    got.toSeq shouldEqual expected.toSeq
    // every doc with weight >= 1.0 appears at least once; overall
    // mixture mass sits strictly between 0.5x and 2.5x of the corpus
    val perDoc = got.groupBy(_._1).view.mapValues(_.length).toMap
    docs.foreach { case (id, src) =>
      if (5 + (src.stripPrefix("src").toLong % 5) * 5 >= 10)
        perDoc.getOrElse(id, 0) should be >= 1
    }
    assert(got.length > docs.length / 2 && got.length < docs.length * 5 / 2)
  }

  test("weighted_sample matches the naive order-sampling bottom-20 and skews toward weight") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val prios = docs.map { case (id, lang, nc) =>
      val w = math.max(nc, 1L)
      val u = java.lang.Long.parseLong(md5hex(s"graft-wr$id").take(14), 16) % 1000000007L
      (id, lang, w, u * 1000000L / w)
    }
    val expected = prios.sortBy(t => (t._4, t._1)).take(20).toSeq
    val got = SparkEntry.queries("weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldEqual expected
    // πps actually biases the draw: the mean weight of the sample
    // exceeds the corpus mean (u/w ranks long docs first), and every
    // weight is positive (the greatest(…,1) floor)
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    val corpusMean = prios.map(_._3).sum.toDouble / prios.length
    assert(sampleMean > corpusMean)
    assert(got.forall(_._3 >= 1))
  }

  test("shard_manifest matches naive per-shard digests and covers every doc exactly once") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val recs = docs.map { case (id, lang, text) =>
      val shard = java.lang.Long.parseLong(md5hex(s"graft-shard$id").take(4), 16) % 4
      val dh = java.lang.Long.parseLong(md5hex(text).take(14), 16)
      val nToks = text.replaceAll("\\s+", " ").trim.split(" ", -1).length.toLong
      (lang, shard, dh, nToks, id)
    }
    val expected = recs.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((lang, shard), vs) =>
        (lang, shard, vs.length.toLong, vs.map(_._4).sum,
          vs.map(_._3).reduce(_ ^ _),
          (vs.map(r => BigInt(r._3)).sum mod BigInt(1L << 56)).toLong,
          vs.map(_._5).min, vs.map(_._5).max)
      }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("shard_manifest")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    got shouldEqual expected
    // the assignment is a partition: shard counts sum to the corpus and
    // every (lang, shard) cell is non-empty at this corpus size
    got.map(_._3).sum shouldBe docs.length.toLong
    assert(got.forall(_._3 > 0))
  }

  test("budget_allocation matches naive Hamilton apportionment and conserves the budget") {
    val B = 1000000L
    val counts = Tables.documents(spark, sf).select("lang").collect()
      .map(_.getString(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nn = counts.values.sum
    val base = counts.view.mapValues(n => n * B / nn).toMap
    val rem = counts.map { case (l, n) => l -> (n * B) % nn }
    val k = B - base.values.sum
    val topUp = rem.toSeq.sortBy { case (l, r) => (-r, l) }.take(k.toInt).map(_._1).toSet
    val expected = counts.keys.toSeq.sorted.map { l =>
      (l, counts(l), base(l) + (if (topUp(l)) 1L else 0L))
    }
    val got = SparkEntry.queries("budget_allocation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldEqual expected
    // the defining property: quotas sum EXACTLY to the budget
    got.map(_._3).sum shouldEqual B
  }

  test("shard_rebalance matches naive hashing and shows the consistent-placement gap") {
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    def h16(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(4), 16)
    def hrw(id: Long, shards: Int): Long =
      (0 until shards).map(i => h16(s"graft-hrw$i|$id") * 8 + i).max % 8
    val modMoved = ids.count { id =>
      val h = h16(s"graft-shard$id"); h % 4 != h % 5
    }.toLong
    val hrwMoved = ids.count(id => hrw(id, 4) != hrw(id, 5)).toLong
    val n = ids.length.toLong
    val got = SparkEntry.queries("shard_rebalance")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldEqual Seq(
      ("mod_rehash", n, modMoved, modMoved * 1000000L / n),
      ("rendezvous", n, hrwMoved, hrwMoved * 1000000L / n))
    // the measured case for consistent placement: mod-rehash reshuffles
    // the large majority, rendezvous only ~the 1/5 the new shard wins
    assert(modMoved * 2 > n)
    assert(hrwMoved * 3 < n)
  }

  test("hashed_features matches a naive token-hash fold and buckets stay in range") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(
          graft.operators.TextAnalysis.norm(col("text"))).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val expected = toks.flatMap { case (id, ts) =>
      ts.map { t =>
        val h = java.lang.Long.parseLong(md5hex(t).take(14), 16) % 1000000007L
        (id, (h % 64).toInt, 1L - 2L * ((h / 64) % 2))
      }
    }.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((id, b), xs) => (id, b, xs.length.toLong, xs.map(_._3).sum) }
      .sortBy(t => (t._1, t._2))
    val got = q("hashed_features").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldEqual expected
    // the signed sum can never exceed the occupancy in magnitude
    got.foreach { case (_, b, n, f) =>
      assert(b >= 0 && b < 64)
      assert(math.abs(f) <= n)
    }
  }

  test("temperature_mix: α=0.5 boosts the tail, shrinks the head, and copies track the boost") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nl = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val isqrt = nl.view.mapValues(v => math.floor(math.sqrt(v.toDouble)).toLong).toMap
    val sumIsqrt = isqrt.values.sum
    val boostFx = nl.map { case (l, c) =>
      l -> (BigInt(isqrt(l)) * n * 1000000 / (BigInt(sumIsqrt) * c)).toLong
    }
    val copies = docs.map { case (id, l) =>
      val bucket = java.lang.Long.parseLong(md5hex(s"graft-temp$id").take(4), 16) % 100
      val fx = boostFx(l)
      (l, fx / 1000000 + (if (bucket < (fx % 1000000) / 10000) 1L else 0L))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = q("temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    got.map(_._1).toSeq shouldEqual nl.keys.toSeq.sorted
    got.foreach { case (l, nDocs, fx, boost, nCopies) =>
      nDocs shouldEqual nl(l)
      fx shouldEqual boostFx(l)
      boost shouldEqual fx / 1e6
      nCopies shouldEqual copies(l)
    }
    // α = 0.5 must boost the smallest language more than the largest
    val smallest = nl.minBy(_._2)._1
    val largest = nl.maxBy(_._2)._1
    if (nl(smallest) < nl(largest))
      boostFx(smallest) should be > boostFx(largest)
    // realized copy mass tracks the smoothed target within the 1%
    // draw granularity: |Σcopies − N| ≤ Σ_l (n_l · 1% rounding)
    val totalCopies = got.map(_._5).sum
    math.abs(totalCopies - n) should be <= (nl.values.map(_ / 50 + 1).sum)
  }

  test("sq8_error: codes span [0,255] and reconstruction error is bounded by the step") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e7).toLong).toArray)
    val dims = vecs.head._2.length
    val mn = Array.tabulate(dims)(i => vecs.map(_._2(i)).min)
    val mx = Array.tabulate(dims)(i => vecs.map(_._2(i)).max)
    val expected = vecs.map { case (id, arr) =>
      val errsCodes = arr.zipWithIndex.map { case (v, i) =>
        val code = if (mx(i) > mn(i)) (v - mn(i)) * 255 / (mx(i) - mn(i)) else 0L
        val recon = mn(i) + code * (mx(i) - mn(i)) / 255
        (math.abs(v - recon), code)
      }
      (id, (dims.toLong, errsCodes.map(_._1).sum, errsCodes.map(_._1).max,
        errsCodes.map(_._2).min, errsCodes.map(_._2).max))
    }.toMap
    val got = q("sq8_error").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    got.keySet shouldEqual expected.keySet
    got.foreach { case (id, (nd, sumE, maxE, minC, maxC, mae)) =>
      (nd, sumE, maxE, minC, maxC) shouldEqual expected(id)
      mae shouldEqual sumE.toDouble / nd / 1e7
      // per-dimension error can never exceed one quantization step
      maxE should be <= mx.zip(mn).map { case (a, b) => (a - b) / 255 + 1 }.max
      assert(minC >= 0 && maxC <= 255)
    }
  }

  test("dedup_weight conserves one unit of mass per cluster and covers the corpus") {
    val r = q("dedup_weight").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    r.length shouldEqual Tables.documents(spark, sf).count().toInt
    // within a cluster every member carries the same size and weight,
    // the member count equals csize, and weight_fx = floor(1e6/csize)
    r.groupBy(_._2).foreach { case (_, members) =>
      val sizes = members.map(_._3).distinct
      sizes.length shouldEqual 1
      members.length.toLong shouldEqual sizes.head
      members.map(_._4).distinct.toSeq shouldEqual Seq(1000000L / sizes.head)
    }
    // singletons dominate the tiny slice and keep full weight
    r.count(t => t._3 == 1 && t._4 == 1000000L) should be > 0
  }

  test("source_overlap matches a naive pairwise shingle-set compare") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"),
        graft.operators.TextAnalysis.tokens(
          graft.operators.TextAnalysis.norm(col("text"))).as("toks"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
      .groupBy(_._1)
      .view.mapValues(_.flatMap { case (_, ts) =>
        ts.sliding(3).filter(_.size == 3).map(_.mkString(" "))
      }.toSet).toMap
    val srcs = bySource.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
      (a, b) = (srcs(i), srcs(j))
      common = (bySource(a) & bySource(b)).size
      if common > 0
    } yield (a, b, common.toLong, bySource(a).size.toLong, bySource(b).size.toLong,
      common.toDouble / (bySource(a).size + bySource(b).size - common)))
      .sortBy(t => (t._1, t._2))
    val got = q("source_overlap").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    got.toSeq shouldEqual expected
  }

  test("ann_recall agrees with intersecting the registered ANN queries against the truth") {
    val truth = SparkEntry.queries("knn_cosine")(spark, sf).collect()
      .filter(_.getInt(2) <= 3) // top-3 of the exact top-5
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(name: String): Map[Long, Int] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter(truth)
        .groupBy(_._1).view.mapValues(_.length).toMap
    // The registered ann_lsh_bucket runs multi-probe (LshProbes), so its
    // hits correspond to ann_recall's "lsh_mp" arm; "lsh" is the
    // single-bucket baseline that only ann_recall materializes.
    val lshMpHits = hits("ann_lsh_bucket")
    val ivfHits = hits("ivf_topk")
    val got = q("ann_recall").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    got.size shouldEqual 30 // 3 methods x 10 query vectors
    got.foreach { case ((method, qid), (nTrue, nHit, recall)) =>
      nTrue shouldEqual 3L
      recall shouldEqual nHit / 3.0
      method match {
        case "lsh_mp" => nHit shouldEqual lshMpHits.getOrElse(qid, 0).toLong
        case "ivf"    => nHit shouldEqual ivfHits.getOrElse(qid, 0).toLong
        case "lsh"    => // baseline arm: dominated-by-lsh_mp checked below
        case other    => fail(s"unexpected method $other")
      }
    }
    // Multi-probe must dominate the single-bucket baseline per query
    // (probing a superset of buckets can only add true neighbors) and
    // lift mean recall materially (the r6 verdict's done-criterion).
    val mean = got.toSeq.groupBy(_._1._1).view
      .mapValues(rs => rs.map(_._2._3).sum / rs.size).toMap
    (0L until 10L).foreach { qid =>
      got(("lsh_mp", qid))._2 should be >= got(("lsh", qid))._2
    }
    mean("lsh_mp") should be > mean("lsh") * 2
  }

  test("order_value_mad matches a naive sorted median/MAD computation") {
    val byPrio = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact, r.getLong(2)))
      .groupBy(_._1)
    def medianOfSorted(xs: Seq[Long]): Double = {
      val n = xs.length
      (xs((n - 1) / 2) + xs(n / 2)) / 2.0
    }
    val expected = byPrio.toSeq.map { case (prio, rows) =>
      val cents = rows.map(_._2).sorted.toSeq
      val medC = medianOfSorted(cents)                 // exact .0 or .5
      val devs = rows.map(t => math.abs(2 * t._2 - (2 * medC).toLong)).sorted.toSeq
      val mad4 = devs((devs.length - 1) / 2) + devs(devs.length / 2)
      (prio, rows.size.toLong, medC / 100.0, mad4 / 400.0)
    }.sortBy(_._1)
    val got = q("order_value_mad").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    got.toSeq shouldEqual expected
  }

  test("leakage_split: clusters never straddle train and val, and the corpus is covered") {
    val rows = q("leakage_split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    rows.length shouldEqual Tables.documents(spark, sf).count().toInt
    rows.groupBy(_._2).foreach { case (_, members) =>
      members.map(_._3).distinct.length shouldEqual 1
    }
    // the split is keyed on the same clusters dedup_clusters reports
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { case (doc, cluster, _) =>
      cluster shouldEqual clusters.getOrElse(doc, doc)
    }
    // both splits are non-degenerate on even this tiny slice
    rows.map(_._3).distinct.sorted.toSeq shouldEqual Seq("train", "val")
  }

  test("fixed_size_sample takes exactly min(k, stratum) docs by salted hash priority") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.map { case (id, _) =>
        (lang, id, java.lang.Long.parseLong(md5hex(s"graft-k$id").take(14), 16) % 1000000007L)
      }.sortBy(t => (t._3, t._2)).take(10).zipWithIndex
        .map { case ((l, id, pri), i) => (l, i + 1, id, pri) }
    }.sortBy(t => (t._1, t._2))
    val got = q("fixed_size_sample").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    got.toSeq shouldEqual expected
  }

  test("events_hourly_filled covers the full hour-by-type grid with honest zeros") {
    val ev = Tables.events(spark, sf).select(
        date_trunc("hour", col("ts")).as("hour"), col("event_type")).collect()
      .map(r => (r.get(0).toString, r.getString(1)))
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = ev.map(_._2).distinct.sorted
    val got = SparkEntry.queries("events_hourly_filled")(spark, sf).collect()
      .map(r => ((r.get(0).toString, r.getString(1)), r.getLong(2)))
    // every cell of the grid is present exactly once
    val hours = got.map(_._1._1).distinct
    got.length shouldEqual hours.length * types.length
    // filled cells match the raw counts; absent cells are zero
    got.foreach { case (cell, n) =>
      n shouldEqual counts.getOrElse(cell, 0L)
    }
    // total mass is conserved and real gaps exist on the tiny slice
    got.map(_._2).sum shouldEqual ev.length.toLong
    assert(got.exists(_._2 == 0L))
  }

  test("conversion_funnel matches a naive per-user sequential scan") {
    val byUser = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
      .groupBy(_._1)
    var (nView, nClick, nFull) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      val tv = evs.filter(_._2 == "view").map(_._3).minOption
      val tc = tv.flatMap(v => evs.filter(e => e._2 == "click" && e._3 > v).map(_._3).minOption)
      val tp = tc.flatMap(c => evs.filter(e => e._2 == "purchase" && e._3 > c).map(_._3).minOption)
      if (tv.isDefined) nView += 1
      if (tc.isDefined) nClick += 1
      if (tp.isDefined) nFull += 1
    }
    val r = SparkEntry.queries("conversion_funnel")(spark, sf).collect().head
    r.getLong(0) shouldEqual byUser.size.toLong
    r.getLong(1) shouldEqual nView
    r.getLong(2) shouldEqual nClick
    r.getLong(3) shouldEqual nFull
    r.getDouble(4) shouldEqual nClick.toDouble / nView
    r.getDouble(5) shouldEqual nFull.toDouble / nClick
    // funnel stages can only narrow
    assert(nView >= nClick && nClick >= nFull)
  }

  test("rrf_fusion fuses the registered bm25 top-20 with the naive tf top-20") {
    val bmTop = SparkEntry.queries("bm25_score")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))       // doc_id, score_fx
      .sortBy(t => (-t._2, t._1)).take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val terms = Set("data", "stream", "vector")
    val tfTop = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).trim.split("\\s+")
        (r.getLong(0), toks.count(terms))
      }
      .filter(_._2 > 0)
      .sortBy(t => (-t._2, t._1)).take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expected = (bmTop.keySet ++ tfTop.keySet).toSeq.map { id =>
      val fx = bmTop.get(id).map(rk => 1000000000L / (60 + rk)).getOrElse(0L) +
        tfTop.get(id).map(rk => 1000000000L / (60 + rk)).getOrElse(0L)
      (id, bmTop.get(id), tfTop.get(id), fx)
    }.sortBy(t => (-t._4, t._1))
    val got = SparkEntry.queries("rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getLong(3)))
    got.toSeq shouldEqual expected
  }

  test("dedup_artifacts composes clusters, weights, split, and keep-best retention consistently") {
    val rows = q("dedup_artifacts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5), r.getBoolean(6)))
    rows.length shouldEqual Tables.documents(spark, sf).count().toInt
    // column-for-column agreement with the standalone artifact queries
    val weights = q("dedup_weight").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val splits = q("leakage_split").collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val scores = q("text_quality").collect()
      .map(r => (r.getLong(0), r.getDouble(4))).toMap
    rows.foreach { case (doc, cluster, csize, wfx, score, split, _) =>
      (cluster, csize, wfx) shouldEqual weights(doc)
      split shouldEqual splits(doc)
      score shouldEqual scores(doc)
    }
    // exactly one kept doc per cluster: the argmax-score member,
    // smallest doc_id on ties
    rows.groupBy(_._2).foreach { case (_, members) =>
      val kept = members.filter(_._7)
      kept.length shouldEqual 1
      val best = members.map(_._5).max
      kept.head._5 shouldEqual best
      kept.head._1 shouldEqual members.filter(_._5 == best).map(_._1).min
    }
    // the quality policy is exercised: at least one multi-member
    // cluster exists on this slice (planted near-dups), so keep-best
    // made a real choice among candidates
    assert(rows.groupBy(_._2).exists(_._2.length > 1))
  }

  test("minhash_incremental: probe pairs straddle the split and are true near-dups") {
    val got = q("minhash_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (dNew, dIdx, jac) =>
      dNew % 10 shouldEqual 0L
      dIdx % 10 should not equal 0L
      jac should be >= 0.5
    }
    // banding may MISS straddling pairs (recall < 1) but must never
    // invent similarity: every surfaced pair is in the exact ≥ 0.5
    // Jaccard output of ngram_jaccard
    val exact = q("ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (dNew, dIdx, _) =>
      assert(exact((math.min(dNew, dIdx), math.max(dNew, dIdx))))
    }
  }

  test("zorder_layout: buckets partition the table and z-order bounds both spans") {
    val rows = SparkEntry.queries("zorder_layout")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = Tables.orders(spark, sf).count()
    // each layout covers every row exactly once
    Seq("zorder", "bydate").foreach { l =>
      rows.filter(_._1 == l).map(_._3).sum shouldEqual n
    }
    // naive reference for the z-key arithmetic on a sample of rows
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), datediff(col("o_orderdate"),
        lit(java.sql.Date.valueOf("1992-01-01"))).cast("long").as("day_num"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (ckMn, ckMx) = (o.map(_._1).min, o.map(_._1).max)
    val (dMn, dMx) = (o.map(_._2).min, o.map(_._2).max)
    def interleave(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val expectedBuckets = o.map { case (ck, dn) =>
      val xs = (ck - ckMn) * 65535 / (ckMx - ckMn)
      val ys = (dn - dMn) * 65535 / (dMx - dMn)
      (interleave(xs, ys) / 4194304, ys / 64)
    }
    val zCounts = expectedBuckets.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val gotZ = rows.filter(_._1 == "zorder").map(r => r._2 -> r._3).toMap
    gotZ shouldEqual zCounts
    // the z-order layout must bound the custkey span everywhere the
    // single-key date layout leaves it at full width: its WORST bucket
    // custkey span is far below bydate's (which is ~the whole domain)
    val zWorstCk = rows.filter(_._1 == "zorder").map(_._4).max
    val dateWorstCk = rows.filter(_._1 == "bydate").map(_._4).max
    zWorstCk.toDouble should be < dateWorstCk.toDouble * 0.25
  }

  test("minhash_est_err: estimate is matches/16 and the error column is honest") {
    val r = q("minhash_est_err").collect()
    r.foreach { row =>
      val m = row.getInt(2)
      assert(m >= 0 && m <= 16)
      row.getDouble(3) shouldEqual m / 16.0
      row.getDouble(5) shouldEqual math.abs(row.getDouble(3) - row.getDouble(4))
    }
    // candidate pairs surfaced by banding include the planted near-dups:
    // every pair with full signature agreement must be truly similar
    r.filter(_.getInt(2) == 16).foreach { row =>
      row.getDouble(4) should be >= 0.5
    }
  }
}
