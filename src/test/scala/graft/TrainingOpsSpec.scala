package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the training-pipeline queries (X-38..X-41)
  * over the sf0.001 corpus — the oracle pins exact values; these pin
  * the semantics a reader should be able to rely on. */
class TrainingOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sequence_pack: offsets stay inside the chunk and ids advance with the stream") {
    val r = q("sequence_pack")
    r.filter(col("seq_offset") < 0 || col("seq_offset") >= 2048).count() shouldEqual 0
    r.filter(col("seq_id") < 0).count() shouldEqual 0
    // within a packing stratum, chunk ids never decrease as doc_id advances
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "shard").orderBy("doc_id")
    r.withColumn("prev", lag(col("seq_id"), 1).over(w))
      .filter(col("prev").isNotNull && col("seq_id") < col("prev"))
      .count() shouldEqual 0
  }

  test("context_truncation matches a plain-Scala truncation ledger and the mass balances") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => r.getString(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").length.toLong)
    val expect = (for ((lang, rows) <- docs.groupBy(_._1); ctx <- Seq(64L, 256L, 1024L)) yield {
      val toks = rows.map(_._2)
      val total = toks.sum
      val kept = toks.map(math.min(_, ctx)).sum
      (lang, ctx, toks.length.toLong, toks.count(_ > ctx).toLong,
        total, kept, (total - kept) * 1000000L / total)
    }).toSeq.sortBy(r => (r._1, r._2))
    val got = q("context_truncation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldEqual expect
    // the ledger is coherent: lost mass shrinks as the context grows,
    // and the longest context keeps strictly more than the shortest
    got.groupBy(_._1).values.foreach { rs =>
      val o = rs.sortBy(_._2)
      o.map(_._7).sliding(2).foreach { case Seq(a, b) => b should be <= a }
      o.map(_._6).sliding(2).foreach { case Seq(a, b) => b should be >= a }
    }
    // non-vacuous at this SF: some docs are cut at 64 and none survive
    // uncut corpora-wide at the shortest context
    assert(got.filter(_._2 == 64L).map(_._4).sum > 0L)
  }

  test("winnow_fingerprints matches a plain-Scala robust winnow and guarantees 8-token runs") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(14), 16) % 1000000007L
    val K = 4; val W = 5; val PosMax = (1L << 30) - 1
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").toSeq)
    val expected = docs.flatMap { case (id, toks) =>
      val grams = toks.sliding(K).filter(_.size == K).map(_.mkString(" ")).toVector
      val hs = grams.map(h)
      // robust winnowing: per window of W hashes, min hash with the
      // RIGHTMOST position; docs shorter than W grams use one partial
      // window over everything
      val ends =
        if (hs.isEmpty) Seq.empty
        else if (hs.size < W) Seq(hs.size - 1)
        else (W - 1) until hs.size
      ends.map { e =>
        val win = (math.max(0, e - W + 1) to e).map(p => (hs(p), p))
        val mn = win.map(_._1).min
        val pos = win.filter(_._1 == mn).map(_._2).max
        (id, pos.toLong, mn)
      }.distinct
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = q("winnow_fingerprints").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldEqual expected
    // the winnowing guarantee on real data: every pair of docs sharing
    // a run of >= W+K-1 = 8 consecutive tokens shares a fingerprint
    val fpsByDoc = got.groupBy(_._1)
      .map { case (d, v) => d -> v.map(_._3).toSet }
    val runs = docs.flatMap { case (id, toks) =>
      toks.sliding(W + K - 1).filter(_.size == W + K - 1)
        .map(r => r.mkString(" ") -> id)
    }.groupBy(_._1).values.map(_.map(_._2).distinct).filter(_.size >= 2)
    runs.foreach { ds =>
      for (a <- ds; b <- ds if a < b)
        assert(fpsByDoc(a).intersect(fpsByDoc(b)).nonEmpty,
          s"docs $a/$b share an 8-token run but no fingerprint")
    }
  }

  test("ngram_novelty matches a plain-Scala unique-shingle ratio") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").toSeq)
    val sh = docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val df = sh.flatMap(_._2).groupMapReduce(identity)(_ => 1)(_ + _)
    val expected = sh.sortBy(_._1).map { case (id, ss) =>
      val n = ss.size.toLong
      val u = ss.count(df(_) == 1).toLong
      (id, n, u, if (n > 0) Some(u * 1000000L / n) else None)
    }.toSeq
    val got = q("ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    got shouldEqual expected
    // the signal separates on this corpus: zero-novelty docs exist
    // (exact/near dups — every shingle shared) alongside docs where a
    // majority of shingles are corpus-unique (the 31-token vocabulary
    // keeps the ceiling well under 1.0; max ≈ 0.71 at sf0.001)
    assert(got.exists(_._4.contains(0L)))
    assert(got.exists(_._4.exists(_ > 500000L)))
  }

  test("dedup_assign matches a plain-Scala union-find assignment") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").toSeq)
    val sh = docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val pairs = for {
      i <- sh.indices; j <- (i + 1) until sh.length
      ((d1, s1), (d2, s2)) =
        if (sh(i)._1 < sh(j)._1) (sh(i), sh(j)) else (sh(j), sh(i))
      common = (s1 intersect s2).size
      jac = common.toDouble / (s1.size + s2.size - common)
      if jac >= 0.5
    } yield (d1, d2, jac)
    // union-find over index-index pairs, min-id component labels
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.filter(p => p._1 % 10 != 0 && p._2 % 10 != 0).foreach {
      case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = (x: Long) => find(x)
    val best = pairs.filter(p => (p._1 % 10 == 0) != (p._2 % 10 == 0))
      .map { case (a, b, jac) =>
        if (a % 10 == 0) (a, b, jac) else (b, a, jac) }
      .groupBy(_._1).view.mapValues { ps =>
        ps.map { case (_, di, jac) => (jac, label(di), di) }
          .minBy { case (jac, cl, di) => (-jac, cl, di) }
      }.toMap
    // new docs come from the CORPUS, not the shingled view: a <3-token
    // doc has no shingles but still gets an own-cluster row (the
    // engine's shingled frame keeps it with an empty set, as does the
    // oracle's sh CTE)
    val expected = docs.map(_._1).filter(_ % 10 == 0).sorted.map { id =>
      best.get(id) match {
        case Some((jac, cl, _)) => (id, cl, 1, Some(jac))
        case None               => (id, id, 0, None)
      }
    }.toSeq
    val got = q("dedup_assign").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    got shouldEqual expected
    // the assignment is real: some new docs join standing clusters,
    // some seed their own
    assert(got.exists(_._3 == 1) && got.exists(_._3 == 0))
  }

  test("source_datacard matches a plain-Scala per-source rollup") {
    def md5hexS(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val stop = graft.operators.TextAnalysis.LangProfiles
      .flatMap(_._2).distinct
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val rows = docs.map { case (_, src, lang, text, nc) =>
      val toks = text.trim.replaceAll("\\s+", " ").split(" ").toSeq
      val n = toks.size.toLong
      val nd = toks.distinct.size.toLong
      val totlen = toks.map(_.length.toLong).sum
      val hits = toks.count(stop.contains)
      val pass = n >= 20 && n <= 80 &&
        totlen >= n * 3 && totlen <= n * 5 &&
        nd * 10 >= n * 3 && hits >= 2
      (src, lang, n, nc, md5hexS(text), if (pass) 1L else 0L)
    }
    val expected = rows.groupBy(_._1).map { case (src, rs) =>
      val perLang = rs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val (topL, topN) = perLang.minBy { case (l, c) => (-c, l) }
      (src, rs.size.toLong, perLang.size.toLong, rs.map(_._3).sum,
        rs.map(_._4).sum, rs.map(_._4).sum * 100 / rs.size,
        rs.map(_._6).sum, rs.size.toLong - rs.map(_._5).distinct.size,
        topL, topN)
    }.toSeq.sortBy(_._1)
    val got = q("source_datacard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getString(8), r.getLong(9))).toSeq
    got shouldEqual expected
    // a data card over this corpus is non-trivial in every column:
    // quality gate passes some-but-not-all docs somewhere, and the
    // gopher stopword list keeps the gate honest
    assert(got.exists(t => t._7 > 0 && t._7 < t._2))
  }

  test("tf_cosine_pairs matches a plain-Scala df-capped cosine scan") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").toSeq
          .filter(_.nonEmpty))
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupMapReduce(identity)(_ => 1L)(_ + _)
    }
    val shByDoc = docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    val shDf = shByDoc.values.flatten
      .groupMapReduce(identity)(_ => 1)(_ + _)
    val keep = shDf.filter { case (_, c) => c >= 2 && c <= 8 }.keySet
    val n2 = tf.map { case (id, m) => id -> m.values.map(v => v * v).sum }.toMap
    // candidates share >= 1 rare shingle; the score is FULL-vector
    // token-TF cosine
    val expected = (for {
      i <- tf.indices; j <- (i + 1) until tf.length
      ((d1, m1), (d2, m2)) =
        if (tf(i)._1 < tf(j)._1) (tf(i), tf(j))
        else (tf(j), tf(i))
      if shByDoc(d1).exists(s => keep(s) && shByDoc(d2)(s))
      dot = m1.keysIterator.filter(m2.contains).map(k => m1(k) * m2(k)).sum
      cos2 = dot * dot * 1000000L / (n2(d1) * n2(d2))
      if cos2 >= 902500L
    } yield (d1, d2, dot, cos2)).sortBy(t => (t._1, t._2))
    val got = q("tf_cosine_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldEqual expected
    // the threshold separates: planted near-dup pairs clear it and
    // everything reported is a genuine ≥0.95 cosine (cos² ≤ 10⁶ too)
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, c2) => assert(c2 >= 902500L && c2 <= 1000000L) }
  }

  test("lsh_recall matches a plain-Scala minhash-vs-truth recall curve") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(14), 16) % 1000000007L
    val Mod = 1000000007L
    val A = (0 until 16).map(i => (2L * i + 1) * 104729L % Mod)
    val B = (0 until 16).map(i => (i + 1) * 7919L % Mod)
    val base = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").toVector)
    // base corpus + the deterministic prefix-truncated variants
    val corpus = base ++ base.filter(_._1 % 5 == 0).map { case (id, toks) =>
      val f = (id / 5) % 5 + 5
      val m = math.max(3L, toks.size * f / 10).toInt
      (id + 1000000000L) -> toks.take(m)
    }
    val shingles = corpus.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    // truth: exact 3-shingle Jaccard >= 0.5 with its integer decile
    val truth = (for {
      i <- shingles.indices; j <- (i + 1) until shingles.length
      // order the PAIR by doc id (array order is collect order)
      ((d1, s1), (d2, s2)) =
        if (shingles(i)._1 < shingles(j)._1) (shingles(i), shingles(j))
        else (shingles(j), shingles(i))
      common = (s1 intersect s2).size; union = s1.size + s2.size - common
      if common * 2 >= union
    } yield ((d1, d2), common.toLong * 10 / union)).toMap
    // candidates: 16-hash signatures, 4 bands x 4 rows
    val sigs = shingles.map { case (id, ss) =>
      val hs = ss.toSeq.map(h)
      id -> (0 until 16).map(i => hs.map(x => (A(i) * x + B(i)) % Mod).min)
    }
    val buckets = sigs.flatMap { case (id, sig) =>
      (0 until 4).map(b =>
        (b, (0 until 4).map(r => sig(b * 4 + r)).mkString("-")) -> id)
    }.groupMap(_._1)(_._2)
    val cand = buckets.values.flatMap { ids =>
      val srt = ids.distinct.sorted
      for (i <- srt.indices; j <- (i + 1) until srt.size) yield (srt(i), srt(j))
    }.toSet
    val expected = truth.toSeq.groupBy(_._2).map { case (bucket, ps) =>
      (bucket, ps.size.toLong, ps.count(p => cand(p._1)).toLong)
    }.toSeq.sortBy(_._1)
    val got = q("lsh_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldEqual expected
    // the curve measures something: genuine misses at the 0.5 decile,
    // saturation at the top (j >= 0.9 pairs are all caught)
    val byBucket = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byBucket(5L)._2 < byBucket(5L)._1)
    assert(byBucket(9L)._2 == byBucket(9L)._1)
    assert(got.map(_._2).sum > got.map(_._3).sum)
  }

  test("winnow_overlap matches the naive shared-fingerprint pair count") {
    val fps = q("winnow_fingerprints").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .distinct.groupBy(_._2).map { case (fp, v) => fp -> v.map(_._1).sorted }
    val kept = fps.filter { case (_, ds) => ds.size >= 2 && ds.size <= 16 }
    val expected = kept.toSeq.flatMap { case (_, ds) =>
      for (i <- ds.indices; j <- (i + 1) until ds.size) yield (ds(i), ds(j))
    }.groupBy(identity).map { case (p, v) => (p._1, p._2, v.size.toLong) }
      .filter(_._3 >= 2).toSeq.sortBy(t => (t._1, t._2))
    val got = q("winnow_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldEqual expected
    assert(got.nonEmpty) // the corpus genuinely shares phrases
  }

  test("chi2_tokens matches a naive contingency-table computation") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"),
        graft.operators.TextAnalysis.tokens(
          graft.operators.TextAnalysis.norm(col("text"))).as("toks"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toSet))
    val n = docs.length.toLong
    val nl = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pres = docs.flatMap { case (l, ts) => ts.map(t => (l, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val at = pres.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val expected = pres.toSeq.collect {
      case ((l, t), a) if at(t) >= 5 && at(t) < n =>
        val (b, c) = (at(t) - a, nl(l) - a)
        val dd = n - nl(l) - b
        val num = BigInt(n) * (a * dd - b * c) * (a * dd - b * c) * 1000000
        val den = BigInt(at(t)) * (n - at(t)) * nl(l) * (n - nl(l))
        (l, t, a, (num / den).toLong, a * (n - nl(l)) > b * nl(l))
    }.groupBy(_._1).toSeq.flatMap { case (l, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex
        .map { case ((_, t, a, chi, over), i) => (l, i + 1, t, a, chi, over) }
    }.sortBy(r => (r._1, r._2))
    val got = q("chi2_tokens").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    got.toSeq shouldEqual expected
    // χ² is scale-bounded: fx ≤ n·10⁶ (χ² ≤ n for a 2×2 table)
    got.foreach(_._5 should be <= n * 1000000L)
  }

  test("pmi_collocations matches a naive count-everything computation") {
    val toksAll = Tables.documents(spark, sf)
      .select(graft.operators.TextAnalysis.tokens(
        graft.operators.TextAnalysis.norm(col("text"))).as("toks"))
      .collect().map(_.getSeq[String](0).toIndexedSeq)
    val uni = toksAll.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bi = toksAll.flatMap(ts => ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nToks = uni.values.sum
    val nBi = toksAll.map(ts => math.max(ts.length - 1, 0).toLong).sum
    val expected = bi.toSeq.collect { case (bg, cab) if cab >= 5 =>
      val Array(a, b) = bg.split(" ", 2)
      val fx = (BigInt(cab) * nToks * nToks * 1000000 /
        (BigInt(uni(a)) * uni(b) * nBi)).toLong
      (bg, cab, uni(a), uni(b), fx)
    }.sortBy(r => (-r._5, r._1)).take(20)
    val got = q("pmi_collocations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldEqual expected
    // a collocation is over-represented: top-ranked ratios exceed
    // independence (ratio_fx > 10⁶ means observed > expected)
    assert(got.nonEmpty && got.head._5 > 1000000L)
  }

  test("decontaminate: never flags a benchmark doc, and hits are positive") {
    val r = q("decontaminate")
    r.filter(col("doc_id") % 10 === 0).count() shouldEqual 0
    r.filter(col("n_hits") <= 0).count() shouldEqual 0
  }

  test("repetition_stats: fractions in [0,1] and the flag matches its definition") {
    val r = q("repetition_stats")
    r.filter(col("top_token_frac") < 0 || col("top_token_frac") > 1).count() shouldEqual 0
    r.filter(col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1).count() shouldEqual 0
    r.filter(col("flagged") =!=
      (col("top_token_frac") > 0.2 || col("dup_bigram_frac") > 0.5)).count() shouldEqual 0
  }

  test("pii_scrub: scrubbed hash differs from the raw hash exactly when emails were found") {
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("raw_hash"))
    val r = q("pii_scrub").join(raw, "doc_id")
    r.filter(col("n_emails") > 0 && col("scrubbed_hash") === col("raw_hash"))
      .count() shouldEqual 0
    r.filter(col("n_emails") === 0 && col("scrubbed_hash") =!= col("raw_hash"))
      .count() shouldEqual 0
    // (no planted emails in the tiny sf0.001 slice — the equivalence
    // above is the invariant; sf0.01's oracle run covers the hit path)
  }

  test("next_token_topk matches a naive bigram conditional table") {
    def toks(t: String): Array[String] =
      t.replaceAll("\\s+", " ").trim.split(" ", -1)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(r => toks(r.getString(0)).toSeq)
    val pairs = docs.flatMap(t => t.zip(t.drop(1)))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val topCtx = uni.toSeq.sortBy { case (t, c) => (-c, t) }.take(20).map(_._1).toSet
    val counts = pairs.filter(p => topCtx(p._1)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val totals = counts.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val expected = counts.toSeq.map { case ((c, n), cnt) => (c, n, cnt) }
      .groupBy(_._1).toSeq.flatMap { case (c, vs) =>
        vs.sortBy(v => (-v._3, v._2)).take(3).zipWithIndex.map {
          case ((_, n, cnt), i) =>
            (c, i + 1L, n, cnt, cnt * 1000000L / totals(c))
        }
      }.sortBy(e => (e._1, e._2))
    val got = SparkEntry.queries("next_token_topk")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldEqual expected
    got.length shouldEqual 60 // 20 contexts × top-3
  }

  test("pareto_docs matches a naive all-pairs domination scan") {
    val scored = SparkEntry.queries("text_quality")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_tokens", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
    // naive skyline: keep a point iff NO other point dominates it
    // (≤ tokens, ≥ quality, strictly better on at least one axis)
    val expected = scored.filter { case (_, t, q) =>
      !scored.exists { case (_, t2, q2) =>
        t2 <= t && q2 >= q && (t2 < t || q2 > q)
      }
    }.map(p => (p._1, p._2, p._3)).sortBy(p => (p._2, p._1)).toSeq
    val got = SparkEntry.queries("pareto_docs")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldEqual expected
    // the frontier is a real curve on this corpus: more than one point,
    // far fewer than the corpus, and quality strictly increases with
    // the token budget along it
    assert(got.length > 1 && got.length < scored.length)
    val byLen = got.groupBy(_._2).view.mapValues(_.head._3).toSeq.sortBy(_._1)
    byLen.map(_._2) shouldEqual byLen.map(_._2).sorted
  }

  test("classifier_filter matches a plain-Scala linear head and every funnel stage binds") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(14), 16) % 1000000007L
    // the frozen head, re-derived independently (same SplitMix64 recipe)
    val w: IndexedSeq[Long] = (0 until 64).map { b =>
      var z = (b + 1).toLong * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      z % 1000001L
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.replaceAll("\\s+", " ").split(" ").toSeq)
    val perDoc = docs.map { case (id, toks) =>
      val margins = toks.map { t =>
        val hv = h(t)
        val sgn = 1L - 2L * ((hv / 64L) % 2L)
        sgn * w((hv % 64L).toInt)
      }
      (id, toks.length.toLong, margins.sum)
    }.sortBy(_._1)
    def p(r: (Long, Long, Long)) =
      (r._2 > 0, r._3 > 0, r._3 * 20 >= r._2 * 1000000L)
    val expectDocs = perDoc.map { r =>
      val (p1, p2, p3) = p(r)
      (r._1, r._2, r._3, p1 && p2 && p3)
    }
    val fam = q("classifier_filter").collect()
    val gotDocs = fam.filter(_.getString(0) == "doc")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)
    gotDocs shouldEqual expectDocs.toSeq
    // funnel arithmetic off the same per-doc frame
    val s0 = perDoc.length.toLong
    val s1 = perDoc.count(r => p(r)._1).toLong
    val s2 = perDoc.count(r => p(r)._1 && p(r)._2).toLong
    val s3 = perDoc.count(r => { val (a, b, c) = p(r); a && b && c }).toLong
    val gotStages = fam.filter(_.getString(0) == "stage")
      .map(r => (r.getInt(5), r.getString(6), r.getLong(7), r.getLong(8),
        r.getLong(9))).toSeq.sortBy(_._1)
    gotStages shouldEqual Seq(
      (1, "has_tokens", s0, s0 - s1, s1),
      (2, "margin_positive", s1, s1 - s2, s2),
      (3, "margin_strong", s2, s2 - s3, s3))
    // non-vacuous: the margin gates genuinely split the corpus (some
    // docs fail each scored stage, some survive the whole funnel)
    assert(s2 > 0 && s2 < s1)
    assert(s3 > 0 && s3 < s2)
  }

  test("edit_distance_pairs matches a plain-Scala banding + Levenshtein DP") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(14), 16) % 1000000007L
    val Mod = 1000000007L
    val A = (0 until 16).map(i => (2L * i + 1) * 104729L % Mod)
    val B = (0 until 16).map(i => (i + 1) * 7919L % Mod)
    def lev(a: String, b: String): Long = {
      val prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j), prev(j - 1)) + 1,
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = t
        }
      }
      prev(b.length).toLong
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.replaceAll("\\s+", " "))
    // oracle-parity precondition: Spark levenshtein counts codepoints,
    // DuckDB counts UTF-8 bytes — identical ONLY on ASCII. Pin it so a
    // regenerated multilingual corpus fails here, not in a hash diff.
    docs.foreach { case (id, t) =>
      assert(t.forall(_ < 128), s"doc $id has non-ASCII text; the " +
        "edit_distance_pairs oracle compare is only valid on ASCII")
    }
    val shingles = docs.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    // the SAME 16-hash signatures / 4x4 banding as minhash_lsh
    val sigs = shingles.map { case (id, ss) =>
      val hs = ss.toSeq.map(h)
      id -> (0 until 16).map(i => hs.map(x => (A(i) * x + B(i)) % Mod).min)
    }
    val cand = sigs.flatMap { case (id, sig) =>
      (0 until 4).map(b =>
        (b, (0 until 4).map(r => sig(b * 4 + r)).mkString("-")) -> id)
    }.groupMap(_._1)(_._2).values.flatMap { ids =>
      val srt = ids.distinct.sorted
      for (i <- srt.indices; j <- (i + 1) until srt.size) yield (srt(i), srt(j))
    }.toSet
    val txt = docs.toMap
    val expected = cand.toSeq.sorted.flatMap { case (d1, d2) =>
      val (t1, t2) = (txt(d1), txt(d2))
      val (l1, l2) = (t1.length.toLong, t2.length.toLong)
      val maxlen = math.max(l1, l2)
      // Gravano length filter BEFORE the DP, then the exact sim gate
      if (maxlen > 0 && math.abs(l1 - l2) * 5 <= maxlen) {
        val dist = lev(t1, t2)
        if ((maxlen - dist) * 5 >= maxlen * 4)
          Some((d1, d2, l1, l2, dist, (maxlen - dist) * 1000000L / maxlen))
        else None
      } else None
    }
    val got = q("edit_distance_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldEqual expected
    assert(got.nonEmpty)
    got.foreach { case (_, _, l1, l2, dist, sim) =>
      // dist >= |len1 - len2| (every indel moves length by 1) — the
      // inequality that makes the pre-DP length filter SOUND
      assert(dist >= math.abs(l1 - l2))
      assert(sim >= 800000L && sim <= 1000000L)
    }
  }
}
