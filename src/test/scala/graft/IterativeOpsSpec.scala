package graft

/** Independent reference implementations (plain Scala, no Spark) of the
  * two iterative operators, compared EXACTLY against the registered
  * queries at sf0.001 — a third implementation alongside the Spark plan
  * and the DuckDB oracle, so a shared misreading of the algorithm can't
  * slip through two engines that were written to mirror each other. */
class IterativeOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Scale = 1000000000000L

  test("link_pagerank matches a plain-Scala fixed-point power iteration") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    val ids = docIds.toSet
    // same derived graph: 3 hash targets per non-sink doc (may include
    // self-loops); every 7th doc is a SINK with no outbound edges
    val edges = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .filter { case (_, dst) => ids.contains(dst) }
    var r = docIds.map(d => d -> Scale / n).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupMapReduce(_._2)(e => r(e._1) / 3)(_ + _)
      val dmass = docIds.filter(_ % 7 == 0).map(r).sum
      r = docIds.map(d =>
        d -> ((Scale / n) * 15 / 100
          + (contrib.getOrElse(d, 0L) + dmass / n) * 85 / 100)).toMap
    }
    val got = SparkEntry.queries("link_pagerank")(spark, sf)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    got shouldEqual r
    // Σrank is CONSERVED up to truncation dust: every fixed-point div
    // drops < 1 unit (of 1e-12) per row/edge, so three iterations lose
    // at most ~6n units each — nothing like the ~0.85·|sinks|/n ≈ 12%
    // per round that vanishes without the dangling-mass term.
    val total = r.values.sum
    val dustBound = 6L * n * 3
    total should be <= Scale
    total should be >= (Scale - dustBound)
  }

  test("link_hits matches a plain-Scala mutual-reinforcement iteration") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    val ids = docIds.toSet
    val edges = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .filter { case (_, dst) => ids.contains(dst) }
    val F = 1000000L
    def normalize(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.view.mapValues(v => v * F / mx).toMap
    }
    var a = docIds.map(_ -> F).toMap
    var h = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      h = normalize(docIds.map(d => d ->
        edges.collect { case (s0, t) if s0 == d => a(t) }.sum).toMap)
      a = normalize(docIds.map(d => d ->
        edges.collect { case (s0, t) if t == d => h(s0) }.sum).toMap)
    }
    val got = SparkEntry.queries("link_hits")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldEqual docIds.map(d => d -> ((h(d), a(d)))).toMap
    // sinks exist and carry hub 0; the max-normalized scores peak at 1e6
    assert(got.values.exists(_._1 == 0L))
    got.values.map(_._1).max shouldEqual F
    got.values.map(_._2).max shouldEqual F
  }

  test("link_triangles matches a naive all-triples triangle count") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    // same derived graph as pagerank, undirected + deduped, no loops
    val und = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = (und ++ und.map(_.swap)).groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    // naive: for every edge (a,b), triangles through it are the common
    // neighbors; each triangle counted once per corner, then /3... —
    // count per NODE directly: pairs of its neighbors that are adjacent
    val triPerNode = adj.map { case (v, ns) =>
      val s = ns.toSeq.sorted
      v -> (for {
        i <- s.indices; j <- i + 1 until s.length
        if adj(s(i)).contains(s(j))
      } yield 1).size.toLong
    }
    val got = SparkEntry.queries("link_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got.keySet shouldEqual deg.keySet
    got.foreach { case (node, (degree, nTri, ccFx)) =>
      degree shouldEqual deg(node)
      nTri shouldEqual triPerNode(node)
      val expFx = if (degree >= 2) 2 * nTri * 1000000L / (degree * (degree - 1)) else 0L
      ccFx shouldEqual expFx
    }
    // the synthesized graph actually has triangles — the closure join
    // is exercised, not vacuously empty
    assert(got.values.map(_._2).sum > 0)
    // Σ per-node counts = 3 × (number of distinct triangles)
    got.values.map(_._2).sum % 3 shouldEqual 0L
  }

  test("kmeans_centroids matches a plain-Scala Lloyd iteration") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(row => row.getLong(0) ->
        row.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e7).toLong).toArray)
      .sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / math.sqrt(dot(a, a).toDouble * dot(b, b).toDouble)
    def assign(cents: Map[Long, Array[Long]]): Map[Long, Long] =
      vecs.map { case (id, qe) =>
        // max cosine, ties to the lowest cluster id — minBy keeps the
        // FIRST minimum in iteration order, matching row_number's tiebreak
        id -> cents.toSeq.sortBy(_._1).minBy { case (_, ce) => -cos(qe, ce) }._1
      }.toMap
    val qById = vecs.toMap
    def update(a: Map[Long, Long]): Map[Long, Array[Long]] =
      a.groupBy(_._2).map { case (c, members) =>
        val qs = members.keys.toSeq.map(qById)
        c -> Array.tabulate(64)(i =>
          math.floor(qs.map(_(i)).sum.toDouble / qs.size).toLong)
      }
    val c0 = vecs.filter(_._1 < 8).map { case (id, qe) => id -> qe }.toMap
    val a1 = assign(c0)
    val c1 = update(a1)
    val a2 = assign(c1)
    val c2 = update(a2)
    val counts = a2.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("kmeans_centroids")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val want = c2.toSeq.flatMap { case (c, arr) =>
      arr.zipWithIndex.map { case (v, pos) => (c, pos) -> ((v, counts(c))) }
    }.toMap
    got shouldEqual want
  }

  test("pq_error matches a plain-Scala per-subspace Lloyd PQ") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(row => row.getLong(0) ->
        row.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e7).toLong).toArray)
      .sortBy(_._1)
    val sd = 16
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (0 until 4).flatMap { s =>
      val subs = vecs.map { case (id, qe) => id -> qe.slice(s * sd, (s + 1) * sd) }
      def assign(cents: Map[Long, Array[Long]]): Seq[(Long, Long, Long)] =
        subs.map { case (id, sv) =>
          // min squared-L2, ties to the lowest cluster id
          val (c, dist) = cents.toSeq.map { case (cid, ce) => (cid, d2(sv, ce)) }
            .minBy { case (cid, dist) => (dist, cid) }
          (id, c, dist)
        }.toSeq
      val seeds = subs.filter(_._1 < 8).toMap
      val byId = subs.toMap
      val c1 = assign(seeds).groupBy(_._2).map { case (c, members) =>
        val svs = members.map(m => byId(m._1))
        c -> Array.tabulate(sd)(i =>
          math.floor(svs.map(_(i)).sum.toDouble / svs.size).toLong)
      }
      assign(c1).map { case (id, c, dist) => (id, s.toLong, c, dist) }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("pq_error")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldEqual expected
    // compression is non-trivial: codes spread beyond one centroid per
    // subspace and reconstruction error is nonzero somewhere
    assert(got.map(r => (r._2, r._3)).distinct.size > 4)
    assert(got.exists(_._4 > 0L))
  }

  test("semantic_dedup matches a plain-Scala cluster-then-pair reference") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(row => row.getLong(0) ->
        row.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e7).toLong).toArray)
      .sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / math.sqrt(dot(a, a).toDouble * dot(b, b).toDouble)
    def assign(cents: Map[Long, Array[Long]]): Map[Long, Long] =
      vecs.map { case (id, qe) =>
        id -> cents.toSeq.sortBy(_._1).minBy { case (_, ce) => -cos(qe, ce) }._1
      }.toMap
    val qById = vecs.toMap
    def update(a: Map[Long, Long]): Map[Long, Array[Long]] =
      a.groupBy(_._2).map { case (c, members) =>
        val qs = members.keys.toSeq.map(qById)
        c -> Array.tabulate(64)(i =>
          math.floor(qs.map(_(i)).sum.toDouble / qs.size).toLong)
      }
    val c0 = vecs.filter(_._1 < 8).map { case (id, qe) => id -> qe }.toMap
    val c2 = update(assign(update(assign(c0))))
    val a3 = assign(c2)
    // within-cluster pairs at cosine >= 0.45; keep the EARLIEST
    // qualifying neighbor per dropped vector
    val expected = vecs.flatMap { case (v, qv) =>
      val earlier = vecs.filter { case (u, _) => u < v && a3(u) == a3(v) }
        .map { case (u, qu) => (u, cos(qu, qv)) }
        .filter(_._2 >= 0.45)
      if (earlier.isEmpty) None
      else {
        val (u, c) = earlier.minBy(_._1)
        Some(v -> ((a3(v), u, c)))
      }
    }.toMap
    val got = SparkEntry.queries("semantic_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    got shouldEqual expected
  }

  test("semantic_dedup fails fast past the cluster-size bound") {
    spark.conf.set(queries.SimilarityQueries.SemDedupMaxKey, "10")
    try {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("semantic_dedup")(spark, sf).collect()
      }
      e.getMessage should include("maxCluster")
    } finally spark.conf.unset(queries.SimilarityQueries.SemDedupMaxKey)
  }

  test("neighbor_features matches a plain-Scala 2-hop message pass") {
    val feats = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = feats.size
    val edges = feats.keys.toSeq.filter(_ % 7 != 0)
      .flatMap(src => (1 to 3).map(j => (src, (src * 31 + j * 97) % n)))
    val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def pass(h: Map[Long, Long]): Map[Long, Long] =
      feats.keys.map { v =>
        v -> inN.get(v).map(ns => ns.map(h).sum / ns.length).getOrElse(h(v))
      }.toMap
    val h1 = pass(feats)
    val h2 = pass(h1)
    val got = SparkEntry.queries("neighbor_features")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    got.length shouldEqual n
    got.foreach { case (v, f, indeg, g1, g2) =>
      f shouldEqual feats(v)
      indeg shouldEqual inN.get(v).map(_.length.toLong).getOrElse(0L)
      g1 shouldEqual h1(v)
      g2 shouldEqual h2(v)
    }
    // the graph actually mixes: both hops move most nodes off their
    // own raw feature, and sinks still receive messages (indeg > 0)
    assert(got.count(r => r._4 != r._2) > n / 2)
    assert(got.exists(r => r._1 % 7 == 0 && r._3 > 0))
  }

  test("embedding_gram_pca matches a plain-Scala Gram + power iteration") {
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.floor(x.toDouble * 10000).toLong))
    val d = 64
    val g = Array.ofDim[BigInt](d, d)
    for (i <- 0 until d; j <- 0 until d)
      g(i)(j) = vecs.iterator.map(v => BigInt(v(i)) * v(j)).sum
    def round(v: Array[BigInt]): (Array[BigInt], BigInt) = {
      val w = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      (w.map(x => x * 1000000 / m), m) // BigInt / truncates toward zero
    }
    val (v1, _) = round(Array.fill(d)(BigInt(1000000)))
    val (v2, m2) = round(v1)
    val got = SparkEntry.queries("embedding_gram_pca")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.map(_._1).toSeq shouldEqual (0L until 64L)
    got.map(_._2).toSeq shouldEqual v2.map(_.toLong).toSeq
    got.map(_._3).distinct.toSeq shouldEqual Seq((m2 / 1000000).toLong)
    // the iteration converged onto a real direction: successive rounds
    // agree in orientation (positive dot product) and the dominant
    // eigenvalue is strictly positive
    (v1, v2).zipped.map((a, b) => a * b).sum should be > BigInt(0)
    assert(m2 > 0)
  }

  test("label_propagation matches a plain-Scala synchronous LPA") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    // same derived simple graph: distinct undirected pairs, no self-loops
    val pairs = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj: Map[Long, Array[Long]] =
      (pairs ++ pairs.map(p => (p._2, p._1))).groupMap(_._1)(_._2)
        .view.mapValues(_.toArray).toMap
    var lab = docIds.map(d => d -> d).toMap
    for (_ <- 1 to 2) {
      val prev = lab
      lab = docIds.map { d =>
        adj.get(d) match {
          case Some(nb) =>
            // majority label among neighbors, ties to the LOWEST label
            val cnt = nb.groupMapReduce(prev)(_ => 1L)(_ + _)
            d -> cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
          case None => d -> prev(d) // isolated: keeps its own label
        }
      }.toMap
    }
    val sizes = lab.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("label_propagation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.length shouldEqual n
    got.foreach { case (d, l, sz) =>
      l shouldEqual lab(d)
      sz shouldEqual sizes(l)
    }
    // the vote actually coarsens: strictly fewer communities than nodes,
    // and at least one genuine multi-member community formed
    val nComm = lab.values.toSet.size
    assert(nComm < n)
    assert(sizes.values.max > 1)
  }

  test("link_prediction matches a plain-Scala common-neighbors/RA reference") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    val pairs = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = (pairs.toSeq ++ pairs.toSeq.map(_.swap))
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    // enumerate over the middle node exactly like the query (deg cap
    // 64 is vacuous on this graph — every degree is far below it)
    val expected = adj.toSeq.flatMap { case (z, nbrs) =>
      val srt = nbrs.toSeq.sorted
      for (i <- srt.indices; j <- (i + 1) until srt.size)
        yield ((srt(i), srt(j)), 1000000L / deg(z))
    }.groupMapReduce(_._1)(t => (1L, t._2)) { case ((c1, r1), (c2, r2)) =>
      (c1 + c2, r1 + r2)
    }.filter { case (p, (cn, _)) => cn >= 2 && !pairs.contains(p) }
      .toSeq.map { case ((a, b), (cn, ra)) => (a, b, cn, ra) }
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("link_prediction")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldEqual expected
    assert(got.nonEmpty)
    // no predicted pair is an existing edge, and RA evidence is
    // bounded by cn (each common neighbor contributes ≤ 10⁶/2 — its
    // degree is ≥ 2 by construction of a middle node)
    got.foreach { case (a, b, cn, ra) =>
      assert(!pairs.contains((a, b)))
      assert(ra <= cn * 500000L)
    }
  }

  test("anchor_text_agg matches a plain-Scala per-page anchor rollup") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = docs.length.toLong
    val byId = docs.map(d => d._1 -> d).toMap
    val anchors = Seq("About the Company", "Leadership and Management",
      "Investor Relations Overview", "Products Catalog",
      "Contact Support", "Corporate Profile")
    val links = docs.map(_._1).filter(_ % 7 != 0).flatMap { src =>
      (1 to 3).map { j =>
        val tgt = (src * 31 + j * 97) % n
        val (_, source, lang) = byId(tgt)
        val url = s"https://www.$source.example.com/$lang/p${tgt % 5}"
        (src, url, anchors(((src + j) % 6).toInt))
      }
    }
    val expected = links.groupBy(_._2).map { case (url, ls) =>
      val perAnchor = ls.groupBy(_._3).view.mapValues(_.size.toLong).toSeq
      val (topA, topN) = perAnchor.minBy { case (a, c) => (-c, a) }
      (url, ls.size.toLong, ls.map(_._1).distinct.size.toLong,
        perAnchor.size.toLong, topA, topN)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("anchor_text_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSeq
    got shouldEqual expected
    // the rollup is real fan-in: some page collects multiple distinct
    // anchors, and every emitted link is accounted for exactly once
    assert(got.exists(_._4 > 1))
    got.map(_._2).sum shouldEqual 3L * docs.count(_._1 % 7 != 0)
  }

  test("kcore_peel matches a plain-Scala simultaneous peel") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    val pairs = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = (pairs.toSeq ++ pairs.toSeq.map(_.swap))
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    var alive = docIds.toSet
    var round = Map.empty[Long, Int]
    for (r <- 1 to 6) {
      val peeled = alive.filter(v =>
        adj.getOrElse(v, Set.empty).count(alive) < 5)
      round ++= peeled.map(_ -> r)
      alive --= peeled
    }
    val rows = SparkEntry.queries("kcore_peel")(spark, sf).collect()
    val got = rows
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
    got.length shouldEqual n
    got.foreach { case (d, pr) => pr shouldEqual round.get(d) }
    // the cascade is real: every round 1..6 peels someone (a one-shot
    // degree filter would stop after round 1), and the 5-core of this
    // graph is empty — every node carries a peel round
    (1 to 6).foreach(r => assert(round.values.exists(_ == r), s"round $r empty"))
    assert(alive.isEmpty)
    // convergence certificate: nobody survived ⇒ the peel is provably
    // finished even though round 6 itself peeled the last 9 nodes
    rows.foreach(r => r.getBoolean(2) shouldBe true)
  }

  test("bfs_distances matches a plain-Scala level-synchronous BFS") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    val out: Map[Long, Seq[Long]] = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .groupMap(_._1)(_._2).view.mapValues(_.toSeq).toMap
    var dist = docIds.filter(_ < 5).map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (u, h) =>
        out.getOrElse(u, Nil).map(_ -> (h + 1)) } ++ dist.toSeq
      dist = relaxed.groupMapReduce(_._1)(_._2)(math.min)
    }
    val got = SparkEntry.queries("bfs_distances")(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    got.length shouldEqual n
    got.foreach { case (d, h) => h shouldEqual dist.get(d) }
    // the frontier genuinely expands: some node at every level 1..3,
    // and some node still unreached after 3 hops
    (1L to 3L).foreach(l => assert(dist.values.exists(_ == l)))
    assert(got.exists(_._2.isEmpty))
  }

  test("random_walks matches a plain-Scala md5-seeded walk") {
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = docIds.length.toLong
    val adj: Map[Long, Array[Long]] = docIds.filter(_ % 7 != 0)
      .flatMap(d => (1 to 3).map(j => d -> ((d * 31 + j * 97) % n)))
      .distinct.groupMap(_._1)(_._2)
      .view.mapValues(_.distinct.sorted.toArray).toMap
    def md5hex4(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(2).map(b => f"$b%02x").mkString, 16)
    }
    val expect = docIds.map { start =>
      var cur: Option[Long] = Some(start)
      val steps = (1 to 4).map { t =>
        cur = cur.flatMap(c => adj.get(c).map { nb =>
          nb((md5hex4(s"graft-walk$start|$t") % nb.length).toInt)
        })
        cur
      }
      (start, steps(0), steps(1), steps(2), steps(3))
    }
    val got = SparkEntry.queries("random_walks")(spark, sf).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getLong(0), opt(1), opt(2), opt(3), opt(4))
    }
    got.toSeq shouldEqual expect.toSeq
    // the corpus is non-degenerate: most walks complete all 4 steps,
    // and at least one walk hits a sink and truncates with nulls
    assert(got.count(_._5.isDefined) > n / 2)
    assert(got.exists(_._5.isEmpty))
  }

  test("textrank_keywords matches a plain-Scala weighted-PageRank iteration") {
    val Scale = 1000000000L
    val PFx = 1000000L
    val toksAll = Tables.documents(spark, sf)
      .select("text").collect()
      .map(_.getString(0).trim.replaceAll("\\s+", " ").split(" ").toSeq)
    // symmetric co-occurrence counts over adjacent DISTINCT tokens
    val und = toksAll
      .flatMap(ts => ts.sliding(2).filter(p => p.size == 2 && p(0) != p(1)))
      .flatMap(p => Seq((p(0), p(1)), (p(1), p(0))))
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val wdeg = und.toSeq.groupMapReduce(_._1._1)(_._2)(_ + _)
    val pFx = und.map { case ((u, v), w) => (u, v) -> w * PFx / wdeg(u) }
    val nodes = wdeg.keys.toSeq.sorted
    val nv = nodes.length.toLong
    var s = nodes.map(_ -> Scale / nv).toMap
    for (_ <- 1 to 3) {
      val contrib = pFx.toSeq
        .groupMapReduce(_._1._2) { case ((u, _), p) => s(u) * p / PFx }(_ + _)
      s = nodes.map(t =>
        t -> ((Scale / nv) * 15 / 100 + contrib.getOrElse(t, 0L) * 85 / 100)).toMap
    }
    val expected = nodes.map(t => (t, wdeg(t), s(t), s(t).toDouble / Scale))
      .sortBy(t => (-t._3, t._1)).take(10)
    val got = SparkEntry.queries("textrank_keywords")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    got shouldEqual expected
    // scores genuinely separate (the graph is not regular) and total
    // mass is conserved up to truncation dust — here the dominant dust
    // term is the ONE-TIME ×10⁶ transition-probability truncation:
    // Σ_v p_fx(u,·) undershoots PFx by up to outdeg(u), so each round
    // loses ≤ Scale·maxOutdeg/PFx mass through the probabilities, plus
    // ≤ 1 unit per edge/node div as in the link_pagerank bound
    assert(got.map(_._3).distinct.size > 1)
    val maxOutdeg = pFx.keys.toSeq.groupBy(_._1).values.map(_.size).max.toLong
    val total = s.values.sum
    total should be <= Scale
    total should be >= (Scale -
      3L * (Scale * maxOutdeg / PFx + pFx.size.toLong + 3L * nv))
  }
}
