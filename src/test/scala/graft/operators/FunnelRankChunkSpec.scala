package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Round-11 additions: q53 funnel, p16 chunking, p17 PageRank, t18
  * TF-IDF keywords, d19 edit-distance verify. Each is re-derived here
  * independently (in-memory Scala fold over the raw tables) so the spec
  * is an oracle of its own, not a snapshot of the implementation. */
class FunnelRankChunkSpec extends SparkSpec {

  test("q53: stage histogram matches an in-memory strict-order replay") {
    val got = RelationalQueries.q53_funnel(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val events = Tables.events(spark, sf())
      .select("user_id", "event_type", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perUser = events.groupBy(_._1).map { case (_, es) =>
      val t1 = es.collect { case (_, "view", t) => t }
        .reduceOption(_ min _)
      val t2 = t1.flatMap(a => es.collect {
        case (_, "click", t) if t > a => t }.reduceOption(_ min _))
      val t3 = t2.flatMap(b => es.collect {
        case (_, "purchase", t) if t > b => t }.reduceOption(_ min _))
      (t1, t2, t3)
    }.toSeq
    val expected = perUser
      .groupBy { case (t1, t2, t3) =>
        if (t3.isDefined) 3L else if (t2.isDefined) 2L
        else if (t1.isDefined) 1L else 0L }
      .map { case (st, us) =>
        (st, us.length.toLong,
          if (st == 3L) us.map(u => u._3.get - u._1.get).sum else 0L) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == expected)
    // stages must be strictly ordered: a click BEFORE the first view
    // never advances the funnel — replay guarantees it, and the engine
    // result equals the replay, so count a degenerate case explicitly
    assert(got.map(_._2).sum == perUser.length)
  }

  test("q53: the three window milestones share one user_id exchange") {
    val plan = RelationalQueries.q53_funnel(spark, sf())
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    // user_id (reused by all 3 Windows + the user groupBy) and the
    // 4-row stage groupBy — anything more means a milestone re-shuffled
    assert(hashExchanges <= 2, s"unexpected exchanges:\n$plan")
  }

  test("p16: chunks tile each doc with stride 24, width <= 32, exact text") {
    val got = PipelineQueries.p16_chunking(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      (0 until toks.length by 24).map { st =>
        val chunk = toks.slice(st, st + 32)
        (id, st.toLong / 24, st.toLong, chunk.length.toLong,
          chunk.mkString(" "))
      }
    }.sortBy(c => (c._1, c._2))
    assert(got.toSeq == expected.toSeq)
    // overlap invariant: consecutive chunks of one doc share 8 token
    // positions (except a short tail)
    expected.groupBy(_._1).values.foreach { cs =>
      cs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + 24)
          if (a._4 == 32) assert(a._3 + a._4 - b._3 == 8)
        case _ =>
      }
    }
  }

  test("p17: ranks match an in-memory fixed-point iteration; mass conserved") {
    val got = PipelineQueries.p17_pagerank(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = got.length.toLong
    assert(n > 0)
    val Scale = 1000000000000L
    val edges = (0L until n).flatMap { d =>
      Seq((d * 31 + 7) % n, (d * 17 + 3) % n, (d * 13 + 11) % n,
        (d + 1) % n)
        .map(t => if (t == d) (t + 1) % n else t)
        .distinct.map(t => (d, t))
    }
    val outdeg = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.length }
    val base = 15L * Scale / (100L * n)
    var rank = Array.fill(n.toInt)(Scale / n)
    for (_ <- 1 to 6) {
      val contrib = Array.fill(n.toInt)(0L)
      edges.foreach { case (s0, d0) =>
        contrib(d0.toInt) += rank(s0.toInt) / outdeg(s0) }
      rank = contrib.map(c => base + 85L * c / 100L)
    }
    assert(got.toSeq == (0L until n).map(d => (d, rank(d.toInt))))
    // total mass stays within integer-truncation loss of 1.0
    val mass = rank.sum
    assert(mass <= Scale && mass > Scale - n * 200L)
    // the iteration actually discriminates (not a uniform fixpoint)
    assert(rank.distinct.length > 1)
  }

  test("t18: top-3 terms per doc by tf*N/df with term tiebreak, len >= 4") {
    val got = TextQueries.t18_tfidf_keywords(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)
        .filter(_.length >= 4).toSeq))
    val nDocs = docs.length.toLong
    val tf = docs.flatMap { case (id, tk) =>
      tk.groupBy(identity).map { case (t, xs) => (id, t, xs.length.toLong) } }
    val dfm = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val expected = tf.groupBy(_._1).toSeq.flatMap { case (id, ts) =>
      ts.map { case (_, t, f) => (t, (f * nDocs).toDouble / dfm(t)) }
        .sortBy { case (t, sc) => (-sc, t) }
        .take(3).zipWithIndex
        .map { case ((t, sc), i) => (id, i + 1L, t, sc) }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
    assert(got.forall(_._3.length >= 4))
  }

  test("p18: capped BFS distances match an in-memory frontier expansion") {
    val got = PipelineQueries.p18_bfs_hops(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables.documents(spark, sf()).count()
    val adj = (0L until n).map { d =>
      d -> Seq((d * 31 + 7) % n, (d * 17 + 3) % n, (d * 13 + 11) % n,
        (d + 1) % n).map(t => if (t == d) (t + 1) % n else t).distinct
    }.toMap
    val dist = scala.collection.mutable.Map[Long, Long]()
    var frontier = (0L until n).filter(_ % 97 == 0).toSet
    frontier.foreach(dist(_) = 0L)
    for (k <- 1L to 8L) {
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      frontier.foreach(dist(_) = k)
    }
    assert(got.toSeq == dist.toSeq.sortBy(_._1))
    assert(got.exists(_._2 == 8L) || got.length == n.toInt)
  }

  test("q54: the streaming funnel converges to the batch q53 answer") {
    val batch = RelationalQueries.q53_funnel(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val stream = StreamQueries.q54_stream_funnel(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stream.toSeq == batch.toSeq)
  }

  test("s12: in-cell kNN graph matches an in-memory top-3 per vector") {
    val got = SimilarityQueries.s12_knn_join(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val vecs = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { s0 += a(i) * b(i); i += 1 }
      s0
    }
    val expected = vecs.groupBy(_._2).values.flatMap { cell =>
      val nz = cell.toSeq
        .map { case (id, _, a) => (id, a, math.sqrt(dot(a, a))) }
        .filter(_._3 > 0.0)
      nz.flatMap { case (id, a, na) =>
        nz.filter(_._1 != id)
          .map { case (jd, b, nb) =>
            (jd, math.floor(dot(a, b) / (na * nb) * 1e9).toLong) }
          .sortBy { case (jd, c) => (-c, jd) }
          .take(3).zipWithIndex
          .map { case ((jd, c), i) => (id, i + 1L, jd, c) }
      }
    }.toSeq.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
  }

  test("q55: chi-square drift cells replayed exactly in BigInt") {
    val got = RelationalQueries.q55_drift_chi2(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val evs = Tables.events(spark, sf())
      .select("ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val lo = evs.map(_._1).min; val hi = evs.map(_._1).max
    val mid = lo + (hi - lo) / 2
    val cells = evs.groupBy(e =>
        (e._2, math.min(math.floor(e._3).toLong / 32, 15L)))
      .map { case ((et, b), es) =>
        (et, b, es.count(_._1 <= mid).toLong, es.count(_._1 > mid).toLong) }
      .toSeq
    val tots = cells.groupBy(_._1).map { case (et, cs) =>
      et -> (cs.map(_._3).sum, cs.map(_._4).sum) }
    val expected = cells.map { case (et, b, n1, n2) =>
      val (tn1, tn2) = tots(et)
      val chi = if (tn1 == 0 || tn2 == 0) None else {
        val diff = BigInt(n1) * tn2 - BigInt(n2) * tn1
        Some((diff * diff * 1000000 / (BigInt(tn1) * tn2 * (n1 + n2)))
          .toLong)
      }
      (et, b, n1, n2, chi)
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
    // drift exists between the halves but every cell is populated-ish
    assert(got.map(_._3).sum > 0 && got.map(_._4).sum > 0)
  }

  test("d20: clusters respect mutual-kNN edges and cover every vector") {
    val knn = SimilarityQueries.s12_knn_join(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val knnSet = knn.toSet
    val mutual = knn.filter { case (u, v) => u < v && knnSet.contains((v, u)) }
    val clusters = SimilarityQueries.d20_knn_clusters(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lbl = clusters.map(c => c._1 -> c._2).toMap
    // every vector labeled exactly once
    assert(clusters.length ==
      graft.core.Tables.embeddings(spark, sf()).count())
    // mutual edges land in one cluster; the label is the component min
    mutual.foreach { case (u, v) => assert(lbl(u) == lbl(v)) }
    clusters.groupBy(_._2).foreach { case (c, ms) =>
      assert(ms.map(_._1).min == c)
      assert(ms.forall(_._3 == ms.length))
    }
    // mutuality actually prunes: some one-directional edges exist, and
    // at least one real (size > 1) cluster forms
    assert(mutual.nonEmpty && mutual.length < knn.length)
    assert(clusters.exists(_._3 > 1))
  }

  test("q56: retention cells match an in-memory cohort replay") {
    val got = RelationalQueries.q56_cohort_retention(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val evs = Tables.events(spark, sf()).select("user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = evs.map(_._2).min
    val active = evs.map { case (u, t) =>
      (u, (t - lo) / 86400000000000L) }.distinct
    val firsts = active.groupBy(_._1).map { case (u, ds) =>
      u -> ds.map(_._2).min }
    val sizes = firsts.values.groupBy(identity).map { case (c, xs) =>
      c -> xs.size.toLong }
    val expected = active.groupBy { case (u, d) => (firsts(u), d) }
      .map { case ((c, d), xs) =>
        val n = xs.size.toLong
        (c, d - c, n, sizes(c), n * 1000000L / sizes(c)) }
      .toSeq.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
    // day-0 retention is 100% for every cohort by definition
    got.filter(_._2 == 0L).foreach(x => assert(x._5 == 1000000L))
  }

  test("q58: transition matrix matches replay; windows share one exchange") {
    val df = RelationalQueries.q58_session_paths(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      s"session windows re-shuffled:\n$plan")
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val evs = Tables.events(spark, sf())
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      sorted.zip(sorted.drop(1)).collect {
        case (a, b) if b._4 - a._4 <= 1800L * 1000000000L => (a._3, b._3)
      }
    }.groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.size.toLong) }
      .toSeq.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected)
  }

  test("t19: LUT entropy hits exact values on crafted distributions") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t19").toString
    Seq(
      (0L, "aaaaaaaa", "en", "web", 8L),     // 0 bits/char
      (1L, "abababab", "en", "web", 8L),     // exactly 1 bit/char
      (2L, "abcdabcd", "en", "web", 8L),     // exactly 2 bits/char
      (3L, "abcdefgh", "en", "web", 8L))     // exactly 3 bits/char
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextQueries.t19_char_entropy(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // powers of two: the LUT entries are exact, so entropy is exact
    assert(got.toSeq == Seq(
      (0L, 1L, 0L), (1L, 2L, 1048576L),
      (2L, 4L, 2097152L), (3L, 8L, 3145728L)))
  }

  test("d19: anchored candidates + Levenshtein threshold replayed exactly") {
    val got = DedupQueries.d19_editdist(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty) // the corpus does contain near-identical docs
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = t
        }
      }
      prev(b.length)
    }
    def anchors(t: String) = Seq(
      (0, t.take(32)), (1, t.substring(math.max(t.length - 32, 0))))
    val byAnchor = docs.flatMap { case (id, t) =>
      anchors(t).map { case (k, a) => ((k, a), (id, t)) } }
      .groupBy(_._1).values
    val expected = byAnchor.flatMap { g =>
      val ds = g.map(_._2).toSeq
      for {
        (ia, ta) <- ds; (ib, tb) <- ds
        if ia < ib && math.abs(ta.length - tb.length) <= 40
      } yield (ia, ib, ta, tb)
    }.toSeq.distinct
      .map { case (ia, ib, ta, tb) => (ia, ib, lev(ta, tb).toLong,
        math.max(ta.length, tb.length)) }
      .collect { case (ia, ib, d, mx) if d * 5 <= mx => (ia, ib, d) }
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq == expected)
  }
}
