package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** Round-12 session-4 additions: t21 hashed-feature classifier (and the
  * ops that build on it). Each test replays the statistic with an
  * independent in-memory Scala fold so the spec is its own oracle. */
class ClassifierCurriculumSpec extends SparkSpec {

  private def md5Long60(sb: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def weight(h: Long): Long =
    h % 4096 * 2654435761L % 2147483648L - 1073741824L

  test("t21: score matches an in-memory hashed-feature replay") {
    val got = TextQueries.t21_quality_classifier(spark, sf())
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1).toSeq
      val feats = w ++ w.zip(w.drop(1)).map { case (a, b) => s"${a}_$b" }
      val num = feats.map(f => weight(md5Long60(f))).sum
      val exp = (feats.size.toLong, num, num / feats.size,
        if (num >= 0) 1L else 0L)
      assert(got(id) === exp, s"doc $id")
    }
    // the model must actually discriminate: both classes present
    assert(got.values.exists(_._4 == 0L) && got.values.exists(_._4 == 1L))
  }

  test("c07: per-class P/R/F1 match an in-memory confusion-matrix replay") {
    val preds = TextQueries.t02_langid(spark, sf())
      .select("actual_lang", "pred_lang")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val classes = (preds.map(_._1) ++ preds.map(_._2)).distinct.sorted
    val exp = classes.map { c =>
      val tp = preds.count { case (a, p) => a == c && p == c }.toLong
      val fp = preds.count { case (a, p) => p == c && a != c }.toLong
      val fn = preds.count { case (a, p) => a == c && p != c }.toLong
      val sup = tp + fn
      (c, (sup, tp, fp, fn,
        if (tp + fp == 0) 0L else tp * 1000000L / (tp + fp),
        if (sup == 0) 0L else tp * 1000000L / sup,
        if (tp * 2 + fp + fn == 0) 0L
        else tp * 2000000L / (tp * 2 + fp + fn)))
    }.toMap
    val got = ClusterQueries.c07_langid_eval(spark, sf())
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    classes.foreach(c => assert(got(c) === exp(c), s"class $c"))
    val n = classes.size
    assert(got("~macro")._5 === exp.values.map(_._5).sum / n)
    assert(got("~macro")._7 === exp.values.map(_._7).sum / n)
    assert(got.size === n + 1)
  }

  test("t22: learned merge table matches an in-memory 4-round BPE replay") {
    val words = Tables.documents(spark, sf())
      .selectExpr("text").collect().flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
    var segs = words.map { case (w, c) =>
      (" " + w.split("").mkString(" ") + " ", c) }.toSeq
    val exp = (1 to 4).map { _ =>
      val pc = segs.flatMap { case (seg, c) =>
        val sy = seg.trim.split(" ").toSeq
        sy.zip(sy.drop(1)).map(p => (p, c))
      }.groupBy(_._1).map { case (p, rows) => (p, rows.map(_._2).sum) }
      val ((l, r), n) = pc.minBy { case ((l, r), n) => (-n, l, r) }
      segs = segs.map { case (seg, c) =>
        (seg.replace(s" $l $r ", s" $l$r "), c) }
      (l, r, l + r, n)
    }
    val got = TextQueries.t22_bpe_train(spark, sf())
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got === exp)
    // the loop must actually cascade: round-2+ recounts see merged
    // symbols (pair counts strictly decrease or symbols lengthen)
    assert(exp.map(_._4).zip(exp.tail.map(_._4)).forall { case (a, b) => a >= b } ||
      exp.exists(m => m._1.length > 1 || m._2.length > 1))
  }

  test("p20: pacing schedule matches an in-memory tercile + gate replay") {
    val docs = Tables.documents(spark, sf())
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      val nTok = w.length.toLong
      val diff = if (nTok == 0) 0L else w.map(_.length.toLong).sum * 1000000L / nTok
      (id, nTok, diff)
    }
    val n = scored.length.toLong
    val ranked = scored.sortBy { case (id, _, d) => (d, id) }.zipWithIndex
      .map { case ((id, nTok, _), i) => (id, nTok, i.toLong * 3 / n) }
    val pace = Map(1L -> Seq(100L, 50L, 20L), 2L -> Seq(60L, 100L, 60L),
      3L -> Seq(20L, 50L, 100L))
    val exp = (for {
      (id, nTok, ter) <- ranked
      e <- 1L to 3L
    } yield {
      val gate = md5Long60(s"$id:$e") % 100
      (e, ter, gate < pace(e)(ter.toInt), nTok, id)
    }).groupBy { case (e, ter, _, _, _) => (e, ter) }
      .map { case (k, rows) =>
        (k, (rows.size.toLong,
          rows.count(_._3).toLong,
          rows.filter(_._3).map(_._4).sum,
          rows.filter(_._3).map(_._5).sum))
      }
    val got = PipelineQueries.p20_curriculum(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === exp)
    // pacing must bite: epoch 1 samples more of tercile 0 than tercile 2
    assert(got((1L, 0L))._2 * got((1L, 2L))._1 >
      got((1L, 2L))._2 * got((1L, 0L))._1)
  }

  test("d21: island merge covers exactly the shared character runs") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_d21").toString
    val run1 = "ABCDEFGHIJKLMNOPQRSTUVWXY" // 25 chars, shared by docs 1+2
    val run2 = "0123456789012345678901234" // 25 chars, shared by docs 1+3
    val docs = Seq(
      (1L, "aaaa" + run1 + "bbbb" + run2 + "eeee"),
      (2L, "cccc" + run1 + "dddd"),
      (3L, "ffff" + run2 + "gggg"),
      (4L, "hhhh unique text that appears nowhere else at all hh"))
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = DedupQueries.d21_substring_spans(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    // doc 1: two disjoint 25-char islands -> 6 matched grams each, 50 covered
    assert(got(1L) === ((12L, 50L)))
    assert(got(2L) === ((6L, 25L)))
    assert(got(3L) === ((6L, 25L)))
    assert(got(4L) === ((0L, 0L)))
  }

  test("c08: NDCG matches an in-memory graded replay and is properly bounded") {
    val qterms = TextQueries.bm25QueryTerms
    val docs = Tables.documents(spark, sf())
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val disc = (1 to 10).map(i =>
      math.floor(1048576.0 / (math.log(i + 1) / math.log(2))).toLong)
    def gain(r: Long): Long = (1L << r) - 1L
    val rel = (for {
      (qid, term) <- qterms
      (did, toks) <- docs
      tf = toks.count(_ == term) if tf > 0
    } yield ((qid, did), tf.toLong))
      .groupBy(_._1).map { case (k, v) => (k, math.min(v.map(_._2).sum, 20L)) }
    val ranked = TextQueries.t16_bm25_topk(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expDcg = ranked.filter(_._2 <= 10)
      .groupBy(_._1).map { case (q, rows) =>
        (q, rows.map { case (_, rk, did) =>
          gain(rel((q, did))) * disc(rk.toInt - 1) }.sum)
      }
    val expIdcg = rel.groupBy(_._1._1).map { case (q, rs) =>
      (q, rs.toSeq.map { case ((_, did), g) => (g, did) }
        .sortBy { case (g, did) => (-g, did) }.take(10).zipWithIndex
        .map { case ((g, _), i) => gain(g) * disc(i) }.sum)
    }
    val got = ClusterQueries.c08_ndcg_eval(spark, sf())
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    expDcg.keys.foreach { q =>
      assert(got(q) === ((expDcg(q), expIdcg(q),
        expDcg(q) * 1000000L / expIdcg(q))), s"query $q")
    }
    assert(got.values.forall(v => v._3 > 0 && v._3 <= 1000000L))
  }

  test("d22: exactly one kept member per component, the best-scored one") {
    val rows = DedupQueries.d22_cluster_keep_best(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val nDocs = Tables.documents(spark, sf()).count()
    assert(rows.length.toLong === nDocs) // full manifest, singletons included
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.count(_._5 == 1L) === 1, s"comp $comp")
      val kept = members.find(_._5 == 1L).get
      // kept member is max by (score, then min doc_id)
      val best = members.minBy(m => (-m._4, m._1))
      assert(kept._1 === best._1, s"comp $comp")
      assert(members.forall(_._3 === members.length.toLong))
    }
    // matches d14's clustering on the clustered subset
    val d14 = DedupQueries.d14_dedup_components(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.filter(r => d14.contains(r._1))
      .foreach(r => assert(r._2 === d14(r._1), s"doc ${r._1}"))
    assert(rows.exists(_._3 > 1L)) // at least one real cluster exercised
  }

  test("t21: single-token and empty-ish docs produce no bigrams") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t21").toString
    Seq((1L, "solo", "en", "src0", 4L), (2L, "", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextQueries.t21_quality_classifier(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // one unigram each (split('') = ['']), zero bigrams
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }
}
