package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {

  test("exact streaming dedup keeps first-seen doc across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamingDedup.dedupExactStream(in.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("exact_dedup").start()
    try {
      in.addData((1L, "the quick brown fox"), (2L, "something else"))
      q.processAllAvailable()
      in.addData((3L, "the quick brown fox"), (4L, "the quick brown fox"))
      q.processAllAvailable()
      val res = s.table("exact_dedup").as[StreamingDedup.ExactDecision]
        .collect().map(d => d.doc_id -> d).toMap
      assert(res(1L).kept && res(1L).dup_of == 1L)
      assert(res(2L).kept)
      // batch-2 copies both point at the batch-1 original
      assert(!res(3L).kept && res(3L).dup_of == 1L)
      assert(!res(4L).kept && res(4L).dup_of == 1L)
    } finally q.stop()
  }

  test("near-dup candidates surface across batches via shared band buckets") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val in = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupCandidateStream(
      in.toDF().toDF("doc_id", "text"), minEst = 0.5)
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("near_dedup").start()
    try {
      in.addData((1L, text), (2L, "completely unrelated content here now"))
      q.processAllAvailable()
      in.addData((3L, text)) // identical to doc 1, arrives a batch later
      q.processAllAvailable()
      val cands = s.table("near_dedup").as[StreamingDedup.Candidate].collect()
      // identical docs share every band → the (1,3) pair appears (per band,
      // possibly twice) with estimate 1.0; the unrelated doc pairs with none
      assert(cands.exists(c => c.doc_a == 1L && c.doc_b == 3L && c.est == 1.0))
      assert(!cands.exists(c => c.doc_a == 2L || c.doc_b == 2L))
    } finally q.stop()
  }

  test("degenerate batch of near-identical docs is bounded by the bucket cap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val overflow = s.sparkContext.longAccumulator("stream_dedup_overflow")
    val in = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupCandidateStream(
      in.toDF().toDF("doc_id", "text"), minEst = 0.5,
      bucketCap = 4, overflow = Some(overflow))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("near_dedup_capped").start()
    try {
      // one batch, 20 identical docs, cap 4: uncapped this is C(20,2)=190
      // pairs per band; capped, only the 4 stored members pair with later
      // arrivals -> per band C(4,2) + 16*4 = 70 pairs, and 2 bands emit
      // 140 candidate rows total. 16 arrivals/band hit a full bucket.
      in.addData((1L to 20L).map(i => (i, text)))
      q.processAllAvailable()
      val cands = s.table("near_dedup_capped").as[StreamingDedup.Candidate]
        .collect()
      assert(cands.length == 140, s"expected 140 capped candidates, got ${cands.length}")
      // early members still pair: (1,2) survives; late-late pairs dropped
      assert(cands.exists(c => c.doc_a == 1L && c.doc_b == 2L))
      assert(!cands.exists(c => c.doc_a == 5L && c.doc_b == 6L))
      // the recall loss is counted, not silent: 16 overflow arrivals/band
      assert(overflow.value == 32L, s"overflow=${overflow.value}")
    } finally q.stop()
  }

  test("near-dup state is per-bucket: no cross-bucket comparisons") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupCandidateStream(
      in.toDF().toDF("doc_id", "text"), minEst = 0.0) // report ANY co-bucketed pair
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("near_dedup_buckets").start()
    try {
      in.addData((1L, "aaa bbb ccc ddd"), (2L, "eee fff ggg hhh"))
      q.processAllAvailable()
      val cands = s.table("near_dedup_buckets").as[StreamingDedup.Candidate].collect()
      // disjoint vocabularies → different buckets → even with minEst=0
      // no pair is ever compared
      assert(cands.isEmpty)
    } finally q.stop()
  }
}
