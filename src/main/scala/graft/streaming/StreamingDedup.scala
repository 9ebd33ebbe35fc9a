package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}
import graft.functions.TextFunctions

/** Incremental (streaming) dedup — the online counterpart of the batch
  * d01/d03 pipeline, for ingest-time filtering of a training corpus.
  * The reference's only ingest mechanism is chunked prepared inserts
  * (tot_run/curr_run, oph_io_server_thread.h:60-66); these operators are
  * the Structured-Streaming upgrade of that path.
  *
  * Scale shape: all state is partitioned by key (content hash / band
  * bucket), so state shards across executors exactly like a shuffle —
  * no global structure, no driver state. At 100 TB the band-bucket
  * cardinality is ~#docs×bands, each bucket holding only its own
  * signatures; RocksDB state store handles the footprint.
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String)
  /** First-seen doc per content hash is kept; later arrivals point at it. */
  final case class ExactDecision(doc_id: Long, kept: Boolean, dup_of: Long)
  /** Near-dup candidate surfaced by a shared LSH band bucket. */
  final case class Candidate(doc_a: Long, doc_b: Long, est: Double)

  /** Exact streaming dedup: key = 60-bit md5 of the full text, state =
    * the first doc_id seen. Emits one decision per arriving doc. */
  def dedupExactStream(docs: DataFrame): Dataset[ExactDecision] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id").cast("long"),
        TextFunctions.md5Long60(col("text")).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, ExactDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long)], st: GroupState[Long]) =>
          // first-seen wins; ties inside one batch resolve by lowest id
          // so the result is independent of partition arrival order
          val ids = rows.map(_._1).toSeq.sorted
          val prior = st.getOption
          val keeper = prior.getOrElse(ids.head)
          if (prior.isEmpty) st.update(keeper)
          ids.iterator.map(id =>
            ExactDecision(id, kept = prior.isEmpty && id == keeper, dup_of = keeper))
      }
  }

  /** Streaming MinHash/LSH near-dup candidates: each doc fans out to
    * `bands` band buckets; per-bucket state keeps (doc_id, signature) of
    * everything seen; a new arrival emits a candidate pair for every
    * stored signature whose estimated Jaccard ≥ `minEst`. Downstream
    * (batch or foreachBatch) unions bands and exact-verifies — the same
    * sketch→verify cascade as batch d03.
    *
    * Hot buckets are BOUNDED, mirroring the batch family's
    * [[graft.operators.DedupQueries]] salted cap: per-bucket state stores
    * at most `bucketCap` signatures. Arrivals into a full bucket still
    * PROBE the stored cap (pairs against early members are kept) but are
    * not stored, so a degenerate stream of near-identical docs costs
    * O(cap) per arrival and O(cap) state instead of re-creating the
    * quadratic bucket inside one batch — a bounded recall loss counted on
    * `overflow` (a driver-visible accumulator), never silent. */
  def nearDupCandidateStream(docs: DataFrame, k: Int = 16, bands: Int = 2,
      minEst: Double = 0.5, bucketCap: Int = 2048,
      overflow: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    val rowsPerBand = k / bands
    val sig = TextFunctions.minhashSignature(col("text"), k)
    docs
      .select(col("doc_id").cast("long"), sig.as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(array((0 until bands).map { b =>
          concat_ws("_",
            (lit(b) +: (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1))): _*)
        }: _*)).as("band_key"))
      .as[(Long, Seq[Long], String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, Seq[Long], String)],
         st: GroupState[Seq[(Long, Seq[Long])]]) =>
          var seen = st.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[Candidate]
          // in-batch determinism: process in doc_id order
          rows.toSeq.sortBy(_._1).foreach { case (docId, docSig, _) =>
            seen.foreach { case (oldId, oldSig) =>
              if (oldId != docId) {
                val matches = oldSig.iterator.zip(docSig.iterator)
                  .count { case (a, b) => a == b }
                val est = matches.toDouble / oldSig.length
                if (est >= minEst)
                  out += Candidate(math.min(oldId, docId),
                    math.max(oldId, docId), est)
              }
            }
            if (seen.length < bucketCap) seen :+= (docId, docSig)
            else overflow.foreach(_.add(1L))
          }
          st.update(seen)
          out.result().iterator
      }
  }
}
