package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, by alternating
  * large-star / small-star rounds (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC '14) — the standard shape for
  * transitive dedup-cluster closure at data-pipeline scale.
  *
  * Why not plain min-label propagation: its round count is the graph
  * DIAMETER (a 100 TB crawl's duplicate chains can be long), while
  * large-star/small-star provably converges in O(log² n) rounds — and in
  * practice a handful — with each round just two hash-partition
  * aggregations + a join, all on the edge list (never an adjacency
  * matrix, never driver state).
  *
  * Each round:
  *  - large-star: every node u links its LARGER neighbors to
  *    m = min(N(u) ∪ {u});
  *  - small-star: every node u links its smaller-or-equal neighbors and
  *    itself to m.
  * The fixpoint is a star forest: every node carries an edge to its
  * component minimum. Convergence is detected by an (edge-count,
  * hash-xor) signature of the canonicalized edge set — two cheap
  * aggregates, no driver-side edge materialization. Lineage is truncated
  * every round with localCheckpoint (on a cluster: checkpoint to a
  * reliable store) so the iterated plan stays O(1) deep.
  *
  * Reference semantics: the io-server has no graph operator; this closes
  * the transitive step its pairwise dedup output needs (see
  * DedupQueries.d07's one-step doc comment).
  */
object GraphComponents {

  /** (u, min(N(u) ∪ {u})) for every node u of the symmetric closure. */
  private def neighborhoodMin(sym: DataFrame): DataFrame =
    sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("mn"))

  /** One large-star round: (v, mn) for every neighbor v > u. */
  private def largeStar(sym: DataFrame, mins: DataFrame): DataFrame =
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("mn").as("v"))

  /** One small-star round: (v, mn) for every neighbor v < u, plus
    * (u, mn) — re-roots u and its smaller neighbors at the minimum. */
  private def smallStar(sym: DataFrame, mins: DataFrame): DataFrame =
    sym.join(mins, "u")
      .filter(col("v") < col("u"))
      .select(col("v").as("u"), col("mn").as("v"))
      .unionByName(mins.select(col("u"), col("mn").as("v")))

  /** Canonical (max, min) orientation, self-loops dropped, distinct.
    * With `parts` set, the distinct's exchange is pinned to that width
    * via an explicit repartition on the full key (HashPartitioning(u,v)
    * satisfies the distinct's clustering, so EnsureRequirements adds no
    * second exchange) — the r19 concurrency-safe replacement for
    * mutating the session's shuffle-partition conf. */
  private def canon(e: DataFrame, parts: Option[Int] = None): DataFrame = {
    val c = e.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
    parts.fold(c)(p => c.repartition(p, col("u"), col("v"))).distinct()
  }

  /** Component labels for every node appearing in `edges` (two long
    * columns, any names — positionally (a, b)). Output: (node, comp)
    * with comp = min node id of the component; the minimum labels
    * itself. */
  def labels(edges: DataFrame, maxIter: Int = 50): DataFrame =
    labelsWithRounds(edges, maxIter)._1

  /** [[labels]] plus the number of large+small-star rounds executed
    * before the edge-set fixpoint — the observable the depth probes pin
    * (a path graph of length L must converge in O(log L) rounds, not
    * O(L)).
    *
    * Round shape (r18 optimization; results bit-identical):
    *  - NO intermediate canon/distinct between the large-star and
    *    small-star steps: both stars are per-edge emits over per-node
    *    MIN aggregates, and min over a multiset equals min over its
    *    set, so duplicate intermediate edges cannot change what the
    *    round-end canon() produces — dropping the mid-round distinct
    *    removes one Exchange + stage barrier per round (guide §2.4).
    *  - SCALE-ADAPTIVE round partitioning: after the first canon pass
    *    materializes, the edge count is known (it rides the same
    *    aggregate as the convergence signature), and every subsequent
    *    round plans its shuffles at ~2M edges/partition (≈32 MB blocks)
    *    clamped to the session's configured parallelism — a 35k-edge
    *    dedup graph iterates on 1 partition instead of paying
    *    32 tasks × ~4 exchanges × rounds of scheduling overhead, while
    *    a 100 TB crawl graph keeps the deployment's full width (guide
    *    §2.2: size reduce partitions from data, don't inherit a
    *    constant). Restored on every exit path; labels are
    *    partitioning-invariant so consumers see identical rows. */
  def labelsWithRounds(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val spark = edges.sparkSession
    var e = canon(edges.toDF("u", "v")).localCheckpoint(true)
    var signature = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v"))))
      .head()
    // r19 (VERDICT item 6): the adaptive width is threaded through
    // explicit repartition(n, key) calls on each round's shuffling
    // frames instead of mutating the session-global shuffle-partition
    // conf — a concurrent query on the same session now plans at its own
    // width. The pre-partitioned sym satisfies both the groupBy("u") and
    // the star join's clustering, so the exchange count per round is
    // unchanged (EnsureRequirements adds none on top).
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val adaptive = math.max(1L, math.min(sessionParts.toLong,
      signature.getLong(0) / 2000000L + 1L)).toInt
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(adaptive, col("u"))
      val afterLarge = largeStar(sym, neighborhoodMin(sym))
      val sym2 = afterLarge.unionByName(
          afterLarge.select(col("v").as("u"), col("u").as("v")))
        .repartition(adaptive, col("u"))
      val next = canon(smallStar(sym2, neighborhoodMin(sym2)), Some(adaptive))
        .localCheckpoint(true)
      val sig = next.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v"))))
        .head()
      converged = sig == signature
      signature = sig
      e = next
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // star forest: (u → comp) edges for non-roots; roots label themselves.
    // One distinct only (r19): the former inner distinct on the roots arm
    // was redundant — the outer distinct dedups the whole union — so its
    // Exchange is dropped; the remaining exchange rides the adaptive width.
    (e.select(col("u").as("node"), col("v").as("comp"))
      .unionByName(e.select(col("v").as("node"), col("v").as("comp")))
      .repartition(adaptive, col("node"), col("comp"))
      .distinct(), it)
  }
}
