package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property test for the large-star/small-star connected-components
  * operator: on random graphs (sparse, dense, chains, cliques, stars)
  * the distributed labels must equal a driver-side union-find's, and
  * every node must label itself with its component MINIMUM. */
class GraphComponentsSpec extends SparkSpec {

  /** Driver-side union-find oracle. */
  private def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are already the component minima (we always parent max→min,
    // and min-roots never get re-parented)
    nodes.map(n => n -> find(n)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val s = spark
    import s.implicits._
    // canon drops self-loops, so a node appearing ONLY in self-loops is
    // absent from the output (documented: labels cover nodes of the
    // loop-free edge set)
    val loopFree = edges.filter(e => e._1 != e._2)
    val nodes = loopFree.flatMap(e => Seq(e._1, e._2)).toSet
    val expected = unionFind(nodes, loopFree)
    val got = GraphComponents.labels(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == nodes)
    assert(got == expected)
  }

  test("chain graph (deep diameter) resolves to one component") {
    check((0L until 40L).map(i => (i + 1, i)))
  }

  test("two cliques bridged by one edge merge") {
    val cliqueA = for (i <- 0 until 8; j <- i + 1 until 8) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 100 until 108; j <- i + 1 until 108) yield (i.toLong, j.toLong)
    check(cliqueA ++ cliqueB ++ Seq((7L, 100L)))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    check(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (9L, 3L), (3L, 9L), (9L, 9L)))
  }

  test("random sparse graphs match union-find") {
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(edges)
    }
  }

  test("star graph with high-id hub") {
    check((0L until 30L).map(i => (1000L, i)))
  }

  test("300-node chain converges within the round budget (log, not diameter)") {
    // naive min-label propagation needs 299 rounds here — far past
    // maxIter — so this fails if the algorithm loses its star-contraction
    val edges = (0L until 300L).map(i => (i + 1, i))
    val s = spark
    import s.implicits._
    val got = GraphComponents.labels(edges.toDF("a", "b"), maxIter = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 301 && got.values.forall(_ == 0L))
  }

  test("deep paths: round count grows logarithmically with chain length") {
    // the depth probe the corpus can't produce (its near-dup clusters
    // give ~4 rounds): pure path graphs of growing diameter, round
    // count pinned. 64× deeper chain may add only ~log2(64)=6 rounds;
    // a diameter-bound algorithm would need 64× the rounds.
    val s = spark
    import s.implicits._
    def rounds(n: Long): Int = {
      val edges = (0L until n).map(i => (i + 1, i))
      val (lbl, r) = GraphComponents.labelsWithRounds(edges.toDF("a", "b"))
      val got = lbl.collect().map(x => x.getLong(0) -> x.getLong(1))
      assert(got.length == n + 1 && got.forall(_._2 == 0L), s"labels at n=$n")
      r
    }
    val r256 = rounds(256L)
    val r16k = rounds(16384L)
    assert(r16k <= r256 + 8,
      s"rounds grew super-logarithmically: $r256 @256 -> $r16k @16k")
    assert(r16k <= 16, s"absolute round budget at depth 16k: $r16k")
  }
}
