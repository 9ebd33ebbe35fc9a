package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator Catalyst extension: top-k rows per key WITHOUT a
  * per-partition sort.
  *
  * Spark's native plan for "rank <= k per key" is Exchange -> Sort ->
  * Window(row_number) -> Filter: it sorts EVERY candidate row (O(n log n)
  * per key, all rows materialized in the sort buffer) only to discard all
  * but k. This operator declares the same clustering requirement
  * (`ClusteredDistribution(keys)` — Catalyst inserts the one hash
  * exchange) and then keeps a bounded k-entry heap per key: O(n log k)
  * time, O(keys·k) memory, no sort spill. At 100 TB with millions of
  * keys per partition, the sort buffer is the difference between a scan
  * and a spill storm.
  *
  * Semantics (fixed to the ANN ranking shape): rank 1..k by
  * (ord DESC, tie ASC), exactly `row_number() OVER (PARTITION BY keys
  * ORDER BY ord DESC, tie ASC) <= k`. `ord` must be double (Spark SQL
  * sort order, NaN largest) or long (exact at any magnitude — counts
  * above 2^53 rank correctly), `tie` long, both non-null.
  */
final case class TopKPerKeyNode(keys: Seq[Expression], ord: Expression,
    tie: Expression, k: Int, rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  // rankAttr is a CONSTRUCTOR argument so tree copies (analysis,
  // optimization) preserve its exprId — a per-instance val would mint a
  // fresh id on every makeCopy and orphan downstream references
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is PRODUCED here, not consumed from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner rule: the logical node plans as partial → (exchange) → final,
  * the same shape Catalyst gives hash aggregation. The PARTIAL operator
  * runs before the exchange with no distribution requirement and bounds
  * every input partition to k rows per key, so the shuffle moves at most
  * keys·k rows per partition instead of every candidate row — at 100 TB
  * the exchange, not the heap, is the cost, and this is what shrinks it.
  * The FINAL operator declares the clustering requirement (Catalyst
  * inserts the one hash exchange) and assigns ranks. Global top-k is a
  * subset of the union of per-partition top-k, and the (ord, tie) order
  * is total, so the split is exact. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.keys, n.ord, n.tie, n.k, n.rankAttr,
        TopKPartialExec(n.keys, n.ord, n.tie, n.k, planLater(n.child))) :: Nil
    case _ => Nil
  }
}

/** Map-side top-k: emits each input partition's best ≤k rows per key,
  * unranked and in no particular order. Shares the final operator's
  * bounded-heap discipline (O(n log k) time); memory is bounded at
  * [[TopKPerKeyExec.PartialMaxKeys]] tracked keys — once a partition
  * has seen more distinct keys than that, rows of NEW keys pass through
  * to the exchange unfiltered (emitting a superset is always correct;
  * with near-unique keys a partial cannot reduce the shuffle anyway, so
  * degrading to pass-through is exactly the right behavior — the same
  * reasoning as Spark's partial-aggregation fallback). */
final case class TopKPartialExec(keys: Seq[Expression], ord: Expression,
    tie: Expression, k: Int, child: SparkPlan) extends UnaryExecNode {
  import TopKPerKeyExec.{Entry, PartialMaxKeys, evictOrd, offer}

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ordEval = BindReferences.bindReference(ord, child.output)
      val tieEval = BindReferences.bindReference(tie, child.output)
      val longMode = ordEval.dataType == LongType
      def ordD(o: Any): Double = if (longMode) 0.0 else o.asInstanceOf[Double]
      def ordL(o: Any): Long = if (longMode) o.asInstanceOf[Long] else 0L
      val heaps = mutable.LinkedHashMap
        .empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      // lazy flatMap: pass-through rows stream straight into the shuffle
      // writer while absorbed rows buffer in the bounded heaps
      iter.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(q) =>
            val o = ordEval.eval(row)
            offer(longMode, q, kk, ordD(o), ordL(o),
              tieEval.eval(row).asInstanceOf[Long], row)
            Iterator.empty
          case None if heaps.size < PartialMaxKeys =>
            val q = mutable.PriorityQueue.empty[Entry](evictOrd(longMode))
            heaps.put(key.copy(), q)
            val o = ordEval.eval(row)
            offer(longMode, q, kk, ordD(o), ordL(o),
              tieEval.eval(row).asInstanceOf[Long], row)
            Iterator.empty
          case None => Iterator.single(row) // map full: superset is fine
        }
      } ++ heaps.iterator.flatMap(_._2.iterator.map(_.row))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** One buffered candidate (shared by the partial and final heaps).
    * Exactly one of (ordV, ordL) is live, selected by the operator's
    * ord datatype — a LONG ord column compares exactly (no 2^53 double
    * mantissa cap), a DOUBLE ord with Spark's NaN/-0.0 sort order. */
  final case class Entry(ordV: Double, ordL: Long, tieV: Long, row: InternalRow)

  /** Distinct keys a PARTIAL tracks per input partition before new keys
    * degrade to pass-through (≈ keys·k small rows of heap state). */
  val PartialMaxKeys = 1 << 16

  /** Total order matching Spark SQL's double sort exactly: NaN largest
    * (so NaN ranks first under DESC) AND -0.0 == 0.0 — raw >/== would
    * leave NaN rows in insertion order, while bare Double.compare would
    * rank 0.0 above -0.0 where the window oracle ties them. */
  def cmpOrd(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Entry ord comparison under the operator's mode: long ords compare
    * exactly, double ords via [[cmpOrd]]. */
  def cmpEntryOrd(longMode: Boolean, aD: Double, aL: Long, bD: Double,
      bL: Long): Int =
    if (longMode) java.lang.Long.compare(aL, bL) else cmpOrd(aD, bD)

  /** Max-heap whose TOP is the WORST entry (lowest ord; ties: highest
    * tie value), so the replace test against the incumbent is O(1). */
  def evictOrd(longMode: Boolean): Ordering[Entry] =
    Ordering.fromLessThan { (a, b) =>
      val c = cmpEntryOrd(longMode, a.ordV, a.ordL, b.ordV, b.ordL)
      c > 0 || (c == 0 && a.tieV < b.tieV)
    }

  /** Offer a row to a k-bounded heap; the row is COPIED only when it is
    * actually retained (the common rejected row costs no allocation). */
  def offer(longMode: Boolean, q: mutable.PriorityQueue[Entry], k: Int,
      ordV: Double, ordL: Long, tieV: Long, row: InternalRow): Unit =
    if (q.size < k) q.enqueue(Entry(ordV, ordL, tieV, row.copy()))
    else {
      val w = q.head
      val c = cmpEntryOrd(longMode, ordV, ordL, w.ordV, w.ordL)
      if (c > 0 || (c == 0 && tieV < w.tieV)) {
        q.dequeue(); q.enqueue(Entry(ordV, ordL, tieV, row.copy()))
      }
    }

  /** [[offer]] for an already-materialized entry (spill merge path). */
  def offerEntry(longMode: Boolean, q: mutable.PriorityQueue[Entry], k: Int,
      e: Entry): Unit =
    if (q.size < k) q.enqueue(e)
    else {
      val w = q.head
      val c = cmpEntryOrd(longMode, e.ordV, e.ordL, w.ordV, w.ordL)
      if (c > 0 || (c == 0 && e.tieV < w.tieV)) { q.dequeue(); q.enqueue(e) }
    }

  /** Unsigned lexicographic byte order — any total order works for the
    * spill-run merge as long as every run uses the same one; UnsafeRow
    * bytes are canonical per value for a fixed key schema (the same
    * assumption the hash exchange makes). */
  def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Session conf key: distinct keys the FINAL operator holds per
    * partition before spilling its heaps to a sorted disk run (specs set
    * it low to force the spill path). */
  val SpillKeysConf = "graft.topk.final.spillKeys"
}

final case class TopKPerKeyExec(keys: Seq[Expression], ord: Expression,
    tie: Expression, k: Int, rankAttr: Attribute, child: SparkPlan)
  extends UnaryExecNode {
  import TopKPerKeyExec.Entry

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  /** Rows for one key must be co-located; Catalyst plans the shuffle. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val spillKeys = conf.getConfString(TopKPerKeyExec.SpillKeysConf,
      (1 << 16).toString).toInt
    val nFields = child.output.size
    child.execute().mapPartitions({ iter =>
      import TopKPerKeyExec.{cmpBytes, offerEntry}
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ordEval = BindReferences.bindReference(ord, child.output)
      val tieEval = BindReferences.bindReference(tie, child.output)
      val longMode = ordEval.dataType == LongType
      require((ordEval.dataType == DoubleType || longMode) &&
          tieEval.dataType == LongType,
        "TopKPerKey expects a double or long ordering column and a long tie column")
      def ordD(o: Any): Double = if (longMode) 0.0 else o.asInstanceOf[Double]
      def ordL(o: Any): Long = if (longMode) o.asInstanceOf[Long] else 0L
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      // ---- spill machinery: past spillKeys distinct keys the heap map
      // flushes to a key-SORTED disk run ((key, entries≤k) groups), and
      // the emit phase merge-joins the runs with the surviving map — so
      // per-partition memory is O(spillKeys·k) regardless of how many
      // distinct keys the exchange delivers
      val spills = mutable.ArrayBuffer.empty[java.io.File]
      // run-reader streams register here so an early-terminated consumer
      // (limit, take) releases file handles at task end, not at GC
      val openStreams = mutable.ArrayBuffer.empty[java.io.Closeable]
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          openStreams.foreach(s => try s.close() catch { case _: Exception => })
          spills.foreach(_.delete())
        })
      def sortedGroups(): Seq[(Array[Byte], Array[Entry])] =
        heaps.iterator.map { case (key, q) => (key.getBytes, q.toArray) }
          .toSeq.sortWith((a, b) => cmpBytes(a._1, b._1) < 0)
      def spill(): Unit = {
        val f = org.apache.spark.GraftSparkShims.createTempSpillFile("graft_topk")
        spills += f
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
        try sortedGroups().foreach { case (kb, es) =>
          out.writeInt(kb.length); out.write(kb)
          out.writeInt(es.length)
          es.foreach { e =>
            out.writeDouble(e.ordV); out.writeLong(e.ordL); out.writeLong(e.tieV)
            val rb = e.row.asInstanceOf[UnsafeRow].getBytes
            out.writeInt(rb.length); out.write(rb)
          }
        } finally out.close()
        heaps.clear()
      }
      iter.foreach { row =>
        val key = keyProj(row)
        val q = heaps.get(key) match {
          case Some(q0) => q0
          case None =>
            if (heaps.size >= spillKeys) spill()
            val q0 = mutable.PriorityQueue.empty[Entry](
              TopKPerKeyExec.evictOrd(longMode))
            heaps.put(key.copy(), q0)
            q0
        }
        val o = ordEval.eval(row)
        TopKPerKeyExec.offer(longMode, q, kk, ordD(o), ordL(o),
          tieEval.eval(row).asInstanceOf[Long], row)
      }
      // emit UnsafeRows: downstream operators may buffer without copying
      val outProj = UnsafeProjection.create(output, output)
      def ranked(q: mutable.PriorityQueue[Entry]): Iterator[InternalRow] = {
        // dequeueAll drains in priority order = worst-first; reverse to
        // best-first and number the ranks
        val best = q.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case (e, i) =>
          outProj(new JoinedRow(e.row, InternalRow(i + 1L))).copy(): InternalRow
        }
      }
      if (spills.isEmpty)
        heaps.iterator.flatMap { case (_, q) => ranked(q) }
      else {
        // merge-join the sorted disk runs with the in-memory remainder:
        // one key's heap is live at a time
        def fileRun(f: java.io.File): Iterator[(Array[Byte], Array[Entry])] =
          new Iterator[(Array[Byte], Array[Entry])] {
            private val in = new java.io.DataInputStream(
              new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16))
            openStreams += in
            private var nextKeyLen = readLen()
            private def readLen(): Int =
              try in.readInt() catch { case _: java.io.EOFException => in.close(); -1 }
            override def hasNext: Boolean = nextKeyLen >= 0
            override def next(): (Array[Byte], Array[Entry]) = {
              val kb = new Array[Byte](nextKeyLen); in.readFully(kb)
              val n = in.readInt()
              val es = Array.tabulate(n) { _ =>
                val ordV = in.readDouble(); val ordLv = in.readLong()
                val tieV = in.readLong()
                val rb = new Array[Byte](in.readInt()); in.readFully(rb)
                val ur = new UnsafeRow(nFields)
                ur.pointTo(rb, rb.length)
                Entry(ordV, ordLv, tieV, ur)
              }
              nextKeyLen = readLen()
              (kb, es)
            }
          }
        final class Run(it: Iterator[(Array[Byte], Array[Entry])]) {
          var head: (Array[Byte], Array[Entry]) = _
          advance()
          def advance(): Unit = head = if (it.hasNext) it.next() else null
        }
        val runs = (spills.toSeq.map(fileRun) :+ sortedGroups().iterator)
          .map(new Run(_)).filter(_.head != null)
        new Iterator[InternalRow] {
          private var pending: Iterator[InternalRow] = Iterator.empty
          private def refill(): Unit =
            while (!pending.hasNext && runs.exists(_.head != null)) {
              val live = runs.filter(_.head != null)
              var minKey = live.head.head._1
              live.foreach(r =>
                if (cmpBytes(r.head._1, minKey) < 0) minKey = r.head._1)
              val q = mutable.PriorityQueue.empty[Entry](
                TopKPerKeyExec.evictOrd(longMode))
              live.foreach { r =>
                if (cmpBytes(r.head._1, minKey) == 0) {
                  r.head._2.foreach(e => offerEntry(longMode, q, kk, e))
                  r.advance()
                }
              }
              pending = ranked(q)
            }
          override def hasNext: Boolean = { refill(); pending.hasNext }
          override def next(): InternalRow = { refill(); pending.next() }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** `df` + rank column, top `k` rows per `keys` by (`ord` DESC, `tie`
    * ASC), all referenced by column name. Attributes are resolved
    * against the frame's ANALYZED plan (the Column bridge would hand the
    * custom node unresolved wrappers the analyzer ignores). Installs the
    * planner strategy on the session idempotently. */
  def apply(df: DataFrame, keys: Seq[String], ord: String, tie: String,
      k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    GraftSqlShims.addStrategy(spark, TopKPerKeyStrategy)
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$n' in ${child.output.map(_.name)}"))
    val node = TopKPerKeyNode(keys.map(attr), attr(ord), attr(tie), k,
      AttributeReference("rank", LongType, nullable = false)(), child)
    GraftSqlShims.ofRows(spark, node)
  }
}
