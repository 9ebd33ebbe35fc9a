package graft.core

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Session-scoped plan memos shared by the dedup / ANN families.
  *
  * Values are cached DataFrames (or small derived artifacts) reused
  * across every query of a Verify/Bench sweep, so holding them for the
  * session's lifetime is the point. Two hazards this helper removes:
  *
  *  - identity hashes are NOT stable memo keys: they can be reused after
  *    a session is GC'd and can collide between live sessions, handing a
  *    later session a DataFrame bound to a stopped one. The key here is
  *    the session UUID.
  *  - without eviction the memo grows without bound across session
  *    restarts; entries whose SparkContext has stopped are pruned (their
  *    cached data died with the context) on every access.
  */
object SessionMemo {
  private final case class Slot(session: SparkSession, value: AnyRef)
  private val map = mutable.HashMap.empty[(String, String), Slot]

  /** Stable per-session key (falls back to identity only for non-classic
    * sessions, which this engine never constructs). */
  def sessionKey(s: SparkSession): String = s match {
    case _: org.apache.spark.sql.classic.SparkSession =>
      org.apache.spark.sql.GraftSqlShims.sessionUUID(s)
    case other => "id-" + System.identityHashCode(other)
  }

  /** Filesystem-safe tag for a session-memoized tmp store rooted at
    * `dir`. Scoped by dir AND applicationId AND session UUID: two JVMs
    * sweeping the same sfDir must not overwrite each other's store
    * mid-read (the q39 lesson), and — since the memo that guards the
    * build is per-session — two sessions inside ONE application must
    * not either: a second session re-running the builder would
    * deleteQuietly + rewrite the directory under the first session's
    * readers if the path were only (dir, applicationId). */
  def pathTag(s: SparkSession, dir: String): String =
    (dir + "_" + s.sparkContext.applicationId + "_" + sessionKey(s))
      .replaceAll("[^a-zA-Z0-9]", "_")

  /** Memoize `build` under (session, key). The builder runs OUTSIDE the
    * lock (it may fire cache-fill jobs); a concurrent duplicate build is
    * tolerated and the first insert wins. */
  def memoize[T <: AnyRef](s: SparkSession, key: String)(build: => T): T = {
    prune()
    val k = (sessionKey(s), key)
    map.synchronized(map.get(k)) match {
      case Some(slot) => slot.value.asInstanceOf[T]
      case None =>
        val v = build
        map.synchronized(map.getOrElseUpdate(k, Slot(s, v))).value.asInstanceOf[T]
    }
  }

  /** Read an existing memo without a builder (None if absent) — for
    * specs inspecting artifacts a query already built. */
  def peek[T <: AnyRef](s: SparkSession, key: String): Option[T] =
    map.synchronized(map.get((sessionKey(s), key))).map(_.value.asInstanceOf[T])

  private def prune(): Unit = map.synchronized {
    val dead = map.collect {
      case (k, slot) if slot.session.sparkContext.isStopped => k
    }
    dead.foreach(map.remove)
  }

  /** Drop every memo belonging to `s` (cached DataFrames are unpersisted
    * so the next build recomputes from scratch). Bench uses this between
    * measurement reps: a memoized plan would otherwise short-circuit the
    * re-run and report a cache hit as the query's cost. */
  def clear(s: SparkSession): Unit = {
    val sk = sessionKey(s)
    val mine = map.synchronized {
      val hit = map.collect { case (k, slot) if k._1 == sk => (k, slot) }
      hit.keys.foreach(map.remove)
      hit.values.toSeq
    }
    mine.foreach {
      case Slot(_, df: org.apache.spark.sql.DataFrame) =>
        try df.unpersist(blocking = false) catch { case _: Throwable => }
      case Slot(_, p: Product) =>
        p.productIterator.foreach {
          case df: org.apache.spark.sql.DataFrame =>
            try df.unpersist(blocking = false) catch { case _: Throwable => }
          case _ =>
        }
      case _ =>
    }
  }

  /** Visible for tests. */
  private[graft] def size: Int = map.synchronized(map.size)
}
