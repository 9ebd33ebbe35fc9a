package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SessionMemo: build-once semantics per (session, key), and the
  * `clear` path Bench relies on between measurement reps — a cleared
  * memo must rebuild (a stale hit would report a cache hit as a
  * query's cost) and cached DataFrames must be unpersisted. */
class SessionMemoSpec extends SparkSpec {

  test("memoize builds once per key; clear forces a rebuild") {
    var builds = 0
    def build(): java.lang.Integer = { builds += 1; Integer.valueOf(builds) }
    val v1 = SessionMemo.memoize(spark, "spec:k1")(build())
    val v2 = SessionMemo.memoize(spark, "spec:k1")(build())
    assert(v1 eq v2)
    assert(builds == 1)
    SessionMemo.clear(spark)
    val v3 = SessionMemo.memoize(spark, "spec:k1")(build())
    assert(builds == 2 && v3.intValue == 2)
    SessionMemo.clear(spark)
  }

  test("clear unpersists memoized DataFrames (direct and inside tuples)") {
    import spark.implicits._
    val df1 = SessionMemo.memoize(spark, "spec:df") {
      val d = Seq((1L, "a"), (2L, "b")).toDF("id", "v").persist()
      d.count() // materialize the cache
      d
    }
    val (df2, _) = SessionMemo.memoize(spark, "spec:pair") {
      val d = Seq((3L, "c")).toDF("id", "v").persist()
      d.count()
      (d, "meta")
    }
    assert(df1.storageLevel.useMemory && df2.storageLevel.useMemory)
    SessionMemo.clear(spark)
    // unpersist(blocking = false) is async; poll briefly
    val deadline = System.nanoTime() + 10_000_000_000L
    def released(df: org.apache.spark.sql.DataFrame): Boolean =
      !df.storageLevel.useMemory && !df.storageLevel.useDisk
    while (!(released(df1) && released(df2)) && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(released(df1), "direct DataFrame memo not unpersisted")
    assert(released(df2), "tuple-held DataFrame memo not unpersisted")
    // and the slots are really gone: a re-memoize rebuilds
    var rebuilt = false
    SessionMemo.memoize(spark, "spec:df") { rebuilt = true; "fresh" }
    assert(rebuilt)
    SessionMemo.clear(spark)
  }
}
