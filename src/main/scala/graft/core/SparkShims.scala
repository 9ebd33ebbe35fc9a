// Lives in org.apache.spark to reach the private[spark] disk-block
// machinery. Like GraftSqlShims (the sql-side twin), keep it tiny.
package org.apache.spark

object GraftSparkShims {
  /** A temp file in Spark's configured local spill dirs (spark.local.dir
    * / SPARK_LOCAL_DIRS, hashed-subdir layout) — the same placement the
    * engine's own shuffle/sort spills use, instead of java.io.tmpdir
    * (which on a real cluster is typically a small root volume). Falls
    * back to java.io.tmpdir when no SparkEnv exists (bare unit tests). */
  def createTempSpillFile(prefix: String): java.io.File =
    Option(SparkEnv.get) match {
      case Some(env) => env.blockManager.diskBlockManager.createTempLocalBlock()._2
      case None => java.io.File.createTempFile(prefix, ".spill")
    }

  /** THIS JVM's block-manager local dirs — lets tests scope spill-file
    * assertions to the current app instead of scanning all of
    * spark.local.dir (where concurrent or crashed Spark processes leave
    * their own temp files). */
  def spillLocalDirs(): Seq[java.io.File] =
    Option(SparkEnv.get).toSeq.flatMap(
      _.blockManager.diskBlockManager.localDirs.toSeq)
}
