package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared cleanup for the bounded-replay streaming harnesses
  * ([[NearDup]], [[Transitions]], [[Sketch]]): each stages input
  * parquet in a temp dir and drains through a memory sink, and without
  * cleanup repeated bench runs accumulate disk (staging dirs) and
  * driver memory (sink tables held by the session catalog). */
private[graft] object StreamStage {

  /** Materialize `result` off the memory sink `sinkName`, then drop
    * the sink's temp view and delete the staging dir. localCheckpoint
    * keeps the materialization distributed (executor block store), so
    * the sink and staged files are safe to free before the caller
    * consumes the frame. */
  def reap(spark: SparkSession, sinkName: String, stagingDir: String)
          (result: DataFrame): DataFrame = {
    val out = result.localCheckpoint()
    spark.catalog.dropTempView(sinkName)
    deleteTree(stagingDir)
    out
  }

  /** Recursive delete of a staging dir tree (children before parents). */
  def deleteTree(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val it = java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      try it.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally it.close()
    }
  }
}
