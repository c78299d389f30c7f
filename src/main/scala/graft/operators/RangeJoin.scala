package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval (range) join — the second temporal operator
  * Spark has no native plan for: pair every left row with the right
  * rows of the same key whose timestamp falls in
  * `[l.ts - before, l.ts + after]`.
  *
  * Scale design — bucketize to an EQUI-join: Spark plans a bare
  * `l.key = r.key AND r.ts BETWEEN …` as a shuffled join on the key
  * alone, which degenerates into a per-key cartesian on hot keys (and
  * with no equi-key at all it becomes BroadcastNestedLoopJoin). Here
  * both sides bin their timestamps at `binSize = before + after`
  * granularity: a right row lands in exactly ONE (key, bin); a left
  * row enumerates the ≤ 2 bins its window can overlap. The join is
  * then a plain equi-join on (key, bin) — hash-partitioned, AQE-skew-
  * splittable — followed by the exact range filter. Each qualifying
  * pair meets exactly once (in the bin containing r.ts), so no
  * post-join dedup is needed. Shuffle volume is |L|·⌈span/binSize+1⌉
  * + |R| rows — linear, never pairs².
  */
object RangeJoin {

  /** Pairs of (left row, right row) with equal `key` and
    * `r.ts ∈ [l.ts − before, l.ts + after]` (inclusive; `ts` is any
    * integral column — epoch ns/us or plain longs). Right columns
    * must be pre-renamed to avoid collisions; both frames need `key`
    * and `ts`. Self-pairs are the caller's filter (left and right are
    * usually disjoint event types). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                   before: Long, after: Long): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      s"intervalJoin: need a nonempty window, got before=$before after=$after")
    val binSize = before + after
    val rightRenamed = right.withColumnRenamed(key, "_rk").withColumnRenamed(ts, "_rts")
    // integral `div`, NOT double floor-division: ns-epoch magnitudes
    // (~1.7e18) exceed double's 2^53 exact range, so a float divide
    // would mis-bin boundary rows at production timestamps
    val l = left.withColumn("_bin",
      explode(sequence(expr(s"($ts - ${before}L) div ${binSize}L"),
        expr(s"($ts + ${after}L) div ${binSize}L"))))
    val r = rightRenamed.withColumn("_bin", expr(s"_rts div ${binSize}L"))
    l.join(r, l("_bin") === r("_bin") && col(key) === col("_rk") &&
        col("_rts") >= col(ts) - before && col("_rts") <= col(ts) + after)
      .drop("_bin", "_rk")
  }
}
