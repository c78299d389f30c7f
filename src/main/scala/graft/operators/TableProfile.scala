package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling: per requested column, row/null
  * counts and a HyperLogLog distinct-count estimate — the statistics
  * pass a query planner or data-quality gate runs over a new table.
  *
  * Scale shape: the columns unpivot into ONE (column, value) stream
  * (map-side explode — |cols|·|rows| narrow rows, no shuffle until
  * the aggregates), the null/row counts are a |cols|-row aggregate,
  * and the distinct estimates reuse [[Sketch.hllDistinct]] grouped on
  * the column name — so the whole profile of a 100-TB table shuffles
  * |cols|·(2^p + 1) rows. One scan, no per-column passes. */
object TableProfile {

  def profile(df: DataFrame, cols: Seq[String], p: Int = 6): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("cname"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.cname"), col("s.v"))
    val stats = stacked.groupBy("cname").agg(
      count(lit(1)).as("n_rows"),
      count(when(col("v").isNull, 1)).as("n_null"))
    val hll = Sketch.hllDistinct(stacked.filter(col("v").isNotNull),
      Seq("cname"), col("v"), p)
    // left join: an all-NULL column has no rows on the HLL side (it is
    // built over non-null values only) but must still appear in the
    // profile — that is exactly the column an ANALYZE pass should report
    stats.join(hll.select("cname", "hll_est"), Seq("cname"), "left")
      .withColumn("hll_est", coalesce(col("hll_est"), lit(0.0)))
  }
}
