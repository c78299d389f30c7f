package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (temporal point-in-time) join — the operator
  * Spark lacks natively: for each left row, attach the payload of the
  * right row with the greatest timestamp ≤ the left row's timestamp
  * within the same key (ties on timestamp broken by the right-side
  * `rightOrd` column, larger wins — deterministic regardless of
  * partitioning).
  *
  * Scale design: NOT a range join. Both sides are tagged and unioned,
  * then ONE shuffle on the key partitions the stream and a
  * sort-within-partition window carries the latest right payload
  * forward (`last(…, ignoreNulls)` over an unbounded-preceding ROWS
  * frame). Cost is O((|L|+|R|) log) per key group with zero pair
  * materialization — a ts-range join would enumerate every
  * (left, right-earlier) candidate pair and explode quadratically on
  * hot keys. At 100 TB the single exchange carries each row exactly
  * once, and AQE's skew split handles hot keys because the window is
  * per-key-ordered, not per-key-collected.
  *
  * Row-atomicity: the payload columns are carried as ONE struct by a
  * single `last(ignoreNulls)` — the attached payload always comes from
  * a single right row (the latest at-or-before), never a per-column mix
  * of different right rows. A right row whose payload columns are NULL
  * still wins the carry (its NULLs are attached as-is), matching what a
  * lateral `ORDER BY ts DESC LIMIT 1` join would produce.
  */
object AsofJoin {

  /** Left as-of join. `left` and `right` must both carry `key` and
    * `ts` columns; `payload` names right-side columns to attach
    * (pre-rename them to avoid collisions with left columns);
    * `rightOrd` is the right-side tie-break column at equal ts.
    * Returns every left row with the payload columns appended (NULL
    * when no right row is at-or-before the left row's ts). */
  def leftAsof(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightOrd: String, payload: Seq[String]): DataFrame = {
    val lStructType = StructType(left.schema.fields)
    val pStructType = StructType(payload.map(c => right.schema(c)))
    val ordType = right.schema(rightOrd).dataType
    val lRows = left.select(
      col(key).as("_k"), col(ts).as("_ts"),
      lit(null).cast(ordType).as("_ord"), lit(1).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(pStructType).as("_p"))
    val rRows = right.select(
      col(key).as("_k"), col(ts).as("_ts"),
      col(rightOrd).as("_ord"), lit(0).as("_side"),
      lit(null).cast(lStructType).as("_l"),
      struct(payload.map(col).toIndexedSeq: _*).as("_p"))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // same-instant right row is visible to the left row; _ord orders
    // right rows among themselves (larger = later = wins the carry).
    // The payload rides as ONE struct (non-null on every right row even
    // when its fields are null), so a single last(ignoreNulls) attaches
    // an atomic right row — never a cross-row mix of payload columns.
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lRows.unionByName(rRows)
      .select(col("_side"), col("_l"),
        last(col("_p"), ignoreNulls = true).over(w).as("_p"))
      .filter(col("_side") === 1)
      .select((col("_l.*") :: payload.map(c => col("_p." + c).as(c)).toList): _*)
  }
}
