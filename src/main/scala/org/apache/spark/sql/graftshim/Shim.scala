package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] surface (Spark 4 made
  * `Column(expr)` backend-agnostic and private). Used only to expose
  * native Catalyst expressions as `Column`s and to register them for
  * SQL — the same hooks `SparkSessionExtensions.injectFunction` uses.
  */
object Shim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Eagerly-converted catalyst expression (ExpressionUtils.expression
    * wraps lazily in a ColumnNodeExpression, which catalyst
    * transform/collect cannot see through — use this when the tree
    * must be introspected or rewritten). */
  def catalystExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Static-int argument of a SQL function call (e.g. the bit width of
    * `lsh_bucket(emb, 8)`): must be a foldable integer literal. */
  def intLiteral(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
    case other => sys.error(s"expected an integer literal argument, got $other")
  }

  /** Unpersist the block-manager storage behind a `localCheckpoint()`ed
    * DataFrame (its plan is a `LogicalRDD` over the persisted RDD —
    * `df.rdd.unpersist()` would target a NEW rdd, not those blocks).
    * No-op for other plans. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
