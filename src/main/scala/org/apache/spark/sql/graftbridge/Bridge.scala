package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge: `classic.ExpressionUtils` is private[sql]
  * in Spark 4, so the graft library reaches it through this subpackage. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session's CacheManager holds no cached plans — the
    * observable contract behind Dedup's self-cleaning operators (leaked
    * Dataset.persist entries live in the CacheManager until unpersisted;
    * localCheckpoint blocks do NOT register there and are GC-reclaimed). */
  def cacheManagerIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
