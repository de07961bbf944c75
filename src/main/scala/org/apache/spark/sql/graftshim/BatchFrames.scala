package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame

/** The one `private[sql]` doorway the txlog streaming sink needs: the
  * DataFrame handed to a v1 `Sink.addBatch` is a STREAMING Dataset view
  * of the finished micro-batch, and batch-side operators (the joins
  * inside the transactional merge) refuse streaming plans. Re-basing it
  * on the already-computed InternalRow RDD with `isStreaming = false`
  * is the standard connector-library pattern (Delta's sink does the
  * same); it re-uses the micro-batch's execution — no recompute, no
  * driver collect. Lives under `org.apache.spark.sql` solely to reach
  * `internalCreateDataFrame`.
  */
object BatchFrames {

  /** The micro-batch frame as a plain batch DataFrame. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = false)
  }

  /** The inverse doorway, for a v1 `Source.getBatch`: the engine
    * requires the returned frame to be streaming-tagged, while the
    * change feed computes it with batch operators. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = true)
  }
}
