package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared parquet-state plumbing for the streaming modules. */
private[streaming] object StreamState {

  /** The standing state table at `path`, if any batch has written it. */
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }
}
