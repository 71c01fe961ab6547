package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** G-section driver entry for the streaming TABLE TAIL (the snapshot
  * log as micro-batches — GraftTableTailStream): builds a scratch
  * graft table from the sf `orders`, publishes epoch 1 (keys < 500),
  * tails it with one AvailableNow run, then appends + publishes epoch
  * 2 (keys in [500, 1000)) and RESUMES the same checkpoint — the
  * returned frame is exactly the second run's rows, so the DuckDB
  * oracle (`o_orderkey IN [500, 1000)`) proves both the epoch-diff
  * batch shape and the restart-resumes-past-the-checkpoint contract
  * value-exactly.
  */
object TableTail {

  def demo(s: SparkSession, dir: String): DataFrame = {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val wh = graft.sources.GraftSink.scratchDir + s"/tail_wh_$run"
    val tbl = s"$wh/t.parquet"
    val ckpt = s"$wh/_ckpt"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    val orders = graft.sources.GraftIO.readParquet(s, s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    orders.where(col("o_orderkey") < 500).coalesce(2).write.parquet(tbl)
    val cat = new graft.sources.GraftCatalog(s, wh)
    cat.publishSnapshot("t")
    // foreachBatch sink (checkpoint-recoverable, unlike `memory`):
    // each micro-batch lands as one parquet append
    val out = s"$wh/_tail_out"
    def runOnce(): Long = {
      val q = s.readStream.format("graft").load(tbl)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(out); () }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.sources.GraftIO.readParquet(s, out).count()
    }
    val firstCount = runOnce() // consumes epoch 1 (keys < 500)
    orders.where(col("o_orderkey") >= 500 && col("o_orderkey") < 1000)
      .coalesce(2).write.mode("append").parquet(tbl)
    cat.invalidate("t")
    cat.publishSnapshot("t")
    val total = runOnce() // resumes past the checkpointed epoch: the diff
    val secondRun = graft.sources.GraftIO.readParquet(s, out)
      .where(col("o_orderkey") >= 500)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
      .localCheckpoint(true)
    require(total - firstCount == secondRun.count(),
      "[GRAFT] the resumed tail must emit exactly the new epoch's rows")
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    secondRun
  }
}
