package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink layer: the write-side analog of the reference's
  * `ArgoDBSinkTable`/partition machinery
  * (reference: ArgodbMapreduceInputFormat.java:117-118 partitions,
  * io.transwarp.holodesk.sink.* imports) re-expressed as Spark-native
  * layouts:
  *  - hive-style partitioned parquet → directory-level partition
  *    pruning on read (the single-value-partition scheme);
  *  - bucketed tables → co-located, shuffle-free equi-joins (the
  *    section/tablet bucketing scheme).
  */
object GraftSink {

  def scratchDir: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_warehouse"

  /** Hive-style partitioned write. At 100 TB this is the layout that
    * makes `col=value` scans touch one directory instead of the table.
    */
  def writePartitioned(df: DataFrame, name: String, partitionCols: Seq[String]): String = {
    val path = s"$scratchDir/$name"
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    path
  }

  /** Read back a partitioned table (partition columns become readable
    * from directory names; pruning shows as PartitionFilters in the
    * scan).
    */
  def readPartitioned(s: SparkSession, name: String): DataFrame =
    s.read.parquet(s"$scratchDir/$name")

  /** Bucketed + sorted managed table: both sides of a repeated join
    * pre-shuffled once at write time; subsequent joins on the bucket
    * key plan with zero Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", s"$scratchDir/tbl_$table")
      .format("parquet")
      .saveAsTable(table)
}
