package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType

import scala.collection.mutable

/** Driver-side load of A42 position-delete sidecars into per-file
  * sorted row-index masks — the Iceberg deletion-vector serving shape
  * for the SQL catalog: the masks ride the (file, row-group) splits
  * and each reader skips its slice's positions locally, so a
  * `SELECT ... FROM graft.db.t` on a mutated table never pays a join
  * at all (and hash-matches `morRead`, which composes the same masks
  * as anti-joins).
  *
  * Scale contract: the sidecar is read on the DRIVER (plain
  * parquet-mr, no Spark job) under a HARD row cap — tombstone volume
  * is churn-bounded by the advisor's `mor-compact` budget, and past
  * the cap the right answer is a compaction, so the load refuses BY
  * NAME instead of growing an unbounded driver artifact.
  *
  * Reference anchor: the reference's record reader applies per-split
  * constants/skips during iteration
  * (ArgodbMapreduceRecordReader.java:74-219); this is the same
  * split-local discipline carrying a mutation mask.
  */
object GraftMorMask {

  /** Scheme-less absolute path — `_metadata.file_path` (`file:///x`)
    * and split paths (`file:/x`) agree as map keys.
    */
  def norm(p: String): String = p.replaceFirst("^[a-zA-Z0-9.+-]+:/+", "/")

  /** Load the listed sidecar parquet files into
    * `normalized data-file path -> sorted row indexes`. Throws past
    * `cap` total tombstones.
    */
  def load(sidecarFiles: Seq[String], conf: Configuration,
      cap: Long = graft.sources.GraftMor.MaxBroadcastTombstones)
      : Map[String, Array[Long]] = {
    val acc = mutable.HashMap.empty[String, mutable.ArrayBuffer[Long]]
    var n = 0L
    sidecarFiles.foreach { f =>
      GraftV2.withReader(f, conf) { r =>
        val fileSchema = r.getFooter.getFileMetaData.getSchema
        val requested = new MessageType(fileSchema.getName,
          fileSchema.getType(Seq("dv_file"): _*),
          fileSchema.getType(Seq("dv_pos"): _*))
        r.setRequestedSchema(requested)
        var store = r.readNextRowGroup()
        while (store != null) {
          val rr = new ColumnIOFactory().getColumnIO(requested)
            .getRecordReader(store, new GroupRecordConverter(requested))
          var i = 0L
          val rows = store.getRowCount
          while (i < rows) {
            val g = rr.read()
            n += 1
            if (n > cap)
              throw new IllegalStateException(
                s"[GRAFT] more than $cap unmerged position tombstones: past " +
                  "the SQL serving cap - fold them with GraftMor.morCompact " +
                  "(then REFRESH TABLE), or read via GraftMor.morRead")
            acc.getOrElseUpdate(norm(g.getBinary(0, 0).toStringUsingUTF8),
              new mutable.ArrayBuffer[Long]) += g.getLong(1, 0)
            i += 1
          }
          store = r.readNextRowGroup()
        }
      }
    }
    acc.iterator.map { case (k, v) => k -> v.toArray.sorted }.toMap
  }
}
