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

  /** One equality-sidecar load (A44/A45) for the SQL serving surface:
    * `(key column names, key tuple -> max sequence)` — the reader
    * masks a row whose key maps to a sequence ABOVE its file's
    * (erases stamp Long.MaxValue: mask everywhere, forever). Canonical
    * key values: `java.lang.Long` for integral columns, `String` for
    * string columns — the two key classes real tables erase on; any
    * other key type refuses BY NAME (fall back to morRead). Same
    * driver-side, hard-capped discipline as [[load]].
    */
  def loadEq(sidecarFiles: Seq[String], conf: Configuration,
      cap: Long = graft.sources.GraftMor.MaxBroadcastTombstones)
      : (Seq[String], Map[Seq[Any], Long]) = {
    require(sidecarFiles.nonEmpty, "[GRAFT] loadEq with no sidecar files")
    val schema = GraftV2.readSchema(sidecarFiles.head, conf)
    val keyFields = schema.fields.filterNot(f => f.name == "seq").toSeq
    keyFields.foreach { f =>
      f.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.StringType => ()
        case other => throw new IllegalStateException(
          s"[GRAFT] equality-mask key column '${f.name}' has type " +
            s"${other.simpleString}: the SQL serving surface composes " +
            "long/int/string keys only - read via GraftMor.morRead or " +
            "fold with morCompact")
      }
    }
    val acc = mutable.HashMap.empty[Seq[Any], Long]
    var n = 0L
    sidecarFiles.foreach { f =>
      GraftV2.withReader(f, conf) { r =>
        val fileSchema = r.getFooter.getFileMetaData.getSchema
        val names = keyFields.map(_.name) :+ "seq"
        val requested = new MessageType(fileSchema.getName,
          names.map(n0 => fileSchema.getType(Seq(n0): _*)): _*)
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
                s"[GRAFT] more than $cap unmerged equality tombstones: past " +
                  "the SQL serving cap - fold them with GraftMor.morCompact " +
                  "(then REFRESH TABLE), or read via GraftMor.morRead")
            val key: Seq[Any] = keyFields.indices.map { j =>
              keyFields(j).dataType match {
                case org.apache.spark.sql.types.StringType =>
                  g.getBinary(j, 0).toStringUsingUTF8
                case org.apache.spark.sql.types.IntegerType =>
                  java.lang.Long.valueOf(g.getInteger(j, 0).toLong)
                case _ => java.lang.Long.valueOf(g.getLong(j, 0))
              }
            }
            val seq = g.getLong(keyFields.length, 0)
            val prev = acc.getOrElse(key, Long.MinValue)
            if (seq > prev) acc.put(key, seq)
            i += 1
          }
          store = r.readNextRowGroup()
        }
      }
    }
    (keyFields.map(_.name), acc.toMap)
  }

  /** The A45 file→sequence manifest, driver-loaded: normalized data
    * file path -> commit sequence; files absent are base (sequence 0).
    */
  def loadSeqm(sidecarFiles: Seq[String],
      conf: Configuration): Map[String, Long] = {
    val acc = mutable.HashMap.empty[String, Long]
    sidecarFiles.foreach { f =>
      GraftV2.withReader(f, conf) { r =>
        val fileSchema = r.getFooter.getFileMetaData.getSchema
        val requested = new MessageType(fileSchema.getName,
          fileSchema.getType(Seq("file_norm"): _*),
          fileSchema.getType(Seq("file_seq"): _*))
        r.setRequestedSchema(requested)
        var store = r.readNextRowGroup()
        while (store != null) {
          val rr = new ColumnIOFactory().getColumnIO(requested)
            .getRecordReader(store, new GroupRecordConverter(requested))
          var i = 0L
          val rows = store.getRowCount
          while (i < rows) {
            val g = rr.read()
            acc.put(norm(g.getBinary(0, 0).toStringUsingUTF8), g.getLong(1, 0))
            i += 1
          }
          store = r.readNextRowGroup()
        }
      }
    }
    acc.toMap
  }
}
