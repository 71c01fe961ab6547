package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DecimalLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

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
  * NAME instead of growing an unbounded driver artifact. Loads are
  * CACHED keyed by the sidecar file list (sidecar parquet is
  * immutable and part-file names are unique, so the path list is a
  * content address): a second scan of the same pin — or the same
  * table re-queried in a session — re-opens ZERO sidecar files; a
  * mutation writes new epoch files, which is a new key. The cache is
  * a small LRU (the loaded artifacts are driver-capped already).
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

  // ── load cache ──────────────────────────────────────────────────

  private val MaxCacheEntries = 8

  /** One entry's lazily-computed artifact: the `lazy val` gives each
    * KEY its own initialization lock, so the global map lock is held
    * only for the (cheap) lookup/insert — first-scans of DIFFERENT
    * tables load their sidecars concurrently instead of serializing
    * driver IO behind one monitor (r13 VERDICT wart). Scala retries a
    * lazy initializer whose first run threw, which is exactly right
    * for the cap/key-type refusals — but the failed cell is also
    * evicted below so it cannot squat in the LRU.
    */
  private final class Cell(compute: () => AnyRef) {
    lazy val value: AnyRef = compute()
  }

  private val cache =
    new java.util.LinkedHashMap[(String, Seq[String], Long), Cell](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Seq[String], Long), Cell]): Boolean =
        size() > MaxCacheEntries
    }

  private def cached[T <: AnyRef](kind: String, files: Seq[String],
      cap: Long)(compute: => T): T = {
    val key = (kind, files, cap)
    val cell = cache.synchronized {
      cache.get(key) match {
        case hit: Cell => hit
        case _ =>
          val c = new Cell(() => compute)
          cache.put(key, c)
          c
      }
    }
    try cell.value.asInstanceOf[T]
    catch {
      case e: Throwable =>
        // a refused load must not occupy an LRU slot (and a racing
        // waiter evicting the same cell is idempotent)
        cache.synchronized { if (cache.get(key) eq cell) cache.remove(key) }
        throw e
    }
  }

  private val opens = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Total sidecar parquet files OPENED by the loaders so far — the
    * observability hook the cache spec asserts on (a cache hit opens
    * nothing).
    */
  def sidecarOpens: Long = opens.get()

  // ── canonical key values ────────────────────────────────────────

  /** Canonical JVM value getter for one equality-key column at
    * requested-group position `gi` — the ONE representation both the
    * sidecar loader and the data-side reader map a key to, so tuple
    * equality holds across physical encodings:
    *
    *   - integral / date        → java.lang.Long
    *   - timestamps (INT64 any unit, legacy INT96) → java.lang.Long micros
    *   - UTF8 binary            → String
    *   - decimals (INT32/INT64/FLBA/BINARY backing) → java.math.BigDecimal
    *     (scale from the column's own annotation — one column, one scale)
    *
    * None for the genuinely unservable (nested groups, raw binary,
    * floating point — an inexact GDPR key is a design error): callers
    * refuse BY NAME and route to `morRead`/`morCompact`.
    */
  def canonicalKeyGetter(t: Type, gi: Int): Option[Group => Any] = {
    if (!t.isPrimitive) return None
    val p = t.asPrimitiveType()
    // decimals canonicalize SCALE-INSENSITIVELY (stripTrailingZeros):
    // java.math.BigDecimal.equals is scale-sensitive, and a file whose
    // decimal scale diverges from the table schema (schema evolution)
    // would otherwise probe-miss on whichever path took its scale from
    // the other source. Every producer of eq-probe keys (this loader,
    // the row-path data getter through here, the columnar getter in
    // GraftColumnarReader) strips, so equality is value equality.
    def dec(d: DecimalLogicalTypeAnnotation, unscaled: Group => java.math.BigInteger): Group => Any =
      g => new java.math.BigDecimal(unscaled(g), d.getScale).stripTrailingZeros()
    p.getPrimitiveTypeName match {
      case BINARY => p.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          Some(g => g.getBinary(gi, 0).toStringUsingUTF8)
        case d: DecimalLogicalTypeAnnotation =>
          Some(dec(d, g => new java.math.BigInteger(g.getBinary(gi, 0).getBytes)))
        case _ => None
      }
      case FIXED_LEN_BYTE_ARRAY => p.getLogicalTypeAnnotation match {
        case d: DecimalLogicalTypeAnnotation =>
          Some(dec(d, g => new java.math.BigInteger(g.getBinary(gi, 0).getBytes)))
        case _ => None
      }
      case INT32 => p.getLogicalTypeAnnotation match {
        case d: DecimalLogicalTypeAnnotation =>
          Some(dec(d, g => java.math.BigInteger.valueOf(g.getInteger(gi, 0).toLong)))
        case _ => // plain int and DATE (epoch days) both canonicalize as Long
          Some(g => java.lang.Long.valueOf(g.getInteger(gi, 0).toLong))
      }
      case INT64 => p.getLogicalTypeAnnotation match {
        case d: DecimalLogicalTypeAnnotation =>
          Some(dec(d, g => java.math.BigInteger.valueOf(g.getLong(gi, 0))))
        case ts: TimestampLogicalTypeAnnotation => ts.getUnit match {
          case TimeUnit.MILLIS =>
            Some(g => java.lang.Long.valueOf(g.getLong(gi, 0) * 1000L))
          case TimeUnit.MICROS =>
            Some(g => java.lang.Long.valueOf(g.getLong(gi, 0)))
          case TimeUnit.NANOS =>
            Some(g => java.lang.Long.valueOf(Math.floorDiv(g.getLong(gi, 0), 1000L)))
        }
        case _ => Some(g => java.lang.Long.valueOf(g.getLong(gi, 0)))
      }
      case INT96 =>
        // legacy Spark timestamp: 8-byte little-endian nanos-of-day +
        // 4-byte little-endian Julian day → canonical micros
        Some { g =>
          val bytes = g.getInt96(gi, 0).getBytes
          val buf = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanosOfDay = buf.getLong
          val julianDay = buf.getInt
          java.lang.Long.valueOf(
            (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L)
        }
      case _ => None // boolean/float/double: not equality-key material
    }
  }

  /** Load the listed sidecar parquet files into
    * `normalized data-file path -> sorted row indexes`. Throws past
    * `cap` total tombstones. Cached by the (immutable) file list.
    */
  def load(sidecarFiles: Seq[String], conf: Configuration,
      cap: Long = graft.sources.GraftMor.MaxBroadcastTombstones)
      : Map[String, Array[Long]] =
    cached("dv", sidecarFiles, cap) { loadUncached(sidecarFiles, conf, cap) }

  private def loadUncached(sidecarFiles: Seq[String], conf: Configuration,
      cap: Long): Map[String, Array[Long]] = {
    val acc = mutable.HashMap.empty[String, mutable.ArrayBuffer[Long]]
    var n = 0L
    sidecarFiles.foreach { f =>
      opens.incrementAndGet()
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
    * (erases stamp Long.MaxValue: mask everywhere, forever). Key
    * values are CANONICAL per [[canonicalKeyGetter]] — long/int,
    * string, date, timestamp (incl. legacy INT96) and decimal keys
    * all serve; true exotics (nested, raw binary, floating point)
    * refuse BY NAME (fall back to morRead). Same driver-side,
    * hard-capped, cached discipline as [[load]].
    */
  def loadEq(sidecarFiles: Seq[String], conf: Configuration,
      cap: Long = graft.sources.GraftMor.MaxBroadcastTombstones)
      : (Seq[String], Map[Seq[Any], Long]) =
    cached("eq", sidecarFiles, cap) { loadEqUncached(sidecarFiles, conf, cap) }

  private def loadEqUncached(sidecarFiles: Seq[String], conf: Configuration,
      cap: Long): (Seq[String], Map[Seq[Any], Long]) = {
    require(sidecarFiles.nonEmpty, "[GRAFT] loadEq with no sidecar files")
    val schema = GraftV2.readSchema(sidecarFiles.head, conf)
    val keyFields = schema.fields.filterNot(f => f.name == "seq").toSeq
    val acc = mutable.HashMap.empty[Seq[Any], Long]
    var n = 0L
    sidecarFiles.foreach { f =>
      opens.incrementAndGet()
      GraftV2.withReader(f, conf) { r =>
        val fileSchema = r.getFooter.getFileMetaData.getSchema
        val names = keyFields.map(_.name) :+ "seq"
        val requested = new MessageType(fileSchema.getName,
          names.map(n0 => fileSchema.getType(Seq(n0): _*)): _*)
        val getters: Array[Group => Any] = keyFields.indices.toArray.map { j =>
          canonicalKeyGetter(requested.getType(j), j).getOrElse(
            throw new IllegalStateException(
              s"[GRAFT] equality-mask key column '${keyFields(j).name}' has " +
                s"type ${keyFields(j).dataType.simpleString}: the SQL serving " +
                "surface composes integral/string/date/timestamp/decimal " +
                "keys only - read via GraftMor.morRead or fold with morCompact"))
        }
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
            val key: Seq[Any] = getters.toIndexedSeq.map(_(g))
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
    * Cached like [[load]].
    */
  def loadSeqm(sidecarFiles: Seq[String],
      conf: Configuration): Map[String, Long] =
    cached("seqm", sidecarFiles, 0L) { loadSeqmUncached(sidecarFiles, conf) }

  private def loadSeqmUncached(sidecarFiles: Seq[String],
      conf: Configuration): Map[String, Long] = {
    val acc = mutable.HashMap.empty[String, Long]
    sidecarFiles.foreach { f =>
      opens.incrementAndGet()
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
