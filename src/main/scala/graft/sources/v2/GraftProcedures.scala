package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL maintenance surface: `CALL graft.system.<procedure>(...)` — the
  * Iceberg-shaped stored-procedure pattern over this engine's existing
  * maintenance actions, registered through Spark 4's native
  * `ProcedureCatalog` (GraftTableCatalog implements it). Why: the SQL
  * surface can CREATE, mutate and time-travel a table (A58/A55/A26)
  * but until now could not MAINTAIN it — every advisor signal
  * (GraftAdvisor: compact / expire-snapshots / vacuum / mor-compact /
  * rebucket) pointed at a Scala-only act. Each procedure delegates to
  * the same function the Scala API exposes, so the refusal arms
  * (lease gates, live-mask refusals, layout validation) fire BY NAME
  * through SQL too, then drops the catalog's pins so the next SQL
  * read re-pins the post-maintenance state (the REFRESH TABLE rule).
  *
  *   CALL graft.system.compact(table => 'db.t')
  *   CALL graft.system.vacuum(table => 'db.t')
  *   CALL graft.system.expire_snapshots(table => 'db.t', keep_last => 5)
  *   CALL graft.system.restore(table => 'db.t', version => 3)
  *   CALL graft.system.rebucket(table => 'db.t')
  *   CALL graft.system.mor_compact(table => 'db.t')
  *   CALL graft.system.publish_snapshot(table => 'db.t')
  *
  * Each returns a one-row result relation (what changed), the
  * Iceberg procedure convention.
  */
object GraftProcedures {

  /** What a procedure needs from the owning catalog: the session, a
    * table-name resolver (namespace path + table name + table path),
    * the per-namespace pinned GraftCatalog, and the invalidation hook
    * (maintenance re-pins, exactly like REFRESH TABLE).
    */
  final case class Ctx(spark: SparkSession,
      resolve: String => (Array[String], String, String),
      resolveNs: String => String,
      catalogFor: Array[String] => graft.sources.GraftCatalog,
      invalidate: (Array[String], String) => Unit,
      partColsOf: String => Seq[String])

  val Namespace: Array[String] = Array("system")

  private val names = Seq("compact", "vacuum", "expire_snapshots",
    "restore", "rebucket", "mor_compact", "publish_snapshot", "analyze",
    "advise")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Namespace))
      names.map(n => Identifier.of(Namespace, n)).toArray
    else Array.empty

  def load(ctx: Ctx, ident: Identifier): UnboundProcedure = {
    if (!ident.namespace.sameElements(Namespace) ||
        !names.contains(ident.name))
      throw new IllegalArgumentException(
        s"[GRAFT] no such procedure: ${ident.namespace.mkString(".")}." +
          s"${ident.name} (have: system.{${names.mkString(", ")}})")
    ident.name match {
      case "compact" => proc(ctx, "compact",
        out = Seq("table" -> StringType, "files_before" -> LongType,
          "files_after" -> LongType)) { (c, ns, name, path) =>
        val before = GraftV2.dataFiles(path,
          c.spark.sessionState.newHadoopConf()).size.toLong
        graft.sources.GraftSink.compactTable(c.spark, path, c.partColsOf(path))
        val after = GraftV2.dataFiles(path,
          c.spark.sessionState.newHadoopConf()).size.toLong
        Seq(utf8(s"${ns.mkString(".")}.$name"), before, after)
      }
      case "vacuum" => proc(ctx, "vacuum",
        out = Seq("table" -> StringType, "deleted_files" -> LongType)) {
        (c, ns, name, _) =>
        val deleted = c.catalogFor(ns).vacuum(name).size.toLong
        Seq(utf8(s"${ns.mkString(".")}.$name"), deleted)
      }
      case "expire_snapshots" => proc(ctx, "expire_snapshots",
        extra = Seq(ProcedureParameter.in("keep_last", IntegerType)
          .defaultValue("10").build()),
        out = Seq("table" -> StringType, "expired" -> LongType)) {
        (c, ns, name, _, args) =>
        val keep = args.getInt(1)
        val expired = c.catalogFor(ns).expireSnapshots(name, keep).size.toLong
        Seq(utf8(s"${ns.mkString(".")}.$name"), expired)
      }
      case "restore" => proc(ctx, "restore",
        extra = Seq(ProcedureParameter.in("version", LongType).build()),
        out = Seq("table" -> StringType, "restored_from" -> LongType,
          "new_version" -> LongType)) { (c, ns, name, _, args) =>
        val v = args.getLong(1)
        val newId = c.catalogFor(ns).restoreSnapshot(name, v)
        Seq(utf8(s"${ns.mkString(".")}.$name"), v, newId)
      }
      case "rebucket" => proc(ctx, "rebucket",
        out = Seq("table" -> StringType, "status" -> StringType)) {
        (c, ns, name, path) =>
        GraftLayout.rebucket(c.spark, path)
        Seq(utf8(s"${ns.mkString(".")}.$name"), utf8("rebucketed"))
      }
      case "mor_compact" => proc(ctx, "mor_compact",
        out = Seq("table" -> StringType, "status" -> StringType)) {
        (c, ns, name, path) =>
        graft.sources.GraftMor.morCompact(c.spark, path, c.partColsOf(path))
        Seq(utf8(s"${ns.mkString(".")}.$name"), utf8("folded"))
      }
      case "publish_snapshot" => proc(ctx, "publish_snapshot",
        out = Seq("table" -> StringType, "snapshot_id" -> LongType)) {
        (c, ns, name, _) =>
        val id = c.catalogFor(ns).publishSnapshot(name)
        Seq(utf8(s"${ns.mkString(".")}.$name"), id)
      }
      case "advise" => adviseProc(ctx)
      case "analyze" => proc(ctx, "analyze",
        out = Seq("table" -> StringType, "row_count" -> LongType,
          "columns_analyzed" -> LongType)) { (c, ns, name, path) =>
        val (rows, cols) = GraftTableStats.analyze(c.spark, path)
        Seq(utf8(s"${ns.mkString(".")}.$name"), rows, cols)
      }
    }
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** `CALL graft.system.advise(namespace => 'db')` — the A34/A37
    * advisor's signals as a SQL result relation, one row per
    * (table, rule, metric, detail): the FLAG half of the
    * flag→act→clear loop, so a SQL-only operator can read the signals
    * and act on them with the maintenance CALLs above without ever
    * leaving SQL.
    */
  private def adviseProc(ctx: Ctx): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "advise"
    override def description(): String =
      "graft maintenance advisor: one row per (table, rule, metric, detail)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "advise"
      override def description(): String =
        "graft maintenance advisor: one row per (table, rule, metric, detail)"
      override def parameters(): Array[ProcedureParameter] =
        Array(ProcedureParameter.in("namespace", StringType).build())
      override def isDeterministic: Boolean = false // reads live fs state
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val nsArg = input.getUTF8String(0)
        require(nsArg != null, "[GRAFT] advise: namespace must be set")
        val root = ctx.resolveNs(nsArg.toString)
        val advice = graft.sources.GraftAdvisor.advise(ctx.spark, root)
        val schema = StructType(Seq(
          StructField("table", StringType), StructField("rule", StringType),
          StructField("metric", LongType), StructField("detail", StringType)))
        val scan: Scan = new LocalScan {
          override def rows(): Array[InternalRow] = advice.map(a =>
            new GenericInternalRow(Array[Any](utf8(a.table), utf8(a.rule),
              a.metric, utf8(a.detail)))).toArray
          override def readSchema(): StructType = schema
          override def description(): String = "graft procedure advise"
        }
        java.util.Collections.singletonList(scan).iterator()
      }
    }
  }

  /** A one-table procedure with no extra parameters. */
  private def proc(ctx: Ctx, procName: String,
      out: Seq[(String, DataType)])(
      run: (Ctx, Array[String], String, String) => Seq[Any]): UnboundProcedure =
    proc(ctx, procName, Seq.empty, out)((c, ns, name, path, _) =>
      run(c, ns, name, path))

  /** A one-table procedure with extra parameters after `table`. */
  private def proc(ctx: Ctx, procName: String,
      extra: Seq[ProcedureParameter], out: Seq[(String, DataType)])(
      run: (Ctx, Array[String], String, String, InternalRow) => Seq[Any])
      : UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def description(): String =
      s"graft maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"graft maintenance procedure $procName"
      override def parameters(): Array[ProcedureParameter] =
        (ProcedureParameter.in("table", StringType).build() +: extra).toArray
      // side-effecting by design: never constant-folded or re-invoked
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tableArg = input.getUTF8String(0)
        require(tableArg != null, s"[GRAFT] $procName: table must be set")
        val (ns, tbl, path) = ctx.resolve(tableArg.toString)
        val result = run(ctx, ns, tbl, path, input)
        // the act changed the table's physical state: drop the
        // catalog's pins so the next read re-pins (REFRESH semantics)
        ctx.invalidate(ns, tbl)
        val schema = StructType(out.map { case (n, t) =>
          StructField(n, t, nullable = true) })
        val scan: Scan = new LocalScan {
          override def rows(): Array[InternalRow] =
            Array(new GenericInternalRow(result.toArray))
          override def readSchema(): StructType = schema
          override def description(): String = s"graft procedure $procName"
        }
        java.util.Collections.singletonList(scan).iterator()
      }
    }
  }
}
