package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** The connector layer: Spark-native analog of the reference's
  * `ArgodbMapreduceInputFormat` + `MetaUtils` surface.
  *
  * The reference opens `database.table`, discovers the schema
  * (MetaUtils.java:25-82), applies an optional single-value partition
  * filter `col=value` that prunes to exactly one partition/section
  * (ArgodbMapreduceInputFormat.java:208-255), generates locality-aware
  * splits, and re-attaches partition values as typed columns with
  * Hive default-partition handling (ArgodbMapreduceRecordReader.java:182-201).
  *
  * Spark-first re-expression: a catalog over a directory of parquet
  * tables. Schema discovery = parquet footer read. The partition
  * filter compiles to a typed Catalyst predicate so Catalyst pushes it
  * into the scan — on a hive-partitioned layout that is directory-level
  * partition pruning; on flat parquet it is row-group min/max pruning.
  * Split generation + locality is Spark's FileSourceScanExec; snapshot
  * consistency is parquet immutability + a pinned file listing.
  */
final class GraftCatalog(spark: SparkSession, root: String) {

  import GraftCatalog._

  /** Schema discovery without reading data (MetaUtils.getTableInfo analog). */
  def tableSchema(name: String): StructType = table(name).schema

  /** Hive-style column descriptor list: (name, hive type name). */
  def describeTable(name: String): Seq[(String, String)] =
    tableSchema(name).fields.toSeq.map(f => f.name -> HiveTypeMapping.toHiveName(f.dataType))

  /** Full-table scan. */
  def table(name: String): DataFrame =
    spark.read.parquet(s"$root/$name.parquet")

  /** Scan with the reference's partition-filter semantics:
    *  - blank filter → full scan (ArgodbMapreduceInputFormat.java:213-227);
    *  - `col=value` / `col="value"` → typed equality predicate on the
    *    partition column, value parsed per the column's Hive type
    *    (ArgodbMapreduceInputFormat.java:228-251);
    *  - Hive default-partition sentinels select NULL / empty-string
    *    rows (ArgodbMapreduceRecordReader.java:185-198);
    *  - a filter column missing from the table is an error
    *    (MetaUtils.java:48-51).
    */
  def scan(name: String, filter: String = ""): DataFrame = {
    val df = table(name)
    if (filter == null || filter.trim.isEmpty) df
    else df.where(compileFilter(filter, df.schema))
  }
}

object GraftCatalog {

  /** Hive's sentinel for a null partition value. */
  val DefaultPartitionName = "__HIVE_DEFAULT_PARTITION__"

  /** Hive's sentinel for an empty-string partition value. */
  val DefaultPartitionEmpty = "__HIVE_DEFAULT_PARTITION_EMPTYSTR__"

  /** `col=value` → column name (getFilterColumn analog,
    * reference ArgodbSerdeUtils.java:28-33).
    */
  def filterColumn(filter: String): String = {
    val i = filter.indexOf('=')
    require(i > 0, s"[GRAFT] Bad partition filter (expected col=value): $filter")
    filter.substring(0, i).trim
  }

  /** `col=value` → value with optional surrounding quotes stripped
    * (getFilterStringValue analog, reference ArgodbSerdeUtils.java:18-26).
    */
  def filterValue(filter: String): String = {
    val i = filter.indexOf('=')
    require(i >= 0, s"[GRAFT] Bad partition filter (expected col=value): $filter")
    val v = filter.substring(i + 1)
    if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\"")) v.substring(1, v.length - 1)
    else v
  }

  /** Compile a `col=value` partition filter into a typed Catalyst
    * predicate that Catalyst can push down to the scan.
    */
  def compileFilter(filter: String, schema: StructType): Column = {
    // the reference rejects multi-column partition filters outright
    // (ArgodbMapreduceInputFormat.java:236-238); "/" separates parts in
    // a partition-define, so its presence means a multi-column filter.
    if (filter.contains("/")) {
      throw new IllegalArgumentException(
        "[GRAFT] Filter is not supported for multi-columns-single-value-partition table.")
    }
    val colName = filterColumn(filter)
    val field = schema.fields.find(_.name.equalsIgnoreCase(colName)).getOrElse {
      throw new IllegalArgumentException(
        s"[GRAFT] Filter column [$colName] is not in table schema ${schema.fieldNames.mkString("[", ",", "]")}.")
    }
    filterValue(filter) match {
      case DefaultPartitionName  => col(field.name).isNull
      case DefaultPartitionEmpty if field.dataType == StringType => col(field.name) === lit("")
      case raw =>
        col(field.name) === typedLit(raw, field.dataType)
    }
  }

  /** String partition value → typed literal Column. */
  private def typedLit(raw: String, dt: DataType): Column =
    lit(HiveTypeMapping.parseValue(raw, dt))
}
