package graft.sources

import org.apache.spark.sql.types._

/** Hive/HCatalog primitive type system ↔ Spark SQL types.
  *
  * Spark-native re-expression of the reference's type surface:
  * `ArgodbSerdeUtils.primitiveTypeInfoToHCatFieldSchemaType`
  * (reference: src/main/java/io/transwarp/mapreduce/utils/ArgodbSerdeUtils.java:71-102)
  * enumerates BOOLEAN TINYINT SMALLINT INT BIGINT FLOAT DOUBLE DECIMAL
  * STRING CHAR VARCHAR BINARY DATE TIMESTAMP, and
  * `convertStringValueToObject` (ArgodbSerdeUtils.java:35-67) parses a
  * partition value string into the typed object for that column.
  */
object HiveTypeMapping {

  private val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r
  private val CharRe = """(?:char|varchar)\((\d+)\)""".r

  /** Hive type-name string → Spark DataType. Unsupported names throw,
    * mirroring ArgodbSerdeUtils.java:99-100.
    */
  def toSparkType(hiveName: String): DataType = hiveName.trim.toLowerCase match {
    case "boolean"            => BooleanType
    case "tinyint"            => ByteType
    case "smallint"           => ShortType
    case "int" | "integer"    => IntegerType
    case "bigint"             => LongType
    case "float"              => FloatType
    case "double"             => DoubleType
    case "decimal"            => DecimalType(10, 0)
    case DecimalRe(p, s)      => DecimalType(p.toInt, s.toInt)
    case "string"             => StringType
    case CharRe(_)            => StringType
    case "binary"             => BinaryType
    case "date"               => DateType
    case "timestamp"          => TimestampNTZType // Hive timestamps are wall-clock
    case "timestamp with local time zone" => TimestampType
    case other => throw new IllegalArgumentException(s"[GRAFT] Unsupported data type: $other")
  }

  /** Spark DataType → Hive type-name (schema publication direction,
    * the MetaUtils.getTableInfo analog).
    */
  def toHiveName(dt: DataType): String = dt match {
    case BooleanType        => "boolean"
    case ByteType           => "tinyint"
    case ShortType          => "smallint"
    case IntegerType        => "int"
    case LongType           => "bigint"
    case FloatType          => "float"
    case DoubleType         => "double"
    case d: DecimalType     => s"decimal(${d.precision},${d.scale})"
    case StringType         => "string"
    case BinaryType         => "binary"
    case DateType           => "date"
    case TimestampNTZType   => "timestamp"
    case TimestampType      => "timestamp with local time zone"
    case ArrayType(e, _)    => s"array<${toHiveName(e)}>"
    case other => throw new IllegalArgumentException(s"[GRAFT] Unsupported data type: $other")
  }

  /** Parse a partition-value string into the JVM value for a column of
    * Spark type `dt` (the `convertStringValueToObject` analog —
    * reference ArgodbSerdeUtils.java:35-67). Used when re-attaching
    * partition-define values as typed columns.
    */
  def parseValue(value: String, dt: DataType): Any = dt match {
    case BooleanType    => java.lang.Boolean.parseBoolean(value)
    case ByteType       => java.lang.Byte.parseByte(value)
    case ShortType      => java.lang.Short.parseShort(value)
    case IntegerType    => java.lang.Integer.parseInt(value)
    case LongType       => java.lang.Long.parseLong(value)
    case FloatType      => java.lang.Float.parseFloat(value)
    case DoubleType     => java.lang.Double.parseDouble(value)
    case _: DecimalType => new java.math.BigDecimal(value)
    case StringType     => value
    case DateType       => java.sql.Date.valueOf(value)
    case TimestampType  => java.sql.Timestamp.valueOf(value)
    case TimestampNTZType => java.time.LocalDateTime.parse(value.replace(' ', 'T'))
    case BinaryType     => value.getBytes("UTF-8")
    case other => throw new IllegalArgumentException(s"[GRAFT] Unsupported partition type: $other")
  }
}
