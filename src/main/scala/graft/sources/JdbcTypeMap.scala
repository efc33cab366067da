package graft.sources

import java.sql.Types
import org.apache.spark.sql.types._

/** JDBC → Spark type mapping for source schema inference, covering every
  * type the reference maps (ref utils/SqlUtils.scala:72-110), including the
  * MSSQL `TIME` column type (SqlUtils.scala:101) that Spark's stock MSSQL
  * dialect historically folded into strings — Spark 4 has a native
  * `TimeType`, so `time(n)` round-trips as a time-of-day value (precision
  * capped at Spark's max of 6; MSSQL `time(7)` loses its 100 ns digit).
  *
  * DECIMAL/NUMERIC carry source precision/scale through; SQL Server `text`/
  * `ntext` surface as LONGVARCHAR/LONGNVARCHAR and map to strings.
  */
object JdbcTypeMap {

  /** Spark type for a JDBC type id. Throws on unmapped ids — schema
    * inference must fail loudly, not write a corrupt column (same contract
    * as the reference's `Failure` branch, SqlUtils.scala:110-118).
    */
  def toSparkType(jdbcType: Int, precision: Int = 0, scale: Int = 0): DataType =
    jdbcType match {
      case Types.BIGINT => LongType
      case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY => BinaryType
      case Types.BIT | Types.BOOLEAN => BooleanType
      case Types.CHAR | Types.NCHAR | Types.VARCHAR | Types.NVARCHAR |
           Types.LONGVARCHAR | Types.LONGNVARCHAR => StringType
      case Types.DATE => DateType
      case Types.TIME => TimeType(math.min(precision.max(0), TimeType.MAX_PRECISION))
      case Types.TIMESTAMP => TimestampNTZType
      case Types.TIMESTAMP_WITH_TIMEZONE => TimestampType
      case Types.DECIMAL | Types.NUMERIC =>
        if (precision > 0) DecimalType(math.min(precision, DecimalType.MAX_PRECISION), scale)
        else DecimalType.SYSTEM_DEFAULT
      case Types.DOUBLE => DoubleType
      case Types.FLOAT | Types.REAL => FloatType
      case Types.INTEGER => IntegerType
      case Types.SMALLINT | Types.TINYINT => ShortType
      case other =>
        throw new IllegalArgumentException(s"Unmapped JDBC type id $other")
    }

  /** Spark schema from JDBC result-set metadata — the inference entry point
    * for the change-tracking reader's column list.
    */
  def schemaOf(md: java.sql.ResultSetMetaData): StructType =
    StructType((1 to md.getColumnCount).map { i =>
      StructField(md.getColumnLabel(i),
        toSparkType(md.getColumnType(i), md.getPrecision(i), md.getScale(i)),
        nullable = md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
    })
}
