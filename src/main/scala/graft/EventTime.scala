package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The events table's `ts` column has shipped under three physical parquet
  * encodings: TIMESTAMP(NANOS) (read by Spark as epoch-nano BIGINT under
  * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (read as TIMESTAMP_NTZ — the current testdata
  * shape), and TIMESTAMP(MICROS) adjusted (read as TIMESTAMP). Every event
  * operator normalizes through here instead of assuming one encoding —
  * the DuckDB oracles' `epoch_ns(ts)` sees the same values for all three.
  */
object EventTime {

  /** `ts` as epoch-nanoseconds BIGINT (the engine's canonical event-time
    * arithmetic unit: gap/session/range math is exact integer ns). For
    * TIMESTAMP_NTZ the conversion is wall-clock-to-epoch with NO timezone
    * shift (timestampdiff against the NTZ epoch), matching how DuckDB's
    * `epoch_ns` treats a naive timestamp — deliberately independent of
    * `spark.sql.session.timeZone`. */
  def tsNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampNTZType => df.withColumn("ts",
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * lit(1000L))
    case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other")
  }

  /** `ts` as a TimestampType column (micro precision) for Structured
    * Streaming windows/watermarks. NTZ goes through epoch micros (no
    * timezone shift, same convention as tsNanos). */
  def tsTimestamp(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", timestamp_micros(
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
    case TimestampType => df
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other")
  }
}
