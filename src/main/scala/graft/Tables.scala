package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Fixture-table loader (see TESTDATA.md). One parquet file per table under
  * `$dir/`. All query entry points take `(spark, dir)` so the driver can point
  * them at any scale factor.
  *
  * `events.ts` is nanosecond parquet (TIMESTAMP(NANOS)), which Spark 4
  * rejects outright by default; we read it as raw nanos
  * (`legacy.parquet.nanosAsLong`) and truncate to a microsecond timestamp —
  * exactly what DuckDB does on read, so oracle parity holds (SURVEY §7.4(3)).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.NativeFunctions.ensureRegistered(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
