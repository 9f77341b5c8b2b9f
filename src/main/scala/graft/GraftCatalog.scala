package graft

import org.apache.spark.sql.SparkSession

/** SQL facade: register every fixture table as a temp view (plus the native
  * graft functions) so end users can drive the whole engine through
  * `spark.sql(...)` — the same surface the oracle queries document.
  */
object GraftCatalog {
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables(spark, dir, n).createOrReplaceTempView(n)
    }
}
