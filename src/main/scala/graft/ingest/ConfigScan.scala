package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INI / key=val config scan (SURVEY.md S4).
  *
  * The reference reads two config shapes at startup: a ConfigParser INI
  * (`[section]` headers, `key = value`, `;`/`#` comments — irclogbot.py:15-21
  * over `~/.irccreds`) and a bare `key=val`-per-line file with no sections
  * (utils.py:44-52, `_parse_creds` over `~/.dbcreds`). Both are one scan
  * here: (file, section, key, value) rows, `section` NULL until the first
  * header — so a bare creds file parses with every row's section NULL and an
  * INI parses with ConfigParser's section attribution.
  *
  * Spark shape: config files are read `wholetext` (one row per FILE) and the
  * lines recovered by `posexplode`, because section attribution needs the
  * original line ORDER and a plain text scan may split a file across
  * partitions where row order is not the file order. Per-file order is then
  * a window `partitionBy(file) orderBy(pos)` with `last(header, ignoreNulls)`
  * carrying the current section forward — scale-out is ACROSS files (a fleet
  * of per-source configs), which is the only axis config data has: a single
  * config is KBs, a million of them is a DataFrame.
  *
  * Deliberate improvements over the reference, both spec-pinned:
  * `_parse_creds` calls `ln.split("=")` and CRASHES on a value containing
  * `=` (utils.py:49) — here the key/value split is on the FIRST `=` or `:`
  * (ConfigParser's own rule), so `url=http://h?a=b` parses. Blank lines and
  * comments are dropped rather than crashing the bare parser.
  *
  * Caveat: Hadoop's input format silently skips `.`/`_`-prefixed paths
  * (hiddenFileFilter), so the reference's literal `~/.irccreds`/`~/.dbcreds`
  * names are invisible to this scan — stage configs under non-hidden names.
  */
object ConfigScan {

  private val headerRe = "^\\[(.+)\\]$"
  // first '=' or ':' splits; key may not contain either (ConfigParser rule)
  private val kvRe = "^([^=:]+?)\\s*[=:]\\s*(.*)$"

  /** Scan one path (file, directory, or glob) of config files. */
  def ini(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value"))
    val lines = files
      .select(col("file"),
        posexplode(split(col("value"), "\r?\n")).as(Seq("pos", "raw")))
      .select(col("file"), col("pos"), trim(col("raw")).as("line"))
      .filter(col("line") =!= "" &&
        !col("line").startsWith(";") && !col("line").startsWith("#"))
      .withColumn("header",
        when(col("line").rlike(headerRe),
          regexp_extract(col("line"), headerRe, 1)))
    val sectioned = lines.withColumn("section",
      last(col("header"), ignoreNulls = true).over(
        Window.partitionBy(col("file")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val kv = sectioned
      .filter(col("header").isNull && col("line").rlike(kvRe))
      .select(col("file"), col("pos"), col("section"),
        regexp_extract(col("line"), kvRe, 1).as("key"),
        regexp_extract(col("line"), kvRe, 2).as("value"))
    // duplicate keys: LAST occurrence wins — ConfigParser's dict-overwrite
    // semantics — via a per-(file, section, key) row_number on pos desc
    kv.withColumn("__rn", row_number().over(
        Window.partitionBy(col("file"), col("section"), col("key"))
          .orderBy(col("pos").desc)))
      .filter(col("__rn") === 1)
      .select(col("file"), col("section"), col("key"), col("value"))
  }

  /** ConfigParser.get(section, key) analog over the scanned rows: the VALUE
    * of `key` in `section` (NULL section = the bare-creds shape).
    */
  def get(conf: DataFrame, section: Option[String], key: String): DataFrame = {
    val secMatch = section match {
      case Some(s) => col("section") === s
      case None => col("section").isNull
    }
    conf.filter(secMatch && col("key") === key).select(col("value"))
  }
}
