package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Append-only timestamped line log (SURVEY.md K3).
  *
  * The reference's `logit()` (utils.py:35-41, handler utils.py:19-22)
  * renders `strftime("%Y-%m-%dT%H:%M:%S") + " " + " ".join("%s" % m)` and
  * appends the line to one `bot.log` file. The engine's analog is a
  * line-formatted append-only TEXT sink: same byte format per line
  * (second-truncated ISO timestamp, space-joined message fields), but the
  * "file" is a directory of part files written `SaveMode.Append` — the only
  * append story that scales past one writer (a single shared log file is a
  * serial bottleneck at any fan-in; a log DIRECTORY takes a thousand
  * executors' appends without coordination, and readers just
  * `spark.read.text(dir)`).
  *
  * Two deliberate deltas from the reference, both spec-pinned: the timestamp
  * is the row's EVENT time column, not the writer's wall clock (`logit()`
  * stamps `datetime.utcnow()` — non-reproducible by construction), and NULL
  * message fields render as Python's `"None"` so the line bytes match what
  * `"%s" % None` would have produced.
  */
object LogSink {

  /** One formatted log line: `yyyy-MM-dd'T'HH:mm:ss <msg> <msg> ...` */
  def formatLine(ts: Column, msgs: Seq[Column]): Column =
    concat_ws(" ",
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ss") +:
        msgs.map(m => coalesce(m.cast("string"), lit("None"))): _*)

  /** Batch append: render and append to the log directory. */
  def append(df: DataFrame, ts: Column, msgs: Seq[Column], path: String): Unit =
    df.select(formatLine(ts, msgs).as("value"))
      .write.mode(SaveMode.Append).text(path)

  /** Streaming flavor: the same rendering over a streaming frame, to the
    * built-in append-mode text file sink (exactly-once via the sink's own
    * file-commit log under `checkpoint`).
    */
  def stream(df: DataFrame, ts: Column, msgs: Seq[Column], path: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.select(formatLine(ts, msgs).as("value"))
      .writeStream
      .format("text")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
