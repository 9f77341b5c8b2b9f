package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.IrcSink

class SinkSpec extends SparkSuite {
  import spark.implicits._

  private def records(rows: (String, String, String, String, String)*) =
    rows.toDF("channel", "nick", "remark", "posted_s", "id")
      .select(col("channel"), col("nick"), col("remark"),
        col("posted_s").cast("timestamp").as("posted"), col("id"))

  test("append writes channel/day partitions; read round-trips") {
    val path = Files.createTempDirectory("graft_sink").toString + "/t"
    IrcSink.append(records(
      ("#x", "alice", "m1", "2024-01-01 10:00:00", "id1"),
      ("#y", "bob", "m2", "2024-01-02 11:00:00", "id2")), path)
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("channel="))
    assert(dirs.toSet == Set("channel=%23x", "channel=%23y") || dirs.toSet == Set("channel=#x", "channel=#y"))
    val back = IrcSink.read(spark, path)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("channel", "nick", "remark", "posted", "id", "day"))
  }

  test("compaction keeps exactly one earliest row per id (unbounded dedup)") {
    val base = Files.createTempDirectory("graft_compact").toString
    val path = s"$base/t"
    IrcSink.append(records(
      ("#x", "alice", "m1", "2024-01-01 10:00:00", "id1"),
      ("#x", "alice", "m1", "2024-01-01 10:00:05", "id1"), // late duplicate, other day batch
      ("#x", "bob", "m2", "2024-01-01 10:01:00", "id2")), path)
    IrcSink.append(records(
      ("#x", "alice", "m1", "2024-01-03 09:00:00", "id1")), path) // way-late dup
    IrcSink.compact(spark, path, s"$base/compacted")
    val out = IrcSink.read(spark, s"$base/compacted")
    assert(out.count() == 2)
    val kept = out.filter(col("id") === "id1")
      .select(date_format(col("posted"), "yyyy-MM-dd HH:mm:ss")).as[String].collect()
    assert(kept.toSeq == Seq("2024-01-01 10:00:00")) // earliest survives
  }
}
