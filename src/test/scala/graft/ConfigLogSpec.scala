package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ingest.ConfigScan
import graft.sinks.LogSink

/** S4 config scan + K3 append-only log sink (the last two SURVEY §2.1/§2.2
  * rows previously documented as non-operators — now first-class, spec-
  * verified like S1-S3).
  */
class ConfigLogSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, name: String, body: String): Unit = {
    Files.write(Paths.get(dir, name), body.getBytes("UTF-8"))
    ()
  }

  test("S4: scan equals a reference ConfigParser fold on 24 seed-randomized files") {
    // broad-input robustness behind the s16 gate's fixed fixture: random
    // mixes of comments, blanks, repeated section headers, dup keys (small
    // key alphabet forces last-wins collisions), '='/':' separators with
    // separators INSIDE values — all compared against a direct in-JVM fold
    // implementing the documented rules. Fixed seed: deterministic, no flake.
    val rnd = new scala.util.Random(181818L)
    def key() = (1 to (1 + rnd.nextInt(3)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    def value() = {
      val chars = "abcxyz=:#;[] _?/"
      (1 to rnd.nextInt(8)).map(_ => chars(rnd.nextInt(chars.length)))
        .mkString.trim // line-trim must not alter the generated value
    }
    val files = (0 until 24).map { i =>
      val sb = new StringBuilder
      for (_ <- 0 until 3 + rnd.nextInt(12)) rnd.nextInt(6) match {
        case 0 => sb.append("; comment ").append(rnd.nextInt(9)).append('\n')
        case 1 => sb.append('\n')
        case 2 => sb.append('[').append("s").append(rnd.nextInt(3)).append("]\n")
        case 3 => sb.append("  ").append(key()).append(" = ").append(value()).append('\n')
        case 4 => sb.append(key()).append(':').append(value()).append('\n')
        case _ => sb.append(key()).append('=').append(value()).append('\n')
      }
      (f"cfg$i%02d.ini", sb.toString)
    }
    val headerRe = "^\\[(.+)\\]$".r
    val kvRe = "^([^=:]+?)\\s*[=:]\\s*(.*)$".r
    def ref(body: String): Map[(Option[String], String), String] = {
      var sec: Option[String] = None
      val out = scala.collection.mutable.LinkedHashMap
        .empty[(Option[String], String), String]
      body.split("\r?\n").map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith(";") && !l.startsWith("#"))
        .foreach {
          case headerRe(h) => sec = Some(h)
          case kvRe(k, v) => out((sec, k)) = v
          case _ => ()
        }
      out.toMap
    }
    val dir = Files.createTempDirectory("graft_cfg_rand").toString
    files.foreach { case (n, b) => write(dir, n, b) }
    val got = ConfigScan.ini(spark, dir)
      .select(regexp_extract(col("file"), "([^/]+)$", 1).as("f"),
        col("section"), col("key"), col("value"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2))
        -> r.getString(3))
      .toMap
    val want = files.flatMap { case (n, b) =>
      ref(b).map { case ((s2, k), v) => (n, s2, k) -> v }
    }.toMap
    assert(got == want,
      s"scan disagreed with the reference fold: got=${got.size} want=${want.size} " +
        s"onlyGot=${(got.keySet -- want.keySet).take(3)} " +
        s"onlyWant=${(want.keySet -- got.keySet).take(3)}")
    assert(want.size > 30, s"random space too thin (${want.size} kvs) — raise line counts")
    assert(want.keys.exists(_._2.isDefined) && want.keys.exists(_._2.isEmpty),
      "need both sectioned and NULL-section rows for the assertion to bite")
  }

  test("S4: INI scan — sections, comments, first-delimiter split, override") {
    val dir = Files.createTempDirectory("graft_conf").toString
    // the ~/.irccreds shape (irclogbot.py:15-21): ConfigParser INI
    write(dir, "irccreds.ini",
      """; creds for the bot
        |[default]
        |password = hunter2
        |host: es.example.org
        |# duplicate key -- ConfigParser keeps the LAST read
        |password = hunter3
        |url = http://h:9200/path?a=b
        |
        |[extra]
        |password = other
        |""".stripMargin)
    val conf = ConfigScan.ini(spark, dir + "/irccreds.ini")
    val rows = conf.select("section", "key", "value").as[(String, String, String)]
      .collect().toSet
    assert(rows === Set(
      ("default", "password", "hunter3"), // last occurrence wins
      ("default", "host", "es.example.org"), // ':' delimiter
      ("default", "url", "http://h:9200/path?a=b"), // '=' in value survives
      ("extra", "password", "other")))
    // ConfigParser.get analog
    assert(ConfigScan.get(conf, Some("default"), "password")
      .as[String].head() === "hunter3")
  }

  test("S4: bare key=val creds scan (utils.py:44-52 shape) — NULL section") {
    val dir = Files.createTempDirectory("graft_conf").toString
    // NB: the reference file is literally `~/.dbcreds`, but Hadoop's input
    // format silently skips `.`/`_`-prefixed paths (hiddenFileFilter), so
    // the operator requires a non-hidden copy — documented on ConfigScan.
    write(dir, "dbcreds", "user=bot\npass=s3cret\n\n")
    val conf = ConfigScan.ini(spark, dir + "/dbcreds")
    val rows = conf.select("section", "key", "value")
      .collect().map(r => (r.isNullAt(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set((true, "user", "bot"), (true, "pass", "s3cret")))
    assert(ConfigScan.get(conf, None, "pass").as[String].head() === "s3cret")
  }

  test("S4: many files scan in one pass, attribution by file") {
    val dir = Files.createTempDirectory("graft_conf").toString
    write(dir, "a.conf", "[s]\nk = 1\n")
    write(dir, "b.conf", "[s]\nk = 2\n")
    val conf = ConfigScan.ini(spark, dir)
    assert(conf.count() === 2)
    assert(conf.select("value").as[String].collect().toSet === Set("1", "2"))
    assert(conf.filter(col("file").endsWith("a.conf"))
      .select("value").as[String].head() === "1")
  }

  test("K3: log line format is byte-compatible with logit()") {
    // logit(): strftime("%Y-%m-%dT%H:%M:%S") + " " + " ".join("%s" % m)
    val df = Seq(("2024-05-01 12:34:56.789", "joined", "#chan", 42L))
      .toDF("ts_s", "what", "chan", "n")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("what"), col("chan"), col("n"))
    val line = df.select(LogSink.formatLine(col("ts"),
      Seq(col("what"), col("chan"), col("n"))).as("v")).as[String].head()
    assert(line === "2024-05-01T12:34:56 joined #chan 42") // µs truncated
    // NULL renders as Python "%s" % None
    val withNull = df.select(LogSink.formatLine(col("ts"),
      Seq(col("what"), lit(null).cast("string"))).as("v")).as[String].head()
    assert(withNull === "2024-05-01T12:34:56 joined None")
  }

  test("K3: append accumulates across writes; read-back via spark.read.text") {
    val path = Files.createTempDirectory("graft_log").toString + "/bot_log"
    val batch = Seq(("2024-05-01 00:00:01", "msg one"), ("2024-05-01 00:00:02", "msg two"))
      .toDF("ts_s", "m")
      .select(col("ts_s").cast("timestamp").as("ts"), col("m"))
    LogSink.append(batch, col("ts"), Seq(col("m")), path)
    LogSink.append(batch.filter(col("m") === "msg one"), col("ts"), Seq(col("m")), path)
    val back = spark.read.text(path).as[String].collect().sorted
    assert(back.toSeq === Seq(
      "2024-05-01T00:00:01 msg one",
      "2024-05-01T00:00:01 msg one",
      "2024-05-01T00:00:02 msg two"))
  }

  test("K3: streaming flavor writes the same lines exactly once") {
    val dir = Files.createTempDirectory("graft_logstream").toString
    val src = dir + "/src"
    Files.createDirectories(Paths.get(src))
    write(src, "in.csv", "2024-05-01 00:00:03,stream msg\n")
    val stream = spark.readStream
      .schema("ts timestamp, m string").csv(src)
    val q = LogSink.stream(stream, col("ts"), Seq(col("m")),
      dir + "/out", dir + "/ckpt").start()
    q.awaitTermination(60000)
    val back = spark.read.text(dir + "/out").as[String].collect().toSeq
    assert(back === Seq("2024-05-01T00:00:03 stream msg"))
  }
}
