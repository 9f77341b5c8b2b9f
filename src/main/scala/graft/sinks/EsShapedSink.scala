package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** The reference's ACTUAL sink contract, as a pluggable adapter: every record
  * becomes an Elasticsearch index action
  * `es_client.index(index="irclog", doc_type="irc", id=<blake2b>, body=<doc>)`
  * (/root/reference/irclogbot.py:50-51; ES 6.3.1 per requirements.txt:9).
  *
  * Zero-egress design: the DSL layer (action metadata + document source,
  * exactly the `_bulk` NDJSON wire shape) is pure and golden-testable; the
  * transport is a tiny serializable trait a production deployment implements
  * with an HTTP client and tests implement with a local spool directory.
  * Retry/drop semantics reuse [[IrcSink.writeEachWithRetry]] (MAX_RETRIES=5,
  * then dead-letter — irclogbot.py:46-59), so a poisoned record costs only
  * itself.
  *
  * Scale contract: documents are rendered and sent per-partition (executor-
  * side, no driver round-trip); a bulk request's size is bounded by
  * `bulkSize`, the standard ES ingestion knob. Nothing here shuffles.
  */
object EsShapedSink {

  /** Where records land: the reference pins index=irclog, doc_type=irc. */
  final case class IndexSpec(index: String = "irclog", docType: String = "irc")

  /** Transport seam: production = HTTP POST to `/_bulk`; tests = local spool.
    * Must be serializable (instances ship to executors) and idempotent under
    * replay — the id is the content key, so re-sending an action is the
    * upsert the reference already relies on.
    */
  trait BulkTransport extends Serializable {
    def send(ndjsonLines: Seq[String]): Unit
  }

  /** Spool transport for egress-free use: each `send` appends its lines to a
    * uniquely-named file under `dir` (one file per bulk request, so no
    * cross-task write races). Doubles as a dead-letter quarantine.
    *
    * `appendPerTask = true` (r22, guide §6 — fewer, larger files): all
    * sends from one transport instance append to ONE spool file instead of
    * one per bulk request. Spark deserializes a fresh instance into every
    * task closure, so the file is task-local and race-free exactly like
    * the per-request mode; the spool's file count becomes ∝ tasks instead
    * of ∝ corpus/bulkSize (at 100 TB the difference between thousands of
    * files and billions). Content is byte-identical — requests append in
    * send order. Default stays per-request (the pinned dead-letter /
    * quarantine granularity).
    */
  final class SpoolTransport(dir: String, appendPerTask: Boolean = false)
      extends BulkTransport {
    @transient private var taskFile: java.nio.file.Path = null
    def send(ndjsonLines: Seq[String]): Unit = {
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      // Files.write throws IOException on a failed write (disk full,
      // permission) — writeEachWithRetry's retry/dead-letter contract
      // depends on send() throwing, which PrintWriter would swallow.
      val bytes = ndjsonLines.mkString("", "\n", "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8)
      if (appendPerTask) {
        if (taskFile == null)
          taskFile = java.nio.file.Files.createTempFile(d, "bulk_", ".ndjson")
        java.nio.file.Files.write(taskFile, bytes,
          java.nio.file.StandardOpenOption.APPEND)
      } else {
        java.nio.file.Files.write(
          java.nio.file.Files.createTempFile(d, "bulk_", ".ndjson"), bytes)
      }
      ()
    }
  }

  /** Scratch root for spool directories that only need to outlive one query:
    * prefer a memory-backed filesystem (`/dev/shm` on Linux) over the disk
    * tmpdir. The k1 round-trip gate verifies NDJSON CONTENT and upsert
    * semantics, not disk latency — and a per-rep full-table spool through
    * `java.io.tmpdir` was flagged as an I/O ambush victim in two consecutive
    * driver windows (r15 rep-3 20.9 s, r16 all reps ≤34.7 s vs isolated
    * median 1.85 s, BASELINE.md r16). Falls back to tmpdir where no
    * writable `/dev/shm` exists; durability-sensitive callers (dead-letter
    * quarantine) should keep passing an explicit on-disk dir.
    */
  def scratchRoot: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) shm.getAbsolutePath
    else System.getProperty("java.io.tmpdir")
  }

  /** Minimal RFC 8259 string escaping — enough for the five document fields;
    * non-ASCII passes through (the wire is UTF-8, like the reference's
    * `txt.encode("utf-8")`).
    */
  private[graft] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c if Character.isHighSurrogate(c)
            && i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)) =>
          // Valid pair: both chars pass through; they encode to valid UTF-8.
          sb.append(c).append(s.charAt(i + 1))
          i += 1
        case c if Character.isSurrogate(c) =>
          // Unpaired surrogate cannot be encoded as UTF-8 on the wire;
          // \uXXXX-escape it so the literal stays lexically valid JSON.
          sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** The `_bulk` action-metadata line for one record id. */
  def actionLine(spec: IndexSpec, id: String): String =
    s"""{"index":{"_index":"${jsonEscape(spec.index)}","_type":"${jsonEscape(spec.docType)}","_id":"${jsonEscape(id)}"}}"""

  /** The document-source line: the reference's body dict
    * (irclogbot.py:41-45) — channel, nick, posted (ISO seconds), remark,
    * plus the id echoed into the body exactly like `body["id"] = hashval`.
    * Field order fixed for golden-testability.
    */
  def sourceLine(channel: String, nick: String, posted: String,
      remark: String, id: String): String =
    s"""{"channel":"${jsonEscape(channel)}","nick":"${jsonEscape(nick)}","posted":"${jsonEscape(posted)}","remark":"${jsonEscape(remark)}","id":"${jsonEscape(id)}"}"""

  private val IsoSeconds = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  /** Render one record row (schema: channel, nick, remark, posted, id — the
    * [[graft.ingest.IrcParser.record]] shape) as its two bulk NDJSON lines.
    */
  def renderAction(row: Row, spec: IndexSpec = IndexSpec()): Seq[String] = {
    val posted = row.getAs[java.sql.Timestamp]("posted")
    val id = row.getAs[String]("id")
    // Fail loudly on a stamping-bug precondition (matching upsertBatch's
    // posture) instead of NPE-ing executor-side, where writeEachWithRetry
    // would burn 5 retries and dead-letter the record as transport-poisoned.
    require(posted != null,
      "renderAction: null posted timestamp — upstream stamping bug, not a transport failure")
    require(id != null,
      "renderAction: null id — upstream content-key bug, not a transport failure")
    val postedStr = IsoSeconds.format(posted.toInstant)
    Seq(
      actionLine(spec, id),
      sourceLine(row.getAs[String]("channel"), row.getAs[String]("nick"),
        postedStr, row.getAs[String]("remark"), id))
  }

  /** Per-record writer suitable for [[IrcSink.writeEachWithRetry]] /
    * [[graft.streaming.IrcStream.startWithRecordSink]] — the literal
    * `es_client.index(...)` call shape (one action per request), with the
    * reference's retry/drop semantics supplied by the caller.
    */
  def recordWriter(transport: BulkTransport,
      spec: IndexSpec = IndexSpec()): Row => Unit =
    row => transport.send(renderAction(row, spec))

  /** Batch/bulk form: group each partition's records into `_bulk` requests of
    * at most `bulkSize` actions. Executor-side only; retries happen at the
    * bulk-request granularity here (a failed request throws and the Spark
    * task retry replays the partition — safe because ids upsert).
    */
  def writeBulk(records: DataFrame, transport: BulkTransport,
      spec: IndexSpec = IndexSpec(), bulkSize: Int = 500): Unit =
    records.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(bulkSize).foreach { chunk =>
        transport.send(chunk.flatMap(renderAction(_, spec)).toSeq)
      }
    }
}
