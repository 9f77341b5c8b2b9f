package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SCD Type-2 maintenance — the incremental form of the batch
  * `i5_scd2_dim` query: per-key state transitions fold into versioned
  * validity intervals AS EVENTS ARRIVE, instead of a full-history window
  * recompute. Closed intervals append downstream the moment the closing
  * event is seen; the open (current) interval per key lives in keyed state.
  *
  * Ordering contract: events must arrive per-key in (us, event_id)
  * non-decreasing order ACROSS batches (within a batch any order — the
  * processor sorts each group's batch slice). A row older than the key's
  * last applied event is DROPPED, mirroring the reference bot's
  * drop-don't-reorder posture on replays (SURVEY §2.2); production inputs
  * needing late tolerance put a watermark-sized sorter in front. Batch
  * parity with `i5_scd2_dim`'s closed rows under in-order feed is pinned in
  * StreamingSpec.
  *
  * Scale: state per key is ONE small case class (current version), not the
  * history; the shuffle key is user_id — the same single Exchange as the
  * batch form, amortized across the stream's lifetime.
  */
object Scd2Stream {

  /** Per-key open-interval state: the version being accumulated. */
  case class St(version: Long, state: String, validFrom: Long,
      lastUs: Long, lastId: Long)

  /** Closed SCD2 intervals from a stream of
    * (user_id, us, event_id, event_type) rows; schema matches
    * `i5_scd2_dim`'s closed rows (valid_to_us always set here — the open
    * interval is unemittable until its closing event arrives).
    */
  def closedIntervals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"), col("us").cast("long"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[St]) => {
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, String, Long, Long)]
          sorted.foreach { case (_, us, id, et) =>
            if (st == null) {
              st = St(1L, et, us, us, id)
            } else if (us > st.lastUs || (us == st.lastUs && id > st.lastId)) {
              if (et != st.state) {
                out += ((uid, st.version, st.state, st.validFrom, us))
                st = St(st.version + 1, et, us, us, id)
              } else {
                st = st.copy(lastUs = us, lastId = id)
              }
            } // older than the last applied event: dropped (see scaladoc)
          }
          if (st != null) state.update(st)
          out.iterator
        })
      .toDF("user_id", "version", "state", "valid_from_us", "valid_to_us")
  }
}
