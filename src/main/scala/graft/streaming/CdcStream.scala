package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming CDC MERGE maintenance — the incremental form of the batch
  * `i7_cdc_merge` query (r17 verdict "next" #8, the last batch-streaming
  * parity gap in the i-family): instead of re-deriving target ∪ change
  * batch with a full-outer join per run, the merged state table lives in
  * keyed state and each arriving change folds in as it is seen. Rows before
  * `cutUs` are the TARGET build phase (latest pre-cut event per key is the
  * key's base state, whatever its type — pre-cut `error` is a plain state);
  * rows at/after the cut are CDC changes (`error` = delete marker, anything
  * else upserts). Because only the latest event per key decides the batch
  * query's outcome, sequential fold ≡ latest-per-key apply — the parity
  * StreamingSpec pins against the oracle-gated batch twin.
  *
  * Ordering contract (the [[Scd2Stream]] posture): per-key (us, event_id)
  * non-decreasing across batches, any order within a batch (each group's
  * slice is sorted); an older-than-applied row is dropped, mirroring the
  * reference's drop-don't-reorder replay stance.
  *
  * Output (Update mode): one row per key PER BATCH THAT TOUCHED IT — the
  * key's post-batch merged state `(user_id, state, state_us, merge_action,
  * deleted, last_us, last_id)`. The current snapshot is the latest row per
  * key (max (last_us, last_id)) with `deleted = false` — exactly the
  * downstream upsert-sink contract (K1): replaying a batch rewrites the
  * same rows.
  *
  * Scale: state per key is ONE case class; one keyed Exchange amortized
  * over the stream's lifetime — vs the batch form's two window sorts + a
  * full-outer join per refresh.
  */
object CdcStream {

  /** Per-key merged state. `hadTarget` = a pre-cut base state existed;
    * `changed` = any post-cut change applied; `deleted` = tombstone.
    */
  case class St(state: String, stateUs: Long, lastUs: Long, lastId: Long,
      hadTarget: Boolean, changed: Boolean, deleted: Boolean)

  /** Fold a stream of (user_id, us, event_id, event_type) into merged CDC
    * state rows (Update-mode emission; see object scaladoc for the
    * snapshot rule).
    */
  def mergedState(events: DataFrame, cutUs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").cast("long"), col("us").cast("long"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[St]) => {
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption.orNull
          sorted.foreach { case (_, us, id, et) =>
            val inOrder = st == null || us > st.lastUs ||
              (us == st.lastUs && id > st.lastId)
            if (inOrder) {
              if (us < cutUs) {
                // target build: latest pre-cut event IS the base state
                st = St(et, us, us, id, hadTarget = true,
                  changed = false, deleted = false)
              } else if (et == "error") {
                // delete marker; keep phase flags for the action label
                st =
                  if (st == null)
                    St(null, us, us, id, hadTarget = false,
                      changed = true, deleted = true)
                  else st.copy(stateUs = us, lastUs = us, lastId = id,
                    changed = true, deleted = true)
              } else {
                st =
                  if (st == null)
                    St(et, us, us, id, hadTarget = false,
                      changed = true, deleted = false)
                  else St(et, us, us, id, st.hadTarget,
                    changed = true, deleted = false)
              }
            } // else: older than applied — dropped (see scaladoc)
          }
          if (st != null) {
            state.update(st)
            val action =
              if (!st.changed) "unchanged"
              else if (!st.hadTarget) "inserted"
              else "updated"
            Iterator((uid, st.state, st.stateUs, action, st.deleted,
              st.lastUs, st.lastId))
          } else Iterator.empty
        })
      .toDF("user_id", "state", "state_us", "merge_action", "deleted",
        "last_us", "last_id")
  }
}
