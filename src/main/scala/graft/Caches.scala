package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames cached INSIDE library operators (the
  * intermediate frames an operator reuses across two or more of its own
  * joins/aggregates, e.g. dedup signatures or exploded token postings).
  *
  * Spark never auto-unpersists a cached plan, so an operator that caches an
  * intermediate and returns a lazy result would otherwise pin executor
  * memory for the life of the session. One-shot drivers (Verify/Bench)
  * don't care; a long-lived session does. The contract:
  *
  *  - operators route internal caches through [[track]];
  *  - callers invoke [[unpersistAll]] once they have CONSUMED the returned
  *    frames (collected / written — after that the cache is dead weight).
  *
  * Deliberately coarse-grained: per-operator handles would leak into every
  * signature for a bookkeeping concern. Caches whose lifecycle is already
  * internal to one call (cached AND unpersisted inside, like
  * `Dedup.components`) don't go through here.
  */
object Caches {
  private val live = mutable.ListBuffer.empty[DataFrame]

  def track(df: DataFrame): DataFrame = synchronized {
    df.cache()
    live += df
    df
  }

  /** Unpersist every tracked cache (non-blocking) and clear the registry. */
  def unpersistAll(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }

  private[graft] def snapshot: Seq[DataFrame] = synchronized(live.toList)
}
