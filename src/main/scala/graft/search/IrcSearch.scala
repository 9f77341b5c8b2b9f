package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The Elasticsearch `irclog` query surface as a library API (SURVEY.md §0
  * capability 2): term filters on channel/nick/id, time-range filters on
  * posted, and full-text relevance search over remark — the operations a
  * reference user runs against the ES index, expressed as Spark plans over
  * the [[graft.sinks.IrcSink]] table.
  *
  * Scale: term/time filters partition-prune on the sink's (channel, day)
  * layout; full-text search builds (doc, term) postings once per corpus —
  * on a real deployment the postings/stats frames would be materialized
  * tables maintained by compaction, the query side is unchanged.
  */
object IrcSearch {

  /** ES bool-filter analog. All filters optional and ANDed. */
  def filterLog(
      logs: DataFrame,
      channel: Option[String] = None,
      nick: Option[String] = None,
      id: Option[String] = None,
      fromPosted: Option[String] = None,
      untilPosted: Option[String] = None): DataFrame = {
    val conds: Seq[Column] =
      channel.map(col("channel") === _).toSeq ++
        nick.map(col("nick") === _).toSeq ++
        id.map(col("id") === _).toSeq ++
        fromPosted.map(t => col("posted") >= lit(t).cast("timestamp")).toSeq ++
        untilPosted.map(t => col("posted") < lit(t).cast("timestamp")).toSeq
    conds.foldLeft(logs)((df, c) => df.filter(c))
  }

  /** ES `match` analog: OR-of-terms BM25 ranking (k1=1.2, b=0.75). Returns
    * the top-k (id-col, score) pairs, ties broken on the id for determinism.
    */
  def searchText(
      docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int = 10): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("__id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("__id")).agg(count(lit(1)).as("dl"))
    val df = toks.groupBy(col("term")).agg(countDistinct(col("__id")).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(avg(col("dl")).as("avg_dl")))
    val idf = df.crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
    tf.join(dl, "__id")
      .join(broadcast(idf.filter(col("term").isin(terms: _*))), "term")
      .withColumn("term_score",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avg_dl")))))
      .groupBy(col("__id"))
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("__id"))
      .limit(k)
      .withColumnRenamed("__id", idCol)
  }

  /** Aggregation facets over a filtered log slice — the ES aggs panel
    * (terms / date_histogram / cardinality) in one pass.
    */
  def facets(logs: DataFrame): DataFrame =
    logs.groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_msgs"),
        countDistinct(col("nick")).as("n_nicks"),
        min(col("posted")).as("first_posted"),
        max(col("posted")).as("last_posted"))
}
