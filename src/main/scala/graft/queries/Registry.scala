package graft.queries

/** All engine queries, grouped by SURVEY.md §2 inventory section. */
object Registry {
  val groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    AggQueries,
    JoinQueries,
    SortSetQueries,
    WindowQueries,
    TextQueries,
    DedupQueries,
    VectorQueries,
    GeoQueries,
    MultimodalQueries,
    PipelineQueries,
    StorageQueries,
    HeadlineQueries)

  lazy val all: Seq[Q] = {
    val qs = groups.flatMap(_.all)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
