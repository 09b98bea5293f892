package graft.queries

/** The full declared-query registry consumed by graft.SparkEntry. */
object Pack {
  lazy val all: Seq[QDef] =
    PackCore.queries ++ PackFunctions.queries ++ PackParsers.queries ++
      PackExt.queries ++ PackAnalytics.queries ++ PackScale.queries ++
      PackCuration.queries ++ PackCuration.queries2 ++ PackPipeline.queries

  lazy val byName: Map[String, QDef] = all.map(q => q.name -> q).toMap
}
