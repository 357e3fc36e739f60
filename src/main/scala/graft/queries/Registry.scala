package graft.queries

/** All registered query specs, grouped by module. */
object Registry {
  def all: Seq[QuerySpec] =
    RelationalQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ EventQueries.all ++
      MlQueries.all ++ MultimodalQueries.all ++ AnalyticsQueries.all ++
      ExtendedQueries.all ++ PipelineQueries.all ++ GraphQueries.all ++
      StorageQueries.all ++ SeriesQueries.all ++ CurationQueries.all ++
      QualityQueries.all ++ GsodQueries.all ++ GeoQueries.all ++
      EvalQueries.all ++ FeatureQueries.all ++ StatsQueries.all ++
      StreamingQueries.all
}
