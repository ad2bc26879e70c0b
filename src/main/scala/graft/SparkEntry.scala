package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{BehaviorQueries, CatalogBuildQueries, CatalogEnrichQueries, CdcQueries, CohortQueries, CollectJobQueries, ContextQueries, CorpusAuditQueries, CorpusOpsQueries, CorpusStatsQueries, CurationFunnelQueries, CurationQueries, DateParseQueries, QueueReplayQueries, PortalRegistryQueries, EnrichQueries, ErrorReplayQueries, EventOpsQueries, ExtractJobQueries, ExtractorQueries, FallbackUrlQueries, FrontierQueries, FuzzyMatchQueries, GeoCliQueries, GraphTsQueries, InfraOpsQueries, IntegritySimQueries, KnapsackQueries, ListingQueries, MatchAggQueries, PatternMiningQueries, PatternQueries, PayloadQueries, PersonNerQueries, ProfileQueries, QualityAuditQueries, RetrievalEvalQueries, ScaleOpsQueries, SinkPayloadQueries, StatsQueries, SynopsisQueries, TemporalDpQueries, TokenizerQueries, VectorMiningQueries, WebOpsQueries, DedupQueries, DisambiguationQueries, EventQueries, FingerprintQueries, GeoQueries, LangNgramQueries, MultimodalQueries, RelationalQueries, ReportQueries, ScrapeQueries, SimilarityQueries, SkewQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.joinEnrich(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      EventQueries.queries ++ GeoQueries.queries ++ MultimodalQueries.queries ++
      ReportQueries.queries ++ DisambiguationQueries.queries ++ ScrapeQueries.queries ++
      FingerprintQueries.queries ++ LangNgramQueries.queries ++ DateParseQueries.queries ++ QueueReplayQueries.queries ++ PortalRegistryQueries.queries ++ CohortQueries.queries ++ EnrichQueries.queries ++ ProfileQueries.queries ++ StatsQueries.queries ++ ContextQueries.queries ++ CurationQueries.queries ++ SkewQueries.queries ++ ExtractorQueries.queries ++ ListingQueries.queries ++ CatalogBuildQueries.queries ++ CdcQueries.queries ++ VectorMiningQueries.queries ++ PatternQueries.queries ++ ScaleOpsQueries.queries ++ GeoCliQueries.queries ++ PayloadQueries.queries ++ CollectJobQueries.queries ++ MatchAggQueries.queries ++ ExtractJobQueries.queries ++ FallbackUrlQueries.queries ++ TokenizerQueries.queries ++ PersonNerQueries.queries ++ CatalogEnrichQueries.queries ++ ErrorReplayQueries.queries ++ EventOpsQueries.queries ++ RetrievalEvalQueries.queries ++ WebOpsQueries.queries ++ InfraOpsQueries.queries ++ PatternMiningQueries.queries ++ GraphTsQueries.queries ++ QualityAuditQueries.queries ++ IntegritySimQueries.queries ++ BehaviorQueries.queries ++ TemporalDpQueries.queries ++ KnapsackQueries.queries ++ FuzzyMatchQueries.queries ++ SynopsisQueries.queries ++ CorpusOpsQueries.queries ++ SinkPayloadQueries.queries ++ CorpusStatsQueries.queries ++ CorpusAuditQueries.queries ++ FrontierQueries.queries ++ CurationFunnelQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      EventQueries.oracles ++ GeoQueries.oracles ++ MultimodalQueries.oracles ++
      ReportQueries.oracles ++ DisambiguationQueries.oracles ++ ScrapeQueries.oracles ++
      FingerprintQueries.oracles ++ LangNgramQueries.oracles ++ DateParseQueries.oracles ++ QueueReplayQueries.oracles ++ PortalRegistryQueries.oracles ++ CohortQueries.oracles ++ EnrichQueries.oracles ++ ProfileQueries.oracles ++ StatsQueries.oracles ++ ContextQueries.oracles ++ CurationQueries.oracles ++ SkewQueries.oracles ++ ExtractorQueries.oracles ++ ListingQueries.oracles ++ CatalogBuildQueries.oracles ++ CdcQueries.oracles ++ VectorMiningQueries.oracles ++ PatternQueries.oracles ++ ScaleOpsQueries.oracles ++ GeoCliQueries.oracles ++ PayloadQueries.oracles ++ CollectJobQueries.oracles ++ MatchAggQueries.oracles ++ ExtractJobQueries.oracles ++ FallbackUrlQueries.oracles ++ TokenizerQueries.oracles ++ PersonNerQueries.oracles ++ CatalogEnrichQueries.oracles ++ ErrorReplayQueries.oracles ++ EventOpsQueries.oracles ++ RetrievalEvalQueries.oracles ++ WebOpsQueries.oracles ++ InfraOpsQueries.oracles ++ PatternMiningQueries.oracles ++ GraphTsQueries.oracles ++ QualityAuditQueries.oracles ++ IntegritySimQueries.oracles ++ BehaviorQueries.oracles ++ TemporalDpQueries.oracles ++ KnapsackQueries.oracles ++ FuzzyMatchQueries.oracles ++ SynopsisQueries.oracles ++ CorpusOpsQueries.oracles ++ SinkPayloadQueries.oracles ++ CorpusStatsQueries.oracles ++ CorpusAuditQueries.oracles ++ FrontierQueries.oracles ++ CurationFunnelQueries.oracles
}
