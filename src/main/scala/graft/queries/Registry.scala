package graft.queries

import graft.QueryDef

/** Single place that decides which query modules are live. */
object Registry {
  def all: Seq[QueryDef] = Relational.defs ++ RelationalDeep.defs ++
    VectorSearch.defs ++
    TextAnalysis.defs ++ DedupQueries.defs ++ ReferencePipeline.defs ++
    EventsQueries.defs ++ MultimodalQueries.defs ++ AdvancedQueries.defs ++
    ScalarQueries.defs ++ SubqueryQueries.defs ++ GroupingQueries.defs ++
    ChunkingQueries.defs ++ QuantizeQueries.defs ++ ExtraQueries.defs ++
    AnalyticsQueries.defs ++ PipelineQueries.defs
}
