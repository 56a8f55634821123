package graft

/** All verifiable engine capabilities, one [[Qry]] each. Order is the
  * SURVEY.md §2.B build order. */
object Registry {
  def all: Seq[Qry] =
    queries.Relational.all ++ queries.Joins.all ++
      queries.SemiStructured.all ++ queries.Text.all ++
      queries.DedupQ.all ++ queries.SimilarityQ.all ++
      queries.EventsQ.all ++ queries.Parity.all ++
      queries.MultimodalQ.all ++ queries.Udaf.all ++
      queries.SqlSurface.all ++ queries.Scale.all ++
      queries.Extras.all ++ queries.Subqueries.all ++
      queries.CurateQ.all ++ queries.Windows2.all ++
      queries.ComponentsQ.all ++ queries.Pipeline.all ++
      queries.CorpusQ.all ++ queries.Stats.all ++
      queries.SeriesQ.all ++ queries.LayoutQ.all ++
      queries.Signals.all ++ queries.Changes.all ++
      queries.Linkage.all ++ queries.Curation2.all ++
      queries.Pii.all ++ queries.WinnowQ.all ++ queries.BpeTrainQ.all ++
      queries.RagQ.all ++ queries.DriftQ.all ++ queries.EvalQ.all ++
      queries.UnicodeQ.all
}
