package graft.queries

/** All registered engine queries. Each module contributes its own
  * `Seq[Q]`; SparkEntry exposes them under the driver contract. */
object Registry {
  lazy val all: Seq[Q] =
    Relational.all ++ RelationalExt.all ++ Events.all ++ StatsQueries.all ++ ScaleQueries.all ++
      MlQueries.all ++ MultimodalQueries.all ++ OperatorQueries.all ++
      TrainingDataQueries.all ++ StreamingQueries.all ++ SignalQueries.all ++
      AnalyticsQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
