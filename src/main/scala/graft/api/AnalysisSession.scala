package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.clean.Cleaning
import graft.ml.AutoML
import graft.stats.{Correlation, Histogram}

/** Per-task immutable session state — replaces the reference's shared
  * module-global `DataAnalysis` singleton (app.py:17) and its
  * cross-user contamination (SURVEY.md §8.6). Every mutation returns
  * a new session value; the underlying DataFrames are lazy lineage.
  */
final case class TaskConfig(
    taskName: String,
    label: Option[String] = None,
    excludedFeatures: Seq[String] = Nil,
    isTimeSeries: Boolean = false,
    groupBy: Option[String] = None,
    mode: Option[String] = None,
    nanColumns: Seq[String] = Nil)

final case class AnalysisSession(
    config: TaskConfig,
    train: Option[DataFrame] = None,
    test: Option[DataFrame] = None,
    trained: Option[AutoML.Trained] = None) {

  private def cur: DataFrame = train.getOrElse(
    throw new IllegalStateException("no data uploaded"))

  /** Route 1 — upload: eager CSV/parquet ingest with `_row_id`
    * (app.py:23-51; data_analysis.py:17-19). Idempotence belongs to
    * the storage layer (exists-check before write). */
  def upload(spark: SparkSession, path: String): AnalysisSession =
    copy(train = Some(
      if (path.endsWith(".parquet")) spark.read.parquet(path)
      else if (path.endsWith(".xlsx"))
        graft.sources.Xlsx.read(spark, path)
          .withColumn("_row_id",
            org.apache.spark.sql.functions.monotonically_increasing_id())
      else graft.sources.Tables.csvWithRowId(spark, path)))

  def withTrainFrame(df: DataFrame): AnalysisSession = copy(train = Some(df))

  /** Route 2 — display-data: first 5 rows by explicit order
    * (`head()` mapped onto `_row_id`, SURVEY.md §8.8). */
  def displayData: DataFrame = {
    val ordered =
      if (cur.columns.contains("_row_id")) cur.orderBy("_row_id")
      else cur
    ordered.limit(5)
  }

  /** Route 3 — pre-analyze: P1 drop all-null columns, remember them
    * (app.py:62-70). */
  def preAnalyze: AnalysisSession = {
    val (cleaned, removed) = Cleaning.dropAllNullColumns(cur)
    copy(config = config.copy(nanColumns = removed), train = Some(cleaned))
  }

  /** Route 4 — set-supervised-options: label/excluded/TS flags + P2
    * (app.py:72-94). */
  def setSupervisedOptions(label: String, excluded: Seq[String],
                           isTimeSeries: Boolean = false,
                           groupBy: Option[String] = None): AnalysisSession = {
    val (cleaned, dropped) = Cleaning.dropColumns(cur, excluded)
    copy(
      config = config.copy(label = Some(label), excludedFeatures = dropped,
        isTimeSeries = isTimeSeries, groupBy = groupBy),
      train = Some(cleaned))
  }

  /** Visualization routes — result tables feeding plots (S7 mapped to
    * tables, SURVEY.md §1.4). */
  def histogramOf(column: String): DataFrame = Histogram.histogram(cur, column)

  def scatterOf(feature: String): DataFrame = {
    val l = config.label.getOrElse(sys.error("label not set"))
    cur.select(col(feature), col(l))
  }

  def correlations: DataFrame = {
    val l = config.label.getOrElse(sys.error("label not set"))
    val feats = featureCols.filter(c =>
      cur.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    Correlation.corrWithLong(cur, feats, l)
  }

  def acfOf(feature: String, orderCols: Seq[Column], nLags: Int = 10): DataFrame = {
    val g = config.groupBy.getOrElse(sys.error("group_by not set"))
    graft.stats.Acf.acf(cur, g, orderCols, feature, nLags)
  }

  /** D4 — per-group line-series data (reference data_analysis.py:56-79):
    * one ordered projection for ALL groups × the feature, not G
    * filter-scans. */
  def seriesOf(feature: String, orderCols: Seq[Column]): DataFrame = {
    val g = config.groupBy.getOrElse(sys.error("group_by not set"))
    cur.select(col(g) +: orderCols :+ col(feature): _*)
      .orderBy(col(g) +: orderCols: _*)
  }

  def featureCols: Seq[String] = {
    val l = config.label.getOrElse(sys.error("label not set"))
    Cleaning.featureColumns(cur, l,
      config.groupBy.toSeq ++ Seq("date", "_row_id", "_file"))
  }

  /** Route 5/6 — start_ml summary + confirm_training
    * (app.py:142-162 → data_analysis.py:141-149). */
  def startMl(mode: String): AnalysisSession =
    copy(config = config.copy(mode = Some(mode)))

  def confirmTraining(quick: Boolean = true,
                      orderCols: Seq[Column] = Nil): AnalysisSession = {
    val l = config.label.getOrElse(sys.error("label not set"))
    val mode = config.mode match {
      case Some("classification") => AutoML.Classification
      case _ => AutoML.Regression
    }
    val t =
      if (config.isTimeSeries) {
        val g = config.groupBy.getOrElse(sys.error("group_by not set"))
        AutoML.trainTimeSeries(cur, g, orderCols, featureCols, l,
          quick = quick)._2
      } else AutoML.train(cur, l, featureCols, mode, quick = quick)
    copy(trained = Some(t))
  }

  /** Route 7 — upload-test-data (app.py:164-189). */
  def uploadTest(df: DataFrame): AnalysisSession = copy(test = Some(df))

  /** Route 8 — evaluate: transform test, metric report; classification
    * gets real metrics (deliberate fix of the reference's silent
    * no-op, SURVEY.md §8.5). */
  def evaluate(threshold: Option[Double]): DataFrame = {
    val l = config.label.getOrElse(sys.error("label not set"))
    val t = trained.getOrElse(sys.error("model not trained"))
    val testDf = test.getOrElse(sys.error("no test data"))
    AutoML.evaluate(t, testDf, l, threshold)
  }

  def importances: Seq[(String, Double)] =
    AutoML.featureImportances(trained.getOrElse(sys.error("model not trained")))
}
