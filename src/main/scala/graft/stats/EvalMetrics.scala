package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D6-D9 — evaluation metrics over a (label, prediction) frame
  * (reference data_analysis.py:163-167,200-204).
  *
  * In Spark the prediction lives in the same row as the label after
  * `model.transform` — a join-by-construction, replacing the
  * reference's positional `zip` pairing (SURVEY.md §2.3 J4). All
  * metrics are single-pass aggregates.
  */
object EvalMetrics {

  /** D7 — RMSE: sqrt(mean((pred − y)²)), sklearn
    * `mean_squared_error(squared=False)`. */
  def rmse(y: Column, pred: Column): Column =
    sqrt(avg(pow(pred - y, 2)))

  def mae(y: Column, pred: Column): Column = avg(abs(pred - y))

  /** D9 — binary confusion counts after P8 thresholding (positive
    * class = value < threshold, reference data_analysis.py:200-201).
    * sklearn label order [0, 1]. */
  def confusionAggs(yBin: Column, predBin: Column): Seq[Column] = Seq(
    sum(when(yBin === 1 && predBin === 1, 1L).otherwise(0L)).as("tp"),
    sum(when(yBin === 0 && predBin === 1, 1L).otherwise(0L)).as("fp"),
    sum(when(yBin === 1 && predBin === 0, 1L).otherwise(0L)).as("fn"),
    sum(when(yBin === 0 && predBin === 0, 1L).otherwise(0L)).as("tn"))

  /** D8 — F1 from confusion counts: 2TP/(2TP+FP+FN) — the
    * oracle-safe exact formula (SURVEY.md §2.4 D8). */
  def f1FromCounts(tp: Column, fp: Column, fn: Column): Column =
    when(lit(2) * tp + fp + fn === 0, 0.0)
      .otherwise(lit(2.0) * tp / (lit(2) * tp + fp + fn))

  /** Full regression+classification report as a one-row frame —
    * continuous label/prediction thresholded by the P8 rule
    * (positive = value < threshold). NOT for already-binary 0/1
    * columns: re-binarizing them at 0.5 inverts the positive class
    * (hi=1 < 0.5 is false) — use [[classificationReport]] there. */
  def report(df: DataFrame, y: Column, pred: Column, threshold: Double): DataFrame = {
    val yBin = graft.clean.Cleaning.binarize(y, threshold)
    val pBin = graft.clean.Cleaning.binarize(pred, threshold)
    reportFrom(df, y, pred, yBin, pBin)
  }

  /** The classifier-output variant: label and prediction are already
    * 0/1 and enter the confusion counts directly, positive class = 1.
    */
  def classificationReport(df: DataFrame, y: Column, pred: Column): DataFrame =
    reportFrom(df, y, pred, y.cast("int"), pred.cast("int"))

  /** Exact tie-aware ROC-AUC via per-distinct-score concordance
    * counting (the Mann–Whitney U identity): with pos_eq/neg_eq the
    * class counts at each score and neg_lt the negatives strictly
    * below it,
    *
    *   AUC = Σ_s pos_eq·(2·neg_lt + neg_eq) / (2·n_pos·n_neg)
    *
    * — every term integral until the final division, so the oracle
    * matches bit-for-bit. The cumulative pass runs over DISTINCT
    * scores only; the contract is score cardinality ≪ row count
    * (model outputs, calibrated bins). For a continuous
    * high-cardinality score, quantize first (e.g. `round(s, 4)` or a
    * KLL-bucketed bin) — the unpartitioned window below is a
    * single-task sort over the distinct-score frame by design, and
    * the contract is ENFORCED: the final aggregate counts the
    * distinct-score rows EXACTLY (they are the groupBy output — the
    * count is free) and `raise_error`s above `maxDistinctScores`
    * (the DynamicPivot cap-guard discipline — silent degradation to
    * a near-row-count single-task sort must be loud). Zero extra
    * scans and an exact admission boundary — this replaced a round-8
    * eager `approx_count_distinct` pre-pass that doubled the query
    * (0.76→1.62 s warm) and, being a ~2-5% rsd sketch, could reject
    * a legitimate input near the cap nondeterministically. The guard
    * is now post-hoc: one over-cap run pays its own degraded cost
    * before failing loudly, the price of folding the check into the
    * only corpus pass (acceptable — the guard exists against silent
    * 10×-over misuse, not to meter the first offense).
    *
    * Single-class input (n_pos·n_neg = 0): AUC is mathematically
    * undefined — the row comes back with the class counts and an
    * explicitly-guarded NULL `auc` (stated semantics, not a silent
    * divide-by-zero artifact). Callers wanting a hard failure should
    * check the counts. */
  def rocAuc(df: DataFrame, score: Column, labelBin: Column,
             maxDistinctScores: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(score.as("s")).agg(
      sum(when(labelBin === 1, 1L).otherwise(0L)).as("pos_eq"),
      sum(when(labelBin === 0, 1L).otherwise(0L)).as("neg_eq"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("neg_lt", coalesce(sum(col("neg_eq")).over(w), lit(0L)))
      .agg(
        count(lit(1)).as("n_s"), // exact distinct-score count, free
        sum(col("pos_eq")).as("n_pos"),
        sum(col("neg_eq")).as("n_neg"),
        sum(col("pos_eq") * (lit(2L) * col("neg_lt") + col("neg_eq")))
          .as("numer2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_s") > maxDistinctScores,
          raise_error(format_string(
            "rocAuc: %d distinct score values exceed the %d cap — the " +
              "per-distinct-score cumulative pass degrades to a " +
              "near-row-count single-task sort. Quantize the score " +
              "first (round(score, k) or a KLL-bucketed bin), or " +
              "raise maxDistinctScores deliberately",
            col("n_s"), lit(maxDistinctScores))).cast("double"))
        .when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("numer2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6))
        .otherwise(lit(null).cast("double")).as("auc"))
  }

  private def reportFrom(df: DataFrame, y: Column, pred: Column,
                         yBin: Column, pBin: Column): DataFrame = {
    val base = df.agg(
      round(rmse(y, pred), 6).as("rmse"),
      (round(mae(y, pred), 6).as("mae") +:
        round(min(y), 6).as("y_min") +:
        round(max(y), 6).as("y_max") +:
        confusionAggs(yBin, pBin)): _*)
    base.withColumn("precision",
        round(when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))), 6))
      .withColumn("recall",
        round(when(col("tp") + col("fn") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn"))), 6))
      .withColumn("f1", round(f1FromCounts(col("tp"), col("fp"), col("fn")), 6))
  }
}
