package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.AutoML
import graft.sources.Tables

/** ML-pipeline queries. Learned models are rows-only checks by design:
  * fitted values are not SQL-expressible and the correctness contract
  * for M3-M9 is protocol-level (SURVEY.md §8.7) — pinned by
  * AutoMLSpec, not the DuckDB oracle. */
object MlQueries {

  /** M3/M8 shape on harness data: quick CV (1-combo grid, 2 folds)
    * on a deterministic 80/20 hash split of lineitem, predicting
    * price from line attributes; emits the metric report row. */
  def automlTrainEval(s: SparkSession, d: String): DataFrame = {
    val li = Tables.load(s, d, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount", "l_tax", "l_extendedprice")
    val train = li.filter(col("l_orderkey") % 10 < 8)
    val test = li.filter(col("l_orderkey") % 10 >= 8)
    val features = Seq("l_quantity", "l_discount", "l_tax")
    val trained = AutoML.train(train, "l_extendedprice", features,
      AutoML.Regression, numFolds = 2, parallelism = 4, quick = true)
    AutoML.evaluate(trained, test, "l_extendedprice", threshold = Some(30000.0))
  }

  /** Classification mode end-to-end (the reference's silent no-op,
    * implemented for real — SURVEY.md §8.5): binarized price label,
    * quick GBTClassifier CV on a 20% systematic sample of the train
    * split, full-split evaluation. */
  def automlClassify(s: SparkSession, d: String): DataFrame = {
    val li = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_tax"),
        when(col("l_extendedprice") < 30000.0, 1.0).otherwise(0.0).as("hi"))
    val train = li.filter(col("l_orderkey") % 10 < 8 &&
      col("l_orderkey") % 5 === 0)
    val test = li.filter(col("l_orderkey") % 10 >= 8)
    val features = Seq("l_quantity", "l_discount", "l_tax")
    val trained = AutoML.train(train, "hi", features,
      AutoML.Classification, numFolds = 2, parallelism = 4, quick = true)
    AutoML.evaluateClassification(trained, test, "hi")
  }

  /** Smoothed target encoding — the categorical-feature transform a
    * gradient-boosted pipeline wants for high-cardinality keys:
    * enc(cat) = (Σ_cat y + m·ȳ) / (n_cat + m), m = 10. Two aggregate
    * passes (per-category + global) and a broadcast of ONE row; the
    * encoding table itself is the output (join it back to features at
    * train time). Decimal sums keep it order-independent. */
  def targetEncoding(s: SparkSession, d: String): DataFrame = {
    val joined = Tables.load(s, d, "orders")
      .join(broadcast(Tables.load(s, d, "customer")
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        col("o_totalprice").cast("decimal(18,4)").as("y"))
    val grouped = joined.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum(col("y")).as("sum_y"))
    // global mean from the (tiny) grouped output — decimal sums are
    // associative, so Σ sum_y / Σ n is exactly the raw-row mean and
    // the orders scan + join run once, not twice
    val global = grouped.agg(
      (sum(col("sum_y")).cast("double") / sum(col("n_orders"))).as("gmean"))
    grouped
      .crossJoin(broadcast(global))
      .select(col("c_mktsegment"), col("n_orders"),
        round((col("sum_y").cast("double") + lit(10.0) * col("gmean")) /
          (col("n_orders") + lit(10.0)), 6).as("encoding"))
  }

  val targetEncodingOracle: String =
    """WITH j AS (
      |  SELECT c_mktsegment, CAST(o_totalprice AS DECIMAL(18,4)) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |g AS (SELECT CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) / COUNT(*) AS gmean FROM j)
      |SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  ROUND((CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) + 10.0 * gmean) /
      |    (COUNT(*) + 10.0), 6) AS encoding
      |FROM j, g GROUP BY c_mktsegment, gmean""".stripMargin

  val all: Seq[Q] = Seq(
    Q("m3_automl_train_eval", automlTrainEval, None),
    Q("m4_automl_classify", automlClassify, None),
    Q("ml_target_encoding", targetEncoding, Some(targetEncodingOracle)))
}
