package graft

import org.apache.spark.sql.functions._
import graft.ml.Scalers

class ScalersSpec extends SparkSpec {
  import spark.implicits._

  test("standard scaler is ddof=0 (population std), sklearn-exact") {
    // xs = [1,2,3,4]: mu=2.5, std_pop=sqrt(1.25) (ddof=1 would be sqrt(5/3))
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val fit = Scalers.fitStandard(df, Seq("x"))
    val (mu, sd) = fit.stats("x")
    assert(mu == 2.5)
    assert(math.abs(sd - math.sqrt(1.25)) < 1e-12)
    val scaled = fit.transform(df).agg(avg("x"), stddev_pop("x")).head()
    assert(math.abs(scaled.getDouble(0)) < 1e-12)
    assert(math.abs(scaled.getDouble(1) - 1.0) < 1e-12)
  }

  test("minmax scaler maps to [0,1] and reuses train-time stats") {
    val train = Seq(10.0, 20.0, 30.0).toDF("x")
    val fit = Scalers.fitMinMax(train, Seq("x"))
    val test = Seq(15.0, 40.0).toDF("x") // 40 is out of train range → > 1
    val out = fit.transform(test).collect().map(_.getDouble(0))
    assert(out(0) == 0.25 && out(1) == 1.5)
  }

  test("zero-variance column passes through unscaled (no div by zero)") {
    val df = Seq(5.0, 5.0).toDF("x")
    val out = Scalers.fitStandard(df, Seq("x")).transform(df)
      .collect().map(_.getDouble(0))
    assert(out.forall(_ == 0.0)) // (5-5)/1
  }
}
