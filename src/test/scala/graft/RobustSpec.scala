package graft

import org.apache.spark.sql.functions._
import graft.stats.Robust

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("MAD outliers: hand-computed median/MAD, masking resistance") {
    // group g: values 1..9 plus one gross outlier 1000.
    // median of {1..9, 1000} = 5.5; deviations {4.5,3.5,...,0.5,994.5}
    // → MAD = median{0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5} = 2.5
    // threshold 3·1.4826·2.5 = 11.1195 → exactly one outlier (1000).
    // A z-score rule with the same data: mean ≈ 104.5, σ ≈ 298 —
    // the outlier is only 3.0σ out and its neighbors are < 0.4σ,
    // i.e. the outlier MASKS itself; MAD does not care.
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val got = Robust.madOutliers(df, "grp", "v").collect().head
    assert(got.getString(0) == "g")
    assert(got.getLong(1) == 10L)
    assert(got.getDouble(2) == 5.5)   // median
    assert(got.getDouble(3) == 2.5)   // MAD
    assert(got.getLong(4) == 1L)      // the single gross outlier
    assert(got.getDouble(5) == 994.5) // max |dev|
  }

  test("MAD outliers: constant series has MAD 0 and flags any deviant") {
    val df = (Seq.fill(20)(7.0) :+ 7.1).map(("c", _)).toDF("grp", "v")
    val got = Robust.madOutliers(df, "grp", "v").collect().head
    assert(got.getDouble(3) == 0.0)
    assert(got.getLong(4) == 1L) // 7.1 deviates from a zero-MAD series
  }
}
