package graft

import graft.stats.Histogram

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("numpy 'auto' bin count on 1..100 (Sturges wins)") {
    // n=100: sturges = ceil(log2(100)+1) = 8
    // IQR = 75.25 - 25.75 = 49.5 (linear-interpolated quartiles)
    // fd = ceil(99 / (2*49.5/cbrt(100))) = ceil(4.6416) = 5 → max = 8
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val spec = Histogram.autoBinSpec(df, "x")
    assert(spec.nBins == 8)
    assert(spec.lo == 1.0 && spec.hi == 100.0)
  }

  test("bin counts partition all rows, top edge folds into last bin") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val hist = Histogram.histogram(df, "x").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist.values.sum == 100)
    assert(hist.keys.max == 7) // x=100 lands in bin 7, not bin 8
    assert(hist.keys.min == 0)
  }

  test("constant column degrades to a single bin") {
    val df = Seq.fill(50)(3.14).toDF("x")
    val hist = Histogram.histogram(df, "x").collect()
    assert(hist.length == 1 && hist.head.getLong(1) == 50)
  }

  test("multi-column path equals the per-column path (nulls, constants)") {
    val df = Seq(
      (1.0, 10.0, Some(5.0)), (2.0, 10.0, None), (3.0, 10.0, Some(7.0)),
      (4.0, 10.0, Some(9.0)), (100.0, 10.0, Some(11.0)))
      .toDF("a", "const", "withnull")
    val cols = Seq("a", "const", "withnull")
    val multi = Histogram.histogramAll(df, cols).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val single = cols.flatMap { c =>
      Histogram.histogram(df, c).collect()
        .map(r => (c, r.getInt(0)) -> r.getLong(1))
    }.toMap
    assert(multi == single)
    // null rows contribute to no bin for that column
    assert(multi.collect { case ((c, _), n) if c == "withnull" => n }.sum == 4)
  }

  test("multi-column quantiles equal single-column quantiles") {
    val df = (1 to 100).map(i => (i.toDouble, (101 - i).toDouble * 2))
      .toDF("x", "y")
    val ns = Map("x" -> 100L, "y" -> 100L)
    val multi = Histogram.exactQuantilesMulti(
      df, Seq("x", "y"), Seq(0.25, 0.5, 0.75), ns)
    val sx = Histogram.exactQuantiles(df, "x", Seq(0.25, 0.5, 0.75), 100L)
    val sy = Histogram.exactQuantiles(df, "y", Seq(0.25, 0.5, 0.75), 100L)
    assert(multi("x") == sx && multi("y") == sy)
  }
}
