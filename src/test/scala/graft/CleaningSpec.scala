package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.clean.Cleaning

class CleaningSpec extends SparkSpec {
  private def frame() = {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType),
      StructField("all_null", DoubleType), StructField("some_null", DoubleType)))
    val rows = java.util.Arrays.asList(
      Row(1, "x", null, 1.0), Row(2, "y", null, null), Row(3, null, null, 3.0))
    spark.createDataFrame(rows, schema)
  }

  test("P1 drops exactly the all-null columns") {
    val (cleaned, removed) = Cleaning.dropAllNullColumns(frame())
    assert(removed == Seq("all_null"))
    assert(cleaned.columns.toSeq == Seq("a", "b", "some_null"))
    assert(cleaned.count() == 3) // rows untouched
  }

  test("P1 keeps a column with a single non-null") {
    val (_, removed) = Cleaning.dropAllNullColumns(frame())
    assert(!removed.contains("some_null") && !removed.contains("b"))
  }

  test("P2 drops only existing columns and reports them") {
    val (cleaned, dropped) = Cleaning.dropColumns(frame(), Seq("a", "nope"))
    assert(dropped == Seq("a"))
    assert(!cleaned.columns.contains("a"))
    val (_, none) = Cleaning.dropColumns(frame(), Seq("zzz"))
    assert(none.isEmpty) // the reference's "no valid columns" path
  }

  test("P4 feature list excludes label and bookkeeping columns") {
    assert(Cleaning.featureColumns(frame(), "a", Seq("b")) ==
      Seq("all_null", "some_null"))
  }

  test("P8 binarize: positive class is value < threshold") {
    val df = frame().select(Cleaning.binarize(col("a"), 2.5).as("bin"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 1, 0))
  }
}
