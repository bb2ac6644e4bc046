package graft.tools

import graft.Sessions
import graft.scaleops.TextAnalysis
import org.apache.spark.sql.functions._

/** Per-expression cost attribution over the documents corpus:
  * `runMain graft.tools.TextProfile [sfDir] [reps]`. */
object TextProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/testdata/sf1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(appName = "text-profile")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to reps).foreach { rep =>
      Sessions.releaseResidue(spark, blocking = true)
      println(s"--- rep $rep")
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      def run(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      time("scan_only")(run(docs.select("doc_id")))
      time("tokenize")(run(docs.select(TextAnalysis.tokens(col("text")))))
      val toksDf = docs.select(col("doc_id"), col("text"),
        TextAnalysis.tokens(col("text")).as("_toks"),
        TextAnalysis.tokens(lower(col("text"))).as("_toksl"))
      time("quality_of_toks")(run(toksDf.select(
        TextAnalysis.qualityScoreOf(col("_toks"), col("text")))))
      time("langid_of_toks")(run(toksDf.select(
        TextAnalysis.langIdOf(col("_toks")))))
      time("fingerprint_of_toks")(run(toksDf.select(
        TextAnalysis.fingerprintOf(col("_toksl")))))
      time("regex_alpha_only")(run(docs.select(
        length(regexp_replace(col("text"), "[^a-z ]", "")))))
      time("one_filter_hof")(run(toksDf.select(
        size(filter(col("_toks"), t => t.isin(TextAnalysis.stopwords: _*))))))
    }
    spark.stop()
  }
}
