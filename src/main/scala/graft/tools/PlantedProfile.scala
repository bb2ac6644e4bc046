package graft.tools

import graft.Sessions
import graft.scaleops.Similarity
import org.apache.spark.sql.functions._

/** Stage attribution for dedup_embedding_planted: times the corpus
  * build, the LSH pipeline alone, and the planted-truth side
  * separately. `runMain graft.tools.PlantedProfile [sfDir] [reps]`. */
object PlantedProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/testdata/sf1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(appName = "planted-profile")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to reps).foreach { rep =>
      Sessions.releaseResidue(spark, blocking = true)
      println(s"--- rep $rep")
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      val e = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val pl = e.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + lit(10000000L)).as("vec_id"),
          transform(sequence(lit(1), lit(64)), i =>
            element_at(col("v"), i) +
              lit(0.3) * element_at(col("v"), pmod(i, lit(64)) + lit(1)))
            .as("v"))
      val corpus = e.unionByName(pl)
      time("corpus_count")(corpus.count())
      val approx = time("lsh_plan")(
        Similarity.nearDupPairsLshDerived(corpus, "vec_id", "v",
          threshold = 0.9, dim = 64))
      time("lsh_run")(
        approx.write.format("noop").mode("overwrite").save())
      for ((p, t) <- Seq((10, 8), (14, 16), (18, 31))) {
        val manual = Similarity.nearDupPairsLsh(corpus, "vec_id", "v",
          threshold = 0.9, dim = 64, numPlanes = p, numTables = t)
        time(s"lsh_run_p${p}_t$t")(
          manual.write.format("noop").mode("overwrite").save())
        println(s"  pairs at p=$p t=$t: ${manual.count()}")
      }
      val plDouble = time("planted_truth") {
        import graft.functions.ArrayDot
        def n2(c: org.apache.spark.sql.Column) = sqrt(ArrayDot(c, c))
        e.select(col("vec_id").as("a"), col("v").as("av"))
          .join(pl.select((col("vec_id") - lit(10000000L)).as("a"),
            col("vec_id").as("b"), col("v").as("bv")), "a")
          .withColumn("cos", round(
            ArrayDot(col("av"), col("bv")) / (n2(col("av")) * n2(col("bv"))), 6))
          .filter(col("cos") >= 0.9).count()
      }
      println(s"planted_truth rows: $plDouble")
    }
    spark.stop()
  }
}
