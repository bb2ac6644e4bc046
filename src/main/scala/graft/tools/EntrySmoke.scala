package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(appName = "entry-smoke")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
  }
}
