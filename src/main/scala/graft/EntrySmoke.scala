package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    require(n > 0)
    // SQL functions registered via extensions path
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    val fp = spark.sql("SELECT simhash64(text) FROM docs LIMIT 1").head.getLong(0)
    println(s"[smoke] extensions simhash=$fp")
    spark.stop()
  }
}
