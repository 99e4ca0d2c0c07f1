package graft.operators

/** Scratch: dump per-(query, table) parquet scan counts (Test/runMain). */
object ScanCountDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("scan-dump", Some("local[8]"))
      .config("spark.sql.shuffle.partitions", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents", "embeddings")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
        val counts = tables.flatMap { t =>
          val n = s"$t\\.parquet".r.findAllIn(plan).size
          if (n >= 2) Some(s"$t=$n") else None
        }
        if (counts.nonEmpty) println(s"MULTI $name ${counts.mkString(",")}")
      } catch { case e: Throwable => println(s"ERR $name ${e.getMessage}") }
    }
    spark.stop()
  }
}
