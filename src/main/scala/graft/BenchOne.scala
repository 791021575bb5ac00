package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = args(0)
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = Queries.all(q)(spark, dir).count()
      println(f"[benchone] $q ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
