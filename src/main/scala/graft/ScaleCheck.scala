package graft

import org.apache.spark.sql.functions._

/**
 * Scale-stress harness: replicates the documents table `mult`× (ids
 * shifted so clones are distinct rows — near-dup CLUSTERS of size
 * `mult`, the adversarial shape for dedup-family ops) and times the
 * named heavy operators on it. Companion of the corpus-curation 16×
 * measurement cited in COVERAGE.md; run
 * `sbt "runMain graft.ScaleCheck /root/testdata/sf0.1 16"`.
 */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val n = base.count()
    val big = (0 until mult).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
      .reduce(_ unionAll _)
      .localCheckpoint(true)
    println(s"[scalecheck] corpus: ${n * mult} docs (${mult}x)")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scalecheck] $name ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }
    time("passage_dedup(n=4)") {
      graft.ext.Dedup.duplicatePassageStats(big, "text", "doc_id", n = 4).count()
    }
    time("winnow_fps(k=3,w=4)") {
      graft.ext.TextAnalysis.winnowFingerprintsDF(big, "text", "doc_id").count()
    }
    time("dsir_weights(B=256)") {
      graft.ext.Sampling.dsirWeights(big, "text", "doc_id",
        col("source") === "src0").count()
    }
    time("nb_train_score(B=128)") {
      graft.ext.NaiveBayes.trainAndScore(big, "text", "lang", "doc_id").count()
    }
    spark.stop()
  }
}
