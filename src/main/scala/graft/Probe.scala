package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Knobs.noteDir(dir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    t("warmup")(Tables.events(spark, dir).count())
    t("documents.count")(Tables.documents(spark, dir).count())
    t("shingleSets")(graft.ops.Dedup.shingleSetsProbe(spark, dir).count())
    t("bands")(graft.ops.Dedup.bandsProbe(spark, dir).count())
    t("minhash_rep")(graft.ops.Dedup.dedupMinhash(spark, dir).count())
    t("minhash_full")(graft.ops.Dedup.dedupMinhashPairsFull(spark, dir).count())
    t("ann_lsh")(graft.ops.Similarity.annLsh(spark, dir).count())
    t("ann_lsh_again")(graft.ops.Similarity.annLsh(spark, dir).count())
    spark.stop()
  }
}
