package graft
import org.apache.spark.sql.SparkSession

/** Local mirror of the driver's t1 smoke: run SparkEntry.entry on sf0.001
  * and require rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRYROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
