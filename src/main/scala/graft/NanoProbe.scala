package graft
import org.apache.spark.sql.SparkSession
object NanoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema(); df.show(2, false)
    } catch { case e: Throwable => println("READ FAILED: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
