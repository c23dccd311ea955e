package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-test")
    .getOrCreate()

  val Sf0001 = "/root/testdata/sf0.001"

  /** Stage the sf0.001 events table into a fresh temp dir for streaming
    * file-source specs (one copied file -> one AvailableNow micro-batch).
    * One definition for every streaming spec's fixture. */
  def stageEventsDir(): String = {
    val work = java.nio.file.Files.createTempDirectory("graft-events-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$work/events-part1.parquet"))
    work
  }

  override def afterAll(): Unit = {
    // keep the session for the other suites in the same JVM
  }
}
