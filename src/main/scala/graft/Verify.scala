package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Extra args
  * select a query subset for fast local iteration (the driver passes
  * none); oracle_sql.json is always dumped in full so the local gate
  * stays runnable on whichever names were refreshed. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    Knobs.noteDir(sfDir) // derived knobs + oracle SQL must read this corpus
    val only = args.drop(2).toSet
    // A misspelled subset name must fail loudly, not silently select
    // nothing and let a "0 queries verified" run read as green.
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local-mode heartbeat eviction is pure downside (see Bench) —
      // scaled verify sweeps hit the same freeze class as stress chunks
      .config("spark.network.timeout", "1800s")
      .config("spark.executor.heartbeatInterval", "300s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failures = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonUtil.q(k)}: ${JsonUtil.q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // still degrade per-query (every healthy result is dumped and the
    // driver's compare records the broken ones as missing), but make the
    // process exit non-zero so local CI can't read a partial run as green
    if (failures > 0) {
      System.err.println(s"[verify] $failures quer${if (failures == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
