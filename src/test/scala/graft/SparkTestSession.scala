package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM.
  * Small parallelism keeps suite wall-clock low; tests that need the
  * harness tables read /root/testdata/sf0.001 (read-only).
  */
object SparkTestSession {
  val Sf0001 = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Write a tiny fixture table as parquet under a fresh temp dir and
    * return the dir (usable as the `d` argument of any query). */
  def fixtureDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }
}
