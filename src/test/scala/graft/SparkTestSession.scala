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

  /** splitmix64 mixing step — the deterministic stand-in for an RNG in
    * fixture corpora (word picks are uncorrelated across ids, so two
    * docs only share text when a test plants it). One definition so
    * fixture generators across suites can't drift. */
  def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Write a tiny fixture table as parquet under a fresh temp dir and
    * return the dir (usable as the `d` argument of any query). */
  def fixtureDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }
}
