package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, sequential suites). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    // keep Derby's scratch state out of the repo working tree
    val derbyTmp = java.nio.file.Files.createTempDirectory("graft-derby").toString
    System.setProperty("derby.system.home", derbyTmp)
    System.setProperty("derby.stream.error.file", s"$derbyTmp/derby.log")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.engine.GraftSession.tuned(s)
  }

  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  lazy val sfDir: String = SparkTestBase.sfDir
}
