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
      // All 35 suites share this one 8g JVM; the deep composed plans
      // (TrainingPipeline.run at full config) can render multi-hundred-MB
      // physicalPlanDescription strings on EVERY action (the listener
      // event path builds them even with the UI off). The full test run
      // OOM'd in exactly that StringConcat once the suite count grew
      // (r12 inherited-state fix); plan strings are diagnostics, so a
      // 4 MB cap truncates them without touching any semantics.
      .config("spark.sql.maxPlanStringLength", (4 * 1024 * 1024).toString)
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
