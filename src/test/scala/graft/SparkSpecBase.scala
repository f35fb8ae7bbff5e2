package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide SparkSession —
  * startup dominates otherwise). Tests use sf0.001 when they need
  * driver testdata.
  */
object SparkSpecBase {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
  val Sf = "/root/testdata/sf0.001"
}

abstract class SparkSpecBase extends AnyFunSuite {
  final lazy val spark: SparkSession = SparkSpecBase.spark
  def sf: String = SparkSpecBase.Sf

  /** Every FileSourceScanExec in an executed plan, descending through
    * the AQE wrappers (`AdaptiveSparkPlanExec.executedPlan` /
    * `QueryStageExec.plan` hide subtrees from a plain collect).
    */
  protected def fileScans(
      p: org.apache.spark.sql.execution.SparkPlan
  ): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case s: QueryStageExec        => fileScans(s.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(fileScans)
    }
  }
}
