package graft.xrpl

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM — built by
  * the same [[graft.Sessions]] builder Bench and Verify use, so the
  * posture PlanShapeSpec asserts is the posture every entrypoint
  * actually runs under.
  */
object SparkTest {
  lazy val session: SparkSession = graft.Sessions.build("4", "graft-test")
}
