package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark for the TopKWindowRewrite optimizer rule: the same
  * `row_number().over(...) <= k` query timed with the stock optimizer
  * and with the rewrite installed, on the sf events table.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.RewriteBench"
  */
object RewriteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def query = graft.Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 3)

    def time(reps: Int): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        query.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    time(1) // warm file listing + JIT
    val stock = time(3)
    graft.plans.TopKWindowRewrite.install(spark)
    time(1)
    val rewritten = time(3)
    println(f"stock WindowExec plan:   $stock%.3f s")
    println(f"TopKWindowRewrite plan:  $rewritten%.3f s  " +
      f"(${stock / rewritten}%.2fx)")
    spark.stop()
  }
}
