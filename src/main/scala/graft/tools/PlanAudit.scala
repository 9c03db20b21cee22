package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query physical-plan census — exchanges (shuffles),
  * broadcasts, whole-stage-codegen coverage — so structural regressions
  * show up as numbers, not vibes.
  * Usage: runMain graft.tools.PlanAudit <sfDir> [queryName]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = only.map(Seq(_)).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    println(f"${"query"}%-24s shuffles bcasts sorts codegen interp")
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        val s = plan.toString
        def n(pat: String) = pat.r.findAllIn(s).size
        val shuffles = n("Exchange hashpartitioning") + n("Exchange rangepartitioning")
        val bcasts = n("BroadcastExchange")
        val sorts = n("\\bSort \\[")
        val codegen = n("\\*\\(\\d+\\)")
        val interp = n("(?m)^\\s*(?!\\*)[+:]- \\w")
        println(f"$name%-24s $shuffles%8d $bcasts%6d $sorts%5d $codegen%7d $interp%6d")
        if (only.isDefined) println(s)
      } catch { case e: Throwable => println(f"$name%-24s ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
