package graft.tools

import graft.core.Tables
import graft.plans.TopKPerKey
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev micro-bench: custom TopKPerKey operator vs the window formulation
  * on the lineitem fact. Usage: runMain graft.tools.TopKBench <sfDir> */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // top-10 per (suppkey) — 100*sf suppliers, ~600k*sf rows
    def viaCustom() = TopKPerKey.topK(
      Tables.t(spark, sfDir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
      Seq("l_suppkey"),
      Seq("l_extendedprice" -> false, "l_orderkey" -> true, "l_linenumber" -> true), 10)
    def viaWindow() = {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.t(spark, sfDir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10).drop("rn")
    }

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[topkbench] $label%-12s min=${runs.min}%.2fs runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    // same row multiset?
    val a = viaCustom().count(); val b = viaWindow().count()
    println(s"[topkbench] rows custom=$a window=$b")
    time("custom")(viaCustom())
    time("window")(viaWindow())
    spark.stop()
  }
}
