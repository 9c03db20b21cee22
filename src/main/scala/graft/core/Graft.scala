package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table registry for the graft engine.
  *
  * Scale posture: sessions default to AQE on (runtime shuffle coalescing +
  * skew-join splitting), 32 shuffle partitions for local[32] testing — on a
  * real cluster this knob comes from the submitter, everything else in the
  * engine is partition-count agnostic.
  */
object Graft {

  /** Build a local session wired the way the engine expects.
    * (Reference keeps engine config in `etl/db.py:13-22`; ours is Spark conf.)
    */
  def session(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Dimension tables (region/nation/supplier/part/customer) are small at any
  * scale factor relative to the facts — join code broadcasts them explicitly.
  */
object Tables {
  val dims  = Seq("region", "nation", "customer", "supplier", "part")
  val facts = Seq("orders", "lineitem", "events", "documents", "embeddings")
  val all: Seq[String] = dims ++ facts

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // long (nanosAsLong) — normalize to a micros TimestampType column.
    // The fixture has no sub-microsecond precision, so `div 1000` is exact.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view for the spark.sql surface. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Spread a small input across the cluster before a compute-heavy narrow
    * stage. A few-MB parquet file arrives as ONE partition, serializing
    * e.g. 30M md5 calls onto one core; at cluster scale inputs already have
    * >= defaultParallelism partitions and this is a no-op.
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
