package graft

import graft.operators.Audit
import java.nio.file.Files

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("audited records SUCCESS with observed read/loaded counts") {
    val dir = Files.createTempDirectory("audit").toFile.getAbsolutePath
    val out = s"$dir/out"
    val run = Audit.audited(spark, "unit", s"$dir/etl_run") { (readObs, loadObs) =>
      val src = Audit.observed((1 to 100).toDF("v"), readObs)
      val loaded = Audit.observed(src.filter($"v" % 2 === 0), loadObs)
      loaded.write.mode("overwrite").parquet(out)
    }
    assert(run.status == "SUCCESS")
    assert(run.records_read == 100L)
    assert(run.records_loaded == 50L)
    val table = spark.read.parquet(s"$dir/etl_run")
    assert(table.count() == 1)
  }

  test("audited records FAILED and rethrows") {
    val dir = Files.createTempDirectory("audit2").toFile.getAbsolutePath
    intercept[RuntimeException] {
      Audit.audited(spark, "unit", s"$dir/etl_run") { (_, _) =>
        throw new RuntimeException("boom")
      }
    }
    val rows = spark.read.parquet(s"$dir/etl_run").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("status") == "FAILED")
    assert(rows.head.getAs[String]("notes") == "boom")
  }
}
