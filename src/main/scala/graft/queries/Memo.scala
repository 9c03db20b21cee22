package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run-scoped parquet artifact memo — THE pattern behind every
  * train-once/score-many artifact in the query layer (ANN ground truth,
  * sketch register tables, LM/DSIR models, the HLL exact audit): build
  * once per (artifact name, sf dir) per JVM, persist under
  * annArtifactRoot, read back thereafter so recurring evaluations
  * measure the production read path. Oracles recompute every artifact
  * from scratch, so hash-match still proves the derivations. */
private[queries] object Memo {
  private val written = new java.util.concurrent.ConcurrentHashMap[String, String]

  def parquetArtifact(s: SparkSession, dir: String, name: String)
                     (build: => DataFrame): DataFrame = {
    val path = written.computeIfAbsent(s"$name|$dir", { _ =>
      val p = s"${VectorQueries.annArtifactRoot}/$name/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      build.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }
}
