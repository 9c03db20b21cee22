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
  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[String])]

  /** Build-once path accessor — for consumers that read the artifact by
    * PATH (the partition-pruned index probes), with optional partition
    * columns so the persisted layout is the production one (e.g. the
    * binary-IVF index partitioned by cell). The cached entry remembers
    * the layout it was BUILT with: a second call site reusing the name
    * with a different partitionBy would silently read the first layout
    * (defeating the partition pruning it asked for), so a layout
    * mismatch fails loudly — one artifact name, one layout.
    *
    * Builds run under ONE reentrant monitor, NOT inside the map's
    * computeIfAbsent: builders legitimately nest (cell_split_tree builds
    * binary_ivf_cent; binary_ivf_sweep builds binary_ivf_index), and a
    * nested computeIfAbsent on the same ConcurrentHashMap is a contract
    * violation that throws "Recursive update" whenever the two keys land
    * in one bin. `synchronized` is reentrant on the builder's own
    * thread, so nesting is safe; builds are rare, heavyweight parquet
    * writes, so serializing them across threads costs nothing real. */
  def parquetArtifactPath(s: SparkSession, dir: String, name: String,
                          partitionBy: Seq[String] = Nil)
                         (build: => DataFrame): String = {
    val key = s"$name|$dir"
    val (p, layout) = {
      val hit = written.get(key)
      if (hit != null) hit
      else synchronized {
        val again = written.get(key) // double-checked under the monitor
        if (again != null) again
        else {
          val p = s"${VectorQueries.annArtifactRoot}/$name/" +
            dir.replaceAll("[^A-Za-z0-9.]", "_")
          build.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(p)
          val entry = (p, partitionBy)
          written.put(key, entry)
          entry
        }
      }
    }
    require(layout == partitionBy,
      s"artifact '$name' was built partitioned by [${layout.mkString(",")}] " +
        s"but this call requests [${partitionBy.mkString(",")}] — use a " +
        "distinct artifact name per layout")
    p
  }

  def parquetArtifact(s: SparkSession, dir: String, name: String)
                     (build: => DataFrame): DataFrame =
    // artifacts are schema-stable per JVM run: skip the per-read footer
    // inference (driver-side) via the shared schema memo
    graft.core.Tables.parquetStableSchema(s,
      parquetArtifactPath(s, dir, name)(build))
}
