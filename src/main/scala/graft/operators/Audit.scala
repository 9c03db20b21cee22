package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** ETL run auditing (SURVEY.md §2.1 S14, §2.4 A4): the reference writes an
  * `etl_run` row per job — STARTED -> SUCCESS/FAILED with read/loaded
  * counters (starter:etl/etl.py:20-44). Here counters come from
  * `Dataset.observe` (exact, collected during the job's own action — no
  * second pass over the data), and the audit row is appended to a parquet
  * audit table.
  */
object Audit {

  final case class EtlRun(
      run_id: Long,
      source_system: String,
      started_at: Timestamp,
      finished_at: Timestamp,
      records_read: Long,
      records_loaded: Long,
      status: String,
      notes: String)

  /** Attach an observation counting this DataFrame's rows as they flow
    * through whatever action consumes it. */
  def observed(df: DataFrame, obs: Observation): DataFrame =
    df.observe(obs, count(lit(1)).as("n"))

  private def obsCount(o: Observation): Long =
    o.getAsJava.getOrDefault("n", java.lang.Long.valueOf(0L))
      .asInstanceOf[java.lang.Long].longValue()

  /** Run `job` (read DF -> loaded DF -> sink action) with read/loaded
    * counters observed, append an EtlRun row to `auditPath`, and rethrow
    * after auditing on failure — the reference's try/except FAILED path.
    */
  def audited(spark: SparkSession, sourceSystem: String, auditPath: String)(
      job: (Observation, Observation) => Unit): EtlRun = {
    import spark.implicits._
    val readObs = new Observation(s"read_${System.nanoTime()}")
    val loadObs = new Observation(s"load_${System.nanoTime()}")
    val started = new Timestamp(System.currentTimeMillis())
    val runId = System.currentTimeMillis()

    def write(status: String, notes: String, consultObs: Boolean): EtlRun = {
      // Observation.get blocks until an observed action completes — on the
      // failure path no action may ever have run, so don't consult it.
      val (r, l) = if (consultObs) (obsCount(readObs), obsCount(loadObs)) else (0L, 0L)
      val run = EtlRun(runId, sourceSystem, started,
        new Timestamp(System.currentTimeMillis()), r, l, status, notes)
      Seq(run).toDS().write.mode("append").parquet(auditPath)
      run
    }

    try {
      job(readObs, loadObs)
      write("SUCCESS", "", consultObs = true)
    } catch {
      case e: Throwable =>
        write("FAILED", Option(e.getMessage).getOrElse(e.getClass.getName),
          consultObs = false)
        throw e
    }
  }
}
