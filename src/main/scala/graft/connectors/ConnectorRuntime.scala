package graft.connectors

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Executor-side fan-out runtime for live connectors — the
  * distributed replacement for the reference's sequential
  * 1-request/sec loops (main_scraper.py:183-216 retries,
  * youtube_utils.py:30-218 per-video fetches). SURVEY §3.2 described
  * this shape; this is the drop-in code.
  *
  * Shape: the request work-list is a DataFrame; the fetch runs inside
  * `mapPartitions`, so a cluster with P partitions sustains at most
  * P × ratePerSecPerPartition requests/sec — the rate knob composes
  * with partition count, which is how a 1000-executor job stays
  * polite per-origin (partition by origin upstream, set the
  * per-partition rate to the per-origin budget).
  *
  * Failure policy: bounded retries with exponential backoff and
  * DETERMINISTIC jitter (portable hash of id+attempt — reproducible,
  * no seed-per-task nondeterminism), and terminal failures captured
  * as an `error` COLUMN, not task aborts: one dead remote item must
  * never kill a whole stage's worth of completed fetches. The caller
  * filters `error IS NULL` / routes the rest to a dead-letter sink
  * (the reference logs-and-continues the same way).
  */
object ConnectorRuntime {

  /** Fan a fetch function out over `requests`, returning
    * (id, payload, attempts, error) — payload/error are mutually
    * exclusive; attempts counts tries actually made.
    *
    * @param ratePerSecPerPartition ≤ 0 disables throttling
    * @param numPartitions 0 keeps the input partitioning
    * @param sleeper injectable for tests (defaults to Thread.sleep)
    */
  def fetchWithPolicy(
      requests: DataFrame,
      idCol: String,
      fetch: String => String,
      ratePerSecPerPartition: Double = 1.0,
      maxAttempts: Int = 3,
      backoffMs: Long = 1000L,
      numPartitions: Int = 0,
      sleeper: Long => Unit = Thread.sleep(_)): DataFrame = {
    require(maxAttempts >= 1)
    val spark = requests.sparkSession
    import spark.implicits._
    val ids = requests.select(col(idCol).cast("string")).as[String]
    val parted: Dataset[String] =
      if (numPartitions > 0) ids.repartition(numPartitions) else ids
    val minIntervalNs =
      if (ratePerSecPerPartition <= 0) 0L
      else (1e9 / ratePerSecPerPartition).toLong
    parted.mapPartitions { it =>
      // token-bucket with capacity 1: the (k+1)-th request waits until
      // k × interval has elapsed since the partition's first request
      var nextAllowedNs = 0L
      it.map { id =>
        var attempt = 0
        var payload: String = null
        var error: String = null
        var done = false
        while (!done) {
          attempt += 1
          if (minIntervalNs > 0) {
            val now = System.nanoTime()
            if (now < nextAllowedNs) sleeper((nextAllowedNs - now) / 1000000L + 1)
            nextAllowedNs = math.max(now, nextAllowedNs) + minIntervalNs
          }
          try { payload = fetch(id); error = null; done = true }
          catch {
            case e: Exception =>
              error = s"${e.getClass.getSimpleName}: ${e.getMessage}"
              if (attempt >= maxAttempts) done = true
              else {
                // deterministic jitter: reproducible across reruns,
                // decorrelated across ids (thundering-herd guard)
                val jitter = math.abs(
                  TextFunctions.portableHash64Local(s"$id:$attempt")) %
                  math.max(1L, backoffMs / 2)
                sleeper(backoffMs * (1L << (attempt - 1)) + jitter)
              }
          }
        }
        (id, Option(payload), attempt, Option(error))
      }
    }.toDF(idCol, "payload", "attempts", "error")
  }
}
