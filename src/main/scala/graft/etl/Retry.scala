package graft.etl

/** Q2 — the reference's per-task retry budget (dag_immigration.py:44-45:
  * `retries: 1, retry_delay: 1 minute`), as an in-engine stage wrapper.
  * Every pipeline write is an idempotent full-refresh overwrite (K1/K2),
  * so a retried stage is safe by construction — the same property the
  * reference relies on for Airflow task retries. */
object Retry {

  /** Run `stage`, retrying up to `retries` extra attempts after failure,
    * sleeping `delayMs` between attempts. The terminal failure carries
    * the earlier attempts' exceptions as suppressed. */
  def withRetry[T](retries: Int, delayMs: Long = 0L)(stage: => T): T = {
    require(retries >= 0, s"retries ($retries) must be >= 0")
    var previous: List[Throwable] = Nil
    var attempt = 0
    while (attempt < retries) {
      try return stage
      catch {
        case e: Throwable =>
          previous ::= e
          attempt += 1
          if (delayMs > 0) Thread.sleep(delayMs)
      }
    }
    try stage
    catch {
      case e: Throwable =>
        previous.foreach(e.addSuppressed)
        throw e
    }
  }
}
