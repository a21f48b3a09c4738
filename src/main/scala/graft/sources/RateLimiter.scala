package graft.sources

/** Token-bucket rate limiter for API-bound ingest (the reference's GitHub
  * fetcher sleeps on x-ratelimit headers, gitlinks/gitapi.py:25-56; SURVEY
  * §2.1 S6 maps it to a driver/mapPartitions throttle — "not a Catalyst
  * concern").
  *
  * Deterministically testable: time is injected. Use one limiter per
  * partition inside `mapPartitions` so a 1000-executor fetch respects a
  * global budget of (budget / partitions) each.
  */
final class RateLimiter(
    requestsPerWindow: Int,
    windowMillis: Long,
    now: () => Long = () => System.currentTimeMillis(),
    sleep: Long => Unit = Thread.sleep) {
  require(requestsPerWindow > 0 && windowMillis > 0)

  private var windowStart = now()
  private var used = 0

  /** Blocks (via injected sleep) until a request slot is available. */
  def acquire(): Unit = synchronized {
    val t = now()
    if (t - windowStart >= windowMillis) {
      windowStart = t
      used = 0
    }
    if (used >= requestsPerWindow) {
      val waitMs = windowMillis - (t - windowStart)
      if (waitMs > 0) sleep(waitMs)
      windowStart = now()
      used = 0
    }
    used += 1
  }
}
