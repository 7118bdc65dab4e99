package graft.util

/** Per-partition rate limiting + retry with exponential backoff
  * (SURVEY §2 A14) — the reference's Bottleneck(minTime) throttle and
  * 429/5xx retry loop (geocode.js:41, 375-394) for executor-side calls
  * to external services (geocoders, APIs).
  *
  * Used inside `mapPartitions`: one limiter per partition bounds the
  * *cluster-wide* rate to partitions × perPartitionRate, which is how a
  * distributed pipeline has to reason about third-party quotas (there is
  * no cross-executor token bucket without an external coordinator).
  */
object RateLimited {

  /** token-interval limiter: at most one acquire per `minIntervalMs`. */
  final class Limiter(minIntervalMs: Long) extends Serializable {
    private var last = 0L
    def acquire(): Unit = synchronized {
      val now = System.nanoTime() / 1000000
      val wait = last + minIntervalMs - now
      if (wait > 0) Thread.sleep(wait)
      last = System.nanoTime() / 1000000
    }
  }

  /** retry `f` up to `maxRetries` times on retriable errors with linear
    * backoff (the reference uses baseDelay * attempt). Non-retriable
    * errors surface immediately; exhausted retries rethrow the last. */
  def withRetry[T](maxRetries: Int = 3, baseDelayMs: Long = 100,
                   isRetriable: Throwable => Boolean = _ => true,
                   sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    var attempt = 0
    while (true) {
      try return f()
      catch {
        case e: Throwable if attempt < maxRetries && isRetriable(e) =>
          attempt += 1
          sleep(baseDelayMs * attempt)
        case e: Throwable => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** map an iterator with rate limiting + retry — the body to hand to
    * `Dataset.mapPartitions` for external-call stages. `isRetriable`
    * narrows which failures burn a retry (an HTTP 404 should fail
    * fast; a 429/5xx should back off — the reference retries only
    * OVER_QUERY_LIMIT-style statuses the same way). */
  def mapRateLimited[A, B](it: Iterator[A], minIntervalMs: Long,
                           maxRetries: Int = 3, baseDelayMs: Long = 100,
                           isRetriable: Throwable => Boolean = _ => true)
                          (f: A => B): Iterator[B] = {
    val limiter = new Limiter(minIntervalMs)
    it.map { a =>
      limiter.acquire()
      withRetry(maxRetries, baseDelayMs, isRetriable)(() => f(a))
    }
  }
}
