package graft.ops

import java.io.InputStream
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Extract-stage utility (SURVEY.md §2.1 scoped the reference's HTTP
  * extractors out of the ENGINE, but a user porting the reference still
  * needs the fetch-to-staging step): download a document to a local
  * staging directory with bounded retries and exponential backoff — the
  * reference's retry policy (5 attempts, 0.2 s base delay, ×2ⁿ;
  * README.md:197-208) as a small, injectable utility.
  *
  * Deliberately NOT a Spark job: at any scale the extract stage is
  * rate-limit-bound, not compute-bound (the reference's whole bulk
  * extraction is 20k API calls spread over days), so it stays a plain
  * driver-side loop writing files that `Readers.jsonMultiLine` then scans
  * distributed. Writes are atomic (temp file + move) so a crashed fetch
  * never leaves a partial document that the scan would read as corrupt.
  */
object Ingest {

  /** Open a URL as a stream. `file://` URLs work for tests and local
    * re-staging; injectable so retry behavior is testable without any
    * network (and so callers can add auth headers via their own opener). */
  def defaultOpen(url: String): InputStream =
    java.net.URI.create(url).toURL.openStream()

  /** Fetch `url` into `stagingDir/fileName`, retrying transient failures.
    *
    * @param maxAttempts total attempts before giving up (last error is
    *   rethrown)
    * @param baseDelayMs backoff before attempt k (1-based) is
    *   baseDelayMs × 2^(k-1); no delay before the first attempt
    * @param sleep injectable for tests (defaults to Thread.sleep)
    * @param open injectable stream opener (defaults to URL.openStream)
    * @return path of the staged file
    */
  def fetchToStaging(
      url: String,
      stagingDir: String,
      fileName: String,
      maxAttempts: Int = 5,
      baseDelayMs: Long = 200L,
      sleep: Long => Unit = Thread.sleep,
      open: String => InputStream = defaultOpen): Path = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val dir = Paths.get(stagingDir)
    Files.createDirectories(dir)
    val target = dir.resolve(fileName)
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < maxAttempts) {
      if (attempt > 0) sleep(baseDelayMs << (attempt - 1))
      attempt += 1
      try {
        val in = open(url)
        try {
          // atomic publish: a reader never sees a half-written document
          val tmp = Files.createTempFile(dir, s".$fileName.", ".part")
          try {
            Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
            Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          } finally Files.deleteIfExists(tmp)
        } finally in.close()
        return target
      } catch {
        case e: Exception => lastError = e
      }
    }
    throw new java.io.IOException(
      s"fetch failed after $maxAttempts attempts: $url", lastError)
  }

  /** Fetch a batch of (url, fileName) pairs sequentially (the extract
    * stage is rate-limited upstream; parallelism belongs to the caller's
    * quota policy, not this utility). Fails fast on the first exhausted
    * URL. */
  def fetchAllToStaging(
      urls: Seq[(String, String)],
      stagingDir: String,
      maxAttempts: Int = 5,
      baseDelayMs: Long = 200L,
      sleep: Long => Unit = Thread.sleep,
      open: String => InputStream = defaultOpen): Seq[Path] =
    urls.map { case (url, name) =>
      fetchToStaging(url, stagingDir, name, maxAttempts, baseDelayMs, sleep, open)
    }
}
