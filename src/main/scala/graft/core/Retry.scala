package graft.core

import java.io.IOException
import java.sql.{SQLException, SQLFeatureNotSupportedException, SQLTimeoutException}
import scala.annotation.tailrec
import scala.concurrent.duration._
import scala.util.Random

/** Retry policy for driver-side external calls (JDBC scalar polls, watermark
  * commits, catalog DDL): exponential backoff with jitter, a max-attempt
  * bound, and a retryability filter over exception class + message content.
  *
  * Mirrors the reference's schedule
  * (/root/reference/src/main/scala/services/merging/JdbcMergeServiceClient.scala:38-58):
  * `Schedule.exponential(base, factor).jittered && recurs(max) && recurWhile`
  * where IOException is always transient, SQLFeatureNotSupported /
  * SQLTimeout are always fatal, and other SQLExceptions retry only when the
  * message matches a configured content prefix (deadlock victim, connection
  * reset, ...). Retries are driver-side only — executor-side task retries
  * are Spark's own `spark.task.maxFailures` domain, not duplicated here.
  */
final case class RetryPolicy(baseDelay: FiniteDuration = 100.millis,
                             scaleFactor: Double = 2.0,
                             maxAttempts: Int = 5,
                             retryOnMessageContents: Seq[String] = RetryPolicy.DefaultTransientMessages,
                             mode: RetryPolicy.Mode = RetryPolicy.Always,
                             isBackfilling: Boolean = false,
                             sleeper: Long => Unit = Thread.sleep,
                             jitter: () => Double = () => Random.nextDouble(),
                             // observability hook, fired once per retried
                             // failure BEFORE the backoff sleep (the
                             // reference logs each retry of its schedule)
                             onRetry: (Int, Throwable) => Unit = (_, _) => ()) {

  require(maxAttempts >= 0 && scaleFactor >= 1.0)

  def retriable(t: Throwable): Boolean = t match {
    case _: IOException => true
    case _: SQLFeatureNotSupportedException => false
    case _: SQLTimeoutException => false
    case e: SQLException =>
      retryOnMessageContents.exists(m => Option(e.getMessage).exists(_.contains(m)))
    case _ => false
  }

  private def enabled: Boolean = mode match {
    case RetryPolicy.Never => false
    case RetryPolicy.Always => true
    case RetryPolicy.BackfillOnly => isBackfilling
  }

  /** Delay before retry #n (0-based), jittered in [0.5x, 1.5x) like the
    * reference's `.jittered` combinator.
    */
  def delayMillis(attempt: Int): Long = {
    val raw = baseDelay.toMillis * math.pow(scaleFactor, attempt.toDouble)
    val capped = math.min(raw, 30.seconds.toMillis.toDouble)
    (capped * (0.5 + jitter())).toLong
  }

  /** Run `thunk`, retrying transient failures per the policy. The terminal
    * failure (non-retriable, attempts exhausted, or mode-disabled) is
    * rethrown unchanged.
    */
  def apply[A](thunk: => A): A = {
    @tailrec def loop(attempt: Int): A = {
      val out =
        try Right(thunk)
        catch {
          case t: Throwable if enabled && attempt < maxAttempts && retriable(t) =>
            Left(t)
        }
      out match {
        case Right(a) => a
        case Left(t) =>
          onRetry(attempt, t)
          sleeper(delayMillis(attempt))
          loop(attempt + 1)
      }
    }
    loop(0)
  }
}

object RetryPolicy {
  sealed trait Mode
  case object Never extends Mode
  case object Always extends Mode
  /** Retry only while a backfill is running — steady-state streams prefer to
    * fail fast and restart from the committed watermark (reference
    * `BackfillOnlyImpl`).
    */
  case object BackfillOnly extends Mode

  /** Message fragments marking a retriable SQLException (driver-agnostic
    * spellings of the transient classes the reference configures).
    */
  val DefaultTransientMessages: Seq[String] = Seq(
    "deadlock", "was deadlocked", "Connection reset", "connection is closed",
    "timeout expired", "transport-level error")

  /** No-retry policy, for call sites that must observe the first failure. */
  val disabled: RetryPolicy = RetryPolicy(mode = Never)
}
