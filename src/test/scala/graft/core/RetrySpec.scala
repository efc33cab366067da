package graft.core

import graft.SparkSpec

import java.io.IOException
import java.sql.{SQLException, SQLTimeoutException}
import scala.concurrent.duration._

class RetrySpec extends SparkSpec {

  private def policy(maxAttempts: Int = 5,
                     sleeps: collection.mutable.Buffer[Long] = collection.mutable.Buffer(),
                     mode: RetryPolicy.Mode = RetryPolicy.Always,
                     backfilling: Boolean = false) =
    RetryPolicy(baseDelay = 10.millis, maxAttempts = maxAttempts, mode = mode,
      isBackfilling = backfilling, sleeper = sleeps.append(_), jitter = () => 0.5)

  test("N transient failures then success converges") {
    var calls = 0
    val sleeps = collection.mutable.Buffer[Long]()
    val out = policy(sleeps = sleeps) {
      calls += 1
      if (calls <= 3) throw new IOException(s"transient $calls")
      42
    }
    assert(out == 42 && calls == 4)
    // exponential: 10, 20, 40 ms at jitter factor 1.0
    assert(sleeps.toList == List(10L, 20L, 40L))
  }

  test("attempts exhausted rethrows the last failure") {
    var calls = 0
    val e = intercept[IOException](policy(maxAttempts = 2) {
      calls += 1; throw new IOException("always")
    })
    assert(e.getMessage == "always" && calls == 3) // initial + 2 retries
  }

  test("non-retriable classes fail fast") {
    var calls = 0
    intercept[SQLTimeoutException](policy() { calls += 1; throw new SQLTimeoutException("slow") })
    assert(calls == 1)
    intercept[IllegalStateException](policy() { calls += 1; throw new IllegalStateException("bug") })
    assert(calls == 2)
  }

  test("SQLException retries only on configured message content") {
    var calls = 0
    val out = policy() {
      calls += 1
      if (calls == 1) throw new SQLException("Transaction was deadlocked on lock resources")
      "ok"
    }
    assert(out == "ok" && calls == 2)
    var calls2 = 0
    intercept[SQLException](policy() { calls2 += 1; throw new SQLException("syntax error near FROM") })
    assert(calls2 == 1)
  }

  test("BackfillOnly mode gates retries on the backfill flag") {
    var calls = 0
    intercept[IOException](
      policy(mode = RetryPolicy.BackfillOnly, backfilling = false) {
        calls += 1; throw new IOException("transient")
      })
    assert(calls == 1, "steady-state stream fails fast")
    var calls2 = 0
    val out = policy(mode = RetryPolicy.BackfillOnly, backfilling = true) {
      calls2 += 1
      if (calls2 == 1) throw new IOException("transient") else "done"
    }
    assert(out == "done" && calls2 == 2)
  }

  test("onRetry hook fires once per retried failure with the attempt index") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var calls = 0
    val out = policy().copy(onRetry = (a, t) => seen += ((a, t.getMessage))) {
      calls += 1
      if (calls <= 2) throw new IOException(s"blip $calls") else "done"
    }
    assert(out == "done")
    assert(seen.toSeq == Seq((0, "blip 1"), (1, "blip 2")),
      "hook sees each retried failure, not the terminal success")
    // terminal (non-retriable) failures do NOT fire the hook
    seen.clear()
    intercept[IllegalStateException](
      policy().copy(onRetry = (a, t) => seen += ((a, t.getMessage))) {
        throw new IllegalStateException("fatal")
      })
    assert(seen.isEmpty)
  }

  test("watermark commit survives a transient store failure") {
    val inner = new InMemoryWatermarkStore
    var fails = 2
    val flaky = new WatermarkStore {
      override def get(t: String) = inner.get(t)
      override def set(t: String, wm: Watermark): Unit = {
        if (fails > 0) { fails -= 1; throw new IOException("blip") }
        inner.set(t, wm)
      }
    }
    val retry = policy()
    val wm = Watermark.mssql(7L)
    retry(flaky.set("tgt", wm))
    assert(inner.get("tgt").contains(wm))
  }
}
