package graft

import java.nio.file.Files

import graft.runner.Runner
import graft.runner.Runner._

/** Orchestration semantics (SURVEY §2.9): filename routing, status
  * lifecycle, single-flight FIFO, retry, quarantine. */
class RunnerSpec extends SparkSpec {

  test("parseFilename handles parts, the products special case, and junk") {
    assert(Runner.parseFilename("raw/orders/orders_part2.csv") ===
      Some(("orders", Some(2))))
    assert(Runner.parseFilename("raw/order_items/order_items_part10.csv") ===
      Some(("order_items", Some(10))))
    assert(Runner.parseFilename("raw/products/products.csv") ===
      Some(("products", None)))
    assert(Runner.parseFilename("raw/misc/readme.txt") === None)
    assert(Runner.parseFilename("orders_partX.csv") === None)
  }

  test("status lifecycle: legal path allowed, shortcuts rejected") {
    assert(transition(Pending, Processing).isRight)
    assert(transition(Processing, Done).isRight)
    assert(transition(Processing, FailedStatus).isRight)
    assert(transition(FailedStatus, Pending).isRight)
    assert(transition(Pending, Done).isLeft)
    assert(transition(Done, Processing).isLeft)
  }

  test("single-flight: nothing dispatched while a chunk is processing") {
    val chunks = Seq(
      Chunk("b2", 200L, Pending),
      Chunk("b1", 100L, Processing))
    assert(Runner.nextChunk(chunks) === None)
  }

  test("FIFO: earliest pending wins, id tie-break") {
    val chunks = Seq(
      Chunk("b3", 300L, Pending),
      Chunk("b1", 100L, Done),
      Chunk("b2", 200L, Pending),
      Chunk("b2a", 200L, Pending))
    assert(Runner.nextChunk(chunks).map(_.batchId) === Some("b2"))
  }

  test("withRetry retries with backoff then succeeds") {
    var calls = 0
    val r = Runner.withRetry(attempts = 3, intervalMs = 1L) { () =>
      calls += 1
      if (calls < 3) sys.error("boom") else 42
    }
    assert(r.toOption === Some(42) && calls === 3)
  }

  test("withRetry exhausts attempts and returns the failure") {
    var calls = 0
    val r = Runner.withRetry(attempts = 2, intervalMs = 1L) { () =>
      calls += 1; sys.error("always")
    }
    assert(r.isFailure && calls === 2)
  }

  test("quarantine moves the file and writes a reason doc") {
    val tmp = Files.createTempDirectory("graft-q")
    val f = Files.writeString(tmp.resolve("orders_part1.csv"), "bad,data")
    val dest = Runner.quarantine(f, tmp.resolve("rejected"), "orders",
      "missing header: order_id")
    assert(Files.exists(dest) && !Files.exists(f))
    val reason = Files.readString(
      dest.resolveSibling(dest.getFileName.toString + ".reason.json"))
    assert(reason.contains("missing header: order_id"))
  }
}
