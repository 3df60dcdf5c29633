package graft.stream

import org.scalatest.funsuite.AnyFunSuite

import java.time.Instant

class DailySchedulerSpec extends AnyFunSuite {

  private def at(iso: String) = Instant.parse(iso)

  test("never fires before first markRan") {
    val s = new DailyScheduler(atHourUtc = 2)
    assert(!s.shouldRun(at("2026-01-02T02:30:00Z")))
  }

  test("fires in the scheduled hour once interval elapsed") {
    val s = new DailyScheduler(atHourUtc = 2)
    s.markRan(at("2026-01-01T02:10:00Z"))
    assert(!s.shouldRun(at("2026-01-01T23:00:00Z"))) // wrong hour
    assert(!s.shouldRun(at("2026-01-02T01:59:00Z"))) // right-ish but hour 1
    assert(s.shouldRun(at("2026-01-02T02:15:00Z"))) // 24h+ later, hour 2
  }

  test("does not double-fire within the interval") {
    val s = new DailyScheduler(atHourUtc = 2)
    s.markRan(at("2026-01-02T02:15:00Z"))
    assert(!s.shouldRun(at("2026-01-02T02:45:00Z")))
    assert(s.shouldRun(at("2026-01-03T02:45:00Z")))
  }

  test("custom hour and interval are honored") {
    val s = new DailyScheduler(atHourUtc = 14, intervalHours = 12)
    s.markRan(at("2026-01-01T02:00:00Z"))
    assert(s.shouldRun(at("2026-01-01T14:05:00Z")))
    assert(!s.shouldRun(at("2026-01-01T13:59:00Z")))
  }
}
