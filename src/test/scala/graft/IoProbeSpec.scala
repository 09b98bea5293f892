package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the bench's IO-floor probe: returns a positive, sane time
  * on a working filesystem and leaves nothing behind in /tmp. */
class IoProbeSpec extends AnyFunSuite {
  test("ioProbe returns a positive bounded time and cleans up") {
    val t = Bench.ioProbe()
    assert(t > 0.0 && t < 60.0, s"implausible io probe: $t")
    val leftovers = Option(new java.io.File(
      sys.props("java.io.tmpdir")).listFiles()).getOrElse(Array())
      .filter(_.getName.startsWith("graft_ioprobe"))
    assert(leftovers.isEmpty, s"probe left ${leftovers.length} dirs behind")
  }
}
