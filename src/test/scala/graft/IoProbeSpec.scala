package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the bench's IO-floor probe: returns a positive, sane time
  * on a working filesystem and leaves nothing NEW behind in /tmp (the
  * leftover check is scoped to dirs created by this run — another
  * process's crashed probe in the shared tmpdir must not fail us). */
class IoProbeSpec extends AnyFunSuite {
  test("ioProbe returns a positive bounded time and cleans up") {
    def probeDirs(): Set[String] = Option(new java.io.File(
      sys.props("java.io.tmpdir")).listFiles()).getOrElse(Array())
      .filter(_.getName.startsWith("graft_ioprobe")).map(_.getName).toSet
    val before = probeDirs()
    val t = Bench.ioProbe()
    assert(t > 0.0 && t < 60.0, s"implausible io probe: $t")
    val leftovers = probeDirs() -- before
    assert(leftovers.isEmpty, s"probe left ${leftovers.size} dirs behind")
  }
}
