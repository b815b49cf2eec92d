package graft

import scala.collection.concurrent.TrieMap

/** Fixture record for the fault-injection surface.
  * Reference analog: `UnstableData` at
  * `/root/reference/src/main/ru/hse/flinkanomaly/Main.java:85-97` (v1) and
  * `/root/reference/src/test/ru/hse/flinkanomaly/TestFlinkStatefulStreamsRecover.java:213-239`
  * (v2 adds the `group` key field). */
final case class UnstableData(
    name: String,
    failureTimes: Int,
    waitMillis: Long,
    group: String = "None")

/** Simple filter fixture. Reference analog: `Person` at
  * `/root/reference/src/test/ru/hse/flinkanomaly/TestFlinkStreams.java:130-142`. */
final case class Person(name: String, age: Int)

/** JVM-static failure registry for deterministic fault injection.
  * Reference analog: the static `alreadyFailed` map at
  * `/root/reference/src/main/ru/hse/flinkanomaly/Main.java:90-91` ("must be
  * static otherwise each recover it will be recovered to initial value").
  *
  * Single-JVM only (valid under `local[*]` where driver and executors share
  * the process) — test scaffolding, never part of a cluster deployment.
  * Failures surface as Spark task failures and are retried when the master
  * is e.g. `local[4, 4]` (4 task-failure retries), mirroring the
  * reference's fixed-delay restart strategy. */
object FailureRegistry {
  final case class UnstableDataFailedException(name: String)
      extends RuntimeException(s"unstable data '$name' failed")

  private val alreadyFailed = TrieMap.empty[String, Int]

  def reset(): Unit = alreadyFailed.clear()

  def failures(name: String): Int = alreadyFailed.getOrElse(name, 0)

  /** Sleeps `waitMillis`, then throws the first `failureTimes` times per
    * name; passes (returns true) afterwards. Reference analog:
    * `waitValidateOrFail` at `Main.java:101-111`.
    *
    * The claim-a-failure step is a CAS loop (not read-then-update): two
    * concurrent tasks retrying the same name must never both observe the
    * same count and record only one failure — the recovery specs assert
    * exact failure counts. A value of 0 is never stored, so key-absent and
    * count-0 coincide. */
  def waitValidateOrFail(u: UnstableData): Boolean = {
    if (u.waitMillis > 0) Thread.sleep(u.waitMillis)
    @annotation.tailrec
    def claimFailure(): Boolean = {
      val cur = alreadyFailed.getOrElse(u.name, 0)
      if (cur >= u.failureTimes) false
      else {
        val claimed =
          if (cur == 0) alreadyFailed.putIfAbsent(u.name, 1).isEmpty
          else alreadyFailed.replace(u.name, cur, cur + 1)
        if (claimed) true else claimFailure()
      }
    }
    if (claimFailure()) throw UnstableDataFailedException(u.name)
    true
  }
}
