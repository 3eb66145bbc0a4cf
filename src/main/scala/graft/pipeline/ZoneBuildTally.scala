package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

/** Process-wide count of zone-artifact BUILDS (not reads): every builder
  * that materializes an artifact directory — [[ArtifactZone.ensure]]'s
  * build branch, [[RawZone]]'s four zone writers, [[CompactedZone]]'s
  * merge — bumps this counter once per build it actually performs.
  *
  * Why it exists (VERDICT r12 item 4): the bench artifact must answer
  * "rebuild or noise?" per row without forensics. A timed run whose
  * cpu_sec explodes while this counter moved did real artifact work (a
  * stale fingerprint, a cleaned target/); one where the counter held
  * still was host contention. [[graft.Bench]] snapshots the counter
  * around every timed window and emits the delta as `zone_builds`.
  */
object ZoneBuildTally {
  val builds = new AtomicLong(0L)
}
