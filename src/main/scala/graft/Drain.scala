package graft

/** Deterministic drain for Spark's async listener bus: poll a monotone
  * reading until it is stable for 3 consecutive 50 ms samples (bounded at
  * 10 s) — a fixed sleep undercounts on a loaded machine. Shared by
  * MicroBench, ShuffleStorageDemo, and listener-counting specs. */
object Drain {
  def untilStable(read: => Long): Long = {
    var prev = Long.MinValue
    var stable = 0
    var waited = 0
    while (stable < 3 && waited < 10000) {
      Thread.sleep(50); waited += 50
      val cur = read
      if (cur == prev) stable += 1 else { stable = 0; prev = cur }
    }
    read
  }
}
