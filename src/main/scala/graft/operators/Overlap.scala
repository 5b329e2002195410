package graft.operators

/** One bounded daemon pool for every guide-§2.6 "overlap independent
  * jobs" site (forget cascade legs, fixture builds, releaseDelta's two
  * manifests, the shared component fixtures). The overlap sites
  * previously each allocated an ad-hoc `newFixedThreadPool` per CALL —
  * harmless at gate scale but pure churn in tight loops, and a caller
  * hitting a warm cache still paid pool creation. One lazy shared pool
  * removes the churn; 8 threads comfortably covers the widest site (5
  * concurrent fixture builds) while bounding how many Spark jobs the
  * overlaps can have in flight at once (2-3 is the guide's guidance —
  * the sites themselves each submit at most 5).
  *
  * Safety: every task submitted here is a LEAF — none of the overlap
  * sites submits nested work back into this pool and awaits it (that
  * would deadlock a bounded pool), and the sites' futures only touch
  * independent stores. Threads are daemons so the pool never blocks
  * JVM exit (the per-call pools were explicitly shut down instead).
  */
private[graft] object Overlap {
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    8,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-overlap-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    }
  )

  implicit lazy val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(pool)
}
