package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache discipline shared by every persist-using operator in the
  * library: eagerly materialize the operator's output via
  * `localCheckpoint`, then release the operator-internal persisted
  * frames in a finally — so composing operators in a long-lived session
  * never accumulates dead cache entries, and re-running an operator
  * never trips the cache manager's "already cached" double-persist
  * warning. localCheckpoint blocks live OUTSIDE the SQL cache manager
  * and are reclaimed by the ContextCleaner once the frame is
  * unreferenced, so no unpersist obligation transfers to the caller.
  *
  * The outputs this is applied to are orders of magnitude smaller than
  * the corpus they derive from (duplicate-pair sets, per-doc score rows,
  * per-group diagnostics), so checkpoint storage is cheap relative to
  * the re-scan it avoids. The trade is lineage truncation: on a cluster
  * that loses an executor holding checkpoint blocks the job fails
  * rather than recomputes — for outputs that must survive executor
  * churn, swap in `checkpoint()` to reliable storage (same contract,
  * durable blocks). Callers that need a fully LAZY composable plan use
  * the handle-managed paths ([[Dedup.corpusIndex]]) or the streaming
  * entry points, which never persist per batch.
  *
  * Reclamation timing: localCheckpoint blocks are freed when the result
  * frame becomes unreferenced AND a driver GC cycle lets the
  * ContextCleaner see it — they are invisible to
  * `catalog.clearCache()`. In a long multi-query session (Verify's
  * full-surface sweep, bench loops) blocks from earlier queries can
  * linger until GC; `spark.cleaner.periodicGC.interval` (default 30min)
  * bounds the lag. If memory pressure appears in such a session,
  * suspect this lag before diagnosing a cache leak — the
  * MEMORY_AND_DISK level means lingering blocks spill rather than OOM.
  */
private[graft] object Materialize {
  def andRelease(result: DataFrame, interned: DataFrame*): DataFrame =
    try result.localCheckpoint()
    finally interned.foreach(_.unpersist(false))
}
