package graft

import org.apache.spark.sql.SparkSession

/** The INTERPRETED-LOOP gate for iterative builders (pagerank / hits / bfs /
  * kcore / coreness / closeness / scc / dedup_clusters).
  *
  * Why the toggle exists: each loop round materializes a TINY frame through
  * `localCheckpoint`, and every round's plan is unique — whole-stage codegen
  * then pays a janino compile per round that costs more than interpreting
  * the handful of rows it covers (measured in round 1; SURVEY §6).
  *
  * Why the toggle must be GATED, not unconditional: at real scale the
  * per-round frames are NOT tiny (the working set is the vertex frame), and
  * the compile cost amortizes over millions of rows per round — there the
  * loop must keep codegen. So the toggle applies only when BOTH hold:
  *
  *   - not in the 100 TB posture (`spark.graft.scale.approx` off), and
  *   - the loop's working set is at most [[DefaultMaxRows]] rows
  *     (overridable via [[MaxRowsKey]]); the count is lazy, so the scale
  *     posture short-circuits without paying any action.
  *
  * Conf hygiene: `spark.sql.codegen.wholeStage` is SESSION-global, so the
  * toggle window is (a) scoped to exactly the loop body — operators build
  * their final returned plan lazily, and its codegen decision happens at
  * the caller's action time, after restore — and (b) serialized on a
  * process-wide monitor so two concurrent builders cannot interleave
  * set/restore and leak the off state. CROSS-QUERY EXPOSURE (declared):
  * the monitor serializes builder-vs-builder only — an UNRELATED query
  * run concurrently on the same session during a gated loop's window
  * executes with codegen off (performance-only: interpreted plans are
  * semantically identical). Callers that interleave gated builders with
  * latency-critical foreign queries on one session should give the loop
  * a cloned session (`spark.newSession`) whose conf is free to toggle.
  * Restore is by EFFECTIVE value:
  * `getOption` on a SQL conf that has a registered default always answers
  * the default, so "was it ever explicitly set" is unobservable through
  * the public conf API — what IS observable, and what
  * `InterpretedLoopSpec` pins, is that the effective value after the
  * builder returns equals the effective value before it entered. */
object InterpretedLoop {

  /** Working sets up to this many rows run their loop rounds interpreted:
    * ~2M rows/round interprets in tens of ms — still far below one janino
    * compile per round — while anything bigger keeps codegen. Every gate
    * corpus (sf0.001 through the sf1 insurance corpus, ≤ 50k docs) sits
    * far below the ceiling, so gate behavior is unchanged by the gate. */
  val DefaultMaxRows = 2000000L

  val MaxRowsKey = "spark.graft.loop.interpretedMaxRows"

  def maxRows(s: SparkSession): Long =
    s.conf.getOption(MaxRowsKey).map(_.toLong).getOrElse(DefaultMaxRows)

  /** Should this loop run interpreted? Lazy in the row count: the 100 TB
    * posture answers without evaluating it. */
  def interpret(s: SparkSession, workingSetRows: => Long): Boolean =
    !ScaleMode.approx(s) && workingSetRows <= maxRows(s)

  private val lock = new Object

  /** Runs `body` with whole-stage codegen off iff [[interpret]] says the
    * loop qualifies; otherwise runs it untouched. Reentrant (a loop that
    * composes another loop re-enters the same monitor on the same
    * thread). */
  def run[T](s: SparkSession, workingSetRows: => Long)(body: => T): T = {
    if (!interpret(s, workingSetRows)) return body
    lock.synchronized {
      // getOption would never answer None here (the conf has a registered
      // default), so capture-and-set-back the effective value
      val prev = s.conf.get("spark.sql.codegen.wholeStage", "true")
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      try body
      finally s.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }
}

/** Scoped session-conf window for operators that know their stages'
  * per-ROW cost is far above what byte-based optimizer heuristics assume
  * (guide §8 "use what you know that the optimizer does not"). Same
  * hygiene contract as [[InterpretedLoop]]: the window covers exactly the
  * eagerly-materializing body, capture-and-restore by effective value,
  * serialized on a process-wide monitor so two scoped builders cannot
  * interleave set/restore; an unrelated query run concurrently on the
  * same session during the window sees the scoped value
  * (performance-only — results are partitioning-independent). */
object ScopedConf {
  private val lock = new Object
  def run[T](s: org.apache.spark.sql.SparkSession, key: String, value: String)(body: => T): T =
    lock.synchronized {
      val prev = s.conf.getOption(key)
      s.conf.set(key, value)
      try body
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
}
