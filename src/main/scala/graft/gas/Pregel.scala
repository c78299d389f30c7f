package graft.gas

import org.apache.spark.sql.DataFrame

/** Generic DataFrame-Pregel loop — the user-extension point for custom
  * GAS programs (reference: bigdata-gas `IGASProgram`, which users
  * implement for algorithms beyond the shipped BFS/SSSP/CC/PR; here a
  * program is one `superstep` function over DataFrames).
  *
  * A superstep maps (state, edges, iteration) → next state; the loop
  * localCheckpoints each state (lineage truncation — reliable
  * checkpoints on a cluster) and stops when a superstep is a no-op.
  * The shipped algorithms in [[Analytics]] keep their hand-tuned
  * delta-frontier loops (they can detect convergence from the frontier
  * for free); this generic runner pays one exceptAll per superstep for
  * change detection instead, the honest price of arbitrary programs.
  */
object Pregel {

  def run(edges: DataFrame, initial: DataFrame, maxIter: Int = 64)(
      superstep: (DataFrame, DataFrame, Int) => DataFrame): DataFrame = {
    val e = edges.localCheckpoint()
    var state = initial.localCheckpoint()
    var i = 0
    var changed = true
    while (changed && i < maxIter) {
      i += 1
      val next = superstep(state, e, i).localCheckpoint()
      // multiset equality needs BOTH directions — one-sided exceptAll
      // reads a purely-shrinking superstep (rows removed, none added,
      // e.g. k-core peeling) as a no-op and stops a round early. The
      // one-sided check plus a count comparison is equivalent to the
      // symmetric difference at half the exceptAll cost.
      changed = !next.exceptAll(state).isEmpty || next.count() != state.count()
      state = next
    }
    state
  }
}
