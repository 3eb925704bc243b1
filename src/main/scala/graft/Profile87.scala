package graft

import graft.operators.Graph

/** Dev tool: time one q87 execution at a given adjacency-broadcast
  * budget (edges; 0 forces the shuffle form), printing the edge count
  * the gate saw. Run: sbt "runMain graft.Profile87 <sfDir> <budgetEdges>" */
object Profile87 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val budget = args(1).toLong
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val und = Graph.undirectedEdges(spark, sfDir)
    val t0 = System.nanoTime()
    val e = und.count()
    println(f"[profile87] edges=$e (counted in ${(System.nanoTime() - t0) / 1e9}%.1fs)")
    val t1 = System.nanoTime()
    val (ranked, cks) = Graph.q87RankedPlan(spark, sfDir, maxBroadcastEdges = budget)
    if (args.length > 2 && args(2) == "explain") {
      // plan-only mode: print the intersect-stage plan without paying
      // for the execution (the checkpointed prefix has already run)
      println(ranked.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    } else {
      val rows = ranked.collect()
      println(f"[profile87] budget=$budget rows=${rows.length} wall=${(System.nanoTime() - t1) / 1e9}%.1fs")
    }
    org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(cks: _*)
    spark.stop()
  }
}
