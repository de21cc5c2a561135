package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation.
  *
  * Each round: one equi-join (neighbor labels) + aggregate + update,
  * with `localCheckpoint` cutting lineage so round N doesn't replay
  * rounds 1..N-1. Rounds needed = component diameter (near-dup
  * clusters are near-cliques → 1-2). The loop is driver-coordinated
  * but all data stays distributed — the standard Spark CC shape when
  * GraphFrames isn't on the classpath.
  */
object Graph {

  /** vertices: one column `id`; edges: columns `src`, `dst` (undirected
    * — pass each edge once, both directions are generated here).
    * Returns (id, component) where component = min id reachable. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxRounds: Int = 20): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    var labels = vertices.select(col("id"), col("id").as("label")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val neighborMin = bidir
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("nl")).as("cand"))
      val updated = labels
        .join(neighborMin.select(col("src").as("id"), col("cand")), Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("next"))
        .localCheckpoint()
      changed = updated.filter(col("next") =!= col("label")).count()
      labels = updated.select(col("id"), col("next").as("label"))
      rounds += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
