package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** The per-round lineage-cut discipline shared by the iterative graph
  * ops (BFS, k-core; pageRank and triangles carry older in-place
  * copies pinned by their own specs): persist + localCheckpoint +
  * materialize, so each round's plan reads the previous round's BLOCKS
  * instead of re-deriving r rounds of history (an unrolled iterative
  * plan re-analyzes its whole past every action — the r14 CC probe
  * distortion). Returns the cut frame, its backing RDD (the caller
  * owns the unpersist policy — a loop that only SHRINKS can drop the
  * previous round; a loop whose result unions all rounds must keep
  * them), and the materialized row count (free — the checkpoint needs
  * an action anyway), which is what makes convergence early-exits
  * cost nothing. */
private[graft] object Lineage {

  def cut(df: DataFrame): (DataFrame, RDD[Row], Long) = {
    val r = df.rdd
    r.persist(StorageLevel.MEMORY_AND_DISK)
    r.localCheckpoint()
    val n = r.count()
    (df.sparkSession.createDataFrame(r, df.schema), r, n)
  }
}
