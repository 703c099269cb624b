package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair graph — the step that turns near-dup
  * PAIRS (LSH/winnowing candidates, [[Dedup]]) into dedup CLUSTERS: a
  * training-data pipeline keeps one canonical document per component, not
  * one survivor per pair (pairs are not transitive — A~B, B~C must
  * collapse A, B, C together even when A~C was never generated).
  *
  * Algorithm: iterative minimum-label propagation (the MapReduce-era
  * "hash-to-min" shape — Rastogi et al., "Finding Connected Components in
  * Map-Reduce in Logarithmic Rounds", ICDE 2013): every vertex starts
  * labeled with its own id; each round every vertex takes the min of its
  * label and its neighbors' labels; converged when no label changed. The
  * label a component converges to is its MINIMUM vertex id — which makes
  * the result directly usable as a canonical-document assignment and
  * exactly reproducible by any engine (no partition-order dependence).
  *
  * Scale shape per round: one `groupBy(dst).min` over the edge list (edges
  * carry two longs — partial aggregation collapses duplicate neighbors
  * map-side) and one equi join back to the label table; rounds = graph
  * diameter. Only edge ENDPOINTS participate in rounds — the typically
  * much larger singleton population joins back once at the end. LSH candidate graphs are unions of
  * band-bucket cliques, so their diameter is tiny (a clique converges in
  * one round; chains of overlapping buckets add one round per link).
  * Labels are cached per round and the previous round unpersisted — the
  * convergence count is the action that materializes each round, keeping
  * lineage depth constant. For adversarially deep graphs (long paths) the
  * round count is `maxIter`-bounded; plug a large-star/small-star variant
  * in if a corpus ever produces diameter beyond it (near-dup graphs do
  * not).
  */
object Components {

  /** (id, comp) for every vertex: `comp` = min vertex id reachable through
    * `edges`. Vertices absent from `edges` keep `comp = id`.
    *
    * @param vertices one row per vertex, column `idCol`
    * @param edges    undirected pair list, columns `srcCol`, `dstCol`
    *                 (each pair listed once, either direction; endpoints
    *                 must appear in `vertices`)
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      idCol: String = "id",
      srcCol: String = "id_a",
      dstCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    // symmetrize once and CACHE: every propagation round scans the edge
    // list, and its lineage (for near-dup graphs: the signature kernel +
    // LSH band join) must not re-execute per round. Symmetrization is an
    // explode, NOT a self-union — a union's branches are independent scans,
    // so filling the cache would run the edge lineage once per branch;
    // the explode runs it once total.
    // Cached PRE-PARTITIONED on src: InMemoryRelation preserves its
    // outputPartitioning, so when the label table is too big to broadcast
    // the per-round sort-merge join re-shuffles only the (small) label
    // side, never the 2|E| edge rows. (At label sizes AQE can broadcast,
    // the join is map-side over the cache either way.)
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).as("src"), col(dstCol).as("dst")),
        struct(col(dstCol).as("src"), col(srcCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // propagate over edge ENDPOINTS only: in a dedup corpus most vertices
    // are singletons with no edges — they can never change label, so they
    // stay out of every round and re-join once at the end. The per-round
    // label table is |V_edges|, not |V|. Round 1 is FUSED into the
    // initialization: one `groupBy(dst).min(src)` yields both the endpoint
    // set (sym holds both directions, so `dst` covers every endpoint) and
    // each endpoint's after-one-round label — no separate distinct pass.
    var labels = sym.groupBy(col("dst")).agg(min(col("src")).as("m"))
      .select(col("dst").as("id"), least(col("m"), col("dst")).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var previous = labels
    var changed = 1L
    var iter = 1 // the fused init above IS round 1
    while (changed > 0 && iter < maxIter) {
      // min neighbor label per vertex (partial agg collapses fan-in map-side)
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("comp")).as("nbr_comp"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"), labels("comp"), col("nbr_comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.where(col("nbr_comp") < col("comp")).count()
      previous.unpersist()
      previous = next
      labels = next.select(col("id"),
        least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      iter += 1
    }
    if (changed > 0)
      // `changed` counts the updates the FINAL round then applied, so the
      // result may in fact be converged (a diameter-of-exactly-maxIter
      // graph finishes on that round) — but it was not verified
      System.err.println(s"[components] WARNING: convergence not verified after " +
        s"$maxIter rounds ($changed labels changed in the last round) — results may " +
        "be under-merged; raise maxIter for graphs with diameter beyond it")
    // pin the (endpoint-sized) final labels and release every cached
    // round + the edge cache: nothing of the loop's storage outlives the
    // call except the checkpointed result the returned frame reads
    val finalLabels = labels.localCheckpoint(true)
    previous.unpersist()
    sym.unpersist()
    // singletons re-enter with their own id as component
    vertices.select(col(idCol).as("id"))
      .join(finalLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Canonical-document assignment from near-dup pairs: every document
    * mapped to the minimum doc id of its near-dup component (documents
    * with no near-dup map to themselves). The cluster-collapse step of a
    * dedup pipeline: keep `WHERE id = comp`, drop the rest. */
  def dedupClusters(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    connectedComponents(docs.select(col(idCol)), pairs, idCol)
      .select(col("id").as(idCol), col("comp").as("canonical_id"))
}
