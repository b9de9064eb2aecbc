package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-store drift monitoring: compare two snapshots of an
  * embedding table (an upstream encoder re-run, an ingest batch, a
  * re-extraction) by per-label centroid geometry — the embedding-space
  * analogue of [[Diff]]'s row-level corpus diff and the reference's
  * schema/stat drift monitors (`/root/reference/Redshift/
  * redshift_monitor_dag.py`'s track-and-compare loop, re-expressed for
  * vector data).
  *
  * Per label: member counts in each snapshot, the cosine between the
  * two snapshot centroids (1.0 = no directional drift), and the
  * centroid-norm ratio (magnitude drift — embedding norms shifting
  * under a new encoder is a classic silent regression).
  *
  * Scale shape: each snapshot reduces to a (label, pos, mean) relation
  * via posexplode + ONE grouped average — (labels × dims) stat rows, no
  * matter the corpus size. The cosine never re-assembles arrays: the
  * position-wise join feeds three sums (mo·mn, mo², mn²) in one
  * aggregate. No windows; vectors shuffle only as (label, pos, value)
  * triples inside the centroid aggregation — and that shuffle carries
  * partial sums, not members, thanks to map-side partial aggregation.
  */
object EmbeddingDrift {

  /** (label, pos, m): per-label mean of each vector position. */
  def centroids(embs: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    graft.util.Parallelism.ensure(embs)
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))

  /** Drift report between snapshots: (label, n_old, n_new,
    * centroid_cos, norm_ratio), ordered by label. Labels must appear in
    * both snapshots (inner join — a label appearing/disappearing is
    * [[Diff]]'s business, not a geometry drift).
    */
  def report(oldV: DataFrame, newV: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    // ONE scan per snapshot: the (label, pos) aggregate carries the
    // vector count alongside the mean (every non-empty vector has a
    // pos-0 row, so the pos-0 count IS the label's vector count), so no
    // separate counting scan re-reads the snapshot
    def snap(v: DataFrame, m: String, n: String) =
      graft.util.Parallelism.ensure(v)
        .select(col(labelCol).as("label"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg("x").as(m), count(lit(1)).as(n))
    val co = snap(oldV, "mo", "__co_n")
    val cn = snap(newV, "mn", "__cn_n")
    co.join(cn, Seq("label", "pos"))
      .groupBy("label")
      .agg(
        max(when(col("pos") === 0, col("__co_n"))).as("n_old"),
        max(when(col("pos") === 0, col("__cn_n"))).as("n_new"),
        round(sum(col("mo") * col("mn")) /
          (sqrt(sum(col("mo") * col("mo"))) * sqrt(sum(col("mn") * col("mn")))), 4)
          .as("centroid_cos"),
        round(sqrt(sum(col("mn") * col("mn"))) / sqrt(sum(col("mo") * col("mo"))), 4)
          .as("norm_ratio"))
      .select(col("label"), col("n_old"), col("n_new"),
        col("centroid_cos"), col("norm_ratio"))
      .orderBy("label")
  }
}
