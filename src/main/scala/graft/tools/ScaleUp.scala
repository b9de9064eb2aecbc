package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev diagnostic: synthesize an sf1-scale BENCH dataset from sf0.1 by
  * unioning N id-shifted copies (correctness still gates on the driver
  * fixtures — this data exists only to catch low-parallelism plan shapes
  * empirically at 10× the usual bench scale; see VERDICT r4 item 9).
  *
  * Key families shift consistently (orderkey on both orders and lineitem,
  * custkey on both customer and orders, …) so join selectivities are
  * preserved; dimension tables (nation/region) stay fixed. Document text
  * is per-copy letter-translated so cross-copy near-dup pairs don't
  * explode the LSH candidate set into an unrealistic 10-clone corpus.
  *
  * Usage: runMain graft.tools.ScaleUp [targetDir] [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("/tmp/sf1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Off = 100_000_000_000L // far above any sf0.1 id
    // letters absent from most tokens' hot paths; copy 0 keeps the text
    val letters = "eqjxzvkwyu"

    def shifted(name: String, keyCols: Seq[String],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = graft.Tables.load(spark, src, name)
      val parts = (0 until copies).map { i =>
        val s = keyCols.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * Off)))
        mutate(s, i)
      }
      parts.reduce(_ unionByName _)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$target/$name.parquet")
      println(s"wrote $name x$copies")
    }

    shifted("region", Nil)
    shifted("nation", Nil)
    shifted("customer", Seq("c_custkey"))
    shifted("supplier", Seq("s_suppkey"))
    shifted("part", Seq("p_partkey"))
    shifted("orders", Seq("o_orderkey", "o_custkey"))
    shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    shifted("events", Seq("event_id", "user_id"))
    shifted("documents", Seq("doc_id"), (d, i) =>
      d.withColumn("text", translate(col("text"), "e", letters(i % letters.length).toString)))
    shifted("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
