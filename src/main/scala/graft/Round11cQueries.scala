package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Sources
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.IngestPaths

/** Round-11c: continuous corpus ingest oracled END-TO-END (q280).
  * The documents table is split into four JSONL deliveries by
  * `doc_id % 4` (each salted with one malformed line), pushed through
  * [[StreamingIngest.processBatch]] in delivery order — WITH delivery
  * 2 deliberately REPLAYED, the crash-recovery path — and the final
  * corpus is checksummed. The DuckDB oracle recomputes the survivor
  * law from parquet: one doc per token-set fingerprint, winner =
  * lexicographic min (delivery, doc_id) — a batch arriving earlier
  * beats a lower id arriving later; within a delivery the min id
  * wins. A replay that loses survivors (the two-sink loss mode),
  * duplicates them, mis-parses a JSONL line, or leaks a malformed
  * line into the corpus flips the hash.
  */
object Round11cQueries {

  private val DocsSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)
    .add("source", StringType).add("n_chars", LongType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q280_stream_ingest_e2e" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-q280").toFile.getAbsolutePath
      try {
        val docs = Tables.load(s, dir, "documents")
        val paths = IngestPaths(s"$tmp/corpus", s"$tmp/store", s"$tmp/quarantine")
        def delivery(k: Int): DataFrame = {
          val in = s"$tmp/in$k"
          docs.filter(pmod(col("doc_id"), lit(4L)) === k)
            .write.mode("overwrite").json(in)
          // one malformed line per delivery, written raw (no Spark crc
          // sidecar) — must land in quarantine, never the corpus
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$in/zz-malformed.json"),
            s"""{"doc_id": ${90000 + k}, "text": unquoted}\n""")
          Sources.readValidated(s, in, DocsSchema, "json")
        }
        // deliveries 0,1,2 — then REPLAY 2 (same input, same batch id:
        // the foreachBatch crash-recovery path) — then 3
        Seq(0, 1, 2).foreach(k => StreamingIngest.processBatch(delivery(k), k, paths))
        StreamingIngest.processBatch(delivery(2), 2, paths)
        StreamingIngest.processBatch(delivery(3), 3, paths)

        val nQuarantined = StreamingIngest.quarantined(s, paths)
          .map(_.count()).getOrElse(0L)
        val rowStr = concat_ws("|", col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"), col("ingest_batch"))
        StreamingIngest.corpus(s, paths)
          .withColumn("h",
            conv(substring(md5(rowStr), 1, 15), 16, 10).cast(LongType))
          .agg(
            count(lit(1)).as("n_docs"),
            sum("doc_id").cast(LongType).as("id_sum"),
            sum("ingest_batch").cast(LongType).as("batch_sum"),
            lit(nQuarantined).as("n_quarantined"),
            sum(length(col("text"))).cast(LongType).as("total_chars"),
            expr("bit_xor(h)").as("row_xor"))
          .localCheckpoint() // materialize before the staging tree goes
      } finally {
        import java.nio.file.{Files, Paths}
        import java.util.Comparator
        val root = Paths.get(tmp)
        if (Files.exists(root))
          Files.walk(root).sorted(Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
      }
    }))

  val oracleSql: Map[String, String] = Map(
    "q280_stream_ingest_e2e" -> {
      val fp60 = (s: String) =>
        s"CAST(concat('0x', substring(md5($s), 1, 15)) AS BIGINT)"
      s"""WITH d AS (SELECT doc_id, text, lang, source, n_chars,
         |    CAST(doc_id % 4 AS BIGINT) AS b,
         |    ${LlmQueries.fingerprintSql} AS fp FROM documents),
         |s AS (SELECT *, row_number()
         |    OVER (PARTITION BY fp ORDER BY b, doc_id) AS rn FROM d)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(b) AS BIGINT) AS batch_sum,
         |  CAST(4 AS BIGINT) AS n_quarantined,
         |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
         |  CAST(bit_xor(${fp60(
             "concat_ws('|', doc_id, text, lang, source, n_chars, b)")}) AS BIGINT) AS row_xor
         |FROM s WHERE rn = 1""".stripMargin
    })
}
