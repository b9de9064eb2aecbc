package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.Tables
import graft.sources.FormatRoundTrip
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.IngestPaths

/** Round-12 bench extras, two JSON artifacts:
  *
  * 1. STORE-GROWTH axis of the near-dup ingest (r11 verdict task 4's
  *    "done" probe): the documents table split into `N_DELIVERIES`
  *    JSONL deliveries pushed through
  *    [[StreamingIngest.processBatchNearDup]]; per batch it records
  *    wall seconds against the ACCUMULATED store size (rows + bytes).
  *    With the bucketed store the per-batch cost should grow with the
  *    one store scan (shuffle-free probe), never with a store
  *    re-shuffle — the curve makes that inspectable per round.
  *
  * 2. CODEC size/speed report (task 6's storage-monitor tie-in): per
  *    [[FormatRoundTrip.CodecMatrix]] cell, bytes on disk, ratio vs
  *    the same format uncompressed, write and read-back wall ms —
  *    the numbers the oracled q282 deliberately leaves out of its
  *    hash (machine-dependent).
  *
  * Usage: runMain graft.tools.IngestGrowthBench [sfDir] [outPrefix]
  */
object IngestGrowthBench {

  private val NDeliveries = 8

  private val DocsSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)
    .add("source", StringType).add("n_chars", LongType)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outPrefix = if (args.length > 1) args(1) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val growth = ingestGrowth(spark, sfDir)
    writeOut(s"${outPrefix}BENCH_ingest_growth.json", growth)
    val codec = codecReport(spark, sfDir)
    writeOut(s"${outPrefix}BENCH_codec_report.json", codec)
    spark.stop()
  }

  private def writeOut(path: String, json: String): Unit = {
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (json + "\n").getBytes("UTF-8"))
    println(json)
  }

  private def ingestGrowth(spark: SparkSession, sfDir: String): String =
    graft.util.TempDirs.withTempDir("graft-growth") { tmp =>
      val paths = IngestPaths(s"$tmp/corpus", s"$tmp/store", s"$tmp/quarantine")
      val rows = (0 until NDeliveries).map { k =>
        val in = s"$tmp/in$k"
        Tables.load(spark, sfDir, "documents")
          .filter(pmod(col("doc_id"), lit(NDeliveries.toLong)) === k)
          .write.mode("overwrite").json(in)
        val batch = graft.sources.Sources
          .readValidated(spark, in, DocsSchema, "json")
        val t0 = System.nanoTime()
        val rep = StreamingIngest.processBatchNearDup(batch, k, paths)
          .collect().head
        val wall = (System.nanoTime() - t0) / 1e9
        val bands = spark.table(StreamingIngest
          .storeTableName("bands", s"$tmp/store/bands"))
        val storeRows = bands.count()
        val storeBytes =
          FormatRoundTrip.dirBytes(spark, s"$tmp/store/bands") +
            FormatRoundTrip.dirBytes(spark, s"$tmp/store/ngrams")
        s"""{"batch":$k,"wall_s":$wall,"n_in":${rep.getLong(1)},""" +
          s""""n_kept":${rep.getLong(5)},"store_band_rows":$storeRows,""" +
          s""""store_bytes":$storeBytes}"""
      }
      StreamingIngest.dropStoreTables(spark, paths)
      s"""{"bench":"neardup_ingest_store_growth","sf":"$sfDir",""" +
        s""""n_deliveries":$NDeliveries,"deliveries":[${rows.mkString(",")}]}"""
    }

  private def codecReport(spark: SparkSession, sfDir: String): String =
    graft.util.TempDirs.withTempDir("graft-codecs") { tmp =>
      val docs = Tables.load(spark, sfDir, "documents")
      val hostile = FormatRoundTrip.hostileDocs(docs).coalesce(1)
        .localCheckpoint() // isolate codec cost from the derivation
      def writeMs(fmt: String, codec: String, path: String): Double = {
        val t0 = System.nanoTime()
        val w = hostile.write.mode("overwrite").option("compression", codec)
        fmt match {
          case "jsonl" => w.json(path)
          case "csv" => w.option("header", "true").option("escape", "\"")
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false").csv(path)
          case "orc" => w.orc(path)
          case "parquet" => w.parquet(path)
        }
        (System.nanoTime() - t0) / 1e6
      }
      def readMs(fmt: String, path: String): Double = {
        val schema = new StructType().add("doc_id", LongType)
          .add("text2", StringType).add("lang", StringType)
        val t0 = System.nanoTime()
        (fmt match {
          case "jsonl" => spark.read.schema(schema).json(path)
          case "csv" => spark.read.schema(schema)
            .option("header", "true").option("escape", "\"")
            .option("multiLine", "true").csv(path)
          case "orc" => spark.read.orc(path)
          case "parquet" => spark.read.parquet(path)
        }).agg(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e6
      }
      val plain = Map("csv" -> "none", "jsonl" -> "none",
        "orc" -> "none", "parquet" -> "uncompressed")
      val plainBytes = plain.map { case (fmt, codec) =>
        writeMs(fmt, codec, s"$tmp/$fmt-plain")
        fmt -> FormatRoundTrip.dirBytes(spark, s"$tmp/$fmt-plain")
      }
      val cells = FormatRoundTrip.CodecMatrix.map { case (fmt, codec) =>
        val p = s"$tmp/$fmt-$codec"
        val wms = writeMs(fmt, codec, p)
        val rms = readMs(fmt, p)
        val bytes = FormatRoundTrip.dirBytes(spark, p)
        val ratio = (bytes.toDouble / plainBytes(fmt) * 1000).round / 1000.0
        s"""{"format":"$fmt","codec":"$codec","bytes":$bytes,""" +
          s""""vs_plain":$ratio,"write_ms":${wms.round},""" +
          s""""read_ms":${rms.round}}"""
      }
      s"""{"bench":"codec_size_speed","sf":"$sfDir","plain_bytes":{${
        plainBytes.map { case (f, b) => s""""$f":$b""" }.mkString(",")
      }},"cells":[${cells.mkString(",")}]}"""
    }
}
