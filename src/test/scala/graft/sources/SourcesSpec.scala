package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.Cdc

/** Ingress-boundary coverage: file envelope sources (batch + streaming)
  * feed the same decode path, and relational side-inputs load with
  * explicit schemas. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val envs = (1 to 5).map { i =>
    s"""{"schema":null,"payload":{"before":null,"after":{"orderid":$i,"custid":${i * 10},"amount":${100 + i},"city":"Austin"},"source":{"version":"1.9.5","connector":"postgresql","name":"myserver","ts_ms":${i * 1000},"snapshot":"false","db":"inventory","schema":"inventory","table":"orders_info","txId":$i,"lsn":$i,"xmin":null},"op":"c","ts_ms":${i * 1000},"transaction":null}}"""
  }

  test("batch envelope files decode through the CDC path") {
    val dir = Files.createTempDirectory("graft-envs")
    Files.write(dir.resolve("part-0.jsonl"), envs.mkString("\n").getBytes)
    val flat = Cdc.unwrap(Cdc.decode(Sources.envelopeFiles(spark, dir.toString)))
    assert(flat.count() == 5)
    assert(flat.agg(sum("amount")).as[Long].head() == (1 to 5).map(100 + _).sum)
  }

  test("streaming envelope files produce the same rows as batch") {
    val dir = Files.createTempDirectory("graft-envs-stream")
    Files.write(dir.resolve("part-0.jsonl"), envs.mkString("\n").getBytes)
    val q = Cdc.unwrap(Cdc.decode(
        Sources.envelopeFileStream(spark, dir.toString)))
      .writeStream.outputMode("append").format("memory").queryName("src_stream")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("src_stream").count() == 5)
    } finally q.stop()
  }

  test("kafkaEnvelopes' projection runs end-to-end via source injection") {
    // No kafka jar / broker exists in this sandbox, so substitute a
    // parquet file-stream carrying Kafka's EXACT wire schema (binary
    // key/value + topic/partition/offset/timestamp/timestampType) and
    // drive the very same code path: readStream → .load() → the
    // CAST(binary AS STRING) projection — then the full CDC decode.
    val dir = Files.createTempDirectory("graft-kafka-shaped")
    val ts = new java.sql.Timestamp(1700000000000L)
    spark.createDataFrame(
        spark.sparkContext.parallelize(envs.zipWithIndex.map { case (v, i) =>
          org.apache.spark.sql.Row(
            s"$i".getBytes("UTF-8"), v.getBytes("UTF-8"),
            "myserver.inventory.orders_info", i % 3, i.toLong, ts, 0)
        }), Sources.kafkaWireSchema)
      .write.parquet(dir.toString + "/t")
    val frame = Sources.kafkaEnvelopes(spark,
      bootstrapServers = "unused:9092", topic = "myserver.inventory.orders_info",
      format = "parquet",
      options = Map("path" -> (dir.toString + "/t")),
      schema = Some(Sources.kafkaWireSchema))
    assert(frame.isStreaming)
    assert(frame.schema.map(f => (f.name, f.dataType)) ==
      Seq(("key", StringType), ("value", StringType)))
    val q = Cdc.unwrap(Cdc.decode(frame))
      .writeStream.outputMode("append").format("memory").queryName("kafka_shaped")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("kafka_shaped")
      assert(rows.count() == 5)
      assert(rows.agg(sum("amount")).as[Long].head() == (1 to 5).map(100 + _).sum)
    } finally q.stop()
  }

  test("csv and json side-inputs load with declared schemas only") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val dir = Files.createTempDirectory("graft-rel")
    Files.write(dir.resolve("t.csv"), "id,name,score\n1,a,1.5\n2,b,2.5\n".getBytes)
    Files.write(dir.resolve("t.jsonl"),
      """{"id":1,"name":"a","score":1.5}
        |{"id":2,"name":"b","score":2.5}""".stripMargin.getBytes)

    val fromCsv = Sources.csvTable(spark, dir.resolve("t.csv").toString, schema)
    val fromJson = Sources.jsonTable(spark, dir.resolve("t.jsonl").toString, schema)
    assert(fromCsv.schema == schema && fromJson.schema == schema)
    assert(fromCsv.exceptAll(fromJson).isEmpty && fromJson.exceptAll(fromCsv).isEmpty)
  }

  test("parquet loader asserts declared columns exist with declared types") {
    val dir = Files.createTempDirectory("graft-parq").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("id", "name").write.parquet(dir)
    val ok = Sources.parquetTable(spark, dir, StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType))))
    assert(ok.columns.toSeq == Seq("id", "name"))
    val err = intercept[IllegalArgumentException] {
      Sources.parquetTable(spark, dir, StructType(Seq(
        StructField("id", LongType))))
    }
    assert(err.getMessage.contains("id"))
  }

  test("orc loader round-trips with the same declared-column assertion") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name").write.orc(dir)
    val ok = Sources.orcTable(spark, dir, StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType))))
    assert(ok.columns.toSeq == Seq("id", "name"))
    assert(ok.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    // pushdown reaches the ORC scan like parquet (columnar contract)
    val plan = ok.filter($"id" > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("greaterthan"),
      s"orc scan must carry the pushed filter:\n${plan.take(1200)}")
    val err = intercept[IllegalArgumentException] {
      Sources.orcTable(spark, dir, StructType(Seq(StructField("id", LongType))))
    }
    assert(err.getMessage.contains("id"))
  }
}
