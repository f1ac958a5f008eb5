package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fixture-schema seam: [[Tables.events]] must decode every physical
  * `ts` encoding the driver has shipped (or plausibly will) to the same
  * TimestampType instants. The driver regenerating events.parquet with a
  * different parquet timestamp type cost 16 gates in round 6 — this spec
  * writes all three encodings and asserts the loader normalizes each.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // one known instant: 2024-03-01T12:34:56.789012Z
  private val micros = 1709296496789012L

  private def writeAndLoad(dir: String)(write: String => Unit): (DataType, Seq[Long]) = {
    write(dir)
    val df = Tables.events(spark, dir)
    val loaded = df.schema("ts").dataType
    assert(loaded == TimestampType, s"normalized dtype was $loaded")
    (loaded, df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted)
  }

  test("legacy int64-nanos encoding (nanosAsLong) decodes to the same instants") {
    val dir = tmpDir("evt-nanos")
    val (_, got) = writeAndLoad(dir) { d =>
      // raw int64 column named ts — exactly what nanosAsLong hands the
      // loader when the fixture is parquet TIMESTAMP(NANOS)
      Seq((1L, micros * 1000L), (2L, (micros + 1500L) * 1000L))
        .toDF("event_id", "ts").write.mode("overwrite")
        .parquet(s"$d/events.parquet")
    }
    assert(got == Seq(micros, micros + 1500L))
  }

  test("timestamp_ntz encoding (current fixtures) decodes to the same instants") {
    val dir = tmpDir("evt-ntz")
    val (_, got) = writeAndLoad(dir) { d =>
      Seq((1L, micros), (2L, micros + 1500L)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got == Seq(micros, micros + 1500L))
  }

  test("native timestamp encoding passes through unchanged") {
    val dir = tmpDir("evt-tsz")
    val (_, got) = writeAndLoad(dir) { d =>
      Seq((1L, micros), (2L, micros + 1500L)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got == Seq(micros, micros + 1500L))
  }

  test("current driver fixture loads and the ts column is queryable") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    // the exact operation that died in round 6: date_trunc over ts
    val n = df.select(date_trunc("hour", col("ts"))).where(col("ts").isNotNull).count()
    assert(n > 0)
  }
}
