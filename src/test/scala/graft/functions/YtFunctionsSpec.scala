package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class YtFunctionsSpec extends SparkSpec {
  import YtFunctions._

  private def eval1(c: org.apache.spark.sql.Column, input: (String, Any)*): Any = {
    import spark.implicits._
    val df = input.toList match {
      case (n, v: String) :: Nil => Seq(Option(v)).toDF(n)
      case (n, v) :: Nil => Seq(Option(v.asInstanceOf[Integer]).map(_.toInt)).toDF(n)
      case _ => fail("one column expected")
    }
    df.select(c.as("r")).head.get(0)
  }

  private def extract(url: String): Any =
    eval1(extractVideoId(col("u")), "u" -> url)

  test("F1 extract_video_id: watch URL, short URL, raw id, misses") {
    assert(extract("https://www.youtube.com/watch?v=dQw4w9WgXcQ") == "dQw4w9WgXcQ")
    assert(extract("https://www.youtube.com/watch?v=dQw4w9WgXcQ&t=42") == "dQw4w9WgXcQ")
    assert(extract("https://youtu.be/dQw4w9WgXcQ") == "dQw4w9WgXcQ")
    assert(extract("https://youtu.be/dQw4w9WgXcQ?si=xyz") == "dQw4w9WgXcQ")
    assert(extract("dQw4w9WgXcQ") == "dQw4w9WgXcQ")
    assert(extract("https://example.com/nothing") == null)
    assert(extract("tooshort") == null)
  }

  test("F1 property: arbitrary ids round-trip through a watch URL") {
    // property-style with a seeded generator (scalatestplus bridge is
    // not in the offline cache, so no forAll)
    val chars = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      Seq('_', '-')).toArray
    val rnd = new scala.util.Random(42)
    val ids = Seq.fill(200)(Array.fill(11)(chars(rnd.nextInt(chars.length))).mkString)
    import spark.implicits._
    val df = ids.toDF("id")
      .withColumn("url", concat(lit("https://www.youtube.com/watch?v="), col("id")))
    val bad = df
      .withColumn("fromUrl", extractVideoId(col("url")))
      .withColumn("fromRaw", extractVideoId(col("id")))
      .filter(col("fromUrl") =!= col("id") || col("fromRaw") =!= col("id"))
    assert(bad.count() == 0)
  }

  test("F2 split-based watch-url id") {
    assert(eval1(videoIdFromWatchUrl(col("u")),
      "u" -> "https://www.youtube.com/watch?v=abc&list=x") == "abc")
    assert(eval1(videoIdFromWatchUrl(col("u")), "u" -> "no-param") == null)
  }

  test("F3 format_duration buckets") {
    def fd(s: Integer) = eval1(formatDuration(col("s")), "s" -> s)
    assert(fd(3723) == "1h 2m 3s")
    assert(fd(123) == "2m 3s")
    assert(fd(3) == "3s")
    assert(fd(0) == "Unknown")
    assert(fd(null) == "Unknown")
    assert(fd(3600) == "1h 0m 0s")
  }

  test("F4 sanitize_filename") {
    def sf(s: String) = eval1(sanitizeFilename(col("s")), "s" -> s)
    assert(sf("""a/b\c*d?e:f"g<h>i|j""") == "a_b_c_d_e_f_g_h_i_j")
    assert(sf("x" * 150) == "x" * 100)
    assert(sf(null) == "untitled")
    assert(sf("clean name") == "clean name")
  }

  test("F5 has_timestamps: the four shapes + negatives") {
    def ht(s: String) = eval1(hasTimestamps(col("s")), "s" -> s)
    assert(ht("intro [00:15] more") == true)
    assert(ht("[1:02:03] chaptered") == true)
    assert(ht("02:15 - topic starts") == true)
    assert(ht("line one\n12:30 midline start") == true)
    assert(ht("angle <9:59> style") == true)
    assert(ht("no timestamps here") == false)
    assert(ht("ratio was 5:4 in the match") == false)
    assert(ht(null) == false)
  }

  test("F6 search_context slices around the hit and bolds it") {
    val text = ("x" * 40) + "The Needle word" + ("y" * 40)
    val got = eval1(searchContext(col("t"), "needle", ctx = 10), "t" -> text)
    assert(got == "xxxxxxThe **Needle** wordyyyyy")
    assert(eval1(searchContext(col("t"), "absent"), "t" -> text) == null)
    // hit at position 1: start clamps to 1
    val atStart = eval1(searchContext(col("t"), "the", ctx = 5), "t" -> "The cat sat")
    assert(atStart == "**The** cat ") // after-slice is 5 chars: " cat "
  }

  test("F8 yyyymmdd parses, garbage → null") {
    def d(s: String) = eval1(yyyymmddToDate(col("s")), "s" -> s)
    assert(d("20240131").toString == "2024-01-31")
    assert(d("not-a-date") == null)
    assert(d("20241332") == null)
  }

  test("F9 freshness predicate") {
    import spark.implicits._
    val now = to_timestamp(lit("2024-01-20 00:00:00"))
    val df = Seq(
      ("fresh", "2024-01-19 00:00:00"),
      ("stale", "2024-01-01 00:00:00"),
      ("never", null)
    ).toDF("k", "ts").withColumn("ts", to_timestamp(col("ts")))
    val fresh = df.filter(isFresh(col("ts"), now, 7)).select("k")
      .as[String].collect().toSet
    assert(fresh == Set("fresh"))
  }

  test("F11 thousands formatting") {
    assert(eval1(formatCount(col("n")), "n" -> Integer.valueOf(1234567)) == "1,234,567")
  }

  test("F12 display-name synthesis") {
    import spark.implicits._
    val df = Seq(
      (Some("My List"), Some(3), "id1"),
      (Some("Empty List"), Some(0), "id2"),
      (None: Option[String], None: Option[Int], "id3")
    ).toDF("title", "n", "id")
    val got = df.select(displayName(col("title"), col("n"), col("id")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("✅ My List", "Empty List", "ID: id3"))
  }

  test("F13 channel-id resolution: pattern priority order") {
    val uc = "UC" + "a" * 22
    def rc(s: String) = eval1(resolveChannelId(col("h")), "h" -> s)
    assert(rc(s"""junk "externalId":"$uc" junk""") == uc)
    assert(rc(s"""junk "channelId":"$uc" junk""") == uc)
    assert(rc(s"""href=/channel/$uc""") == uc)
    assert(rc(s""""browseId":"$uc"""") == uc)
    assert(rc("nothing here") == null)
  }
}
