package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.YtFunctions

/** U1–U9 semantics over tiny domain fixtures (FIXTURES.md A). */
class UpsertsSpec extends SparkSpec {
  import Upserts._

  private def videos(rows: (String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("video_id", "title", "view_count")
  }

  private def asSet(df: DataFrame): Set[(String, String, Long)] = {
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  test("U1 LWW upsert replaces matched rows wholesale, keeps the rest") {
    val stored = videos(("v1", "old title", 10L), ("v2", "keep me", 20L))
    val incoming = videos(("v1", "new title", 99L), ("v3", "brand new", 1L))
    val got = asSet(upsertLastWriteWins(stored, incoming, Seq("video_id")))
    assert(got == Set(
      ("v1", "new title", 99L), ("v2", "keep me", 20L), ("v3", "brand new", 1L)))
  }

  test("U1 dedupKeepLast collapses a batch like a row-at-a-time loop") {
    import spark.implicits._
    val batch = Seq(("v1", "first", 1L, 1), ("v1", "second", 2L, 2))
      .toDF("video_id", "title", "view_count", "seq")
    val got = dedupKeepLast(batch, Seq("video_id"), Seq(col("seq")))
      .select("video_id", "title", "view_count")
    assert(asSet(got) == Set(("v1", "second", 2L)))
  }

  test("U2 insert-if-absent never touches stored rows") {
    val stored = videos(("v1", "stored wins", 10L))
    val incoming = videos(("v1", "ignored", 0L), ("v2", "added", 5L), ("v2", "dup", 6L))
    val got = asSet(insertIfAbsent(stored, incoming, Seq("video_id")))
    assert(got.contains(("v1", "stored wins", 10L)))
    assert(got.size == 2)
    assert(got.exists { case (id, _, _) => id == "v2" })
  }

  test("U3 partial update touches only the named columns, honors explicit null") {
    import spark.implicits._
    val stored = Seq(
      ("v1", Some("t1"), Some(10L)), ("v2", Some("t2"), Some(20L))
    ).toDF("video_id", "title", "view_count")
    val updates = Seq(
      ("v1", None: Option[String], Some(99L)),
      ("vX", Some("no such row"), Some(0L))
    ).toDF("video_id", "title", "view_count")
    val got = updateSubset(stored, updates, Seq("video_id"), Seq("title"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2))).toSet
    // title updated to explicit NULL, view_count untouched, vX ignored
    assert(got == Set(("v1", None, 10L), ("v2", Some("t2"), 20L)))
  }

  test("U4 keyed delete with composite key") {
    import spark.implicits._
    val stored = Seq(("p1", "v1", 1), ("p1", "v2", 2), ("p2", "v1", 1))
      .toDF("playlist_id", "video_id", "position")
    val removals = Seq(("p1", "v2"), ("zz", "zz")).toDF("playlist_id", "video_id")
    val got = deleteByKey(stored, removals, Seq("playlist_id", "video_id"))
    assert(got.count() == 2)
    assert(got.filter(col("video_id") === "v2").count() == 0)
  }

  test("U5 diff-sync: adds take remote attrs, retained keep stored attrs") {
    import spark.implicits._
    val stored = Seq(("p1", "v1", 1), ("p1", "v2", 2)).toDF("playlist_id", "video_id", "position")
    val remote = Seq(("p1", "v2", 1), ("p1", "v3", 2)).toDF("playlist_id", "video_id", "position")
    val r = diffSync(stored, remote, Seq("playlist_id", "video_id"))
    assert(r.adds.select("video_id").collect().map(_.getString(0)).toSet == Set("v3"))
    assert(r.removes.select("video_id").collect().map(_.getString(0)).toSet == Set("v1"))
    val synced = r.synced.collect().map(x => (x.getString(1), x.getInt(2))).toSet
    // v2 keeps stored position 2 (reference leaves existing rows alone);
    // v3 arrives with remote position 2
    assert(synced == Set(("v2", 2), ("v3", 2)))
  }

  test("U6 conditional upsert: timestamped transcripts always win") {
    import spark.implicits._
    val stored = Seq(
      ("v1", "plain old"), ("v2", "[00:10] timed old"), ("v3", "plain old")
    ).toDF("video_id", "transcript")
    val incoming = Seq(
      ("v1", "[00:30] timed new"), // wins: new has ts
      ("v2", "plain new"),         // loses: old has ts, new doesn't
      ("v3", "plain new"),         // wins: old has no ts
      ("v4", "fresh insert")       // unmatched: inserted
    ).toDF("video_id", "transcript")
    val got = conditionalUpsert(stored, incoming, Seq("video_id")) { (inc, old) =>
      YtFunctions.hasTimestamps(inc("transcript")) ||
        !YtFunctions.hasTimestamps(old("transcript"))
    }.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("v1", "[00:30] timed new"), ("v2", "[00:10] timed old"),
      ("v3", "plain new"), ("v4", "fresh insert")))
  }

  test("U7 freshness gate selects null-ts and stale rows only") {
    import spark.implicits._
    val df = Seq(
      ("fresh", Some("2024-01-19 00:00:00")),
      ("stale", Some("2024-01-01 00:00:00")),
      ("never", None)
    ).toDF("k", "ts").withColumn("ts", to_timestamp(col("ts")))
    val now = to_timestamp(lit("2024-01-20 00:00:00"))
    val got = freshnessGate(df, "ts", now, 7).select("k")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("stale", "never"))
  }

  test("U8 ledger skip") {
    import spark.implicits._
    val work = Seq("u1", "u2", "u3").toDF("url")
    val ledger = Seq("u2").toDF("playlist_url")
    val got = skipProcessed(work, ledger, "url", "playlist_url")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("u1", "u3"))
  }

  test("U9 latest status per key from append-only pings") {
    import spark.implicits._
    val pings = Seq(
      (1L, "p1", "2024-01-01 10:00:00", "started"),
      (2L, "p1", "2024-01-01 10:05:00", "completed"),
      (3L, "p2", "2024-01-01 11:00:00", "started"),
      (4L, "p2", "2024-01-01 11:01:00", "failed_fetch"),
      (5L, "p2", "2024-01-01 11:01:00", "tiebreak-by-id")
    ).toDF("ping_id", "playlist_id", "pinged_timestamp", "status")
      .withColumn("pinged_timestamp", to_timestamp(col("pinged_timestamp")))
    val got = latestByKey(pings, Seq("playlist_id"),
      Seq(col("pinged_timestamp"), col("ping_id")))
      .collect().map(r => (r.getString(1), r.getString(3))).toSet
    assert(got == Set(("p1", "completed"), ("p2", "tiebreak-by-id")))
  }
}
