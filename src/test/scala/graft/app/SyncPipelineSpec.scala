package graft.app

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.connectors.FakeYouTubeConnector
import graft.ops.ParquetTableStore

class SyncPipelineSpec extends SparkSpec {

  test("full channel sync: cold start then incremental with diff + freshness") {
    val store = new ParquetTableStore(tmpDir("sync"))
    val pipe = new SyncPipeline(store, new FakeYouTubeConnector(3))
    val t1 = to_timestamp(lit("2024-02-01 00:00:00"))

    // cold start
    val r1 = pipe.syncChannel(spark, "chanA", t1)
    assert(r1.playlists == 5)
    assert(r1.added == 15) // 5 playlists × 3 members
    assert(r1.removed == 0)
    assert(r1.scraped == 15)
    assert(store.read(spark, "videos").count() == 15)
    assert(store.read(spark, "transcripts").count() == 15)
    val pl = store.read(spark, "playlists")
    assert(pl.filter(col("item_count") === 3).count() == 5)

    // second run 3 days later: same remote state → no adds/removes,
    // nothing stale yet → nothing scraped
    val t2 = to_timestamp(lit("2024-02-04 00:00:00"))
    val r2 = pipe.syncChannel(spark, "chanA", t2)
    assert(r2.added == 0 && r2.removed == 0 && r2.scraped == 0)

    // third run 10 days later: everything stale → all rescraped
    val t3 = to_timestamp(lit("2024-02-14 00:00:00"))
    val r3 = pipe.syncChannel(spark, "chanA", t3)
    assert(r3.scraped == 15)

    // ping log is append-only with a coherent latest view
    val status = pipe.pingStatus(spark)
    assert(status.count() == 5)
    assert(status.filter(col("status") === "completed").count() == 5)
    assert(store.read(spark, "playlist_pings").count() == 5 * 2 * 3)
  }

  test("membership diff: removed remote rows disappear, retained keep attrs") {
    val store = new ParquetTableStore(tmpDir("sync2"))
    val pipe = new SyncPipeline(store, new FakeYouTubeConnector(4))
    val t1 = to_timestamp(lit("2024-03-01 00:00:00"))
    pipe.syncChannel(spark, "chanB", t1)
    assert(store.read(spark, "playlist_videos").count() == 20)

    // shrink the remote membership: connector now returns 2 per playlist
    val pipe2 = new SyncPipeline(store, new FakeYouTubeConnector(2))
    val t2 = to_timestamp(lit("2024-03-20 00:00:00"))
    val r = pipe2.syncChannel(spark, "chanB", t2)
    assert(r.removed == 10) // positions 3,4 of each playlist dropped
    assert(store.read(spark, "playlist_videos").count() == 10)
    assert(store.read(spark, "playlists")
      .filter(col("item_count") === 2).count() == 5)
  }
}
