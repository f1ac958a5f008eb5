package graft.ops

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized equivalence: the reference applies upserts row-at-a-time
  * (INSERT OR REPLACE / OR IGNORE / UPDATE / DELETE loops over a
  * SQLite table); graft applies them as whole-batch dataflow. For
  * random key/value sequences, the batch operators must land on
  * exactly the table the sequential loop produces.
  */
class UpsertEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812)
  private def key(i: Int) = s"k${i % 17}" // small keyspace → collisions

  private def randomRows(n: Int): Seq[(String, String, Int)] =
    Seq.fill(n)((key(rnd.nextInt(100)), s"v${rnd.nextInt(1000)}", rnd.nextInt(100)))

  test("U1: batch LWW upsert == sequential INSERT OR REPLACE") {
    for (trial <- 1 to 5) {
      val storedRows = randomRows(30).distinctBy(_._1)
      val batchRows = randomRows(25)
      // reference loop: later statements overwrite earlier ones
      val table = mutable.LinkedHashMap[String, (String, String, Int)]()
      storedRows.foreach(r => table(r._1) = r)
      batchRows.foreach(r => table(r._1) = r)
      val expected = table.values.toSet

      val stored = storedRows.toDF("k", "v", "n")
      val batch = batchRows.zipWithIndex
        .map { case ((k, v, n), i) => (k, v, n, i) }.toDF("k", "v", "n", "seq")
      val incoming = Upserts.dedupKeepLast(batch, Seq("k"), Seq(col("seq"))).drop("seq")
      val got = Upserts.upsertLastWriteWins(stored, incoming, Seq("k"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("U2: batch insert-if-absent == sequential INSERT OR IGNORE") {
    for (trial <- 1 to 5) {
      val storedRows = randomRows(20).distinctBy(_._1)
      val batchRows = randomRows(25)
      val table = mutable.LinkedHashMap[String, (String, String, Int)]()
      storedRows.foreach(r => table(r._1) = r)
      batchRows.foreach(r => if (!table.contains(r._1)) table(r._1) = r)
      val expected = table.values.toSet

      val stored = storedRows.toDF("k", "v", "n")
      // INSERT OR IGNORE keeps the FIRST occurrence within the batch
      val batch = batchRows.zipWithIndex
        .map { case ((k, v, n), i) => (k, v, n, i) }.toDF("k", "v", "n", "seq")
      val firstPerKey = Upserts.dedupKeepLast(batch, Seq("k"),
        Seq(-col("seq"))).drop("seq")
      val got = Upserts.insertIfAbsent(stored, firstPerKey, Seq("k"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("U4: batch keyed delete == sequential DELETE loop") {
    for (trial <- 1 to 5) {
      val storedRows = randomRows(30)
      val deleteKeys = Seq.fill(10)(key(rnd.nextInt(100)))
      val expected = storedRows.filterNot(r => deleteKeys.contains(r._1)).toSet

      val got = Upserts.deleteByKey(
        storedRows.toDF("k", "v", "n"),
        deleteKeys.toDF("k"), Seq("k"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("U5: batch diff-sync == sequential add/remove reconciliation") {
    for (trial <- 1 to 5) {
      val storedRows = randomRows(25).distinctBy(_._1)
      val remoteRows = randomRows(25).distinctBy(_._1)
      // reference: remove stored−remote, add remote−stored (keeping
      // stored attrs for retained keys)
      val table = mutable.LinkedHashMap[String, (String, String, Int)]()
      storedRows.foreach(r => table(r._1) = r)
      val remoteKeys = remoteRows.map(_._1).toSet
      table.keys.toSeq.filterNot(remoteKeys.contains).foreach(table.remove)
      remoteRows.foreach(r => if (!table.contains(r._1)) table(r._1) = r)
      val expected = table.values.toSet

      val sync = Upserts.diffSync(
        storedRows.toDF("k", "v", "n"),
        remoteRows.toDF("k", "v", "n"), Seq("k"))
      val got = sync.synced
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("U3: batch partial update == sequential UPDATE loop") {
    for (trial <- 1 to 5) {
      val storedRows = randomRows(25).distinctBy(_._1)
      val updates = randomRows(15).distinctBy(_._1)
      val table = mutable.LinkedHashMap[String, (String, String, Int)]()
      storedRows.foreach(r => table(r._1) = r)
      updates.foreach { case (k, v, _) =>
        table.get(k).foreach { case (_, _, n0) => table(k) = (k, v, n0) }
      }
      val expected = table.values.toSet

      val got = Upserts.updateSubset(
        storedRows.toDF("k", "v", "n"),
        updates.toDF("k", "v", "n"), Seq("k"), Seq("v"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expected, s"trial $trial")
    }
  }
}
