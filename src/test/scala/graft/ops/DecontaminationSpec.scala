package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j k l"),              // leaks into bench 10
    (2L, "totally different words about nothing in particular here now"),
    (3L, "p q r s t u v w p q r s t u v w")        // one bench gram, twice
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (10L, "c d e f g h i j k l"), // doc 1 minus two leading words
    (20L, "p q r s t u v w")      // exactly one 8-gram
  ).toDF("bench_id", "text")

  test("manufactured leak found with the right overlap; clean doc survives") {
    val pairs = Decontamination.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 shares exactly the bench doc's 3 distinct 8-grams
    assert(pairs == Set((1L, 10L, 3L)), s"got $pairs")
    val survivors = Decontamination.dropContaminated(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(2L, 3L))
  }

  test("a repeated benchmark phrase counts as ONE shared gram") {
    // doc 3 contains bench 20's single 8-gram twice; distinct counting
    // keeps n_shared at 1, so minShared=2 does not flag it...
    val strict = Decontamination.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 2)
      .filter(col("bench_id") === 20).count()
    assert(strict == 0)
    // ...and minShared=1 reports it with n_shared = 1, not 2
    val loose = Decontamination.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 1)
      .filter(col("bench_id") === 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(loose == Set((3L, 1L)), s"got $loose")
  }

  test("no retained blocks after materialization") {
    Decontamination.dropContaminated(docs, "doc_id", "text",
      bench, "bench_id", "text").count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
