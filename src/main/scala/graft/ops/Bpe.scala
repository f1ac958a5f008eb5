package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Byte-pair-encoding merge induction (Sennrich et al. 2016) — the
  * tokenizer-training step of a corpus pipeline, distributed the way
  * it should be: ONE corpus scan reduces the text to the word
  * frequency table, and every merge iteration after that touches only
  * the VOCABULARY-sized frame (pair counts are a combinable
  * aggregation over it; the argmax is a 1-row collect; the merge is a
  * per-word fold). The corpus is never read again.
  *
  * Merge semantics (pinned for the oracle): pair occurrences count
  * with overlap via the adjacent zip (so "aaa" contributes (a,a)
  * twice), weighted by word frequency; the winning pair is
  * max count, ties broken (lhs, rhs) lexicographic; application is
  * GREEDY LEFT-TO-RIGHT — "aaa" under (a,a) becomes [aa, a], never
  * [a, aa]. The engine applies merges with a position-ordered fold;
  * the oracle replicates it with the equivalent run-parity
  * formulation (within each maximal run of consecutive matching
  * positions, the 1st, 3rd, … merge).
  *
  * Iterations chain lazily (each merge is one Project over the
  * previous vocab); `stagingDir` cuts the O(iters²) recompute by
  * staging the vocab to parquet per iteration — the
  * [[ConnectedComponents]] fixpoint discipline, which is the shape a
  * 10M-word production vocabulary needs. Results are identical
  * (spec-pinned). */
object Bpe {

  /** (word, freq) from lowercased whitespace tokens — map-side
    * combinable; the single corpus-scale stage. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right merge of (a,b) → a+b over a symbol array,
    * as a single position-ordered fold: state = (rebuilt array,
    * last-element-was-just-merged). A merged element never merges
    * again in the same pass. */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column = {
    val init = struct(array().cast("array<string>").as("out"),
      lit(false).as("m"))
    aggregate(syms, init,
      (acc, s) => {
        val out = acc.getField("out")
        val canMerge = !acc.getField("m") && size(out) > 0 &&
          element_at(out, -1) === lit(a) && (s === lit(b))
        when(canMerge,
          struct(concat(slice(out, lit(1), size(out) - 1),
            array(lit(a + b))).as("out"), lit(true).as("m")))
          .otherwise(
            struct(concat(out, array(s)).as("out"), lit(false).as("m")))
      },
      acc => acc.getField("out"))
  }

  /** Initial character symbolization (1-char substrings in position
    * order — the oracle's `w[i:i]` twin). */
  private def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring_index0(word, i))

  // substring(word, i, 1) with a Column start — the functions API
  // overload takes Int positions only
  private def substring_index0(word: Column, i: Column): Column =
    word.substr(i, lit(1))

  /** The training loop: final vocabulary (word, freq, syms) plus the
    * ordered merge list.
    *
    * Iteration state STAGES: each round's vocab becomes a LogicalRDD
    * leaf over a persisted RDD (the [[ConnectedComponents]] fixpoint
    * discipline — without it, round k's pair count re-runs all k−1
    * previous merges, an O(iters²) recompute that measured 24 s for
    * 6 merges at sf0.1). Every cache frees before return (zero
    * retained blocks — BlockHygieneSpec); the returned vocab frame
    * keeps full lineage, so a later materialization (ts14's join)
    * recomputes the chain once, linearly. `stagingDir` swaps the
    * persisted leaf for a parquet round-trip (the durable form a
    * production vocabulary build would version in the store). */
  /** Per-iteration staging (parquet round-trip or persisted
    * LogicalRDD leaf) shared by the 1-per-iteration and batched
    * training loops; `freeAll` releases every persisted leaf.
    *
    * Lineage cap: each persisted leaf still CHAINS to the previous
    * one in the RDD dependency graph, and task (de)serialization
    * walks that graph recursively — ~200 chained leaves measured a
    * StackOverflowError in the executor. Every 64th iteration
    * therefore stages through parquet (an exit-cleaned scratch dir
    * unless the caller gave a durable `stagingDir`), resetting the
    * graph to a file scan; production merge counts are expected to
    * pass a real stagingDir anyway (the durable form the Scaladoc
    * prescribes). */
  private final class Stager(spark: org.apache.spark.sql.SparkSession,
      stagingDir: Option[String]) {
    private val staged = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    private lazy val spillDir =
      stagingDir.getOrElse(Scratch.tempDir("graft-bpe-"))
    def apply(df: DataFrame, it: Int): DataFrame =
      if (stagingDir.isDefined || it % 64 == 0) {
        df.write.mode("overwrite").parquet(s"$spillDir/bpe_iter_$it")
        spark.read.parquet(s"$spillDir/bpe_iter_$it")
      } else {
        val rdd = df.rdd.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        staged += rdd
        spark.createDataFrame(rdd, df.schema)
      }
    def freeAll(): Unit = staged.foreach(_.unpersist(blocking = false))
  }

  /** The character-symbolized word-frequency table training starts
    * from — ONE corpus scan, everything after runs on this frame. */
  private def initialVocab(docs: DataFrame, textCol: String): DataFrame =
    wordFreq(docs, textCol)
      .select(col("word"), col("freq"), charSyms(col("word")).as("syms"))

  /** Adjacent-pair counts over a vocab frame in the pinned argmax
    * order (cnt DESC, lhs, rhs) — overlap-counted via the zip, word
    * frequency weighted. */
  private def pairCounts(cur: DataFrame): DataFrame = cur
    .filter(size(col("syms")) >= 2)
    .select(col("freq"), explode(expr(
      "zip_with(slice(syms, 1, size(syms) - 1)," +
        " slice(syms, 2, size(syms) - 1)," +
        " (a, b) -> struct(a AS lhs, b AS rhs))")).as("p"))
    .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
    .agg(sum("freq").as("cnt"))
    .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)

  private def train(docs: DataFrame, textCol: String, numMerges: Int,
      stagingDir: Option[String])
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    val stage = new Stager(spark, stagingDir)
    try {
      var vocab = initialVocab(docs, textCol)
      val merges =
        scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      var it = 1
      var exhausted = false
      while (it <= numMerges && !exhausted) {
        val cur = stage(vocab, it)
        val best = pairCounts(cur).limit(1).collect()
        if (best.isEmpty) { vocab = cur; exhausted = true }
        else {
          val (a, b, c) =
            (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((it, a, b, c))
          // building on the staged leaf keeps iteration k+1's jobs on
          // the cache; after the finally-unpersist, the leaf's OWN
          // lineage still reaches back to the scan, so later
          // materializations recompute once, linearly
          vocab = cur.withColumn("syms", mergePair(col("syms"), a, b))
          it += 1
        }
      }
      (vocab, merges.toSeq)
    } finally stage.freeAll()
  }

  /** BATCHED merge induction — the production-vocabulary scale dial:
    * instead of one Spark job + one 1-row collect PER MERGE (a
    * 50k-merge vocabulary = 50k sequential driver round-trips),
    * each of `rounds` rounds runs ONE pair-count job and accepts up
    * to `batchSize` merges whose symbols are PAIRWISE DISJOINT,
    * scanning the (cnt DESC, lhs, rhs) order greedily — a candidate
    * sharing a symbol (lhs or rhs) with an already-accepted merge is
    * skipped this round (it resurfaces next round with fresh
    * counts). Disjointness makes the batch sound: a merge can
    * neither consume nor create an adjacency of another accepted
    * pair (the shared symbol that order-dependence requires is
    * excluded by construction), so applying the batch sequentially
    * equals applying it in any order, and each recorded `pair_freq`
    * (from the round's pre-merge counts) is exact for its merge.
    * The schedule differs from 1-per-iteration BPE (counts refresh
    * per ROUND, not per merge) — ts13 pins the classic schedule,
    * this one is its O(vocab/batch)-round twin.
    *
    * Driver cost per round: the ordered pair stream is consumed
    * lazily (toLocalIterator — sorted range partitions arrive in
    * order, and acceptance needs ≤ a few dozen head rows in
    * practice); state held is ≤ 2·batchSize symbols. Total merges ≤
    * rounds·batchSize; a round with no pairs left ends training.
    * Output: (iter, rank, lhs, rhs, pair_freq) — iter = round,
    * rank = acceptance order within it. */
  def learnMergesBatched(docs: DataFrame, textCol: String, rounds: Int,
      batchSize: Int, stagingDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val stage = new Stager(spark, stagingDir)
    try {
      var vocab = initialVocab(docs, textCol)
      val out = scala.collection.mutable
        .ArrayBuffer[(Int, Int, String, String, Long)]()
      var round = 1
      var exhausted = false
      while (round <= rounds && !exhausted) {
        val cur = stage(vocab, round)
        val sel = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        val used = scala.collection.mutable.Set.empty[String]
        val it = pairCounts(cur).toLocalIterator()
        while (sel.size < batchSize && it.hasNext) {
          val r = it.next()
          val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!used(a) && !used(b)) {
            sel += ((a, b, c)); used += a; used += b
          }
        }
        if (sel.isEmpty) exhausted = true
        else {
          var v = cur
          sel.zipWithIndex.foreach { case ((a, b, c), j) =>
            out += ((round, j + 1, a, b, c))
            v = v.withColumn("syms", mergePair(col("syms"), a, b))
          }
          vocab = v
          round += 1
        }
      }
      out.toSeq.toDF("iter", "rank", "lhs", "rhs", "pair_freq")
    } finally stage.freeAll()
  }

  /** Learn `numMerges` merges; returns (iter, lhs, rhs, pair_freq),
    * fewer rows if the vocabulary runs out of pairs first. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      stagingDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, stagingDir)._2
      .toDF("iter", "lhs", "rhs", "pair_freq")
  }

  /** Apply the trained tokenizer back to the corpus: per document,
    * the BPE token count and word count. The corpus-scale step is
    * ONE (word)-keyed join of the exploded document words against
    * the trained vocabulary's symbolization — the vocabulary is the
    * smaller side (AQE broadcasts it when it fits, shuffles
    * otherwise); the per-doc rollup is one combinable aggregation.
    * Every corpus word is in the vocabulary by construction (same
    * corpus, same tokenization), so the join is inner with no loss
    * — spec-asserted via n_words reconciliation. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int, stagingDir: Option[String] = None): DataFrame =
    tokenizeVocab(docs, idCol, textCol,
      train(docs, textCol, numMerges, stagingDir)._1)

  /** APPLY-path tokenization: fold an ALREADY-LEARNED merge list over
    * the corpus vocabulary without re-training — the natural
    * learnMerges-then-tokenize usage, and the only way to apply a
    * STORED merge table to a NEW corpus (training twice is both
    * wasteful and wrong on a different corpus). Merges apply in list
    * order with the same greedy left-to-right fold as training; words
    * absent from the training corpus still tokenize (their symbols
    * just never merge). No driver round-trips at all: the apply is
    * one lazy plan — `stagingDir` optionally flattens the per-merge
    * expression chain through parquet every 32 merges (a 50k-merge
    * vocabulary as one nested expression would defeat codegen). */
  def tokenizeWithMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)],
      stagingDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    var vocab = wordFreq(docs, textCol)
      .select(col("word"), col("freq"), charSyms(col("word")).as("syms"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      vocab = vocab.withColumn("syms", mergePair(col("syms"), a, b))
      stagingDir.foreach { dir =>
        if ((i + 1) % 32 == 0 && i + 1 < merges.size) {
          vocab.write.mode("overwrite").parquet(s"$dir/bpe_apply_${i + 1}")
          vocab = spark.read.parquet(s"$dir/bpe_apply_${i + 1}")
        }
      }
    }
    tokenizeVocab(docs, idCol, textCol, vocab)
  }

  /** The shared apply tail: join exploded corpus words against a
    * symbolized vocabulary, roll up per doc. */
  private def tokenizeVocab(docs: DataFrame, idCol: String,
      textCol: String, vocab: DataFrame): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(tokens(lower(col(textCol)))).as("word"))
      .join(vocab.select(col("word"), size(col("syms")).as("n_syms")),
        Seq("word"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe_tokens"))
}
