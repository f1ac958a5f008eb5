package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def big = (1L to 2000L).map(i => (i, s"row$i")).toDF("k", "payload")
  private def small = (1L to 2000L by 40).map(i => i).toDF("sk") // 50 keys

  test("no false negatives: every build key passes the membership test") {
    val words = BloomJoin.buildBloom(small, "sk", numBits = 1 << 10)
    val passed = small.filter(BloomJoin.mightContain(col("sk"), words)).count()
    assert(passed == small.count())
  }

  test("bloom prunes the probe side and the semi-join removes the fp tail") {
    val words = BloomJoin.buildBloom(small, "sk", numBits = 1 << 10)
    val survivors = big.filter(BloomJoin.mightContain(col("k"), words)).count()
    // 50 true members of 2000; a 1024-bit/3-hash filter at 50 keys has
    // p_fp ~ (1-e^(-150/1024))^3 ~ 0.25% — survivors must sit between
    // the true-match floor and a loose fp ceiling, i.e. the filter
    // genuinely prunes the scan
    assert(survivors >= 50 && survivors < 400, s"survivors=$survivors")

    val bloomed = BloomJoin.bloomSemiJoin(big, "k", small, "sk",
      numBits = 1 << 10)
      .select("k").as[Long].collect().toSet
    val exact = big.join(small.select(col("sk").as("k")), Seq("k"),
      "left_semi").select("k").as[Long].collect().toSet
    assert(bloomed == exact, "bloom semi-join must equal the exact semi-join")
  }

  test("membership filter evaluates in the scan stage, below the join exchange") {
    // parquet-backed fixture: with a local relation the optimizer
    // constant-folds the whole membership test away at plan time,
    // which hides the shape this test pins
    val tmp = java.nio.file.Files.createTempDirectory("bloomspec").toString
    big.write.mode("overwrite").parquet(s"$tmp/big")
    val bigP = spark.read.parquet(s"$tmp/big")
    val plan = BloomJoin.bloomSemiJoin(bigP, "k", small, "sk",
      numBits = 1 << 10).queryExecution.executedPlan.toString
    // the pruning filter (hash membership) must appear under the
    // probe side's scan, BELOW the join node in the tree (printed
    // after it), i.e. survivors — not the full probe side — pay the
    // join
    val filterIdx = plan.indexOf("xxhash64")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"filter must sit below (print after) the join:\n$plan")
    assert(plan.contains("LeftSemi"), plan)
  }

  test("bitsFor sizes ~bitsPerKey/key word-aligned; sized join stays exact") {
    assert(BloomJoin.bitsFor(1) == 64)
    assert(BloomJoin.bitsFor(100) == 1024)        // 1000 → next 64-mult
    assert(BloomJoin.bitsFor(20000) == 200000)    // exact 64-multiple
    assert(BloomJoin.bitsFor(1L << 40) == (1 << 30), "capped at 2^30 bits")
    val sized = BloomJoin.bloomSemiJoinSized(big, "k", small, "sk",
      expectedKeys = 50)
      .select("k").as[Long].collect().toSet
    val exact = big.join(small.select(col("sk").as("k")), Seq("k"),
      "left_semi").select("k").as[Long].collect().toSet
    assert(sized == exact)
  }

  test("the filter words ship as ONE typed array literal, not per-word literals") {
    // 2^16 bits = 1024 words: element-wise literals would put 1024
    // Literal expressions in the plan; the typed literal is one.
    val words = BloomJoin.buildBloom(small, "sk", numBits = 1 << 16)
    val cond = BloomJoin.mightContain(col("k"), words)
    val exprs = big.select(cond.as("c")).queryExecution.analyzed.expressions
    val refs = exprs.flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
        => l
    })
    // 3 hash probes reference the same array literal value; each is a
    // single ArrayType literal (with 1024 elements INSIDE it, not 1024
    // Literal nodes)
    assert(refs.nonEmpty && refs.size <= 3, s"array literals: ${refs.size}")
    val allLiterals = exprs.flatMap(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Literal => l
    })
    assert(allLiterals.size < 50,
      s"plan carries ${allLiterals.size} literal nodes — words must not unroll")
  }
}
