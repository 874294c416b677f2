package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Structural invariants of the product-quantization family: a
  * complete 4-bit code assignment per (vector, subspace), a codebook
  * bounded by PqM·PqK, and a packed code word that round-trips to the
  * per-subspace codes. Correctness of the values is the DuckDB gates'
  * job (emb_pq_encode / sim_pq_rerank / sim_pq_recall); this spec pins
  * the contracts the packing and ADC lookup rely on.
  */
class PqSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("every vector gets one 4-bit code per subspace, and the word round-trips") {
    val enc = SparkEntry.queries("emb_pq_encode")(spark, dir)
    val n = graft.Tables(spark, dir, "embeddings").count()
    assert(enc.count() === n, "one code word per vector")
    // all 8 nibbles in [0, 16): the word is < 2^32 and non-negative
    val bad = enc.filter(col("code_word") < 0 ||
      col("code_word") >= (1L << 32)).count()
    assert(bad === 0, "code word outside the packed 8x4-bit domain")
    // unpacking nibbles yields codes < PqK for every subspace
    val badNibble = enc.select(explode(expr(
        "transform(sequence(0, 7), m -> (code_word div shiftleft(CAST(1 AS BIGINT), CAST(m * 4 AS INT))) % 16)"))
      .as("code"))
      .filter(col("code") < 0 || col("code") >= graft.operators.PqOps.PqK)
      .count()
    assert(badNibble === 0)
  }

  test("ADC rerank returns exactly 5 ranked rows per query") {
    val r = SparkEntry.queries("sim_pq_rerank")(spark, dir)
      .groupBy(col("qid")).agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"))
    assert(r.filter(col("n") =!= 5 || col("mx") =!= 5).count() === 0)
  }

  test("train + encode degrade gracefully when the corpus is smaller than PqK") {
    // a tenant with fewer vectors than codes must still train and
    // encode: init takes however many seeds exist, codes stay a
    // prefix of [0, n) — pinned here because fixture scale never
    // hits the edge
    import spark.implicits._
    import graft.operators.PqOps
    val n = 5L
    val tiny = (0L until n).map { i =>
      (i, (0 until 64).map(d => ((i * 64 + d) % 97) * 1000L).toArray)
    }.toDF("vec_id", "qv")
    val cb = PqOps.buildCodebook(tiny)
    assert(cb.count() <= n * PqOps.PqM, "more codebook rows than seeds")
    val codes = PqOps.encode(tiny, cb)
    assert(codes.count() === n * PqOps.PqM,
      "every (vector, subspace) must get a code")
    val bad = codes.filter(col("code") < 0 || col("code") >= n).count()
    assert(bad === 0, s"codes must stay a prefix of [0, $n)")
  }

  test("clearPqModel releases the cached code table and a rebuild works") {
    import graft.operators.PqOps
    val codes1 = PqOps.pqCodes(spark, dir)
    val n1 = codes1.count()
    assert(codes1.storageLevel.useMemory, "code table should be cached")
    PqOps.clearPqModel(Some(spark))
    assert(!codes1.storageLevel.useMemory,
      "clear must unpersist the released code table")
    val codes2 = PqOps.pqCodes(spark, dir)
    assert(codes2.count() === n1, "rebuild after clear must reproduce the model")
  }
}
