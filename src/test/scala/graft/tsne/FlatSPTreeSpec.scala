package graft.tsne

import org.scalatest.funsuite.AnyFunSuite

/** The flat broadcast form must be force-for-force identical to the
  * verified pointer tree — same traversal order, same floating-point
  * results — at every theta. */
class FlatSPTreeSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(11)

  private def check(n: Int, d: Int, theta: Double): Unit = {
    val y = Array.fill(n * d)(rng.nextDouble() * 10 - 5)
    val tree = SPTree.build(y, n, d)
    val flat = FlatSPTree.from(tree)
    for (i <- 0 until n) {
      val yi = TSNEKernels.rowOf(y, d, i)
      val negT = new Array[Double](n * d)
      val negF = new Array[Double](n * d)
      val qT = tree.nonEdgeForces(yi, theta, negT, i * d)
      val qF = flat.nonEdgeForces(yi, theta, negF, i * d)
      assert(qT == qF, s"sumQ mismatch row $i (theta=$theta)")
      assert(negT.sameElements(negF), s"negF mismatch row $i (theta=$theta)")
    }
  }

  test("flat ≡ pointer tree, 2-D, theta 0 / 0.5 / 1") {
    for (theta <- Seq(0.0, 0.5, 1.0)) check(n = 200, d = 2, theta)
  }

  test("flat ≡ pointer tree, 3-D octree") {
    check(n = 120, d = 3, theta = 0.5)
  }

  test("flat ≡ pointer tree with duplicate points") {
    val y = Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, -3.0, 4.0)
    val n = 5
    val tree = SPTree.build(y, n, 2)
    val flat = FlatSPTree.from(tree)
    for (i <- 0 until n) {
      val yi = TSNEKernels.rowOf(y, 2, i)
      val negT = new Array[Double](n * 2)
      val negF = new Array[Double](n * 2)
      val qT = tree.nonEdgeForces(yi, 0.5, negT, i * 2)
      val qF = flat.nonEdgeForces(yi, 0.5, negF, i * 2)
      assert(qT == qF && negT.sameElements(negF), s"row $i")
    }
  }
}
