package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed PCA projection of the embedding column — the dimensionality
  * step in front of clustering/ANN when the stored dimension is wider than
  * the signal (and the standard preprocessing for SemDeDup-style pipelines).
  *
  * Shape, built for 100 TB:
  *   1. second-moment (gram) matrix + mean via per-partition primitive
  *      kernels: one dim×dim double array folds per partition, ≤
  *      numPartitions partials of bounded size return to the driver —
  *      vectors never shuffle, nothing explodes.
  *   2. covariance eigendecomposition on the driver: dim×dim doubles of
  *      bounded metadata (the IVF-centroid posture), deterministic power
  *      iteration with reorthogonalization, sign-canonicalized.
  *   3. projection as a narrow codegen pass: the k×dim projection matrix
  *      inlines as literal arrays into zip_with/aggregate HOFs — no UDF, no
  *      broadcast variable, no shuffle.
  *
  * No DuckDB oracle (eigendecomposition is not SQL-expressible); OpsSpec
  * proves orthonormality, variance-optimality vs every coordinate axis,
  * and run-stable output.
  */
object Pca {

  private val K = 8
  private val PowerIters = 60

  /** Mean-centered covariance (dim×dim) of the embedding column via a
    * per-partition primitive kernel (the IVF centroid-update posture):
    * each partition folds its vectors into one dim×dim upper-triangle
    * gram + dim-length sum array in a tight double loop, and the ≤
    * numPartitions partials (a few KB each — bounded metadata) merge on
    * the driver in partition-index order, so the result is deterministic
    * for a given input layout. Products are float×float in double (exact:
    * 24+24 ≤ 53 mantissa bits). This shuffles NOTHING and moves dim²
    * doubles per partition — the previous posexplode-pair formulation
    * materialized n·dim² array-carrying rows and cost 50× more wall-clock.
    */
  private[graft] def covariance(s: SparkSession, d: String): (Array[Array[Double]], Long) = {
    val sp = s
    import sp.implicits._
    val partials = Tables.t(s, d, "embeddings").select(col("embedding"))
      .as[Array[Float]]
      .mapPartitions { it =>
        var dim = -1
        var gram: Array[Double] = null
        var sums: Array[Double] = null
        var n = 0L
        it.foreach { v =>
          if (dim < 0) {
            dim = v.length
            gram = new Array[Double](dim * dim)
            sums = new Array[Double](dim)
          }
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            sums(i) += vi
            var j = i
            while (j < dim) { gram(i * dim + j) += vi * v(j); j += 1 }
            i += 1
          }
          n += 1
        }
        if (dim < 0) Iterator.empty else Iterator((dim, n, gram, sums))
      }
      .collect() // partition-index order: deterministic merge
    val dim = partials.head._1
    val sxy = new Array[Double](dim * dim)
    val sx = new Array[Double](dim)
    var n = 0L
    partials.foreach { case (_, pn, g, sm) =>
      n += pn
      var k = 0
      while (k < dim * dim) { sxy(k) += g(k); k += 1 }
      k = 0
      while (k < dim) { sx(k) += sm(k); k += 1 }
    }
    // centering: cov = sxy/n - mean·meanᵀ (upper triangle mirrored)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val s2 = if (i <= j) sxy(i * dim + j) else sxy(j * dim + i)
      s2 / n - (sx(i) / n) * (sx(j) / n)
    }
    (cov, n)
  }

  /** Top-k eigenvectors of a symmetric matrix by power iteration with
    * per-step reorthogonalization against already-found vectors (so the
    * result is orthonormal to machine precision even on a degenerate tail
    * spectrum, where matrix deflation alone drifts). Deterministic: fixed
    * start vectors, fixed iteration count, sign canonicalized so the
    * largest-|component| entry is positive.
    */
  private[graft] def topEigenvectors(m: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val dim = m.length
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim)(i => { var acc = 0.0; var j = 0; while (j < dim) { acc += m(i)(j) * v(j); j += 1 }; acc })
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val done = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def reorth(w: Array[Double]): Array[Double] = {
      val u = w.clone()
      done.foreach { q =>
        var d = 0.0; var i = 0
        while (i < dim) { d += u(i) * q(i); i += 1 }
        i = 0; while (i < dim) { u(i) -= d * q(i); i += 1 }
      }
      val n = norm(u)
      if (n > 0) u.map(_ / n) else u
    }
    (0 until k).foreach { e =>
      // deterministic start: all components nonzero and index-dependent, so
      // it cannot be orthogonal to the sought eigenvector
      var v = reorth(Array.tabulate(dim)(i => 1.0 / (i + 2 + e)))
      for (_ <- 1 to PowerIters) v = reorth(matVec(v))
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      done += (if (v(pivot) < 0) v.map(-_) else v)
    }
    done.toArray
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "embed_pca_project",
      None, // eigendecomposition is not SQL-expressible; OpsSpec properties
      (s, d) => {
        val (cov, _) = covariance(s, d)
        val evecs = topEigenvectors(cov, K)
        // projection matrix inlined as literals → pure codegen HOF pass
        val projCols = evecs.zipWithIndex.map { case (row, kIdx) =>
          val litRow = array(row.map(lit).toIndexedSeq: _*)
          round(
            aggregate(
              zip_with(col("embedding").cast("array<double>"), litRow, (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x),
            6).as(s"p$kIdx")
        }
        Tables.t(s, d, "embeddings")
          .select(col("vec_id") +: projCols.toIndexedSeq: _*)
          .orderBy("vec_id")
      })
  )
}
