package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PCA projection of the embedding column — the dimensionality
  * step in front of clustering/ANN when the stored dimension is wider than
  * the signal (and the standard preprocessing for SemDeDup-style pipelines).
  *
  * Shape, built for 100 TB:
  *   1. second-moment (gram) matrix + mean via ONE posexplode-pair pass:
  *      per-(i,j) partial sums combine map-side, so the shuffle carries
  *      dim·(dim+1)/2 partials per map task — never vectors. Products are
  *      float×float in double (exact: 24+24 ≤ 53 mantissa bits) and the
  *      cross-partition sums run in DECIMAL, so the gram matrix is
  *      bit-identical under any partitioning or merge order.
  *   2. covariance eigendecomposition on the driver: dim×dim doubles of
  *      bounded metadata (the IVF-centroid posture), deterministic power
  *      iteration with deflation, sign-canonicalized eigenvectors.
  *   3. projection as a narrow codegen pass: the k×dim projection matrix
  *      inlines as literal arrays into zip_with/aggregate HOFs — no UDF, no
  *      broadcast variable, no shuffle.
  *
  * No DuckDB oracle (eigendecomposition is not SQL-expressible); OpsSpec
  * proves orthonormality, variance-optimality vs every coordinate axis,
  * and bit-identical output under repartitioning.
  */
object Pca {

  private val K = 8
  private val PowerIters = 60

  /** Mean-centered covariance (dim×dim) of the embedding column, exactly
    * accumulated: per-pair DECIMAL sums make the result independent of
    * partitioning and shuffle merge order.
    */
  private[graft] def covariance(s: SparkSession, d: String): (Array[Array[Double]], Long) = {
    val vecs = Tables.t(s, d, "embeddings").select(col("embedding"))
    // products |x·y| ≤ ~few hundred for unit-ish embeddings; 12 decimal
    // digits of fraction round identically everywhere, keeping the sum
    // order-independent (the embed_label_centroid discipline)
    val dec = DecimalType(28, 12)
    val pairs = vecs
      .select(posexplode(col("embedding")).as(Seq("i", "vi")), col("embedding"))
      .select(col("i"), col("vi").cast("double").as("vi"),
        posexplode(col("embedding")).as(Seq("j", "vj")))
      .where(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(
        sum((col("vi") * col("vj").cast("double")).cast(dec)).cast("double").as("sxy"),
        sum(col("vi").cast(dec)).cast("double").as("sx"),
        count(lit(1)).as("n"))
      .collect()
    val dim = pairs.map(_.getInt(0)).max + 1
    val n = pairs.collectFirst { case r if r.getInt(0) == 0 && r.getInt(1) == 0 => r.getLong(4) }.get
    val sxy = Array.ofDim[Double](dim, dim)
    val sx = Array.ofDim[Double](dim)
    pairs.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      sxy(i)(j) = r.getDouble(2); sxy(j)(i) = r.getDouble(2)
      if (i == j) sx(i) = r.getDouble(3) // diagonal rows carry dim i's value sum
    }
    // centering: cov = sxy/n - mean·meanᵀ
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      sxy(i)(j) / n - (sx(i) / n) * (sx(j) / n)
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
