package graft.operators

import graft.operators.{Corpus => C}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization for embedding corpora (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — FAISS's PQ):
  * split each d-dim vector into `m` subvectors of d/m dims, k-means each
  * subspace independently (k ≤ 256 centroids), and store ONE BYTE per
  * subspace — a 128-dim float32 vector becomes m=8 bytes, a 64× shrink
  * where [[VectorStorage.quantizeInt8]] gives 4×. Search is ADC
  * (asymmetric distance computation): the query precomputes an m×k table
  * of partial squared distances once, and each database vector scores as
  * m table lookups — no decode, no float math per dimension.
  *
  * Scale design mirrors [[Ivf]]/[[QualityClassifier]]: training collects
  * a BOUNDED deterministic sample (`maxTrainVecs`, limit-probed with a
  * [[Corpus.sampleByHash]] fallback — corpus-size-independent), k-means
  * runs driver-local with a fixed seed (bit-deterministic codebooks:
  * sequential float ops, no parallel reduction), and encode/search are
  * MAP-ONLY over a broadcast model (the lmScore precedent: a per-row
  * table lookup no built-in expression covers) followed by a TakeOrdered
  * for the top-k. Compose with [[Ivf]] for IVF-PQ: route on centroids,
  * store PQ codes as the payload, rescore survivors on original floats
  * ([[Ann]]) when exactness matters.
  */
object Pq {

  /** Trained codebooks: `codebooks(s)(c)` = centroid `c` of subspace `s`
    * (a d/m-dim float array). Codes index into these per subspace. */
  final case class Model(dim: Int, m: Int, codebooks: Vector[Vector[Array[Float]]])
    extends Serializable {
    def dsub: Int = dim / m
    def k: Int = codebooks.head.length
  }

  /** Deterministic driver-local Lloyd iterations over one subspace.
    * Seeded spread init (every ⌈n/k⌉-th point of the sample — distinct
    * starting points without an RNG), `iters` fixed rounds, empty
    * clusters re-seeded to the point farthest from its centroid. */
  private[operators] def kmeans(points: Array[Array[Float]], k: Int, iters: Int): Vector[Array[Float]] = {
    val n = points.length
    val kk = math.min(k, n)
    val dsub = points.head.length
    val centroids = Array.tabulate(kk)(c => points((c * (n / kk)).min(n - 1)).clone())
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) { // assignment: nearest centroid, first-wins ties
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var j = 0
          val cen = centroids(c)
          val p = points(i)
          while (j < dsub) { val t = p(j) - cen(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      // update: mean per cluster
      val sums = Array.fill(kk, dsub)(0.0)
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assign(i); val p = points(i)
        var j = 0
        while (j < dsub) { sums(a)(j) += p(j); j += 1 }
        counts(a) += 1
        i += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dsub) { centroids(c)(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
        } else {
          // empty cluster: steal the point farthest from its own centroid
          var far = 0; var farD = -1.0
          var i2 = 0
          while (i2 < n) {
            val cen = centroids(assign(i2)); val p = points(i2)
            var d = 0.0; var j = 0
            while (j < dsub) { val t = p(j) - cen(j); d += t * t; j += 1 }
            if (d > farD) { farD = d; far = i2 }
            i2 += 1
          }
          centroids(c) = points(far).clone()
          assign(far) = c
        }
        c += 1
      }
      it += 1
    }
    centroids.map(_.toVector.toArray).toVector // defensive copies
  }

  /** Bounded deterministic training sample: guarded limit probe (one
    * job, ≤ cap+1 rows), exact [[Corpus.sampleByHash]] past the cap. */
  private def trainSample(df: DataFrame, idCol: String, vecCol: String,
                          maxTrainVecs: Int, salt: String): Array[Array[Float]] = {
    val vecs = df.select(col(idCol), col(vecCol)).where(col(vecCol).isNotNull)
    val probe = vecs.limit(maxTrainVecs + 1).collect()
    val rows: Array[Array[Float]] =
      (if (probe.length <= maxTrainVecs) probe
       else {
         // rate over the frame actually sampled (non-null vectors) — a
         // corpus with many null embeddings must not under-size the
         // training set
         val n = vecs.count()
         C.sampleByHash(vecs.toDF(idCol, vecCol), idCol,
           maxTrainVecs.toDouble / n, salt).collect()
       }).map(_.getSeq[Float](1).toArray)
    require(rows.nonEmpty, "PQ training needs at least one vector")
    require(rows.forall(_.length == rows.head.length), "ragged embedding lengths")
    rows
  }

  private def trainOnRows(rows: Array[Array[Float]], m: Int, k: Int,
                          iters: Int): Model = {
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = (0 until m).map { s =>
      kmeans(rows.map(_.slice(s * dsub, (s + 1) * dsub)), k, iters)
    }.toVector
    Model(dim, m, books)
  }

  /** Trains the `m` per-subspace codebooks on a bounded deterministic
    * sample. `dim % m` must be 0; `k ≤ 256` so codes fit a byte. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
            k: Int = 256, maxTrainVecs: Int = 100000, iters: Int = 15): Model = {
    require(m > 0 && k > 1 && k <= 256, s"need 0 < m, 1 < k <= 256; got m=$m k=$k")
    trainOnRows(trainSample(df, idCol, vecCol, maxTrainVecs, "pq-train"),
      m, k, iters)
  }

  /** OPQ: PQ behind a learned ORTHOGONAL rotation (Ge et al., "Optimized
    * Product Quantization", CVPR 2013 — FAISS's `OPQMatrix`). Plain PQ
    * quantizes each d/m-dim subspace independently, so variance that
    * CORRELATES across the subspace boundary is quantized twice badly;
    * OPQ alternates (a) PQ training in the rotated space with (b) the
    * orthogonal Procrustes solve R = UVᵀ of svd(Xᵀ X̂) that best aligns
    * the data to its current reconstruction X̂ — monotonically
    * decreasing quantization error, same m bytes per vector. Rotation
    * preserves L2 exactly (‖xR − qR‖ = ‖x − q‖), so ADC search in the
    * rotated space answers the ORIGINAL-space query: [[searchTopKOpq]]
    * just rotates the query. Train is driver-local over the same
    * bounded sample as [[train]] (d×d Procrustes per round: breeze SVD
    * on a 64×64 for the gate corpus); encode adds one d×d matvec per
    * vector, map-only. */
  final case class OpqModel(rotation: Array[Array[Float]], pq: Model)
    extends Serializable {
    def dim: Int = pq.dim
  }

  private[operators] def rotate(r: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val d = v.length
    val out = new Array[Float](d)
    var j = 0
    while (j < d) {
      var acc = 0.0; var i = 0
      while (i < d) { acc += v(i) * r(i)(j); i += 1 }
      out(j) = acc.toFloat; j += 1
    }
    out
  }

  private[operators] def reconstruct(model: Model, codes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](model.dim)
    val dsub = model.dsub
    var s = 0
    while (s < model.m) {
      val cen = model.codebooks(s)(codes(s) & 0xff)
      System.arraycopy(cen, 0, out, s * dsub, dsub)
      s += 1
    }
    out
  }

  private def encodeRow(model: Model, v: Array[Float]): Array[Byte] = {
    val dsub = model.dsub
    val out = new Array[Byte](model.m)
    var s = 0
    while (s < model.m) {
      val book = model.codebooks(s)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        var d = 0.0; var j = 0
        while (j < dsub) { val t = v(s * dsub + j) - cen(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Mean squared quantization error of `model` over `rows` (rotated
    * first when `rotation` is given) — the objective OPQ minimizes;
    * spec-visible so improvement is assertable. */
  private[graft] def quantizationMse(rows: Array[Array[Float]], model: Model,
                                     rotation: Option[Array[Array[Float]]] = None): Double = {
    var acc = 0.0
    rows.foreach { v0 =>
      val v = rotation.fold(v0)(r => rotate(r, v0))
      val rec = reconstruct(model, encodeRow(model, v))
      var j = 0
      while (j < v.length) { val t = v(j) - rec(j); acc += t * t; j += 1 }
    }
    acc / rows.length
  }

  /** Trains OPQ: `opqIters` alternations of rotated-space PQ training
    * and the Procrustes rotation update, then a final full-strength PQ
    * pass under the learned rotation. Deterministic end-to-end (seeded
    * kmeans, LAPACK SVD). */
  def trainOpq(df: DataFrame, idCol: String, vecCol: String, m: Int,
               k: Int = 256, maxTrainVecs: Int = 100000, iters: Int = 15,
               opqIters: Int = 8): OpqModel = {
    require(m > 0 && k > 1 && k <= 256, s"need 0 < m, 1 < k <= 256; got m=$m k=$k")
    require(opqIters >= 1, s"opqIters must be >= 1, got $opqIters")
    val rows = trainSample(df, idCol, vecCol, maxTrainVecs, "opq-train")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    import breeze.linalg.{DenseMatrix, svd}
    val x = DenseMatrix.tabulate(rows.length, dim)((i, j) => rows(i)(j).toDouble)
    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0f else 0.0f)
    var it = 0
    while (it < opqIters) {
      val rotated = rows.map(v => rotate(r, v))
      // few inner Lloyd rounds per alternation — the alternation itself
      // is the outer optimizer (FAISS uses niter=25 total with cheap
      // inner steps; the final pass below gets the full budget)
      val model = trainOnRows(rotated, m, k, math.max(iters / 3, 2))
      val recon = rotated.map(v => reconstruct(model, encodeRow(model, v)))
      val xhat = DenseMatrix.tabulate(rows.length, dim)((i, j) => recon(i)(j).toDouble)
      val s = svd(x.t * xhat) // M = Xᵀ X̂ = U Σ Vᵀ → R = U Vᵀ
      val rNew = s.U * s.Vt
      r = Array.tabulate(dim, dim)((i, j) => rNew(i, j).toFloat)
      it += 1
    }
    OpqModel(r, trainOnRows(rows.map(v => rotate(r, v)), m, k, iters))
  }

  /** Encodes under the OPQ rotation — one d×d matvec then the PQ
    * encoder, map-only with a broadcast model. */
  def encodeOpq(df: DataFrame, idCol: String, vecCol: String,
                opq: OpqModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(opq)
    val enc = udf { (v: Array[Float]) =>
      val o = bc.value
      require(v.length == o.dim, s"vector dim ${v.length} != model dim ${o.dim}")
      encodeRow(o.pq, rotate(o.rotation, v))
    }
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), enc(col(vecCol)).as("codes"))
  }

  /** ADC top-`n` for an ORIGINAL-space query against OPQ codes: the
    * query rotates once on the driver, then [[searchTopK]] applies —
    * orthogonality makes the rotated-space distances the true ones. */
  def searchTopKOpq(encoded: DataFrame, idCol: String, codesCol: String,
                    opq: OpqModel, query: Array[Float], n: Int): DataFrame = {
    require(query.length == opq.dim, s"query dim ${query.length} != ${opq.dim}")
    searchTopK(encoded, idCol, codesCol, opq.pq, rotate(opq.rotation, query), n)
  }

  /** The encode kernel as a reusable column function — broadcast
    * codebooks, map-only; lets callers FUSE the code column into an
    * existing projection (one corpus scan) instead of joining
    * [[encode]]'s two-column frame back on the id (two scans plus a
    * shuffle — the [[Ivf.writeIndexedPq]] case). */
  def encoder(df: DataFrame, model: Model): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    // Array[Float] parameter: the deserializer does ONE primitive copy
    // (ArrayData.toFloatArray) instead of boxing every element — measured
    // 4x on 64-dim vectors
    val enc = udf { (v: Array[Float]) =>
      val mm = bc.value
      require(v.length == mm.dim, s"vector dim ${v.length} != model dim ${mm.dim}")
      val dsub = mm.dsub
      val out = new Array[Byte](mm.m)
      var s = 0
      while (s < mm.m) {
        val book = mm.codebooks(s)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cen = book(c)
          var d = 0.0; var j = 0
          while (j < dsub) { val t = v(s * dsub + j) - cen(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best.toByte
        s += 1
      }
      out
    }
    c => enc(c)
  }

  /** Encodes every vector to its `m`-byte PQ code — map-only, broadcast
    * codebooks. Returns `(idCol, codes binary)` — m raw bytes per
    * vector, each the unsigned centroid index of one subspace. */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), encoder(df, model)(col(vecCol)).as("codes"))

  /** ADC top-`n` nearest codes to `query` by approximate squared L2:
    * the m×k partial-distance table computes ONCE on the driver and
    * broadcasts; scoring is m byte-indexed lookups per row (map-only),
    * the top-n a TakeOrdered. Ties break by id for determinism. */
  def searchTopK(encoded: DataFrame, idCol: String, codesCol: String,
                 model: Model, query: Array[Float], n: Int): DataFrame = {
    require(query.length == model.dim, s"query dim ${query.length} != ${model.dim}")
    val dsub = model.dsub
    // double arithmetic per term (floats widen exactly): the sequential
    // double sum is bit-identical to the SQL oracle's CAST(... AS
    // DOUBLE[]) replay, where float-precision terms drift within the
    // round-to-6 granularity
    val table: Array[Array[Double]] = Array.tabulate(model.m) { s =>
      model.codebooks(s).map { cen =>
        var d = 0.0; var j = 0
        while (j < dsub) {
          val t = query(s * dsub + j).toDouble - cen(j).toDouble
          d += t * t; j += 1
        }
        d
      }.toArray
    }
    val bc = encoded.sparkSession.sparkContext.broadcast(table)
    val adc = udf { (codes: Array[Byte]) =>
      val t = bc.value
      // codes from a DIFFERENT model would score silently wrong (shorter
      // loop) or crash mid-task — fail loudly like encode's dim guard
      require(codes != null && codes.length == t.length,
        s"codes length ${if (codes == null) "null" else codes.length} != model m ${t.length}")
      var d = 0.0; var s = 0
      while (s < t.length) { d += t(s)(codes(s) & 0xff); s += 1 }
      d
    }
    encoded
      .select(col(idCol), round(adc(col(codesCol)), 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(n)
  }
}
