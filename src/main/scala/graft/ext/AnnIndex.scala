package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF(-PQ) index — the OPERATIONAL half of the ANN stack: the
  * train-and-query-in-one-job forms ([[Similarity.ivfKnn]],
  * [[PQ.ivfPqTopK]]) re-train per call, which is right for exploratory
  * queries and wrong for a serving corpus. Here the index is BUILT once
  * (train + assign + encode), WRITTEN as an ordinary parquet table
  * partitioned by the IVF cell (plus a small JSON sidecar for the trained
  * state), and every later query LOADS the metadata (driver-side, a few
  * KB) and scans only the probed cells — Spark's partition pruning over
  * `cell=` directories does the cell selection, so a 1-probe query on a
  * 1024-cell index touches ~0.1% of the files.
  *
  * The layout is engine-agnostic on purpose (parquet + JSON, no pickled
  * state): any Spark job — or any other reader — can load it.
  */
object AnnIndex {

  /** Sidecar state. PQ codebooks are VERSIONED: `codebooks` is version 0
    * (the build-time set), `codebookVersions` holds refresh generations
    * 1..n ([[refreshCodebooks]]), and `cellVersions` records which
    * generation each cell's stored codes were encoded under (absent = 0).
    * Codes are only comparable within one generation, so every encode
    * (append), decode (ADC probe), and file-moving maintenance op keys by
    * the cell's generation.
    */
  final case class Meta(dim: Int, nCells: Int, m: Int, nCodes: Int,
      centroids: Seq[Seq[Double]], codebooks: Option[Seq[Seq[Seq[Double]]]],
      codebookVersions: Seq[Seq[Seq[Seq[Double]]]] = Nil,
      cellVersions: Map[Int, Int] = Map.empty) {
    /** Codebooks of generation `v` as the packed runtime form. */
    private[ext] def codebooksAt(v: Int): PQ.Codebooks = {
      val centers = if (v == 0) codebooks.getOrElse(
        throw new IllegalArgumentException("index was built without PQ codes (m=0)"))
        else codebookVersions(v - 1)
      PQ.Codebooks(m, dim / m, nCodes, centers.map(_.map(_.toArray).toArray).toArray)
    }
    private[ext] def versionOfCell(cell: Int): Int = cellVersions.getOrElse(cell, 0)
  }

  /** Build and persist: trains IVF centroids (sample-bounded) and, when
    * `m > 0`, PQ codebooks; writes `(id, cell, vec, nrm, pq_code?)`
    * partitioned by cell, and the trained state to `_ann_meta.json`.
    * Returns the meta. The L2 norm is materialized at build time so probe
    * queries pay only the dot product per pair, never the norm.
    * `extraCols` carries payload columns (labels, source tags) into the
    * index verbatim — the metadata-filtered-search shape
    * ([[hardNegatives]]) needs the filter column co-located with the
    * vectors it prunes.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, path: String,
      nCells: Int, m: Int = 0, nCodes: Int = 16, iters: Int = 2,
      seed: Long = 42L, extraCols: Seq[String] = Nil): Meta = {
    val spark = df.sparkSession
    require(m == 0 || extraCols.isEmpty,
      "extraCols are only supported for non-PQ indexes (m = 0)")
    val centroids = Similarity.ivfCentroidsSampled(df, idCol, vecCol, nCells, iters, seed)
    val dim = centroids.head.length
    val cb = if (m > 0) Some(PQ.train(df, idCol, vecCol, m, nCodes, iters, seed)) else None
    val base = df.select(col(idCol).cast("long").as("id") +: col(vecCol).as("vec") +:
      Similarity.assignCell(col(vecCol), centroids).as("cell") +:
      extraCols.map(col): _*)
    val indexed = (cb match {
      case Some(codebooks) =>
        import spark.implicits._
        base.as[(Long, Array[Float], Int)]
          .mapPartitions(_.map { case (id, v, cell) =>
            (id, v, cell, codebooks.encodeVec(v)) })
          .toDF("id", "vec", "cell", "pq_code")
      case None => base
    }).withColumn("nrm", Similarity.l2Norm(col("vec")))
    // cluster by cell before the partitioned write: without it every write
    // task emits one file into EVERY cell dir it holds rows for (tasks ×
    // cells tiny files — 512 creates at bench scale, and a probe query
    // then opens `files/cells` footers per probed cell). One exchange on
    // the cell key lands each cell as one task's contiguous write. (At
    // production bytes, repartition on (cell, salt) to keep multiple
    // ~128 MB files per cell; the guide-§6 file-sizing shape.)
    indexed.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val meta = Meta(dim, nCells, m, nCodes, centroids,
      cb.map(_.centers.map(_.map(_.toSeq).toSeq).toSeq))
    writeMeta(spark, path, meta)
    meta
  }

  /** Incrementally add vectors to a persisted index WITHOUT retraining:
    * each new vector assigns to its nearest EXISTING centroid and appends
    * cell-partitioned parquet — untouched cells gain no files, the trained
    * sidecar is untouched, and probe queries see the new vectors on their
    * next scan. This is the serving-corpus ingest shape: cost scales with
    * the batch, never the corpus. The trade is centroid staleness —
    * appended mass does not move the centroids (the IVF serving
    * convention), so rebuild when drift degrades recall. A PQ index
    * (m > 0) encodes the batch with its STORED codebooks — codes stay
    * comparable to the built corpus by construction, with the same
    * staleness trade as the centroids (codebooks never retrain on
    * appended mass). A batch whose columns don't match the index layout
    * refuses (a silent parquet schema union would corrupt reads).
    */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String,
      extraCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val meta = readMeta(spark, path)
    require(meta.m == 0 || extraCols.isEmpty,
      "extraCols are only supported for non-PQ indexes (m = 0)")
    val base = df.select(col(idCol).cast("long").as("id") +: col(vecCol).as("vec") +:
      Similarity.assignCell(col(vecCol), meta.centroids).as("cell") +:
      extraCols.map(col): _*)
    val batch = (meta.codebooks match {
      case Some(_) =>
        // encode with each target CELL's codebook generation — mixing
        // generations inside one cell would silently corrupt ADC probes
        val byVersion = (0 to meta.codebookVersions.size)
          .map(v => v -> meta.codebooksAt(v)).toMap
        val cellVer = meta.cellVersions
        import spark.implicits._
        base.as[(Long, Array[Float], Int)]
          .mapPartitions(_.map { case (id, v, cell) =>
            (id, v, cell, byVersion(cellVer.getOrElse(cell, 0)).encodeVec(v)) })
          .toDF("id", "vec", "cell", "pq_code")
      case None => base
    }).withColumn("nrm", Similarity.l2Norm(col("vec")))
    // layout guard from ONE data file plus the directory-encoded cell key
    // — resolving the whole table (`spark.read.parquet(path)`) lists every
    // file just to compare a schema all files share by this guard's own
    // invariant, and that listing alone gave the fixed-batch streaming
    // epoch α_wall ≈ 0.5 under 10× corpus growth (ScaleRun b67). Full
    // FIELD comparison (name + type, nullability-insensitive, order-free):
    // a same-named column with a different type would append cleanly and
    // then corrupt every read with a silent parquet schema conflict.
    sampleDataFile(spark, path).foreach { f =>
      val existing = org.apache.spark.sql.types.StructType(
        spark.read.parquet(f).schema.fields :+
          org.apache.spark.sql.types.StructField("cell",
            org.apache.spark.sql.types.IntegerType))
      def norm(st: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
        st.fields.map(f => (f.name, f.dataType.sql)).sortBy(_._1).toSeq
      require(norm(batch.schema) == norm(existing),
        s"append batch layout ${norm(batch.schema).map { case (n, t) => s"$n:$t" }.mkString(", ")} " +
          s"does not match the index layout ${norm(existing).map { case (n, t) => s"$n:$t" }.mkString(", ")} — " +
          "pass the same extraCols (same types) the index was built with")
    }
    batch.write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Delete vectors by id WITHOUT rebuilding — the index lifecycle's
    * takedown verb: ONE id-pushed scan discovers the files holding any of
    * `ids` (the IN predicate reaches the parquet reader, so untouched
    * files skip on row-group stats/dictionaries), ONLY those files rewrite
    * without the ids, and the replacements move in per cell. Untouched
    * cells — and untouched files inside touched cells — stay
    * byte-identical; cost ∝ touched files, never the corpus. PQ codes ride
    * the surviving rows unchanged, so ADC probes stay valid; a cell
    * deleted empty simply stops matching probes (run [[rebalance]] with
    * `minBalance` to fold starved cells after heavy deletes). Ids are a
    * bounded in-list (the takedown-batch shape). Returns rows deleted.
    *
    * SWAP CONTRACT (single writer, like every maintenance op here): each
    * cell's replaced files are dropped IMMEDIATELY after that cell's
    * replacements rename in, so a concurrent reader or a crash can see
    * duplicated survivors / resurrected ids in AT MOST ONE cell, never
    * index-wide. There is no log to replay: after a crash mid-swap,
    * rebuild the index (re-running delete would re-discover the old file
    * and duplicate its survivors — don't).
    */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "ids must be non-empty")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hit = col("id").isInCollection(ids)
    val touched = spark.read.parquet(path).filter(hit)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0))
    if (touched.isEmpty) return 0L
    val df = spark.read.option("basePath", path)
      .parquet(touched.toIndexedSeq: _*)
    val nDel = df.filter(hit).count()
    val staging = new org.apache.hadoop.fs.Path(path,
      s".del-staging-${java.util.UUID.randomUUID()}")
    df.filter(!hit).write.partitionBy("cell").parquet(staging.toString)
    // move replacements into their cell dirs (staged names are
    // uuid-unique) and drop each cell's replaced files the moment its
    // replacements land — the duplicate-visibility window is one cell,
    // never the whole touched set (see the swap contract above)
    val remaining = scala.collection.mutable.LinkedHashSet(touched.toSeq: _*)
    fs.listStatus(staging).filter(_.isDirectory).foreach { d =>
      val cellName = d.getPath.getName
      val dest = new org.apache.hadoop.fs.Path(root, cellName)
      fs.mkdirs(dest)
      fs.listStatus(d.getPath).filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          require(fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(dest, f.getPath.getName)),
            s"failed to move ${f.getPath} into $dest")
        }
      remaining.filter(t =>
        new org.apache.hadoop.fs.Path(t).getParent.getName == cellName)
        .foreach { t =>
          fs.delete(new org.apache.hadoop.fs.Path(t), false)
          remaining -= t
        }
    }
    // files whose every row was deleted stage no replacement dir
    remaining.foreach(t => fs.delete(new org.apache.hadoop.fs.Path(t), false))
    fs.delete(staging, true)
    nDel
  }

  /** Retrain PQ codebooks on the CURRENT corpus and re-encode ONLY the
    * cells whose quantization error materially improves — the maintenance
    * verb closing [[append]]'s staleness trade (appends encode with
    * stored codebooks, so after heavy drift the code error grows without
    * bound and ADC recall decays). One bounded-sample train
    * ([[PQ.train]], the build-time trainer), one corpus pass computing
    * per-cell squared reconstruction error under the cell's CURRENT
    * generation vs the candidate, then a staged rewrite of exactly the
    * cells where `curErr > errorFactor × newErr` — untouched cells stay
    * byte-identical and keep their generation. The sidecar appends the
    * new generation to `codebookVersions` and flips only the re-encoded
    * cells' `cellVersions`; probes and appends key every decode/encode by
    * the cell's generation, so mixed-generation indexes stay exact.
    * Returns the number of re-encoded cells (0 = candidate discarded, no
    * generation recorded).
    */
  def refreshCodebooks(spark: SparkSession, path: String,
      errorFactor: Double = 1.05, iters: Int = 2, seed: Long = 42L): Int = {
    require(errorFactor >= 1.0, s"errorFactor must be >= 1, got $errorFactor")
    val meta = readMeta(spark, path)
    require(meta.m > 0, s"$path was built without PQ codes (m=0)")
    val df = spark.read.parquet(path)
    val newCb = PQ.train(df, "id", "vec", meta.m, meta.nCodes, iters, seed)
    val byVersion = (0 to meta.codebookVersions.size)
      .map(v => v -> meta.codebooksAt(v)).toMap
    val cellVer = meta.cellVersions
    import spark.implicits._
    def sqErr(v: Array[Float], cb: PQ.Codebooks): Double = {
      val d = cb.decode(cb.encodeVec(v))
      var s = 0.0
      var i = 0
      while (i < d.length) { val t = v(i) - d(i); s += t * t; i += 1 }
      s
    }
    val errs = df.select(col("cell"), col("vec")).as[(Int, Array[Float])]
      .mapPartitions(_.map { case (cell, v) =>
        (cell, sqErr(v, byVersion(cellVer.getOrElse(cell, 0))), sqErr(v, newCb))
      })
      .toDF("cell", "cur_err", "new_err")
      .groupBy(col("cell"))
      .agg(sum(col("cur_err")).as("cur"), sum(col("new_err")).as("nw"))
      .collect()
    val toRecode = errs.filter(r => r.getDouble(1) > errorFactor * r.getDouble(2))
      .map(_.getInt(0)).toSeq.sorted
    if (toRecode.isEmpty) return 0
    val newVersion = meta.codebookVersions.size + 1

    // staged rewrite of exactly the drifted cells (the delete() swap:
    // whole-directory replacement per cell, one cell's window at a time)
    val rows = df.filter(col("cell").isInCollection(toRecode))
      .select(col("id"), col("vec"), col("cell"), col("nrm"))
      .as[(Long, Array[Float], Int, Double)]
      .mapPartitions(_.map { case (id, v, cell, nrm) =>
        (id, v, cell, newCb.encodeVec(v), nrm) })
      .toDF("id", "vec", "cell", "pq_code", "nrm")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path,
      s".refresh-staging-${java.util.UUID.randomUUID()}")
    rows.write.partitionBy("cell").parquet(staging.toString)
    toRecode.foreach { c =>
      val src = new org.apache.hadoop.fs.Path(staging, s"cell=$c")
      val dst = new org.apache.hadoop.fs.Path(root, s"cell=$c")
      if (fs.exists(src)) {
        fs.delete(dst, true)
        require(fs.rename(src, dst), s"failed to move $src to $dst")
      }
    }
    fs.delete(staging, true)
    writeMeta(spark, path, meta.copy(
      codebookVersions = meta.codebookVersions :+
        newCb.centers.map(_.map(_.toSeq).toSeq).toSeq,
      cellVersions = meta.cellVersions ++ toRecode.map(_ -> newVersion)))
    toRecode.size
  }

  /** Remove crash-orphaned staging directories (`.refresh-staging-*`,
    * `.rebal-staging-*`): the maintenance ops stage rewrites under
    * dot-prefixed UUID dirs that no reader ever lists, and a crash
    * between staging and the per-cell swap leaves them behind — dead
    * bytes, never wrong answers. Single-maintainer contract like every
    * verb here: only run it while no maintenance op is in flight (a
    * LIVE staging dir is indistinguishable from an orphaned one).
    * Returns the number of directories removed.
    */
  def cleanupStaging(spark: SparkSession, path: String): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = fs.listStatus(root).filter { st =>
      val n = st.getPath.getName
      st.isDirectory &&
        (n.startsWith(".refresh-staging-") || n.startsWith(".rebal-staging-"))
    }
    stale.foreach(st => fs.delete(st.getPath, true))
    stale.length
  }

  /** Exact top-k over the probed cells: load the sidecar, rank the query
    * against the centroids driver-side, scan ONLY the `nProbe` nearest
    * cells (a partition-pruning IN filter — untouched cells are never
    * listed, read, or decoded), exact cosine within them.
    */
  def query(spark: SparkSession, path: String, query: Array[Double],
      nProbe: Int, k: Int): DataFrame = {
    val meta = readMeta(spark, path)
    require(nProbe > 0 && nProbe <= meta.nCells, s"nProbe must be in [1, ${meta.nCells}]")
    require(query.length == meta.dim, s"query dim ${query.length} != index dim ${meta.dim}")
    val probed = nearestCells(meta, query, nProbe)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qCol = typedlit(query.toSeq)
    spark.read.parquet(path)
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*))
      .select(col("id"),
        round(Similarity.dot(transform(col("vec"), _.cast("double")), qCol) /
          (col("nrm") * lit(qNorm)), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Batched k-NN JOIN against the persisted index — the unfiltered
    * sibling of [[hardNegatives]], same routing: every query row probes
    * its `nProbe` nearest cells, the probe rows equi-join the
    * cell-partitioned corpus (distinct probed cells partition-prune the
    * scan), and [[graft.plans.TopKPerKey]] heap-cuts top-k per query.
    * Self-matches (same id) are excluded, like [[Similarity.topKNeighbors]].
    * `nProbe = nCells` degenerates to exact brute force.
    */
  def knnJoin(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int, k: Int): DataFrame = {
    val meta = readMeta(spark, path)
    require(nProbe > 0 && nProbe <= meta.nCells, s"nProbe must be in [1, ${meta.nCells}]")
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      Similarity.l2Norm(col(vecCol)).as("q_nrm"),
      explode(Similarity.assignCells(col(vecCol), meta.centroids, nProbe)).as("cell"))
    val probed = q.select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq
    val corpus = spark.read.parquet(path)
      .filter(col("cell").isInCollection(probed))
      .select(col("cell"), col("id").as("neighbor_id"),
        col("vec").as("n_vec"), col("nrm").as("n_nrm"))
    val pairs = corpus.join(q, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dot(col("n_vec"), col("q_vec")) /
          (col("n_nrm") * col("q_nrm")), 6).as("sim"))
    graft.plans.TopKPerKey.topKPerKey(
      pairs, Seq("query_id"), Seq(col("sim").desc, col("neighbor_id")), k)
  }

  /** Per-cell population of the persisted index — the drift monitor that
    * pairs with [[append]]: appended mass never moves centroids, so a
    * cell whose share balloons past `1/nCells` by a large factor is the
    * rebuild signal (probe cost on that cell grows with it). One
    * footer-cheap aggregate over the cell partition column.
    */
  def cellStats(spark: SparkSession, path: String): DataFrame = {
    val meta = readMeta(spark, path)
    spark.read.parquet(path)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"))
      .withColumn("share", col("n_vectors") /
        sum(col("n_vectors")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("balance", col("share") * meta.nCells)
      .orderBy(col("cell"))
  }

  /** Split oversized cells IN PLACE — the remediation op [[cellStats]]'s
    * drift signal calls for (appends never move centroids, so a hot cell's
    * probe cost balloons): every cell whose balance (share × nCells)
    * exceeds `maxBalance` re-trains k=2 sub-centroids ON THAT CELL ONLY
    * (sample-bounded, exactly like [[build]]'s trainer) and rewrites ONLY
    * its partition directory — one sub-cell keeps the old id, the other
    * appends as a fresh cell — so the cost is proportional to the
    * oversized mass, never the corpus, and untouched cells' files stay
    * byte-identical. Splits repeat worst-cell-first until the bound holds,
    * a cell stops separating (near-identical vectors), or `maxSplits`.
    *
    * With `minBalance > 0` a MERGE pass follows: cells whose balance
    * falls below it (post-delete / post-append drift accumulating dead or
    * starved cells — each one a probe that reads almost nothing yet still
    * costs a centroid compare and a directory listing) fold into their
    * nearest-centroid neighbor, smallest first. A merge MOVES the starved
    * cell's parquet files into the neighbor's directory (the cell id
    * lives in the directory name, not the file bytes — zero data rewrite)
    * and replaces the two centroids with their mass-weighted mean; a
    * merge that would push the absorbing cell past `maxBalance` is
    * skipped. Surviving cells renumber contiguously (metadata-only
    * directory renames), so `nCells` genuinely shrinks.
    *
    * The sidecar's centroids/nCells update in the same pass; every
    * query/join/append path reads them unchanged. Exactness at
    * `nProbe = nCells` is preserved by construction (all cells scanned);
    * sub-linear probes see strictly SMALLER hot cells. Works for PQ
    * indexes too (codes ride the moved/rewritten rows unchanged).
    * Returns the number of splits + merges performed.
    */
  def rebalance(spark: SparkSession, path: String, maxBalance: Double = 4.0,
      iters: Int = 2, seed: Long = 42L, maxSplits: Int = 32,
      minBalance: Double = 0.0): Int = {
    require(maxBalance > 1.0,
      s"maxBalance must exceed 1 (the perfectly even share), got $maxBalance")
    require(minBalance >= 0.0 && minBalance < 1.0,
      s"minBalance must be in [0, 1), got $minBalance")
    val meta = readMeta(spark, path)
    val centroids = scala.collection.mutable.ArrayBuffer(meta.centroids: _*)
    // PQ generation per cell rides every structural change: a split's new
    // cell inherits its source generation (codes moved verbatim), a merge
    // across generations is refused (mixed codes would corrupt ADC), and
    // renumbering remaps the keys
    val cellVers = scala.collection.mutable.Map(meta.cellVersions.toSeq: _*)
    val counts = scala.collection.mutable.Map[Int, Long]()
    spark.read.parquet(path).groupBy(col("cell")).count()
      .collect().foreach(r => counts(r.getInt(0)) = r.getLong(1))
    val total = counts.values.sum.toDouble
    if (total == 0) return 0
    val unsplittable = scala.collection.mutable.Set[Int]()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var splits = 0
    // BATCHED split rounds: every cell over the bound splits in ONE pass —
    // one pooled sampling job (per-cell hash-ordered top-N, the
    // sampleVectors order), driver-side k=2 training per cell, one staged
    // write reassigning all of them via a per-cell when-chain, one staged
    // count. The previous worst-first loop issued three Spark jobs PER
    // split (up to 3×maxSplits); a round is three jobs total, and most
    // rebalances converge in one round.
    def breaching: Seq[Int] = counts.filterNot(c => unsplittable(c._1))
      .filter(_._2 * centroids.size / total > maxBalance)
      .toSeq.sortBy(-_._2).map(_._1)
    var round = breaching
    while (splits < maxSplits && round.nonEmpty) {
      val cells = round.take(maxSplits - splits)
      // pooled sample: one job, |cells| × 4096 rows collected
      val sampleSize = 4096
      val pooled = graft.plans.TopKPerKey.topKPerKey(
          spark.read.parquet(path)
            .filter(col("cell").isInCollection(cells))
            .select(col("cell"), col("vec"),
              xxhash64(col("id"), lit(seed)).as("__h")),
          Seq("cell"), Seq(col("__h")), sampleSize)
        .select(col("cell"), col("vec")).collect()
        .groupBy(_.getInt(0))
        .map { case (c, rs) =>
          c -> rs.map(_.getSeq[Float](1).map(_.toDouble).toArray) }
      val subsOf: Map[Int, Seq[Seq[Double]]] = cells.map { c =>
        c -> Similarity.lloydOnSample(pooled(c), 2, iters).map(_.toSeq).toSeq
      }.toMap
      val newIdOf: Map[Int, Int] =
        cells.zipWithIndex.map { case (c, i) => c -> (centroids.size + i) }.toMap
      // one staged write: each row routes through ITS cell's sub-centroids
      val reassigned = spark.read.parquet(path)
        .filter(col("cell").isInCollection(cells))
        .withColumn("cell", cells.foldLeft(lit(null).cast("int")) { (acc, c) =>
          when(col("cell") === c,
            when(Similarity.assignCell(col("vec"), subsOf(c)) === 0, lit(c))
              .otherwise(lit(newIdOf(c)))).otherwise(acc)
        })
      val staging = new org.apache.hadoop.fs.Path(path,
        s".rebal-staging-${java.util.UUID.randomUUID()}")
      reassigned.write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
      val stagedCounts = spark.read.parquet(staging.toString)
        .groupBy(col("cell")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // separating cells swap in; non-separating cells keep their original
      // directory untouched and never retry. New ids assigned to cells
      // that end up NOT splitting leave holes — compacted by appending
      // split cells in order, so re-derive each split's final id.
      val separated = cells.filter(c =>
        stagedCounts.contains(c) && stagedCounts.contains(newIdOf(c)))
      cells.filterNot(separated.contains).foreach(unsplittable += _)
      separated.foreach { c =>
        val finalNew = centroids.size
        val oldDir = new org.apache.hadoop.fs.Path(path, s"cell=$c")
        fs.delete(oldDir, true)
        Seq(c -> c, newIdOf(c) -> finalNew).foreach { case (stagedId, dstId) =>
          val src = new org.apache.hadoop.fs.Path(staging, s"cell=$stagedId")
          val dst = new org.apache.hadoop.fs.Path(path, s"cell=$dstId")
          require(fs.rename(src, dst), s"failed to move $src to $dst")
        }
        centroids(c) = subsOf(c)(0)
        centroids += subsOf(c)(1)
        cellVers.get(c).foreach(v => cellVers(finalNew) = v)
        counts(c) = stagedCounts(c)
        counts(finalNew) = stagedCounts(newIdOf(c))
        splits += 1
      }
      fs.delete(staging, true)
      round = breaching
    }

    // ---- merge pass: fold starved cells into their nearest neighbor ----
    var merges = 0
    val removed = scala.collection.mutable.Set[Int]()
    if (minBalance > 0.0) {
      def countOf(c: Int): Long = counts.getOrElse(c, 0L)
      def dist2(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val unmergeable = scala.collection.mutable.Set[Int]()
      var go = true
      while (go) {
        val live = centroids.indices.filterNot(removed)
        val cand = live.filterNot(unmergeable)
          .map(c => (countOf(c), c)).minOption
        go = live.size > 1 && cand.exists { case (n, _) =>
          n * live.size / total < minBalance }
        if (go) {
          val src = cand.get._2
          val tgt = live.filter(_ != src)
            .minBy(o => dist2(centroids(o), centroids(src)))
          // absorbing must not recreate the hot-cell problem; and a PQ
          // merge across codebook generations would mix incomparable
          // codes in one directory — refuse the pair
          if ((countOf(tgt) + countOf(src)) * (live.size - 1) / total > maxBalance ||
              (meta.m > 0 &&
                cellVers.getOrElse(src, 0) != cellVers.getOrElse(tgt, 0)))
            unmergeable += src
          else {
            val srcDir = new org.apache.hadoop.fs.Path(path, s"cell=$src")
            if (fs.exists(srcDir)) {
              val tgtDir = new org.apache.hadoop.fs.Path(path, s"cell=$tgt")
              fs.mkdirs(tgtDir)
              fs.listStatus(srcDir).filter(_.getPath.getName.endsWith(".parquet"))
                .foreach { st =>
                  // fresh name: part names from different writes could collide
                  val dst = new org.apache.hadoop.fs.Path(tgtDir,
                    s"part-merge-${java.util.UUID.randomUUID()}.snappy.parquet")
                  require(fs.rename(st.getPath, dst),
                    s"failed to move ${st.getPath} to $dst")
                }
              fs.delete(srcDir, true)
            }
            val (ns, nt) = (countOf(src), countOf(tgt))
            if (ns + nt > 0)
              centroids(tgt) = centroids(tgt).zip(centroids(src)).map {
                case (t, s) => (t * nt + s * ns) / (nt + ns) }
            counts(tgt) = nt + ns
            counts.remove(src)
            cellVers.remove(src)
            removed += src
            merges += 1
          }
        }
      }
      // renumber survivors contiguously (ascending order vacates every
      // target slot before it is reused — new ids never exceed old ones)
      if (removed.nonEmpty) {
        val survivors = centroids.indices.filterNot(removed).toSeq
        survivors.zipWithIndex.foreach { case (old, nw) =>
          if (old != nw) {
            val srcDir = new org.apache.hadoop.fs.Path(path, s"cell=$old")
            if (fs.exists(srcDir)) {
              val dstDir = new org.apache.hadoop.fs.Path(path, s"cell=$nw")
              require(!fs.exists(dstDir), s"renumber target $dstDir occupied")
              require(fs.rename(srcDir, dstDir), s"failed to rename $srcDir")
            }
          }
        }
        val renumbered = survivors.map(centroids)
        val renumberedVers = survivors.zipWithIndex.flatMap { case (old, nw) =>
          cellVers.get(old).map(nw -> _) }
        centroids.clear()
        centroids ++= renumbered
        cellVers.clear()
        cellVers ++= renumberedVers
      }
    }

    if (splits > 0 || merges > 0)
      writeMeta(spark, path,
        meta.copy(nCells = centroids.size, centroids = centroids.toSeq,
          cellVersions = cellVers.toMap))
    splits + merges
  }

  /** ANN-routed hard-negative mining for UNBOUNDED query sets — the scale
    * path past [[Similarity.hardNegatives]]'s broadcast form: instead of
    * broadcasting the query set and scoring it against the whole corpus,
    * every query probes only its `nProbe` nearest IVF cells of a
    * [[build]]-persisted index (built with `extraCols = Seq(labelCol)` so
    * the filter column is co-located). The query side explodes to
    * |queries|·nProbe `(query, cell)` rows and equi-joins the index on
    * `cell` — the corpus shuffles by cell AT MOST once and only the probed
    * cells are ever read: the distinct probed-cell set (≤ nCells ints,
    * driver-side) becomes a partition-pruning IN filter on the scan, at
    * the cost of one extra narrow pass over the query side. A corpus
    * vector lives in exactly one cell, so no pair duplicates across
    * probes. Per query the candidate set is the probed cells' population,
    * sub-linear in the corpus for nProbe << nCells; `nProbe = nCells`
    * degenerates to the exact brute-force semantics (the cross-engine
    * gate form — q108). Ranking is `round(sim, 6) DESC, id` and the heap
    * cut is [[graft.plans.TopKPerKey]], both as in the exact form, so
    * results are engine-comparable.
    */
  def hardNegatives(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, nProbe: Int,
      k: Int): DataFrame = {
    val meta = readMeta(spark, path)
    require(nProbe > 0 && nProbe <= meta.nCells, s"nProbe must be in [1, ${meta.nCells}]")
    val q = queries.select(
      col(idCol).as("query_id"), col(labelCol).as("q_label"),
      col(vecCol).as("q_vec"), Similarity.l2Norm(col(vecCol)).as("q_nrm"),
      explode(Similarity.assignCells(col(vecCol), meta.centroids, nProbe)).as("cell"))
    val probed = q.select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq
    val corpus = spark.read.parquet(path)
      .filter(col("cell").isInCollection(probed))
      .select(col("cell"), col("id").as("neg_id"), col(labelCol).as("n_label"),
        col("vec").as("n_vec"), col("nrm").as("n_nrm"))
    val pairs = corpus.join(q, "cell")
      .filter(col("n_label") =!= col("q_label"))
      .select(col("query_id"), col("neg_id"),
        round(Similarity.dot(col("n_vec"), col("q_vec")) /
          (col("n_nrm") * col("q_nrm")), 6).as("sim"))
    graft.plans.TopKPerKey.topKPerKey(
      pairs, Seq("query_id"), Seq(col("sim").desc, col("neg_id")), k)
  }

  /** PQ-approximate top-k over the probed cells (requires `m > 0` at build
    * time): ADC lookup-table distances over the stored codes — the probed
    * cells' codes are the only bytes that move.
    */
  def queryPq(spark: SparkSession, path: String, query: Array[Double],
      nProbe: Int, k: Int): DataFrame = {
    val meta = readMeta(spark, path)
    require(meta.codebooks.isDefined,
      s"$path was built without PQ codes (m=0)")
    val probed = nearestCells(meta, query, nProbe)
    // codes compare only within one codebook generation: probe per
    // generation group (almost always exactly one) and take the global
    // top-k over the per-group results — ADC distances are all against
    // the SAME query, so the union ordering is sound
    val groups = probed.groupBy(meta.versionOfCell)
    val parts = groups.toSeq.sortBy(_._1).map { case (v, cells) =>
      PQ.adcTopK(
        spark.read.parquet(path)
          .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
          .select(col("id"), col("pq_code")),
        "id", query, meta.codebooksAt(v), k)
    }
    val all = parts.reduce(_ unionByName _)
    if (parts.size == 1) all
    else all.orderBy(col("adist"), col("id")).limit(k)
  }

  /** PQ shortlist + EXACT refinement — the production IVF-PQ serving
    * shape (FAISS's refine stage): ADC ranks a shortlist of `k · refine`
    * candidates from the compressed codes alone ([[queryPq]] — only code
    * bytes move), then the true cosine reranks ONLY the shortlist's
    * full vectors (an id-pushed, partition-pruned point lookup). Recall
    * approaches the exact probe at a fraction of its vector-decode cost;
    * `refine = 1` degenerates to trusting ADC order, large `refine`
    * converges on [[query]]'s exact-within-probed-cells result. Output
    * shape matches [[query]] (`id`, `sim`) so callers swap paths freely.
    * The shortlist crosses the driver — k·refine longs, bounded by
    * construction.
    */
  def queryPqRefined(spark: SparkSession, path: String, query: Array[Double],
      nProbe: Int, k: Int, refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val meta = readMeta(spark, path)
    val probed = nearestCells(meta, query, nProbe)
    val ids = queryPq(spark, path, query, nProbe, k * refine)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qCol = typedlit(query.toSeq)
    spark.read.parquet(path)
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*) &&
        col("id").isInCollection(if (ids.isEmpty) Seq(-1L) else ids))
      .select(col("id"),
        round(Similarity.dot(transform(col("vec"), _.cast("double")), qCol) /
          (col("nrm") * lit(qNorm)), 6).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  private def nearestCells(meta: Meta, query: Array[Double], nProbe: Int): Seq[Int] =
    meta.centroids.zipWithIndex
      .map { case (c, j) =>
        (c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }
      .sorted.take(nProbe).map(_._2)

  private def writeMeta(spark: SparkSession, path: String, meta: Meta): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("dim", meta.dim); root.put("nCells", meta.nCells)
    root.put("m", meta.m); root.put("nCodes", meta.nCodes)
    val cs = root.putArray("centroids")
    meta.centroids.foreach { c => val a = cs.addArray(); c.foreach(a.add) }
    meta.codebooks.foreach { books =>
      val bs = root.putArray("codebooks")
      books.foreach { book =>
        val b = bs.addArray()
        book.foreach { c => val a = b.addArray(); c.foreach(a.add) }
      }
    }
    if (meta.codebookVersions.nonEmpty) {
      val vs = root.putArray("codebookVersions")
      meta.codebookVersions.foreach { books =>
        val bs = vs.addArray()
        books.foreach { book =>
          val b = bs.addArray()
          book.foreach { c => val a = b.addArray(); c.foreach(a.add) }
        }
      }
    }
    if (meta.cellVersions.nonEmpty) {
      val cv = root.putObject("cellVersions")
      meta.cellVersions.toSeq.sortBy(_._1).foreach { case (c, v) =>
        cv.put(c.toString, v) }
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_ann_meta.json"), true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
  }

  /** The persisted sidecar state (driver-side, a few KB) — the public
    * introspection point maintenance callers key decisions on (PQ-ness,
    * cell count) without re-deriving it from the data files.
    */
  def meta(spark: SparkSession, path: String): Meta = readMeta(spark, path)

  /** One data file of the index, found by walking at most the cell
    * directories (O(nCells) listing, never O(files)); None on an index
    * with no data yet.
    */
  private def sampleDataFile(spark: SparkSession, path: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .flatMap(d => fs.listStatus(d.getPath).iterator
        .filter(_.getPath.getName.endsWith(".parquet")).take(1))
      .take(1).map(_.getPath.toString).toSeq.headOption
  }

  private[ext] def readMeta(spark: SparkSession, path: String): Meta = {
    val p = new org.apache.hadoop.fs.Path(path, "_ann_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$path is not an ANN index (no _ann_meta.json)")
    val in = fs.open(p)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(content)
    import scala.jdk.CollectionConverters._
    def arr2(n: com.fasterxml.jackson.databind.JsonNode): Seq[Seq[Double]] =
      n.elements().asScala.map(_.elements().asScala.map(_.asDouble()).toSeq).toSeq
    Meta(
      node.get("dim").asInt(), node.get("nCells").asInt(),
      node.get("m").asInt(), node.get("nCodes").asInt(),
      arr2(node.get("centroids")),
      Option(node.get("codebooks")).map(_.elements().asScala.map(arr2).toSeq),
      Option(node.get("codebookVersions"))
        .map(_.elements().asScala.map(gen =>
          gen.elements().asScala.map(arr2).toSeq).toSeq)
        .getOrElse(Nil),
      Option(node.get("cellVersions")).map { cv =>
        cv.fieldNames().asScala.map(k => k.toInt -> cv.get(k).asInt()).toMap
      }.getOrElse(Map.empty))
  }
}
