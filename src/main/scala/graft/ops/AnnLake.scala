package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.sources.LogLake

/** The BUILD/SEARCH split every production vector system has: the ANN
  * index ([[AnnIndex]] books + cell postings + PQ codes) persisted ONCE
  * as loglake tables, then searched — and incrementally maintained — by
  * READING the index, never re-deriving it from the corpus.
  *
  * q157: build → persist (5 loglake tables) → search against the stored
  * index. The search re-ranks from LIST-RESIDENT residuals (Jégou et
  * al. 2011 §V stores re-rank payloads in the inverted list), so its
  * only corpus read is the pushed-filter query-vector scan — pinned
  * in-query by (a) a flat [[AnnIndex.encodePasses]] counter across the
  * whole search construction and (b) a plan walk requiring every
  * embeddings scan to carry a vec_id filter.
  *
  * q158: incremental maintenance on append. New vectors land in a
  * staging table; the maintenance job assigns + encodes them with the
  * FROZEN codebooks read back from the index tables (one delta-sized
  * job — its plan is required to scan ONLY staging + books, never the
  * corpus or the existing postings) and loglake-appends into the index.
  * The query then requires maintained == full-rebuild-under-frozen-books
  * equality for postings AND codes (exact, both directions) before
  * searching the maintained index. The oracle replays the frozen-book
  * math end to end (codebooks from the base subset, assignment over
  * base ∪ delta).
  *
  * 100 TB shape: the index build is the one corpus-sized job and it
  * happens once; appends cost O(delta); every search reads
  * nprobe·n/ncells code rows + a constant shortlist of residuals. The
  * books tables are metadata-sized at any corpus size (2·K₁ half
  * vectors + KS codewords, K₁ ≈ n^¼).
  */
object AnnLake {

  private val MA = 1

  /** index table layout under one scratch root */
  private case class IndexDirs(root: String) {
    val books1 = root + "/books1"     // (i1, c1)        — metadata-sized
    val books2 = root + "/books2"     // (i2, c2)        — metadata-sized
    val rescb  = root + "/rescb"      // (j, code, cv)   — metadata-sized
    val postings = root + "/postings" // (vec_id, c_id, arnk, r)
    val codes  = root + "/codes"      // (vec_id, c_id, j, code)
  }

  /** Build books/assignments/codes from `n` and persist them; k1 rides
    * the postings table's properties so a later reader needs no corpus
    * pass to recover it. Returns k1. */
  private def buildAndPersist(s: org.apache.spark.sql.SparkSession,
      ix: IndexDirs, n: org.apache.spark.sql.DataFrame): Int = {
    val k1 = AnnIndex.k1Of(n.count())
    val (cb1, cb2) = AnnIndex.subBooks(n, k1)
    val asg = AnnIndex.assignTop(n, k1, cb1, cb2, MA)
    val cb = AnnIndex.residualBook(asg)
    val codes = AnnIndex.encode(asg, cb)
    LogLake.create(s, ix.books1, cb1)
    LogLake.create(s, ix.books2, cb2)
    LogLake.create(s, ix.rescb, cb)
    LogLake.create(s, ix.postings, asg, statsCols = Seq("c_id"))
    LogLake.create(s, ix.codes, codes, statsCols = Seq("c_id"))
    LogLake.setTableProperties(ix.postings, Map("ann.k1" -> k1.toString))
    k1
  }

  /** Every parquet scan in `df`'s physical plan, as (pathString, scan).
    * Walks `sparkPlan` (pre-AQE): under adaptive execution the executed
    * plan is an AdaptiveSparkPlanExec whose inner tree is not a child,
    * so collecting over it silently finds no scans — which would make
    * every scan-shape require here vacuously true. */
  private def fileScans(df: org.apache.spark.sql.DataFrame) = {
    val scans = df.queryExecution.sparkPlan.collect {
      case sc: FileSourceScanExec =>
        (sc.relation.location.rootPaths.map(_.toString).mkString(","), sc)
    }
    require(scans.nonEmpty, "scan-shape require would be vacuous: no file scans found")
    scans
  }

  val all: Seq[Q] = Seq(

    // --- q157: PERSISTED ANN INDEX + search-by-reading-it. Same math
    // and knobs as q150 (AnnIndex), so the oracle is the same
    // build+search replay — the hash gate certifies that persisting
    // through loglake and searching from the stored tables loses
    // nothing. The requires certify the split is real: zero encode
    // passes during search, and no unfiltered corpus scan anywhere in
    // the search plan.
    Q(
      "q157_ann_index_search",
      AnnIndex.oracleSql(ma = MA, shortR = AnnIndex.ShortR, k = AnnIndex.K)
    ) { (s, d) =>
      val ix = IndexDirs(Lake.freshDir("q157"))
      val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
      // BUILD: the one corpus-sized pass, persisted
      buildAndPersist(s, ix, AnnIndex.normalized(emb))
      // SEARCH: index tables + the bounded query-vector read only
      val passes = AnnIndex.encodePasses.get()
      val k1 = LogLake.tableProperties(ix.postings)("ann.k1").toInt
      val qn = AnnIndex.normalized(emb.filter(col("vec_id") < 20))
      val res = AnnIndex.search(qn, k1,
        LogLake.snapshot(s, ix.books1), LogLake.snapshot(s, ix.books2),
        LogLake.snapshot(s, ix.rescb), LogLake.snapshot(s, ix.postings),
        LogLake.snapshot(s, ix.codes),
        rerank = None, nprobe = AnnIndex.nprobeOf(k1 * k1))
      require(AnnIndex.encodePasses.get() == passes,
        "q157: the search phase must never re-encode the corpus")
      val scans = fileScans(res)
      val corpus = scans.filter(_._1.contains("embeddings"))
      require(corpus.nonEmpty && corpus.forall { case (_, sc) =>
        sc.dataFilters.exists(_.references.exists(_.name == "vec_id")) },
        "q157: the only corpus read must be the vec_id-filtered query scan")
      require(scans.exists(_._1.contains("/postings")),
        "q157: the search must read the persisted postings table")
      res
    },

    // --- q158: INCREMENTAL INDEX MAINTENANCE. Base corpus indexed at
    // t0; the delta (every vec_id ≡ 3 mod 7) lands in a staging table;
    // maintenance assigns + encodes the delta under the FROZEN books
    // (read back from the index — k1, half-books, residual codebook all
    // come from storage) and appends into postings/codes. Equality
    // against a frozen-book full rebuild is required exactly, both
    // directions, for postings AND codes; the maintenance plan is
    // required to read nothing but staging + books. The search result
    // over the maintained index is the oracle-hashed output.
    Q(
      "q158_ann_index_maintain",
      AnnIndex.oracleSql(ma = MA, shortR = AnnIndex.ShortR, k = AnnIndex.K,
        baseWhere = Some("vec_id % 7 <> 3"))
    ) { (s, d) =>
      val root = Lake.freshDir("q158")
      val ix = IndexDirs(root)
      val staging = root + "/staging"
      val basePred = col("vec_id") % 7 =!= 3
      val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
      // ingestion: the delta arrives as its own table (reading the
      // corpus here is ingest, not maintenance)
      LogLake.create(s, staging, emb.filter(!basePred))
      // t0 BUILD over the base corpus only
      buildAndPersist(s, ix, AnnIndex.normalized(emb.filter(basePred)))
      // MAINTENANCE: frozen books from storage, delta from staging
      val k1 = LogLake.tableProperties(ix.postings)("ann.k1").toInt
      val fb1 = LogLake.snapshot(s, ix.books1)
      val fb2 = LogLake.snapshot(s, ix.books2)
      val fcb = LogLake.snapshot(s, ix.rescb)
      val nd = AnnIndex.normalized(LogLake.snapshot(s, staging))
      val asgD = AnnIndex.assignTop(nd, k1, fb1, fb2, MA)
      val codesD = AnnIndex.encode(asgD, fcb)
      for (job <- Seq(asgD, codesD); (path, _) <- fileScans(job)) {
        require(!path.contains("embeddings") && !path.contains("/postings")
          && !path.contains("/codes"),
          s"q158: the maintenance job must be delta-sized — it may scan " +
            s"only staging + books, got $path")
      }
      val deltaRows = nd.count()
      val before = LogLake.snapshot(s, ix.postings).count()
      LogLake.append(s, ix.postings, asgD)
      LogLake.append(s, ix.codes, codesD)
      require(LogLake.snapshot(s, ix.postings).count() == before + MA * deltaRows,
        "q158: the maintenance append must add exactly ma × delta rows")
      // maintained == frozen-book full rebuild, exactly (multiset:
      // equal cardinality + empty one-way difference suffices)
      val full = AnnIndex.assignTop(AnnIndex.normalized(emb), k1, fb1, fb2, MA)
      val maintained = LogLake.snapshot(s, ix.postings)
      require(maintained.count() == full.count() && maintained.exceptAll(full).isEmpty,
        "q158: maintained postings must equal the frozen-book rebuild")
      val fullCodes = AnnIndex.encode(full, fcb)
      val mCodes = LogLake.snapshot(s, ix.codes)
      require(mCodes.count() == fullCodes.count() && mCodes.exceptAll(fullCodes).isEmpty,
        "q158: maintained codes must equal the frozen-book rebuild")
      // SEARCH the maintained index (list-resident re-rank, as q157)
      AnnIndex.search(AnnIndex.normalized(emb.filter(col("vec_id") < 20)), k1,
        fb1, fb2, fcb,
        maintained, mCodes,
        rerank = None, nprobe = AnnIndex.nprobeOf(k1 * k1))
    }
  )
}
