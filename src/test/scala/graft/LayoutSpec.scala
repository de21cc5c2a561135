package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.Extractor

class LayoutSpec extends AnyFunSuite {
  lazy val spark = GraftSession.test
  import spark.implicits._

  test("stateTag freshness contract: default re-lists per call; TTL memoizes; invalidation hook re-lists") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("tag").toString
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/t.parquet")
    val path = s"$dir/t.parquet"
    def rewrite(): Unit = {
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
        .write.mode("append").parquet(path)
    }
    // default (no TTL conf): a regen is visible on the NEXT call
    val t0 = Layout.stateTag(spark, path)
    rewrite()
    val t1 = Layout.stateTag(spark, path)
    assert(t1 != t0, "default mode must re-list per call (round-15 behavior)")
    // with a TTL: the memo serves the stale tag inside the window …
    spark.conf.set("spark.graft.layout.stateTagTtlMs", "600000")
    try {
      val m0 = Layout.stateTag(spark, path)
      rewrite()
      assert(Layout.stateTag(spark, path) == m0,
        "TTL mode must serve the memoized tag inside the window")
      // … and the explicit invalidation hook forces a fresh LIST
      Layout.invalidateStateTag(path)
      assert(Layout.stateTag(spark, path) != m0,
        "invalidateStateTag must force the next call to re-list")
    } finally spark.conf.unset("spark.graft.layout.stateTagTtlMs")
  }

  test("invalidateStateTag hits the memo under spelling variants of the same path") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("tagnorm").toString
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/t.parquet")
    val path = s"$dir/t.parquet"
    spark.conf.set("spark.graft.layout.stateTagTtlMs", "600000")
    try {
      val m0 = Layout.stateTag(spark, path)
      Seq((2L, "b")).toDF("doc_id", "text").write.mode("append").parquet(path)
      // invalidate under a DIFFERENT spelling (double slash) of the
      // same path — round-16 advice: the memo key is the raw string,
      // so './x' / 'x//y' variants missed and kept serving stale tags
      Layout.invalidateStateTag(s"$dir//t.parquet")
      assert(Layout.stateTag(spark, path) != m0,
        "a normalized-variant invalidation must evict the memo entry")
      // dot-segment variant: Hadoop Path alone does NOT collapse '/./'
      // (the first normalization relied on it and missed) — the key
      // must go through URI.normalize()
      val m1 = Layout.stateTag(spark, path)
      Seq((3L, "c")).toDF("doc_id", "text").write.mode("append").parquet(path)
      Layout.invalidateStateTag(s"$dir/./t.parquet")
      assert(Layout.stateTag(spark, path) != m1,
        "a dot-segment-variant invalidation must evict the memo entry")
    } finally spark.conf.unset("spark.graft.layout.stateTagTtlMs")
  }

  test("store caches honor spark.graft.cache.root (file: URI): cold build lands there, warm call serves without rebuild") {
    import graft.operators.{Curation, Layout}
    import org.apache.hadoop.fs.Path
    val root = "file:" + java.nio.file.Files.createTempDirectory("groot").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val dir = "/root/testdata/sf0.001"
      val cold = Curation.winnowProbeFpCached(spark, dir)
        .collect().map(_.get(0).toString).sorted.toSeq
      assert(cold.nonEmpty)
      // the artifact landed under the CONF'D root, probed through the
      // Hadoop FS of the root's own URI (round 17: the java.io.File
      // probe this replaces answered about the cwd-relative local disk
      // regardless of the configured root)
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stores = fs.listStatus(new Path(s"$root/winnow_probe_cache"))
        .filter(_.isDirectory)
      assert(stores.length == 1, "exactly one store key under the conf'd root")
      // round 18: the key-dir holds committed generations; resolve like
      // the serve path does
      val gen = Layout.resolveGeneration(spark, stores.head.getPath.toString)
      assert(gen.isDefined, "a committed generation must resolve")
      val succ = new Path(gen.get, "_SUCCESS")
      assert(fs.exists(succ))
      val m0 = fs.getFileStatus(succ).getModificationTime
      val warm = Curation.winnowProbeFpCached(spark, dir)
        .collect().map(_.get(0).toString).sorted.toSeq
      assert(warm == cold, "warm serve must read back the stored artifact")
      assert(fs.getFileStatus(succ).getModificationTime == m0,
        "warm call must NOT rebuild the store (the _SUCCESS marker is untouched)")
      assert(Layout.storeReady(spark, gen.get),
        "storeReady must see the completed generation through the Hadoop path")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("buildOnce: concurrent cold callers build exactly once; waiters serve the winner's store") {
    import graft.operators.Layout
    val root = java.nio.file.Files.createTempDirectory("lease").toString
    val store = s"$root/fam/key1"
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): Unit = Layout.buildOnce(spark, store) {
      built.incrementAndGet()
      Thread.sleep(300) // hold the lease long enough for the race to be real
      Seq((1L, "a")).toDF("doc_id", "text").write.mode("overwrite").parquet(store)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map(_ => pool.submit(new Runnable { def run(): Unit = serve() }))
      futs.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(built.get() == 1,
      s"four concurrent cold callers must run the build exactly once, ran ${built.get()}")
    assert(Layout.storeReady(spark, store))
    // the lease marker is gone after a completed build
    val m = new org.apache.hadoop.fs.Path(store + "__building")
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(m), "a completed build must release its lease marker")
    // warm call: no rebuild
    serve()
    assert(built.get() == 1, "a warm call must not re-run the build")
  }

  test("buildOnce: a DEAD builder's stale lease is taken over; a LIVE builder's fresh lease is honored") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("lease2").toString
    val store = s"$root/fam/key2"
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed builder: marker exists, mtime far in the past, no _SUCCESS
    val marker = new Path(store + "__building")
    fs.create(marker, false).close()
    fs.setTimes(marker, System.currentTimeMillis() - 3600 * 1000L, -1)
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.conf.set("spark.graft.cache.leaseMs", "2000")
    try {
      Layout.buildOnce(spark, store) {
        built.incrementAndGet()
        Seq((1L, "a")).toDF("doc_id", "text").write.mode("overwrite").parquet(store)
      }
      assert(built.get() == 1, "a stale (dead-builder) lease must be taken over")
      assert(Layout.storeReady(spark, store))
      // a FRESH foreign lease parks the caller until the store appears:
      // simulate the foreign builder completing from another thread
      val store3 = s"$root/fam/key3"
      val marker3 = new Path(store3 + "__building")
      fs.create(marker3, false).close() // fresh mtime — a live builder
      val t = new Thread(() => {
        Thread.sleep(400)
        Seq((2L, "b")).toDF("doc_id", "text").write.parquet(store3)
        fs.delete(marker3, false)
      })
      t.start()
      val waited = new java.util.concurrent.atomic.AtomicInteger(0)
      Layout.buildOnce(spark, store3) { waited.incrementAndGet() }
      t.join()
      assert(waited.get() == 0,
        "a caller finding a live foreign lease must wait for that build, not run its own")
      assert(Layout.storeReady(spark, store3))
    } finally spark.conf.unset("spark.graft.cache.leaseMs")
  }

  test("gcStores: stale generations deleted per (family, corpus-group); newest/young/building/foreign kept; dryRun reports only") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("gcroot").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      def mk(family: String, key: String, ageMs: Long): Path = {
        val kd = new Path(s"$root/$family/$key")
        fs.mkdirs(kd)
        val succ = new Path(kd, "_SUCCESS")
        fs.create(succ, true).close()
        fs.setTimes(succ, now - ageMs, -1)
        fs.setTimes(kd, now - ageMs, -1)
        kd
      }
      // corpus A: two generations (same group — keys differ only in tag)
      val aOld = mk("clusters_cache", "corpA_1700000000000hdeadbeef_df100", 10 * 86400000L)
      val aNew = mk("clusters_cache", "corpA_1700000009999hcafebabe_df100", 1000L)
      // corpus B: ONE old generation (different group: must survive keepNewest=1)
      val bOnly = mk("clusters_cache", "corpB_1700000000000h12345678_df100", 10 * 86400000L)
      // a live build: old dir but fresh sibling lease marker
      val cBuild = mk("clusters_cache", "corpC_1700000000000h00ff00ff_df100", 10 * 86400000L)
      fs.create(new Path(s"$root/clusters_cache/corpC_1700000000000h00ff00ff_df100__building"), true).close()
      // a foreign (non-store) artifact under the root: never touched
      val foreign = new Path(s"$root/somebody_elses_dir/x")
      fs.mkdirs(foreign)

      // dryRun: reports the old generation as would-delete, deletes nothing
      val dry = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 1, dryRun = true)
      assert(dry.exists(e => e.key.contains("corpA_1700000000000") && e.action == "would-delete"))
      assert(fs.exists(aOld), "dryRun must not delete")

      val rep = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 1)
      def action(key: String) = rep.find(_.key == key).map(_.action)
      assert(!fs.exists(aOld) && action("corpA_1700000000000hdeadbeef_df100").contains("deleted"),
        "the superseded generation of corpus A must be deleted")
      assert(fs.exists(aNew) && action("corpA_1700000009999hcafebabe_df100").contains("kept-newest"))
      assert(fs.exists(bOnly) && action("corpB_1700000000000h12345678_df100").contains("kept-newest"),
        "another corpus's only generation must not count against A's quota")
      assert(fs.exists(cBuild) && action("corpC_1700000000000h00ff00ff_df100").contains("kept-building"),
        "a key-dir with a fresh build lease must never be deleted")
      assert(fs.exists(foreign), "GC must only touch the known store families")

      // hard horizon: a DEAD group's newest generation ages out too
      val rep2 = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 1,
        hardMaxAgeMs = 5 * 86400000L)
      assert(!fs.exists(bOnly) &&
        rep2.find(_.key == "corpB_1700000000000h12345678_df100").map(_.action).contains("deleted"),
        "hardMaxAgeMs must reclaim a dead group's stale newest")
      assert(fs.exists(aNew), "the young live generation survives the hard horizon")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("gcStores: a kept-building generation never occupies a keep-newest quota slot") {
    // r19 advice: the slot decision ran BEFORE the building check, so a
    // complete generation still holding its __building marker consumed
    // the per-key quota while being reported kept-building — pushing
    // another key's only complete generation into age-based deletion.
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("gcslot").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      def mk(key: String, ageMs: Long): Path = {
        val kd = new Path(s"$root/clusters_cache/$key")
        fs.mkdirs(kd)
        val succ = new Path(kd, "_SUCCESS")
        fs.create(succ, true).close()
        fs.setTimes(succ, now - ageMs, -1)
        fs.setTimes(kd, now - ageMs, -1)
        kd
      }
      // same corpus group: the newer key is complete AND mid-rebuild
      // (fresh sibling lease); the older key is this group's only other
      // complete generation, past maxAgeMs — it must win the one slot
      val building = mk("corpS_1700000009999hcafebabe_df100", 1000L)
      fs.create(new Path(s"$root/clusters_cache/corpS_1700000009999hcafebabe_df100__building"), true).close()
      val onlyOther = mk("corpS_1700000000000hdeadbeef_df100", 10 * 86400000L)
      val rep = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 1)
      def action(key: String) = rep.find(_.key == key).map(_.action)
      assert(action("corpS_1700000009999hcafebabe_df100").contains("kept-building"))
      assert(fs.exists(onlyOther) &&
        action("corpS_1700000000000hdeadbeef_df100").contains("kept-newest"),
        "a kept-building generation must not consume the quota slot that keeps this one alive")
      assert(fs.exists(building))
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("gcStores end-to-end on a real store: the superseded generation is reclaimed, the live one still serves warm") {
    import graft.operators.{Curation, Layout}
    import org.apache.hadoop.fs.Path
    val root = "file:" + java.nio.file.Files.createTempDirectory("gcr2").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      // corpus v1 → build generation 1
      val dir = java.nio.file.Files.createTempDirectory("gcc").toString
      val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      src.write.parquet(s"$dir/documents.parquet")
      Curation.winnowProbeFpCached(spark, dir).count()
      // corpus regen → a NEW store generation
      Thread.sleep(1100) // mtime granularity: make the regen visibly newer
      src.limit(40).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val v2 = Curation.winnowProbeFpCached(spark, dir)
        .collect().map(_.get(0).toString).sorted.toSeq
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val fam = new Path(s"$root/winnow_probe_cache")
      assert(fs.listStatus(fam).count(_.isDirectory) == 2,
        "two store keys (corpus generations) before GC")

      val rep = Layout.gcStores(spark, maxAgeMs = 0L, keepNewest = 1)
      val keys = fs.listStatus(fam).filter(_.isDirectory)
      assert(keys.length == 1, s"GC must reclaim the superseded generation: $rep")
      val gen = Layout.resolveGeneration(spark, keys.head.getPath.toString)
      assert(gen.isDefined, "the surviving key must still resolve a committed generation")
      val succ = new Path(gen.get, "_SUCCESS")
      val m0 = fs.getFileStatus(succ).getModificationTime
      val warm = Curation.winnowProbeFpCached(spark, dir)
        .collect().map(_.get(0).toString).sorted.toSeq
      assert(warm == v2, "the surviving generation must serve the same artifact")
      assert(fs.getFileStatus(succ).getModificationTime == m0,
        "the live generation must serve WARM after GC — no rebuild")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("generation protocol: build-once via gen-dir + _CURRENT commit; warm resolve; crash/torn-pointer fallbacks") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("genp").toString
    val key = s"$root/fam/keyA"
    val fs = new Path(key).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): String = Layout.generation(spark, key) { g =>
      built.incrementAndGet()
      Thread.sleep(200)
      Seq((1L, "a")).toDF("doc_id", "text").write.parquet(g)
    }
    // four concurrent cold callers: one build, all resolve the same gen
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val gens = try {
      val futs = (1 to 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[String] { def call(): String = serve() }))
      futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(built.get() == 1 && gens.toSet.size == 1,
      s"one build, one generation: built=${built.get()}, gens=${gens.toSet}")
    val g1 = gens.head
    assert(g1.contains("/gen-") && fs.exists(new Path(g1, "_SUCCESS")))
    // the pointer is the commit record
    val ptr = new Path(s"$key/${"_CURRENT"}")
    assert(fs.exists(ptr), "_CURRENT must exist after a committed build")
    // warm call: resolves without building
    assert(serve() == g1 && built.get() == 1)
    // lease marker released
    assert(!fs.exists(new Path(key + "__building")))

    // two-writer race (the advisory-lease case on object stores): a
    // second complete generation lands and commits LAST — both commits
    // are safe, the pointer picks one, nothing is torn
    Thread.sleep(5)
    val tok2 = f"gen-${System.currentTimeMillis()}%013d-deadbeef"
    Seq((2L, "b")).toDF("doc_id", "text").write.parquet(s"$key/$tok2")
    val os = fs.create(ptr, true)
    os.write(tok2.getBytes("UTF-8")); os.close()
    val resolved = Layout.resolveGeneration(spark, key)
    assert(resolved.contains(s"$key/$tok2"), s"pointer must win: $resolved")
    assert(spark.read.parquet(resolved.get).count() == 1) // complete, not torn
    // loser generation still complete on disk (GC's job, not the reader's)
    assert(fs.exists(new Path(g1, "_SUCCESS")))

    // torn/absent pointer: fallback = newest COMPLETE generation
    fs.delete(ptr, false)
    assert(Layout.resolveGeneration(spark, key).contains(s"$key/$tok2"),
      "absent pointer must fall back to the newest complete generation")
    // a dangling pointer (names a gen that was GC'd) also falls back
    val os2 = fs.create(ptr, true)
    os2.write("gen-9999999999999-gone".getBytes("UTF-8")); os2.close()
    assert(Layout.resolveGeneration(spark, key).contains(s"$key/$tok2"))

    // crash before commit with an INCOMPLETE generation: resolve ignores
    // it and a new serve builds fresh
    val key2 = s"$root/fam/keyB"
    fs.mkdirs(new Path(s"$key2/gen-0000000000001-crashed/part"))
    assert(Layout.resolveGeneration(spark, key2).isEmpty)
    val g2 = Layout.generation(spark, key2) { g =>
      Seq((3L, "c")).toDF("doc_id", "text").write.parquet(g)
    }
    assert(fs.exists(new Path(g2, "_SUCCESS")) && !g2.contains("crashed"))

    // multi-table generation: readyTable gates completeness
    val key3 = s"$root/fam/keyC"
    val g3 = Layout.generation(spark, key3, "tops") { g =>
      Seq((1L, 1.0)).toDF("id", "v").write.parquet(s"$g/cells")
      Seq((1L, 2.0)).toDF("id", "v").write.parquet(s"$g/tops")
    }
    assert(Layout.resolveGeneration(spark, key3, "tops").contains(g3))
    // a build that does not complete its readyTable fails LOUDLY
    val key4 = s"$root/fam/keyD"
    val e = intercept[IllegalArgumentException] {
      Layout.generation(spark, key4, "tops") { g =>
        Seq((1L, 1.0)).toDF("id", "v").write.parquet(s"$g/cells") // no tops
      }
    }
    assert(e.getMessage.contains("tops"))
  }

  test("gcStores: generational stores — losers and uncommitted gens reclaimed, live gen kept, empty husk removed") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("gcgen").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      def mkGen(key: String, gen: String, ageMs: Long, complete: Boolean): Path = {
        val gd = new Path(s"$root/pq_index/$key/$gen")
        fs.mkdirs(gd)
        val f = new Path(gd, if (complete) "_SUCCESS" else "part-0")
        fs.create(f, true).close()
        fs.setTimes(f, now - ageMs, -1)
        fs.setTimes(gd, now - ageMs, -1)
        gd
      }
      val key = "corpX_1800000000000haaaaaaaa_pk8"
      val loser = mkGen(key, "gen-0000000000001-loser", 10 * 86400000L, complete = true)
      val husk = mkGen(key, "gen-0000000000002-husk", 10 * 86400000L, complete = false)
      val live = mkGen(key, "gen-0000000000003-live", 9 * 86400000L, complete = true)
      // an INCOMPLETE generation NEWER than the live one must not steal
      // the keep-newest slot (a crashed build's fresh husk)
      val fresh = mkGen(key, "gen-0000000000004-fresh", 1000L, complete = false)
      val rep = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 1)
      def action(g: String) = rep.find(_.key == s"$key/$g").map(_.action)
      assert(fs.exists(live) && action("gen-0000000000003-live").contains("kept-newest"),
        s"newest COMPLETE gen keeps its slot: $rep")
      assert(!fs.exists(loser) && action("gen-0000000000001-loser").contains("deleted"))
      assert(!fs.exists(husk) && action("gen-0000000000002-husk").contains("deleted"))
      assert(fs.exists(fresh) && action("gen-0000000000004-fresh").contains("kept-young"),
        "a fresh incomplete gen is kept by age only, never as kept-newest")
      // all gens leave → the key-dir husk goes too
      val rep2 = Layout.gcStores(spark, maxAgeMs = 0L, keepNewest = 0,
        hardMaxAgeMs = 0L)
      assert(!fs.exists(new Path(s"$root/pq_index/$key")),
        s"an emptied generational key-dir must be removed: $rep2")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("generation protocol under ADVISORY lease (racy: FS, S3 create semantics): both writers build, both commit safely, one wins, nothing torn") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.racy.impl", classOf[RacyLocalFs].getName)
    val local = java.nio.file.Files.createTempDirectory("racy").toString
    // two spellings of the SAME physical key-dir: distinct strings miss
    // each other's in-JVM lock (two "processes"), while Hadoop Path
    // collapses the `//` so every FS operation hits one directory —
    // and the racy FS lets BOTH win the marker create
    val keyA = s"racy:$local/fam/key"
    val keyB = s"racy:$local/fam//key"
    val inBuild = new java.util.concurrent.CountDownLatch(2)
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(keyDir: String, id: Long): String =
      Layout.generation(spark, keyDir) { g =>
        built.incrementAndGet()
        inBuild.countDown()
        // hold until BOTH builders are inside build — proof the lease
        // really degraded to advisory (an atomic create would serialize
        // them and this await would time out)
        assert(inBuild.await(30, java.util.concurrent.TimeUnit.SECONDS),
          "expected BOTH writers inside build under the racy FS")
        Seq((id, s"writer$id")).toDF("doc_id", "text").write.parquet(g)
      }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val (fa, fb) = try {
      val a = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = serve(keyA, 1L) })
      val b = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = serve(keyB, 2L) })
      (a.get(120, java.util.concurrent.TimeUnit.SECONDS),
       b.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(built.get() == 2, "the advisory race must have admitted both builders")
    // each caller got a COMPLETE generation — its own or the winner's,
    // either is the same artifact by construction; neither is torn
    val fs = new Path(keyA).getFileSystem(hconf)
    for (g <- Set(fa, fb)) {
      assert(fs.exists(new Path(g, "_SUCCESS")), s"returned gen incomplete: $g")
      assert(spark.read.parquet(g).count() == 1, s"torn store at $g")
    }
    // post-race resolution is deterministic and serves a complete store
    val r1 = Layout.resolveGeneration(spark, keyA)
    val r2 = Layout.resolveGeneration(spark, keyB)
    assert(r1.isDefined && r1.map(new Path(_).toString) == r2.map(new Path(_).toString),
      s"both spellings must resolve one winner: $r1 vs $r2")
    assert(spark.read.parquet(r1.get).count() == 1)
    // lease markers fully released despite the double-win
    assert(!fs.exists(new Path(keyA + "__building")))
  }

  test("gcStores under a LIVE generation build: the building key is untouched, the finished gen resolves") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("gclive").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val key = s"$root/rrf_lists/corpL_1800000000000haaaaaaaa_f20"
      // an old INCOMPLETE generation (a crashed build's husk — no
      // _SUCCESS, so resolve ignores it and the serve below builds
      // fresh); aged far past any horizon, it would be reclaimed by the
      // hard GC below... if not for the live lease on its key
      val oldGen = new Path(s"$key/gen-0000000000001-old")
      fs.mkdirs(oldGen)
      fs.create(new Path(oldGen, "part-0"), true).close()
      val now = System.currentTimeMillis()
      fs.setTimes(new Path(oldGen, "part-0"), now - 10 * 86400000L, -1)
      fs.setTimes(oldGen, now - 10 * 86400000L, -1)
      // a refresh in flight: generation() holds the key lease while its
      // build sleeps; GC runs mid-build
      val started = new java.util.concurrent.CountDownLatch(1)
      val finish = new java.util.concurrent.CountDownLatch(1)
      val builder = new Thread(() => {
        Layout.generation(spark, key) { g =>
          started.countDown()
          finish.await(30, java.util.concurrent.TimeUnit.SECONDS)
          Seq((1L, "a")).toDF("doc_id", "text").write.parquet(g)
        }
        ()
      })
      builder.start()
      started.await(30, java.util.concurrent.TimeUnit.SECONDS)
      // hard GC mid-build: hardMaxAgeMs=0 would reclaim everything aged,
      // but the key's live lease must shield ALL its generations —
      // including the in-progress one and the aged complete one
      val rep = Layout.gcStores(spark, maxAgeMs = 0L, keepNewest = 0, hardMaxAgeMs = 0L)
      val mine = rep.filter(_.group.contains("corpL"))
      assert(mine.nonEmpty && mine.forall(_.action == "kept-building"),
        s"a live refresh must shield its key from GC: $rep")
      assert(fs.exists(oldGen), "the aged husk generation survived the mid-build GC")
      finish.countDown()
      builder.join(60000)
      val resolved = Layout.resolveGeneration(spark, key)
      assert(resolved.isDefined && !resolved.get.contains("gen-0000000000001-old"),
        s"the finished build must commit and resolve: $resolved")
      // with the lease released, the stale husk is now reclaimable
      val rep2 = Layout.gcStores(spark, maxAgeMs = 0L, keepNewest = 1)
      assert(!fs.exists(oldGen),
        s"post-build GC must reclaim the stale husk generation: $rep2")
      assert(Layout.resolveGeneration(spark, key) == resolved,
        "the live generation still resolves after GC")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("gcStores grouping: an epoch-stamped corpus-dir name is NOT blanked into a shared group (r17 advice)") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("gcroot3").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      def mk(key: String, ageMs: Long): Path = {
        val kd = new Path(s"$root/clusters_cache/$key")
        fs.mkdirs(kd)
        val succ = new Path(kd, "_SUCCESS")
        fs.create(succ, true).close()
        fs.setTimes(succ, now - ageMs, -1)
        fs.setTimes(kd, now - ageMs, -1)
        kd
      }
      // two DISTINCT corpora whose sanitized dir names carry a 10-digit
      // epoch-seconds stamp + short hex (a dated dump dir, the common
      // real shape); only the trailing 13-digit stateTag is a real tag.
      // The unanchored pattern blanked the dir stamp too, merging both
      // into one group — keepNewest=1 then deleted the older corpus's
      // ONLY generation as a "superseded sibling" (data loss)
      val olderCorpus = mk("dump_1700000000habc_1800000000000haaaaaaaa_df100", 10 * 86400000L)
      val newerCorpus = mk("dump_1700000099hdef_1800000000999hbbbbbbbb_df100", 1000L)
      val rep = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 1)
      def action(k: String) = rep.find(_.key == k).map(_.action)
      assert(fs.exists(olderCorpus) &&
        action("dump_1700000000habc_1800000000000haaaaaaaa_df100").contains("kept-newest"),
        s"each corpus is its own group — the older corpus's only generation must be its group's newest: $rep")
      assert(fs.exists(newerCorpus))
      // and the groups really are distinct in the report
      val groups = rep.map(_.group).toSet
      assert(groups.size == 2, s"expected 2 distinct GC groups, got $groups")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("gcStores: keepNewest quota is charged PER KEY — duplicate generations of one key cannot evict an older key's only generation (advice r18)") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("gcquota").toString
    spark.conf.set("spark.graft.cache.root", root)
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      def mkGen(key: String, gen: String, ageMs: Long): Path = {
        val gd = new Path(s"$root/pq_index/$key/$gen")
        fs.mkdirs(gd)
        val f = new Path(gd, "_SUCCESS")
        fs.create(f, true).close()
        fs.setTimes(f, now - ageMs, -1)
        fs.setTimes(gd, now - ageMs, -1)
        gd
      }
      // same corpus GROUP, two corpus states (keys differ in stateTag):
      // the newer key carries TWO complete generations (a lost advisory-
      // lease race built twice); the older key has its only generation
      val kNew = "corpQ_1800000000999hbbbbbbbb_pk8"
      val kOld = "corpQ_1800000000000haaaaaaaa_pk8"
      val dupA = mkGen(kNew, "gen-0000000000002-dupa", 2 * 86400000L)
      val dupB = mkGen(kNew, "gen-0000000000001-dupb", 3 * 86400000L)
      val only = mkGen(kOld, "gen-0000000000001-only", 10 * 86400000L)
      val rep = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 2)
      def action(k: String, g: String) = rep.find(_.key == s"$k/$g").map(_.action)
      assert(fs.exists(dupA) && action(kNew, "gen-0000000000002-dupa").contains("kept-newest"))
      assert(fs.exists(only) && action(kOld, "gen-0000000000001-only").contains("kept-newest"),
        s"the older key's only generation must hold the second quota slot: $rep")
      assert(!fs.exists(dupB) && action(kNew, "gen-0000000000001-dupb").contains("deleted"),
        "the duplicate generation of the newer key must NOT consume a second slot")
    } finally spark.conf.unset("spark.graft.cache.root")
  }

  test("gcStores: stale __building markers are swept; fresh markers and scratch dirs honor age rules (r18 judge + advice)") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("gcmark").toString
    spark.conf.set("spark.graft.cache.root", root)
    spark.conf.set("spark.graft.cache.leaseMs", "600000")
    try {
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      fs.mkdirs(new Path(s"$root/bm25_index"))
      val stale = new Path(s"$root/bm25_index/keyZ__building")
      fs.create(stale, true).close()
      fs.setTimes(stale, now - 3600000L, -1) // > lease: a crashed builder
      val freshM = new Path(s"$root/bm25_index/keyY__building")
      fs.create(freshM, true).close() // fresh: a live builder
      // refcore scratch: an old fixture dir ages out, a fresh one stays
      val oldScratch = new Path(s"$root/refcore_scratch/cisi_old")
      fs.mkdirs(oldScratch)
      fs.create(new Path(oldScratch, "corpus.all"), true).close()
      fs.setTimes(oldScratch, now - 10 * 86400000L, -1)
      val newScratch = new Path(s"$root/refcore_scratch/cisi_new")
      fs.mkdirs(newScratch)
      val rep = Layout.gcStores(spark, maxAgeMs = 86400000L, keepNewest = 1)
      assert(!fs.exists(stale) &&
        rep.exists(e => e.key == "keyZ__building" && e.action == "deleted"),
        s"a marker older than the lease must be deleted: $rep")
      assert(fs.exists(freshM), "a fresh (live-builder) marker must survive")
      assert(!fs.exists(oldScratch) &&
        rep.exists(e => e.family == "refcore_scratch" && e.action == "deleted"),
        s"aged refcore scratch must be reclaimed: $rep")
      assert(fs.exists(newScratch), "young scratch survives the age rule")
    } finally {
      spark.conf.unset("spark.graft.cache.root")
      spark.conf.unset("spark.graft.cache.leaseMs")
    }
  }

  test("resolveGeneration TTL memo: own-JVM commit invalidates immediately; a foreign commit lands after the TTL window") {
    import graft.operators.Layout
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("genmemo").toString
    val key = s"$root/fam/keyM"
    val fs = new Path(key).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.conf.set("spark.graft.layout.genResolveTtlMs", "600000")
    try {
      // build gen 1 through the protocol (memo is invalidated on commit,
      // then primed by the resolve below)
      val g1 = Layout.generation(spark, key) { g =>
        Seq((1L, "a")).toDF("doc_id", "text").write.parquet(g)
      }
      assert(Layout.resolveGeneration(spark, key).contains(g1))
      // a FOREIGN process commits gen 2 (hand-written: new gen dir +
      // pointer rewrite, not through this JVM's generation())
      val g2tok = "gen-9999999999999-foreign"
      Seq((2L, "b")).toDF("doc_id", "text").write.parquet(s"$key/$g2tok")
      val os = fs.create(new Path(s"$key/_CURRENT"), true)
      os.write(g2tok.getBytes("UTF-8")); os.close()
      assert(Layout.resolveGeneration(spark, key).contains(g1),
        "inside the TTL the memo serves the previously-resolved generation")
      // an own-JVM build-or-resolve: generation() sees the memoized g1...
      // but an explicit invalidation (the GC/commit hook) re-reads NOW
      Layout.invalidateResolve(key)
      assert(Layout.resolveGeneration(spark, key).contains(s"$key/$g2tok"),
        "after invalidation the resolve must pick up the foreign commit")
      // and a ZERO TTL (default) always re-reads
      spark.conf.unset("spark.graft.layout.genResolveTtlMs")
      assert(Layout.resolveGeneration(spark, key).contains(s"$key/$g2tok"))
    } finally spark.conf.unset("spark.graft.layout.genResolveTtlMs")
  }

  test("partitioned corpus layout: directory pruning + content round-trip") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("corpus").toString
    Extractor.writeCorpusPartitioned(docs, out, "lang", "doc_id", filesPerPartition = 2)

    // hive-style lang=... directories exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")))

    // read back: full content round-trip
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "text", "lang").as[(Long, String, String)].collect().sorted.toSeq
    val b = back.select("doc_id", "text", "lang").as[(Long, String, String)].collect().sorted.toSeq
    assert(a == b)

    // partition pruning: a lang filter reads only that directory
    val plan = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(!plan.contains("lang=zh") || plan.contains("PartitionFilters"))
  }
}
