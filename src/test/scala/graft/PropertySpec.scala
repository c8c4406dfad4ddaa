package graft

import graft.olist.{Dimensions, Schemas}
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Property tests (SURVEY §5): surrogate-key density/uniqueness over
  * arbitrary dimension inputs, and idempotence of the incremental
  * anti-join append over arbitrary delta windows. Raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't in the
  * offline dependency set).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val nameGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(org.scalacheck.Gen.Parameters.default, Seed(seed))

  test("surrogate keys: dense from 1000, unique, one per distinct natural key") {
    (1 to 10).foreach { i =>
      val names = sample(Gen.listOfN(30, nameGen), 42L + i)
      val cat = spark.createDataFrame(
        names.map(n => Row(n, n)).asJava, Schemas.category)
      val dim = Dimensions.product(cat).collect()
      val keys = dim.map(_.getAs[Long]("product_key")).sorted.toSeq
      assert(dim.length == names.distinct.size, s"iteration $i")
      assert(keys == (1000L until (1000L + keys.size)).toSeq, s"iteration $i")
    }
  }

  test("as-of join equals the naive per-row maximum over random keyed timelines") {
    import spark.implicits._
    (1 to 8).foreach { i =>
      val lrows = sample(Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 500L))), 100L + i)
        .zipWithIndex.map { case ((k, t), ix) => (k, t, ix.toLong) }
      val rrowsRaw = sample(Gen.listOfN(40,
        Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 500L))), 200L + i)
      // right must be unique per (key, ts) — the documented contract
      val rrows = rrowsRaw.distinct
        .zipWithIndex.map { case ((k, t), ix) => (k, t, 1000L + ix) }
      val got = operators.Temporal.asofJoin(
        lrows.toDF("k", "t", "lid"), rrows.toDF("k", "t", "rv"), "k", "t")
        .collect().map(r => r.getAs[Long]("lid") ->
          Option(r.getAs[java.lang.Long]("rv")).map(_.toLong)).toMap
      lrows.foreach { case (k, t, lid) =>
        val expect = rrows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(lid) == expect, s"iteration $i left=($k,$t,$lid)")
      }
    }
  }

  test("bounded range join equals the naive filter over random keyed timelines") {
    import spark.implicits._
    val W = 50L
    (1 to 8).foreach { i =>
      val lrows = sample(Gen.listOfN(50,
        Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 400L))), 300L + i)
        .zipWithIndex.map { case ((k, t), ix) => (k, t, ix.toLong) }
      val rrows = sample(Gen.listOfN(50,
        Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 400L))), 400L + i)
      val got = operators.Temporal.boundedRangeJoin(
        lrows.toDF("k", "t", "lid"), rrows.toDF("k", "t"), "k", "t", "t", W)
        .select("lid", "r_ts").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val expect = (for {
        (k, t, lid) <- lrows
        (rk, rt) <- rrows
        if rk == k && rt > t && rt <= t + W
      } yield (lid, rt)).sorted
      assert(got == expect, s"iteration $i")
    }
  }

  test("anti-join append: applying the same delta twice adds nothing") {
    import spark.implicits._
    (1 to 10).foreach { i =>
      val cut = sample(Gen.chooseNum(1, 100), 7L * i)
      val base = (1 to 100).map(j => (j % cut, j)).toDF("date_key", "v")
      val existing = base.select("date_key").distinct()
      val delta = (1 to 50).map(j => (j % (cut + 3), j)).toDF("date_key", "v")
      val fresh = delta.join(existing, Seq("date_key"), "left_anti")
      val existing2 = existing.union(fresh.select("date_key")).distinct()
      val secondRun = delta.join(existing2, Seq("date_key"), "left_anti")
      assert(secondRun.count() == 0, s"iteration $i (cut=$cut)")
    }
  }

  test("connected components: 120-deep chain converges within 12 rounds (pointer halving)") {
    import spark.implicits._
    // plain min-label propagation needs ~120 rounds here; the halving
    // path must resolve it in O(log 120) — the cap proves it
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comps = operators.Dedup.connectedComponents(chain, maxIterations = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 121)
    assert(comps.values.forall(_ == 0L), "every chain node labels to the min id")
  }

  test("connected components: random edge sets match a naive union-find") {
    import spark.implicits._
    (1 to 6).foreach { i =>
      val edges = sample(Gen.listOfN(80,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0L, 60L))), 300L + i)
        .filter { case (a, b) => a != b }
      // naive union-find ground truth
      val parent = scala.collection.mutable.Map((0L to 60L).map(x => x -> x): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      val expect = nodes.map(x => x -> find(x)).toMap
      val got = operators.Dedup.connectedComponents(edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"iteration $i")
    }
  }

  test("connected components: iteration cap raises instead of looping forever") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      operators.Dedup.connectedComponents(chain, maxIterations = 1)
    }
  }

  test("connected components: reliable checkpoints used when the session has a checkpoint dir") {
    import spark.implicits._
    // on a cluster this is HDFS/object storage — per-round state then
    // survives executor loss, which localCheckpoint (executor-pinned
    // blocks) does not. Set last in this suite: once set, the dir
    // stays for the session (subsequent callers just also get the
    // durable path).
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comps = operators.Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.forall(_ == 0L))
    val written = new java.io.File(dir).listFiles()
    assert(written != null && written.nonEmpty,
      "no reliable checkpoint state was written under the checkpoint dir")
  }

  test("fused MinHashSigs equals the md5 aggregate form on arbitrary token arrays") {
    import org.apache.spark.sql.functions._
    // the parity contract: element i of minhash_sigs(toks, k) ==
    // min(md5('i:'||tok)) over non-null toks — raw-digest unsigned
    // comparison picks the same minimum as lexicographic hex compare
    val k = 16
    val tokGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(""), Gen.const("düp £x")))
    val docs = (1 to 40).map(i => (i.toLong, sample(tokGen, 7000 + i).toArray))
    val df = spark.createDataFrame(docs).toDF("id", "toks")
      .filter(size(col("toks")) >= 1)
    val fused = df.select(col("id"),
      graft.functions.VectorFunctions.minhashSigs(spark, col("toks"), k).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val aggRows = df.select(col("id"), explode(col("toks")).as("tk"))
      .groupBy("id")
      .agg(min(md5(concat(lit("0:"), col("tk")))).as("s0"),
        (1 until k).map(i =>
          min(md5(concat(lit(s"$i:"), col("tk")))).as(s"s$i")): _*)
      .collect().map(r => r.getLong(0) -> (0 until k).map(i => r.getString(i + 1))).toMap
    assert(fused.keySet == aggRows.keySet)
    fused.foreach { case (id, sigs) =>
      assert(sigs == aggRows(id), s"doc $id fused/aggregate signature mismatch")
    }
  }

  test("bloom sketch: no false negatives across partial-merge shapes; bounded false positives") {
    import graft.functions.BloomSketch
    val hashGen = Gen.listOfN(2000, Gen.long)
    (1 to 5).foreach { i =>
      val hashes = sample(hashGen, 77L + i).distinct
      val bits = 1 << 16
      val k = BloomSketch.optimalK(bits, hashes.size)
      val agg = new BloomSketch.Agg(bits, k)
      // split into 4 "partitions", reduce each, merge pairwise — the
      // exact partial-aggregation shape Spark runs
      val parts = hashes.grouped(math.max(1, hashes.size / 4)).toSeq
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
      val sketch = agg.finish(parts.reduce(agg.merge))
      // no false negatives, ever
      hashes.foreach(h => assert(BloomSketch.mightContain(sketch, h),
        s"iteration $i: inserted hash $h reported absent"))
      // false-positive rate ≈ (1 - e^(-kn/m))^k ≈ 0.03% here; 2000
      // probes → a couple of hits at most, never a broken filter
      val absent = sample(hashGen, 990L + i).filterNot(hashes.contains)
      val fp = absent.count(h => BloomSketch.mightContain(sketch, h))
      assert(fp <= 20, s"iteration $i: implausible false-positive count $fp")
    }
    // garbage bytes keep the file (fail-safe direction), never throw
    assert(graft.functions.BloomSketch.mightContain(Array[Byte](9, 9, 9), 42L))
  }

  test("random CRUD sequences: table state and maintained MV always equal recompute") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    (1 to 4).foreach { run =>
      val dir = java.nio.file.Files.createTempDirectory(s"wh_prop$run").toString
      val wh = new graft.olist.Warehouse(spark, dir)
      // run 3 also fuzzes auto-compaction: inline compact commits ride
      // random appends and must never change visible rows or the MV
      if (run == 3) spark.conf.set("graft.autocompact.minFiles", "6")
      // run 4 forces nearly every delete/update through the
      // deletion-vector path (files stay, positions subtract)
      if (run == 4) spark.conf.set("graft.dv.maxFraction", "0.95")
      try {
      // model: a mutable reference map the warehouse must always match
      var model = Map.empty[Long, (Long, Long)] // id -> (g, v)
      var nextId = 0L
      def rows(n: Int): Seq[(Long, Long, Long, Int)] =
        (1 to n).map { _ =>
          nextId += 1
          (nextId, rnd.nextInt(6).toLong, rnd.nextInt(100).toLong, 2020)
        }
      val init = rows(40)
      model ++= init.map(r => r._1 -> (r._2, r._3))
      wh.save("b", init.toDF("id", "g", "v", "year").coalesce(2),
        partitionBy = Seq("year"))
      wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
      (1 to 12).foreach { step =>
        rnd.nextInt(6) match {
          case 0 => // append a small batch
            val b = rows(rnd.nextInt(5) + 1)
            model ++= b.map(r => r._1 -> (r._2, r._3))
            wh.append("b", b.toDF("id", "g", "v", "year").coalesce(1))
          case 1 => // delete a random group
            val g = rnd.nextInt(6).toLong
            model = model.filterNot(_._2._1 == g)
            wh.delete("b", col("g") === g)
          case 2 => // shift a random group's values
            val g = rnd.nextInt(6).toLong
            model = model.map { case (id, (mg, mv)) =>
              id -> (mg, if (mg == g) mv + 7 else mv) }
            wh.update("b", col("g") === g, Map("v" -> (col("v") + 7L)))
          case 3 => // merge: upsert one existing + one new id
            val existing = if (model.nonEmpty)
              Seq(model.keys.toSeq(rnd.nextInt(model.size))) else Nil
            val fresh = rows(1)
            val delta = existing.map(id => (id, rnd.nextInt(6).toLong,
              rnd.nextInt(100).toLong, 2020)) ++ fresh
            model ++= delta.map(r => r._1 -> (r._2, r._3))
            def doMerge(): Unit = wh.merge("b",
              delta.toDF("id", "g", "v", "year"), keys = Seq("id"))
            // merge keys partition membership off file paths, so on a
            // mixed write-time layout it refuses — the documented
            // remediation is compact-then-retry
            try doMerge() catch {
              case e: IllegalArgumentException
                  if e.getMessage.contains("different partition layout") =>
                wh.compact("b"); doMerge()
            }
          case 4 => // partition evolution: metadata-only layout change —
            // the MODEL does not change; visible rows must not either
            // (merge requires SOME partitioning, so evolve year <-> g)
            val layouts = Seq(Seq("year"), Seq("g"))
            wh.repartitionTable("b", layouts(rnd.nextInt(layouts.size)))
          case 5 => // point delete of one id: the deletion-vector shape
            // (a fraction-of-one-file match) — or a no-op on a dead id
            if (model.nonEmpty) {
              val id = model.keys.toSeq(rnd.nextInt(model.size))
              model -= id
              wh.delete("b", col("id") === id)
            }
        }
        wh.refreshAggregate("b", "mv", Seq("g"), Seq("v"))
        // table ≡ model
        val got = wh.table("b").select("id", "g", "v")
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        assert(got == model, s"run $run step $step: table drifted")
        // MV ≡ recompute from the model
        val expect = model.values.groupBy(_._1).map { case (g, vs) =>
          (g, vs.size.toLong, vs.map(_._2).sum) }.toSet
        val mv = wh.table("mv").as[(Long, Long, Long)].collect().toSet
        assert(mv == expect, s"run $run step $step: MV drifted")
      }
      } finally {
        spark.conf.unset("graft.autocompact.minFiles")
        spark.conf.unset("graft.dv.maxFraction")
      }
    }
  }

  test("two instances: disjoint-partition appends race, both land intact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_race_app").toString
    val wh1 = new graft.olist.Warehouse(spark, dir)
    val wh2 = new graft.olist.Warehouse(spark, dir)
    wh1.save("t", Seq((0L, 2019)).toDF("k", "year").repartition(col("year")),
      partitionBy = Seq("year"))
    val a = new Thread(() => wh1.append("t",
      (1L to 500L).map((_, 2020)).toDF("k", "year")))
    val b = new Thread(() => wh2.append("t",
      (1001L to 1500L).map((_, 2021)).toDF("k", "year")))
    a.start(); b.start(); a.join(); b.join()
    // both writers' rows are fully present — neither commit erased the
    // other's — and the log is a linear v1..v3
    val byYear = wh1.table("t").groupBy("year").count()
      .as[(Int, Long)].collect().toMap
    assert(byYear == Map(2019 -> 1L, 2020 -> 500L, 2021 -> 500L), byYear)
    assert(wh1.tableVersions("t") == Seq(1L, 2L, 3L))
  }

  test("two instances: DELETE racing an append yields one of the serial outcomes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh_race_del").toString
    val wh1 = new graft.olist.Warehouse(spark, dir)
    val wh2 = new graft.olist.Warehouse(spark, dir)
    wh1.save("t", (0L until 100L).map(k => (k, k % 2)).toDF("k", "par")
      .coalesce(4))
    // overlapping work: the delete's predicate also matches half the
    // delta the other writer is appending
    val delta = (100L until 140L).map(k => (k, k % 2))
    val a = new Thread(() => wh1.delete("t", col("par") === 0L))
    val b = new Thread(() => wh2.append("t", delta.toDF("k", "par")))
    a.start(); b.start(); a.join(); b.join()
    val got = wh1.table("t").select("k").as[Long].collect().toSet
    // serializable: the final state must equal ONE of the two serial
    // histories — delete THEN append (delta survives whole) or append
    // THEN delete (delta's par=0 rows die too). Anything else (partial
    // delta, resurrected base evens) is a lost update.
    val baseOdds = (0L until 100L).filter(_ % 2 == 1).toSet
    val deltaAll = (100L until 140L).toSet
    val deltaOdds = deltaAll.filter(_ % 2 == 1)
    val deleteThenAppend = baseOdds ++ deltaAll
    val appendThenDelete = baseOdds ++ deltaOdds
    assert(got == deleteThenAppend || got == appendThenDelete,
      s"non-serializable outcome: $got")
    // the history shows both commits, in some order, on a linear log
    val ops = wh1.history("t").map(_.op)
    assert(ops.head == "save" && ops.toSet == Set("save", "delete", "append"))
    assert(wh1.tableVersions("t") == Seq(1L, 2L, 3L))
  }

  private def assignTriples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet

  test("lshDedupAssign: exact dups convict to the group min; window form ≡ the stateful batch rendering; layout-independent") {
    import spark.implicits._
    val txtA = "alpha beta gamma delta epsilon zeta eta theta"
    val txtB = "omicron pi rho sigma tau upsilon phi chi"
    val docs = Seq(
      (1L, txtA), (2L, txtA), (7L, txtA),          // exact-dup group → min 1
      (5L, txtB), (11L, txtB),                     // exact-dup group → min 5
      (9L, "unrelated content entirely disjoint from both groups")
    ).toDF("doc_id", "text")
    val got = assignTriples(operators.Dedup.lshDedupAssign(docs))
    val byId = got.map(t => t._1 -> t).toMap
    // the global min id can never have a prior
    assert(byId(1L) == ((1L, None, 1)))
    // identical texts share EVERY band: conviction is certain, and the
    // prior is exactly the group's min (cross-group collisions could
    // only lower it further — these token sets are disjoint)
    assert(byId(2L)._2.contains(1L) && byId(2L)._3 == 0)
    assert(byId(7L)._2.contains(1L) && byId(7L)._3 == 0)
    assert(byId(11L)._2.contains(5L) && byId(11L)._3 == 0)
    // keep=1 ⟺ dup_of null, everywhere
    assert(got.forall(t => (t._3 == 1) == t._2.isEmpty))
    // the stateful operator batch-rendered (st7's Q lane) agrees with
    // the window form, on the toy set and on the real table
    def streamForm(df: org.apache.spark.sql.DataFrame) =
      assignTriples(streaming.DocStream.nearDupAssignments(
        streaming.DocStream.nearDupBandPriors(df)))
    assert(streamForm(docs) == got)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(streamForm(real) ==
      assignTriples(operators.Dedup.lshDedupAssign(real)))
    // partition layout cannot change the assignment
    assert(assignTriples(operators.Dedup.lshDedupAssign(
      docs.repartition(7))) == got)
  }

  test("fuzzyContamination: token-set near-copy of a bench doc caught (where exact grams fail), disjoint doc clean, bench side broadcast") {
    import spark.implicits._
    val bench = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (100L, "src0", bench),
      // same token SET, permuted order: every verbatim 8-gram breaks
      // (d10 would miss it) but Jaccard = 1.0 and every minhash
      // signature matches — conviction is certain, not probabilistic
      (200L, "src1", "dog lazy the over jumps fox brown quick today"),
      (300L, "src1", "entirely unrelated text about spark engines and parquet files"),
      (400L, "src0", "another benchmark document with its own words")
    ).toDF("doc_id", "source", "text")
    val got = operators.Dedup.fuzzyContamination(docs)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(rows == List((200L, 1.0, 1L)), s"got $rows")
    // the eval side must broadcast — the training corpus is the
    // 100 TB side and may never be the build side
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "bench side not broadcast")
    // every reported doc is a train doc at or above the threshold
    val real = operators.Dedup.fuzzyContamination(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(real.nonEmpty && real.forall(_._2 >= 0.5))
  }
}
