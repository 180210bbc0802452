package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.functions.gf

/** Round-18 optimization probe: per-JOB wall-clock decomposition of a
  * registered query at a given SF dir. A query's wall is the sum of its
  * Spark jobs (pins/counts/collects each start one), so the job ledger
  * says WHICH internal stage to optimize — the guide's "empirical"
  * loop (spark_optimization_guide.md §1.1) without the UI.
  *
  * Usage: runMain graft.OptProbe <sfDir> <qkey> [<qkey> ...]
  * Each query runs twice; the second (warm) run's ledger prints. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          done.add((je.jobId, desc, (je.time - t0) / 1e3))
        }
      }
    })

    val registry = SparkEntry.queries
    // warmup (session init, codegen cache)
    try registry.head._2(spark, dir).count() catch { case _: Throwable => }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def stage(name: String)(f: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      f
      println(f"  [stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
    }

    // loadP overhead probe: wall of the df.rdd planning pass per call.
    if (keys.headOption.contains("loadp")) {
      (1 to 3).foreach { r =>
        var t0 = System.nanoTime()
        (1 to 20).foreach(_ => Tables.load(spark, dir, "documents"))
        val tLoad = (System.nanoTime() - t0) / 1e9 / 20
        t0 = System.nanoTime()
        (1 to 20).foreach(_ => Tables.loadP(spark, dir, "documents"))
        val tLoadP = (System.nanoTime() - t0) / 1e9 / 20
        println(f"[loadp] rep$r load=$tLoad%.4f loadP=$tLoadP%.4f (per call)")
      }
      spark.stop(); return
    }

    // Kernel micro: OPQ/PQ train wall over the Bench.opqBench sample
    // shape, 3 reps (JIT-warm by rep 2).
    if (keys.headOption.contains("opq")) {
      val rnd = new scala.util.Random(7L)
      val dimn = 64
      val a = Array.fill(dimn, dimn)((rnd.nextGaussian() / math.sqrt(dimn)).toFloat)
      val w = Array.tabulate(dimn)(i => 1.0f / (1 + i / 4))
      val sample = Array.fill(1024) {
        val g = Array.fill(dimn)(rnd.nextGaussian())
        Array.tabulate(dimn) { i =>
          var sacc = 0.0
          var j = 0
          while (j < dimn) { sacc += a(i)(j) * w(i) * g(j); j += 1 }
          sacc.toFloat
        }
      }
      (1 to 3).foreach { r =>
        var t0 = System.nanoTime()
        graft.index.OpqCodec.train(sample, m = 8)
        val opqS = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        graft.index.PqCodec.train(sample, m = 8)
        val pqS = (System.nanoTime() - t0) / 1e9
        println(f"[opq] rep$r opq_train=$opqS%.3f pq_train=$pqS%.3f")
      }
      spark.stop(); return
    }

    // Deterministic structure census: for every registered query, the
    // physical plan's Exchange count (shuffle vs broadcast), the number
    // of jobs its construction+count runs, and wall — noise-free
    // targeting data (exchanges and jobs are plan facts).
    if (keys.headOption.contains("census")) {
      val only = keys.drop(1).toSet
      val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          jobCounter.incrementAndGet()
      })
      println("query,shuffles,broadcasts,jobs,wall_s")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (only.isEmpty || only.contains(name)) {
          try {
            System.gc()
            jobCounter.set(0)
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            df.count()
            val wall = (System.nanoTime() - t0) / 1e9
            // executedPlan of the FINAL frame (post-AQE initial plan):
            // count exchanges in the whole tree
            val plan = df.queryExecution.executedPlan
            var sh = 0; var bc = 0
            plan.foreachUp {
              case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => sh += 1
              case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => bc += 1
              case _ => ()
            }
            // give listener a beat to drain
            Thread.sleep(50)
            println(f"[census] $name,$sh,$bc,${jobCounter.get()},$wall%.2f")
          } catch { case e: Throwable =>
            println(s"[census] $name,ERR,${e.getClass.getSimpleName}")
          }
        }
      }
      spark.stop(); return
    }

    // Interleaved A/B of the r18 verify-tail rewrite: OLD melt pipeline
    // (inlined) vs the registered query, min of 3 each, one JVM.
    if (keys.headOption.contains("ab:verify")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      def oldVerify(cands: org.apache.spark.sql.DataFrame,
          sh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val sets = sh.groupBy("doc_id").agg(collect_set("s").as("sh"))
        val melted = cands
          .select(col("doc_a"), col("doc_b"),
            explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .join(sets, "doc_id")
          .groupBy("doc_a", "doc_b")
          .agg(first(when(col("doc_id") === col("doc_a"), col("sh")),
              ignoreNulls = true).as("sha"),
            first(when(col("doc_id") === col("doc_b"), col("sh")),
              ignoreNulls = true).as("shb"))
        val i = size(array_intersect(col("sha"), col("shb")))
        val na = size(col("sha"))
        val nb = size(col("shb"))
        melted.select(
            when(na <= nb, col("doc_a")).otherwise(col("doc_b")).as("doc_small"),
            when(na <= nb, col("doc_b")).otherwise(col("doc_a")).as("doc_big"),
            (i.cast("double") / least(na, nb)).as("c"))
          .filter(col("c") >= 0.9)
          .select(col("doc_small"), col("doc_big"),
            round(col("c"), 4).as("containment"))
      }
      def oldQ126(): Long = {
        val sh = DedupQueries.cappedShingles(spark, dir)
        val kCol = expr("n div 10") + lit(1)
        val sketch = sh.withColumn("r", row_number().over(
            Window.partitionBy("doc_id").orderBy(md5(col("s")).asc, col("s").asc)))
          .filter(col("r") <= kCol)
          .select(col("doc_id").as("pd"), col("n").as("np"), col("s"))
        val cands = sketch
          .join(sh.select(col("doc_id").as("od"), col("n").as("no"), col("s")), "s")
          .filter(col("np") < col("no") ||
            (col("np") === col("no") && col("pd") < col("od")))
          .groupBy(least(col("pd"), col("od")).as("doc_a"),
            greatest(col("pd"), col("od")).as("doc_b"))
          .agg(count(lit(1)).as("hits"))
          .filter(col("hits") >= 1)
          .select("doc_a", "doc_b")
        oldVerify(cands, sh).count()
      }
      def oldQ118b(): Long = {
        val sh = DedupQueries.cappedShingles(spark, dir)
        val pref = sh
          .withColumn("r", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)))
          .filter(col("r") <= expr("n div 10") + 1)
          .select(col("doc_id").as("pd"), col("s"))
        val cands = pref
          .join(sh.select(col("doc_id").as("od"), col("s")), "s")
          .filter(col("pd") =!= col("od"))
          .select(least(col("pd"), col("od")).as("doc_a"),
            greatest(col("pd"), col("od")).as("doc_b"))
          .distinct()
        oldVerify(cands, sh).count()
      }
      def time(tag: String)(f: => Long): Double = {
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[ab] $tag%-14s $t%6.3fs rows=$n")
        t
      }
      def oldQ106(): Long = {
        val cands = DedupQueries.q21bMinhashFast(spark, dir)
          .select("doc_a", "doc_b")
        val sets = Tables.loadP(spark, dir, "documents")
          .select(col("doc_id"),
            array_distinct(gf.shingles(col("text"), DedupQueries.N)).as("sh"))
        val melted = cands
          .select(col("doc_a"), col("doc_b"),
            explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .join(sets, "doc_id")
          .groupBy("doc_a", "doc_b")
          .agg(first(when(col("doc_id") === col("doc_a"), col("sh")),
              ignoreNulls = true).as("sha"),
            first(when(col("doc_id") === col("doc_b"), col("sh")),
              ignoreNulls = true).as("shb"))
        val i = size(array_intersect(col("sha"), col("shb")))
        val na = size(col("sha"))
        val nb = size(col("shb"))
        melted.filter(na > 0 && nb > 0)
          .select(col("doc_a"), col("doc_b"),
            (i.cast("double") / (na + nb - i)).as("j"))
          .filter(col("j") >= 0.8)
          .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
          .count()
      }
      val reg = SparkEntry.queries
      (1 to 3).foreach { _ =>
        time("q126 OLD")(oldQ126())
        time("q126 NEW")(reg("q126_containment_sketch")(spark, dir).count())
        time("q118b OLD")(oldQ118b())
        time("q118b NEW")(reg("q118b_containment_prefix")(spark, dir).count())
        time("q106 OLD")(oldQ106())
        time("q106 NEW")(reg("q106_fast_neardup")(spark, dir).count())
      }
      spark.stop(); return
    }

    // r19: POST-EXECUTION final adaptive plan of the pin-free shingle
    // seam — the ReusedExchange evidence an initial-plan dump cannot
    // show (AQE dedupes identical exchange stages at runtime via the
    // stage cache).
    if (keys.headOption.contains("seam:final")) {
      val df = DedupQueries.cappedShinglesOf(
        Tables.loadP(spark, dir, "documents"),
        Tables.byteSize(spark, dir, "documents").map(b => math.max(1L, b / 2)))
      // execute THIS Dataset's own QueryExecution so the printed
      // adaptive plan is the final one (a write/count would spawn a
      // fresh unexecuted QueryExecution)
      df.queryExecution.toRdd.foreach(_ => ())
      println(df.queryExecution.executedPlan.toString)
      spark.stop(); return
    }

    // r19 diagnostic: are the q22 self-join's two shuffle subtrees
    // CANONICALLY equal (the precondition for AQE stage reuse)?
    if (keys.headOption.contains("canon")) {
      import org.apache.spark.sql.functions._
      // non-AQE plan: exchanges are visible and the static ReuseExchange
      // rule applies, so a working reuse shows up as ReusedExchangeExec
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val sh = Tables.loadP(spark, dir, "documents")
        .select(col("doc_id"),
          array_distinct(gf.shingles(col("text"), DedupQueries.N)).as("arr"))
        .select(col("doc_id"), explode(col("arr")).as("s"),
          size(col("arr")).cast("long").as("n"))
        .repartition(32, col("s"))
      val j = sh.as("a").hint("merge").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      val exs = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      val reused = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => e
      }
      println(s"[canon] exchanges=${exs.length} reused=${reused.length}")
      if (exs.length >= 2) {
        println(s"[canon] equal=${exs(0).canonicalized == exs(1).canonicalized}")
        if (exs(0).canonicalized != exs(1).canonicalized) {
          val l = exs(0).canonicalized.toString.linesIterator.toSeq
          val r = exs(1).canonicalized.toString.linesIterator.toSeq
          l.zipAll(r, "<none>", "<none>").filter(p => p._1 != p._2).take(6)
            .foreach { case (a, b) =>
              println(s"[canon] L: ${a.take(200)}")
              println(s"[canon] R: ${b.take(200)}")
            }
        }
      }
      spark.stop(); return
    }

    // r19: POST-EXECUTION final adaptive plan of a registry query —
    // runtime ReusedExchange evidence for any key: final:<qkey>
    keys.headOption.filter(_.startsWith("final:")).foreach { k =>
      val df = SparkEntry.queries(k.stripPrefix("final:"))(spark, dir)
      // same-QueryExecution action (see seam:final)
      df.queryExecution.toRdd.foreach(_ => ())
      println(df.queryExecution.executedPlan.toString)
      spark.stop(); return
    }

    // r19 interleaved A/B of the q22 shingle-pipeline shapes, one JVM:
    //  OLD  = r18 registered (explode -> pin -> planner SMJ self-join)
    //  NEW  = r19 registered (bytes-estimated repartition, merge-hinted
    //         self-join, no pin)
    //  BHJ  = the no-hint hazard shape (planner broadcasts a side)
    if (keys.headOption.contains("ab:jacc")) {
      import org.apache.spark.sql.functions._
      def jacc(sh: org.apache.spark.sql.DataFrame, hint: String): Long = {
        val a0 = sh.as("a")
        val a = if (hint.isEmpty) a0 else a0.hint(hint)
        a.join(sh.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
              col("a.n") * 5 >= col("b.n") * 4 && col("b.n") * 5 >= col("a.n") * 4)
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("i"),
            first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
          .select(col("doc_a"), col("doc_b"),
            (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("j"))
          .filter(col("j") >= 0.8)
          .count()
      }
      def ex0() = Tables.loadP(spark, dir, "documents")
        .select(col("doc_id"),
          array_distinct(gf.shingles(col("text"), DedupQueries.N)).as("arr"))
        .select(col("doc_id"), explode(col("arr")).as("s"),
          size(col("arr")).cast("long").as("n"))
      val parts = spark.sparkContext.defaultParallelism
      def time(tag: String)(f: => Long): Unit = {
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        println(f"[ab] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.3fs rows=$n")
      }
      (1 to 3).foreach { _ =>
        time("jacc OLD-pin")(jacc(graft.operators.Pins.pin(ex0()), ""))
        time("jacc NEW-merge")(jacc(ex0().repartition(parts, col("s")), "merge"))
        time("jacc NEW-shj")(jacc(ex0().repartition(parts, col("s")), "shuffle_hash"))
        time("jacc BHJ-nohint")(jacc(ex0().repartition(parts, col("s")), ""))
      }
      spark.stop(); return
    }

    // Bench-identical per-query timing (min of 3 warm count() runs) for
    // a named subset: minibench q126_containment_sketch q118b_...
    if (keys.headOption.contains("minibench")) {
      keys.drop(1).foreach { key =>
        val fn = SparkEntry.queries(key)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          val t = (System.nanoTime() - t0) / 1e9
          System.gc()
          t
        }
        println(f"[minibench] $key%-28s min=${times.min}%6.3f  " +
          times.map(t => f"$t%.3f").mkString(" "))
      }
      spark.stop(); return
    }

    if (keys.contains("counts")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val sh = DedupQueries.cappedShingles(spark, dir)
      val pref = sh
        .withColumn("r", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)))
        .filter(col("r") <= expr("n div 10") + 1)
        .select(col("doc_id").as("pd"), col("s"))
      val prefCands = pref
        .join(sh.select(col("doc_id").as("od"), col("s")), "s")
        .filter(col("pd") =!= col("od"))
        .select(least(col("pd"), col("od")).as("doc_a"),
          greatest(col("pd"), col("od")).as("doc_b"))
        .distinct()
      println(s"[counts] q118b prefix cands = ${prefCands.count()}")
      println(s"[counts] q21 lsh pairs     = ${DedupQueries.q21MinhashLsh(spark, dir).count()}")
      println(s"[counts] q21b fast pairs   = ${DedupQueries.q21bMinhashFast(spark, dir).count()}")
      println(s"[counts] q133 star pairs   = ${DedupQueries.q133MinhashStar(spark, dir).count()}")
      println(s"[counts] sh rows           = ${sh.count()}")
      spark.stop(); return
    }

    if (keys.contains("stages:containment")) {
      // sub-stage ledger of the containment family's shared pipeline
      (1 to 3).foreach { rep =>
        println(s"--- containment stage ledger rep $rep ---")
        var sh: org.apache.spark.sql.DataFrame = null
        stage("cappedShingles (pin)") { sh = DedupQueries.cappedShingles(spark, dir) }
        // E1: pin-free shingle pipeline — both df-agg and probe side hang
        // off ONE repartition exchange; ReuseExchange runs the kernel once
        stage("cappedShingles E1 nopin") {
          import org.apache.spark.sql.functions._
          import org.apache.spark.sql.expressions.Window
          val ex = Tables.loadP(spark, dir, "documents")
            .select(col("doc_id"),
              explode(array_distinct(gf.shingles(col("text"), DedupQueries.N))).as("s"))
          val parts = spark.sparkContext.defaultParallelism
          val exP = ex.repartition(parts, col("s"))
          val dfAgg = exP.groupBy("s").agg(count(lit(1)).as("df"))
            .filter(col("df") <= 64)
          val res = exP.join(dfAgg.hint("shuffle_hash"), "s")
            .select("doc_id", "s", "df")
            .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
            .select("doc_id", "s", "n", "df")
          graft.operators.Pins.pin(res).count() // untagged: probe-only frame
        }
        stage("q118 pairs+agg (exact)") { noop(DedupQueries.containmentPairsFrom(sh)) }
        var cands: org.apache.spark.sql.DataFrame = null
        stage("q126 sketch cands (pin)") {
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions._
          val kCol = expr("n div 10") + lit(1)
          val sketch = sh.withColumn("r", row_number().over(
              Window.partitionBy("doc_id").orderBy(md5(col("s")).asc, col("s").asc)))
            .filter(col("r") <= kCol)
            .select(col("doc_id").as("pd"), col("n").as("np"), col("s"))
          cands = graft.operators.Pins.pin(sketch
            .join(sh.select(col("doc_id").as("od"), col("n").as("no"), col("s")), "s")
            .filter(col("np") < col("no") ||
              (col("np") === col("no") && col("pd") < col("od")))
            .groupBy(least(col("pd"), col("od")).as("doc_a"),
              greatest(col("pd"), col("od")).as("doc_b"))
            .agg(count(lit(1)).as("hits"))
            .filter(col("hits") >= 1)
            .select("doc_a", "doc_b"))
          println(s"    cands=${cands.count()}")
        }
        stage("q126 verify tail") { noop(DedupQueries.containmentVerify(cands, sh)) }
        // V1: two joins against a candidate-member-filtered sets frame
        // (no pair-regroup of array rows; sets side is exception-sized
        // once semi-filtered, so it can broadcast under a gate)
        stage("verify V1 two-join") {
          import org.apache.spark.sql.functions._
          val members = cands.select(col("doc_a").as("doc_id"))
            .union(cands.select(col("doc_b").as("doc_id"))).distinct()
          val sets = sh.join(members, "doc_id").groupBy("doc_id")
            .agg(collect_set("s").as("sh"))
          val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
          val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
          val i = size(array_intersect(col("sha"), col("shb")))
          val na = size(col("sha"))
          val nb = size(col("shb"))
          noop(cands.join(broadcast(a), "doc_a").join(broadcast(b), "doc_b")
            .select(
              when(na <= nb, col("doc_a")).otherwise(col("doc_b")).as("doc_small"),
              when(na <= nb, col("doc_b")).otherwise(col("doc_a")).as("doc_big"),
              (i.cast("double") / least(na, nb)).as("c"))
            .filter(col("c") >= 0.9)
            .select(col("doc_small"), col("doc_big"),
              round(col("c"), 4).as("containment")))
        }
        // V2: narrow count verify — i per pair from (pair, s) hit rows,
        // no arrays anywhere
        stage("verify V2 narrow-count") {
          import org.apache.spark.sql.functions._
          val an = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
          val small = cands
            .join(sh.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
          val hits = small
            .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
          val na = col("an.n")
          val nb = col("bn.n")
          noop(hits
            .join(broadcast(an).as("an"), col("doc_a") === col("an.doc_id"))
            .join(broadcast(an).as("bn"), col("doc_b") === col("bn.doc_id"))
            .select(
              when(na <= nb, col("doc_a")).otherwise(col("doc_b")).as("doc_small"),
              when(na <= nb, col("doc_b")).otherwise(col("doc_a")).as("doc_big"),
              (col("i").cast("double") / least(na, nb)).as("c"))
            .filter(col("c") >= 0.9)
            .select(col("doc_small"), col("doc_big"),
              round(col("c"), 4).as("containment")))
        }
      }
      spark.stop(); return
    }

    keys.foreach { key =>
      val fn = registry(key)
      // cold-ish first run absorbs per-query JIT; ledger from run 2
      fn(spark, dir).count()
      done.clear()
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"%n=== $key rows=$n wall=$wall%.2fs jobs=${done.size} ===")
      val arr = done.toArray(Array.empty[(Int, String, Double)])
      val byDesc = arr.groupBy(_._2).map { case (d, xs) =>
        (d, xs.map(_._3).sum, xs.length)
      }.toSeq.sortBy(-_._2)
      arr.sortBy(_._1).foreach { case (id, d, s) =>
        println(f"  job#$id%-4d $s%8.3fs  ${d.take(110)}")
      }
      println("  -- grouped --")
      byDesc.foreach { case (d, s, c) =>
        println(f"  $s%8.3fs  x$c%-3d ${d.take(100)}")
      }
    }
    spark.stop()
  }
}
