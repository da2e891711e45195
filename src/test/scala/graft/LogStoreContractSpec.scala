package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path

import graft.sources.{CommitLog, HadoopLogStore, InMemoryCasLogStore, LogStore}

/** The runnable [[graft.sources.LogStore]] CONTRACT (the conformance
  * suite a third-party store implementation is expected to pass):
  *
  *  1. exactly ONE concurrent putIfAbsent caller per destination wins;
  *  2. every loser, at the moment its call returns false, can read the
  *     winner's exact bytes at the destination;
  *  3. a lost call never clobbers the winner and leaves no listable
  *     temp garbage;
  *  4. a put on an occupied path returns false without modifying it.
  *
  * Run against BOTH shipped implementations — the Hadoop-primitive
  * default (file: hard-link CAS) and the external-CAS-table reference
  * ([[InMemoryCasLogStore]]) — so the assertions pin the CONTRACT, not
  * one implementation's mechanism. Plug a new store into
  * [[conformance]] to certify it. */
class LogStoreContractSpec extends SparkSpecBase {

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpDir(prefix: String): Path = {
    val d = new Path(
      s"target/tmp/logstore-$prefix-${java.util.UUID.randomUUID()}")
    fsFor(d).mkdirs(d)
    d
  }

  private def readAll(p: Path): String = {
    val fs = fsFor(p)
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
  }

  /** The contract, parameterized by store factory (fresh per test). */
  def conformance(name: String, mkStore: () => LogStore): Unit = {

    test(s"$name: exactly one winner per path; losers observe the winner's bytes") {
      val store = mkStore()
      val dir = tmpDir("race")
      val writers = 8
      val rounds = 20
      val pool = Executors.newFixedThreadPool(writers)
      try {
        for (r <- 0 until rounds) {
          val dst = new Path(dir, f"$r%020d.json")
          val start = new CountDownLatch(1)
          // each caller records (won, bytes-at-dst-right-after-return):
          // contract point 2 is about what a LOSER can read the moment
          // its call comes back, not about eventual state
          val results = (0 until writers).map { w =>
            pool.submit(new java.util.concurrent.Callable[(Int, Boolean, String)] {
              def call(): (Int, Boolean, String) = {
                start.await()
                val fs = fsFor(dst)
                val won = store.putIfAbsent(fs, dst, s"""{"writer":$w}""")
                (w, won, readAll(dst))
              }
            })
          }
          start.countDown()
          val got = results.map(_.get(60, TimeUnit.SECONDS))
          val winners = got.filter(_._2)
          assert(winners.size === 1,
            s"round $r: expected exactly 1 winner, got ${winners.map(_._1)}")
          val winning = s"""{"writer":${winners.head._1}}"""
          got.foreach { case (w, _, seen) =>
            assert(seen === winning,
              s"round $r: caller $w observed '$seen', not the winner's bytes")
          }
          assert(readAll(dst) === winning, s"round $r: final bytes differ")
        }
      } finally pool.shutdown()
    }

    test(s"$name: a put on an occupied path returns false and never clobbers") {
      val store = mkStore()
      val dst = new Path(tmpDir("occupied"), "00000000000000000000.json")
      val fs = fsFor(dst)
      assert(store.putIfAbsent(fs, dst, """{"v":"first"}"""))
      assert(!store.putIfAbsent(fs, dst, """{"v":"second"}"""))
      assert(readAll(dst) === """{"v":"first"}""")
    }

    test(s"$name: no listable temp garbage survives a contended round") {
      val store = mkStore()
      val dir = tmpDir("clean")
      val dst = new Path(dir, "00000000000000000000.json")
      val pool = Executors.newFixedThreadPool(4)
      try {
        val start = new CountDownLatch(1)
        val fs = fsFor(dst)
        val fut = (0 until 4).map { w =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              start.await()
              store.putIfAbsent(fs, dst, s"""{"w":$w}""")
            }
          })
        }
        start.countDown()
        assert(fut.count(_.get(60, TimeUnit.SECONDS)) === 1)
        val leftovers = fs.listStatus(dir).map(_.getPath.getName)
          .filterNot(_ == dst.getName)
        assert(leftovers.isEmpty,
          s"temp files must be cleaned up, found: ${leftovers.mkString(", ")}")
      } finally pool.shutdown()
    }
  }

  conformance("HadoopLogStore (file:)", () => HadoopLogStore)
  conformance("InMemoryCasLogStore", () => {
    InMemoryCasLogStore.reset()
    new InMemoryCasLogStore
  })

  test("CommitLog multi-writer guarantee holds through a plugged-in CAS store") {
    // the end-to-end wiring: spark.graft.logStore.class resolves the
    // reference store by name (the third-party plug-in path), and the
    // 8-writer contiguous-versions guarantee holds on top of it
    InMemoryCasLogStore.reset()
    spark.conf.set(LogStore.ConfKey, classOf[InMemoryCasLogStore].getName)
    try {
      val t = s"target/tmp/logstore-clog-${java.util.UUID.randomUUID()}"
      val pool = Executors.newFixedThreadPool(8)
      val start = new CountDownLatch(1)
      import spark.implicits._
      val futures = (0 until 8).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            start.await()
            CommitLog(spark, t).append(
              Seq((w.toLong, s"writer-$w")).toDF("id", "v"))
          }
        })
      }
      start.countDown()
      val versions = futures.map(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(versions.sorted === (0L until 8L))
      assert(CommitLog(spark, t).read().as[(Long, String)].collect().toSet
        === (0 until 8).map(w => (w.toLong, s"writer-$w")).toSet)
    } finally spark.conf.unset(LogStore.ConfKey)
  }
}
