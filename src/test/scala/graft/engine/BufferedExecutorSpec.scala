package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.TsCatalog

/** Buffered interactive ingest: deferred commits, flush-before-read
  * (exact read-your-writes), statement-time now() resolution. */
class BufferedExecutorSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withExec(flushRows: Int)(
      f: (BufferedExecutor, TsCatalog, () => Long) => Unit): Unit = {
    val root = Files.createTempDirectory("graft-buffered-spec").toString
    try {
      var clock = 1700000000000000000L
      val catalog = new TsCatalog(spark, root)
      val exec = new BufferedExecutor(spark, catalog, () => clock, flushRows)
      assert(exec.executeSql("CREATEDB bdb").isInstanceOf[ExecResult.Ack])
      assert(exec.executeSql("CREATE s").isInstanceOf[ExecResult.Ack])
      f(exec, catalog, () => { clock += 1000; clock })
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("inserts buffer in memory and commit on read (read-your-writes)") {
    withExec(flushRows = 1024) { (exec, catalog, _) =>
      for (i <- 0 until 5)
        assert(exec.executeSql(s"INSERT INTO s VALUES (${1000 + i}, $i.0)") ==
          ExecResult.Ack("1 point(s) buffered, 0 error(s)"))
      assert(exec.buffered == 5)
      assert(catalog.readSeries("bdb", "s").count() == 0) // nothing on disk yet
      // a read flushes first, then sees every buffered point
      exec.executeSql("SELECT value FROM s") match {
        case ExecResult.Rows(df) => assert(df.count() == 5)
        case other => fail(s"expected rows, got $other")
      }
      assert(exec.buffered == 0)
      assert(catalog.readSeries("bdb", "s").count() == 5)
    }
  }

  test("reaching flushRows auto-commits without a read") {
    withExec(flushRows = 3) { (exec, catalog, _) =>
      exec.executeSql("INSERT INTO s VALUES (1, 1.0), (2, 2.0)")
      assert(exec.buffered == 2 && catalog.readSeries("bdb", "s").count() == 0)
      exec.executeSql("INSERT INTO s VALUES (3, 3.0)")
      assert(exec.buffered == 0) // threshold hit → committed
      assert(catalog.readSeries("bdb", "s").count() == 3)
    }
  }

  test("now() resolves at statement time, not flush time") {
    withExec(flushRows = 1024) { (exec, _, tick) =>
      val t1 = tick(); // advances the injected clock
      exec.executeSql("INSERT INTO s VALUE 1.5")
      val t2 = tick()
      exec.executeSql("INSERT INTO s VALUE 2.5")
      exec.executeSql("SELECT value FROM s") match {
        case ExecResult.Rows(df) =>
          val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
          // distinct timestamps prove each VALUE saw its own now()
          assert(rows.map(_._1).distinct.size == 2)
          assert(rows.map(_._2).toSet == Set(1.5, 2.5))
        case other => fail(s"expected rows, got $other")
      }
    }
  }

  test("per-statement error counting and unknown-series rejection") {
    withExec(flushRows = 1024) { (exec, _, _) =>
      assert(exec.executeSql("INSERT INTO nope VALUES (1, 1.0)") ==
        ExecResult.Err(ErrCode.TsNotFound, "timeseries 'nope' not found"))
      // 64-bit overflow literal is rejected at parse; use a date the
      // evaluator rejects to exercise row-level error counting
      exec.executeSql("INSERT INTO s VALUES ('9999-99-99', 1.0), (5, 2.0)") match {
        case ExecResult.Ack(msg) => assert(msg == "1 point(s) buffered, 1 error(s)")
        case other => fail(s"expected ack, got $other")
      }
    }
  }

  test("ignore policy: first statement wins across buffered inserts") {
    withExec(flushRows = 1024) { (exec, catalog, _) =>
      exec.executeSql("CREATE ig 0 'ignore'")
      assert(exec.executeSql("INSERT INTO ig VALUES (5, 1.0)") ==
        ExecResult.Ack("1 point(s) buffered, 0 error(s)"))
      // duplicate timestamp in a LATER statement: shadowed in-buffer,
      // ack reflects 0 accepted (it would be dropped at flush anyway)
      assert(exec.executeSql("INSERT INTO ig VALUES (5, 2.0), (6, 3.0)") ==
        ExecResult.Ack("1 point(s) buffered, 0 error(s)"))
      exec.executeSql("SELECT value FROM ig") match {
        case ExecResult.Rows(df) =>
          val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
          assert(rows == Seq((5L, 1.0), (6L, 3.0))) // first statement won
        case other => fail(s"expected rows, got $other")
      }
      // and against DISK too: a new buffered duplicate of a flushed ts
      exec.executeSql("INSERT INTO ig VALUES (5, 9.9)")
      exec.executeSql("SELECT value FROM ig") match {
        case ExecResult.Rows(df) =>
          assert(df.collect().map(_.getDouble(1)).toSeq == Seq(1.0, 3.0))
        case other => fail(s"expected rows, got $other")
      }
    }
  }

  test("close() commits the remaining buffer") {
    withExec(flushRows = 1024) { (exec, catalog, _) =>
      exec.executeSql("INSERT INTO s VALUES (42, 4.2)")
      assert(catalog.readSeries("bdb", "s").count() == 0)
      exec.close()
      assert(catalog.readSeries("bdb", "s").count() == 1)
    }
  }

  test("REPL statements run in a per-statement escaped-cache scope") {
    withExec(flushRows = 1024) { (exec, _, _) =>
      import spark.implicits._
      graft.core.EscapedCaches.release() // drain anything a prior test left
      exec.executeSql("INSERT INTO s VALUES (7, 1.5)")
      val out = new java.io.ByteArrayOutputStream()
      // the real statement path goes through Repl.run -> scopedStatement
      Console.withOut(new java.io.PrintStream(out)) {
        graft.cli.Repl.run(exec, "SELECT value FROM s")
      }
      assert(out.toString.contains("(stream) 1"), s"unexpected render: $out")
      // a statement whose execution registers an escaped persist (none
      // of today's tsql operators do — emulated through the same
      // scopedStatement wrapper run() uses) must have it drained by
      // return, and nothing may land in the global scope
      var tracked: org.apache.spark.sql.DataFrame = null
      graft.cli.Repl.scopedStatement {
        tracked = graft.core.EscapedCaches.persistTracked(
          (1 to 3).toDF("x").groupBy("x").count())
        tracked.count()
      }
      assert(tracked.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "REPL statement scope failed to drain its escaped persist")
      assert(graft.core.EscapedCaches.release() == 0,
        "a REPL statement leaked a cache into the global scope")
    }
  }
}
