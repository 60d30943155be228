package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.catalog.TsCatalog
import graft.tsql.{Parser, Statement, TimeEval}

/** Write-buffering statement front-end for interactive ingest.
  *
  * The reference acknowledges each INSERT after a WAL append
  * (µs-scale, src/timeseries.c:621-682) and only pays real storage work
  * when the WAL reaches its flush threshold (TS_FLUSHSIZE,
  * src/timeseries.c:15-16, 632-658). A Spark parquet commit per INSERT
  * statement is ~100 ms-class, which is the wrong cost model for an
  * interactive point-insert workload — so this wrapper accumulates
  * INSERT rows in memory, keyed by (db, series), and commits a merged
  * batch when:
  *
  *  - a series' buffer reaches `flushRows` (the TS_FLUSHSIZE analog);
  *  - any NON-insert statement arrives — flush-before-read gives exact
  *    read-your-writes, so buffering is semantically invisible;
  *  - [[flush]] / [[close]] is called (REPL exit, server shutdown).
  *
  * Time expressions (including `now()`) resolve at STATEMENT time, not
  * flush time, with the same per-row error counting as the direct path.
  * Durability divergence (documented): buffered rows live in driver
  * memory until flushed; the reference's un-fsynced WAL pwrite has the
  * same crash window, just a smaller one.
  */
final class BufferedExecutor(spark: SparkSession, catalog: TsCatalog,
    now: () => Long = TimeEval.nowNanos _, flushRows: Int = 1024) {

  private val inner = new StatementExecutor(spark, catalog, now)
  private val buffers = mutable.LinkedHashMap[(String, String), mutable.ArrayBuffer[(Long, Double)]]()
  // per-series buffered timestamps, tracked only under dupPolicy
  // "ignore": merging several statements into one flush batch must not
  // lose the unbuffered path's first-statement-wins determinism (the
  // catalog's dropDuplicates over a merged batch would pick arbitrarily)
  private val bufferedTs = mutable.HashMap[(String, String), mutable.HashSet[Long]]()

  def executeSql(sql: String): ExecResult =
    Parser.parse(sql) match {
      case Left(err) => ExecResult.Err(ErrCode.ParseError, err)
      case Right(Statement.Insert(name, rows)) => bufferInsert(name, rows)
      case Right(other) =>
        // any non-insert statement observes all buffered writes
        flush()
        inner.execute(other)
    }

  private def bufferInsert(name: String,
      rows: Seq[(graft.tsql.TimeExpr, Double)]): ExecResult =
    inner.withSeries(name) { (db, meta) =>
      // time-expression resolution + error counting shared with the
      // direct path (StatementExecutor.resolveRows) — one source of truth
      val (resolved, errors) = inner.resolveRows(rows)
      val accepted =
        if (meta.dupPolicy == "ignore") {
          val seen = bufferedTs.getOrElseUpdate((db, name), mutable.HashSet.empty)
          resolved.filter { case (t, _) => seen.add(t) }
        } else resolved
      val buf = buffers.getOrElseUpdate((db, name), mutable.ArrayBuffer.empty)
      buf ++= accepted
      if (buf.size >= flushRows) flushSeries(db, name)
      ExecResult.Ack(s"${accepted.size} point(s) buffered, $errors error(s)")
    }

  private def flushSeries(db: String, name: String): Unit = {
    // commit BEFORE dropping the buffer: these rows were already acked
    // to the client, so a failed parquet write must leave them queued
    // for the next flush()/close() retry rather than silently lost
    buffers.get((db, name)).filter(_.nonEmpty).foreach { rows =>
      import spark.implicits._
      catalog.insert(db, name, rows.toSeq.toDF("timestamp", "value"))
    }
    buffers.remove((db, name))
    bufferedTs.remove((db, name))
  }

  /** Commit every buffered batch (one write job per touched series).
    * A failing series must not abort the sweep — every other series'
    * acked rows still get their commit attempt; the first failure
    * rethrows afterwards so the caller still sees it. */
  def flush(): Unit = {
    var firstFailure: Option[Throwable] = None
    buffers.keys.toSeq.foreach { case (db, name) =>
      try flushSeries(db, name)
      catch { case scala.util.control.NonFatal(e) =>
        firstFailure match {
          case None => firstFailure = Some(e)
          case Some(first) => first.addSuppressed(e) // no silent loss of later failures
        }
      }
    }
    firstFailure.foreach(throw _)
  }

  /** Rows currently buffered (diagnostics / tests). */
  def buffered: Int = buffers.valuesIterator.map(_.size).sum

  def close(): Unit = flush()
}
