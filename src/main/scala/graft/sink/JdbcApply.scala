package graft.sink

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Executing JDBC apply writer — the reference's core delivery path made
  * real (pipe-s `pkg/output/mysql/stream/streamoutput.go:121-134` row
  * apply, `pkg/output/mysql/batch/tableprocessor.go:198-257` batched
  * statements, `:129-176` insert-shortfall fallback).
  *
  * Takes a COMPACTED net-change frame (one row per (table, pk) —
  * [[graft.op.Compactor.compact]]'s output) and executes it against a
  * JDBC target:
  *
  *   - rows are hash-routed by (table, pk cols) via `repartition` — the
  *     declarative form of the reference's FNV worker routing
  *     (`streamoutput.go:149-161`): one partition owns a key, so per-key
  *     apply order is single-threaded without any global coordination;
  *     composite primary keys (up to 5 columns, the reference's bound —
  *     `pkg/output/mysql/batch/batchoutput.go:119-121`) route and apply
  *     on all key columns;
  *   - each partition holds ONE connection, buffers rows per table, and
  *     flushes `batchSize`-row PreparedStatement batches: DELETE by pk,
  *     UPDATE by pk, multi-row INSERT (`tableprocessor.go:198-257`);
  *   - with `nullToDefault` set, a NULL value-column on an UPDATE writes
  *     `SET col=DEFAULT` instead of binding NULL — the reference's
  *     update semantics (`pkg/utils/mysql.go:167-169` rewrites nil
  *     update columns to the column default). Updates are batched per
  *     null-mask so each distinct statement shape still runs as one
  *     PreparedStatement batch; an update-miss that falls back to an
  *     insert carries `DEFAULT` into the VALUES list so the converged
  *     row is identical either way. INSERT images bind NULL as NULL
  *     (an insert is a full row image; only updates carry the
  *     "unchanged ⇒ default" convention);
  *   - idempotency under at-least-once replay: an UPDATE that matches no
  *     row is retried as an INSERT, and a batch INSERT that hits
  *     duplicate keys is rolled back and re-applied row-by-row as
  *     insert-else-update — the reference's insert-shortfall fallback
  *     (`tableprocessor.go:129-176`) generalized to any SQL target
  *     (Derby/MySQL; no INSERT IGNORE dialect dependence);
  *   - deletes of absent rows are no-ops (count 0 is success).
  *
  * At scale: `writers` bounds the target's connection fan-in (reference
  * worker count); the compacted input is proportional to |keys| per
  * batch, so statement volume is already minimal before JDBC sees it.
  */
object JdbcApply {

  /** @param url       JDBC url (executor-reachable; embedded Derby in the
    *                  harness, a MySQL endpoint in production)
    * @param tableCol  column holding the physical table name
    * @param pkCols    primary-key columns (within each table), 1 to 5 —
    *                  the reference's routing bound (`batchoutput.go:119`)
    * @param valueCols non-key columns, in table DDL order
    * @param writers   apply partitions = max concurrent connections
    * @param nullToDefault NULL update columns write DEFAULT (see above)
    * @param maxReconnects bounded in-writer reconnects on a connection
    *                  failure (SQLState 08xxx / recoverable): the dead
    *                  connection is rolled back and replaced, and the
    *                  in-flight flush re-applies whole — safe because
    *                  every flush is idempotent (insert-else-update,
    *                  delete-if-present). The reference gets this
    *                  transparently from Go database/sql's bad-conn
    *                  replacement; a raw JDBC connection needs it
    *                  explicit. Exhausted retries fail the task (Spark's
    *                  coarser task retry takes over).
    * @param reconnectBackoffMs linear backoff between attempts
    * @param dialect   SQL statement dialect ([[SqlDialect]]); None =
    *                  derive from the url scheme (mysql/mariadb →
    *                  MySQL statements per `pkg/utils/mysql.go:159-218`,
    *                  else ANSI/Derby) — deploy-time is a config flip */
  case class Config(url: String, tableCol: String = "tbl",
      pkCols: Seq[String] = Seq("pk"),
      valueCols: Seq[String] = Seq("r_id", "r_k", "r_v"),
      batchSize: Int = 1000, writers: Int = 8,
      nullToDefault: Boolean = false,
      maxReconnects: Int = 3, reconnectBackoffMs: Long = 100L,
      dialect: Option[SqlDialect] = None) {
    require(pkCols.nonEmpty && pkCols.length <= 5,
      s"1..5 primary-key columns (reference bound), got ${pkCols.length}")
    def resolvedDialect: SqlDialect = dialect.getOrElse(SqlDialect.forUrl(url))
  }

  def apply(net: DataFrame, cfg: Config): Unit = {
    val cols = Seq(cfg.tableCol, "net_op") ++ cfg.pkCols ++ cfg.valueCols
    net.select(cols.map(col): _*)
      .repartition(cfg.writers, (col(cfg.tableCol) +: cfg.pkCols.map(col)): _*)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val writer = new PartitionWriter(() => {
            val c = DriverManager.getConnection(cfg.url)
            c.setAutoCommit(false)
            c
          }, cfg)
          try {
            it.foreach(writer.add)
            writer.flushAll()
          } finally writer.close()
        }
      }
  }

  /** One partition's buffered apply (executor-side). Connection is
    * established lazily inside the guarded flush loop, so an initial
    * connect failure gets the same bounded retry as a mid-flush one. */
  private class PartitionWriter(connect: () => Connection, cfg: Config) {
    private var conn: Connection = null

    def close(): Unit =
      if (conn != null) { try conn.close() catch { case _: Exception => () } }

    /** Connection-level failure (vs statement-level, which the flush
      * logic handles): SQLState class 08, or the JDBC transient /
      * recoverable marker hierarchies. */
    private def isConnFailure(e: SQLException): Boolean =
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).exists {
        case s: SQLException =>
          Option(s.getSQLState).exists(_.startsWith("08")) ||
            s.isInstanceOf[java.sql.SQLNonTransientConnectionException] ||
            s.isInstanceOf[java.sql.SQLTransientConnectionException] ||
            s.isInstanceOf[java.sql.SQLRecoverableException]
        case _ => false
      }

    /** Run one flush; on a connection failure, replace the connection and
      * re-apply the WHOLE flush (idempotent), up to `maxReconnects`. The
      * re-connection itself happens INSIDE the guarded region: a target
      * still down on the retry consumes budget + backoff like any other
      * connection failure, instead of escaping the loop uncaught. */
    private def flushWithReconnect(table: String, rows: collection.Seq[Row]): Unit = {
      var attempt = 0
      var done = false
      while (!done) {
        try {
          if (conn == null) conn = connect()
          flushTable(table, rows); done = true
        } catch {
          case e: SQLException if isConnFailure(e) && attempt < cfg.maxReconnects =>
            attempt += 1
            if (conn != null) {
              try conn.rollback() catch { case _: Exception => () }
              try conn.close() catch { case _: Exception => () }
              conn = null
            }
            Thread.sleep(cfg.reconnectBackoffMs * attempt)
        }
      }
    }
    private val buffers = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Row]]

    def add(r: Row): Unit = {
      val buf = buffers.getOrElseUpdate(r.getAs[String](cfg.tableCol),
        mutable.ArrayBuffer.empty[Row])
      buf += r
      if (buf.length >= cfg.batchSize) {
        flushWithReconnect(r.getAs[String](cfg.tableCol), buf)
        buf.clear()
      }
    }

    def flushAll(): Unit =
      buffers.foreach { case (t, buf) => if (buf.nonEmpty) flushWithReconnect(t, buf) }

    private val dialect: SqlDialect = cfg.resolvedDialect

    /** Which value columns of this row write DEFAULT rather than a bound
      * parameter. Only UPDATE images carry the convention (and the
      * inserts they fall back to); a plain INSERT is a full row image. */
    private val noMask: Seq[Boolean] = cfg.valueCols.map(_ => false)
    private def maskOf(r: Row): Seq[Boolean] =
      if (!cfg.nullToDefault || r.getAs[String]("net_op") != "update") noMask
      else cfg.valueCols.map(c => r.isNullAt(r.fieldIndex(c)))

    private def setVal(st: PreparedStatement, i: Int, v: Any): Unit = v match {
      case null => st.setObject(i, null)
      case l: Long => st.setLong(i, l)
      case n: Int => st.setInt(i, n)
      case d: Double => st.setDouble(i, d)
      case s: String => st.setString(i, s)
      case other => st.setObject(i, other)
    }

    private def insSql(table: String, mask: Seq[Boolean]): String =
      dialect.insertSql(table, cfg.pkCols, cfg.valueCols, mask)
    private def updSql(table: String, mask: Seq[Boolean]): String =
      dialect.updateSql(table, cfg.pkCols, cfg.valueCols, mask)
    private def delSql(table: String): String =
      dialect.deleteSql(table, cfg.pkCols)

    private def fillPks(st: PreparedStatement, r: Row, from: Int): Int = {
      cfg.pkCols.zipWithIndex.foreach { case (c, i) =>
        setVal(st, from + i, r.getAs[Any](c)) }
      from + cfg.pkCols.length
    }
    private def fillInsert(st: PreparedStatement, r: Row, mask: Seq[Boolean]): Unit = {
      var i = fillPks(st, r, 1)
      cfg.valueCols.zip(mask).foreach { case (c, dflt) =>
        if (!dflt) { setVal(st, i, r.getAs[Any](c)); i += 1 } }
    }
    private def fillUpdate(st: PreparedStatement, r: Row, mask: Seq[Boolean]): Unit = {
      var i = 1
      cfg.valueCols.zip(mask).foreach { case (c, dflt) =>
        if (!dflt) { setVal(st, i, r.getAs[Any](c)); i += 1 } }
      fillPks(st, r, i)
    }

    private def flushTable(table: String, rows: collection.Seq[Row]): Unit = {
      val deletes = rows.filter(_.getAs[String]("net_op") == "delete")
      val updates = rows.filter(_.getAs[String]("net_op") == "update")
      val inserts = rows.filter(_.getAs[String]("net_op") == "insert")

      if (deletes.nonEmpty) {
        val st = conn.prepareStatement(delSql(table))
        try {
          deletes.foreach { r => fillPks(st, r, 1); st.addBatch() }
          st.executeBatch() // count 0 (already gone) is fine: idempotent
        } finally st.close()
      }

      // updates first, collecting misses — an update that matched nothing
      // targets a row the replayed delete already removed or that never
      // arrived; apply it as an insert (net image is the full row). One
      // PreparedStatement batch per distinct null-mask (all rows share
      // the all-false mask unless nullToDefault is on and nulls exist).
      val missed = mutable.ArrayBuffer.empty[Row]
      updates.groupBy(maskOf).foreach { case (mask, group) =>
        val st = conn.prepareStatement(updSql(table, mask))
        try {
          group.foreach { r => fillUpdate(st, r, mask); st.addBatch() }
          val counts = st.executeBatch()
          counts.zip(group).foreach { case (n, r) => if (n == 0) missed += r }
        } finally st.close()
      }

      val toInsert = inserts ++ missed
      if (toInsert.nonEmpty) {
        try {
          toInsert.groupBy(maskOf).foreach { case (mask, group) =>
            val st = conn.prepareStatement(insSql(table, mask))
            try {
              group.foreach { r => fillInsert(st, r, mask); st.addBatch() }
              st.executeBatch()
            } finally st.close()
          }
          conn.commit()
        } catch {
          case _: SQLException =>
            // insert-shortfall fallback (tableprocessor.go:129-176): some
            // keys already exist (replay); roll back the torn batch and
            // re-apply row-by-row as insert-else-update
            conn.rollback()
            replayFallback(table, deletes, updates ++ inserts)
        }
      } else conn.commit()
    }

    /** Row-at-a-time re-apply of a rolled-back flush: delete, then upsert
      * each surviving row (insert; duplicate key → update). Statements
      * are cached per (shape, null-mask) across the replay. */
    private def replayFallback(table: String, deletes: collection.Seq[Row],
        upserts: collection.Seq[Row]): Unit = {
      val cache = mutable.Map.empty[String, PreparedStatement]
      def prepared(sql: String) = cache.getOrElseUpdate(sql, conn.prepareStatement(sql))
      try {
        val del = prepared(delSql(table))
        deletes.foreach { r => fillPks(del, r, 1); del.executeUpdate() }
        upserts.foreach { r =>
          val mask = maskOf(r)
          try {
            val ins = prepared(insSql(table, mask))
            fillInsert(ins, r, mask)
            // an IGNORE-verb dialect reports a duplicate as count 0
            // instead of raising — resolve the upsert by count there
            if (ins.executeUpdate() == 0 && dialect.insertIgnoresDuplicates) {
              val upd = prepared(updSql(table, mask))
              fillUpdate(upd, r, mask); upd.executeUpdate()
            }
          } catch {
            // SQLState class 23 = integrity-constraint violation: Derby
            // raises 23505, MySQL 23000 (ER_DUP_ENTRY) — match the class,
            // not one dialect's subcode, so replay stays idempotent on
            // both documented targets
            case e: SQLException
                if Option(e.getSQLState).exists(_.startsWith("23")) ||
                  e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] =>
              val upd = prepared(updSql(table, mask))
              fillUpdate(upd, r, mask); upd.executeUpdate()
          }
        }
        conn.commit()
      } finally cache.values.foreach(_.close())
    }
  }
}
