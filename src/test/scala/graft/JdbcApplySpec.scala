package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.op.{Checker, Compactor}
import graft.sink.JdbcApply
import graft.source.Changelog

/** Fault-injecting JDBC driver: wraps Derby behind `jdbc:flaky:` and
  * fails `prepareStatement` with a connection-failure SQLState (08006)
  * while the shared `failures` budget is positive — exercising the
  * writer's bounded reconnect without needing a killable server. */
object FlakyDriver extends java.sql.Driver {
  val failures = new java.util.concurrent.atomic.AtomicInteger(0)
  val connectFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  private val prefix = "jdbc:flaky:"
  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) { DriverManager.registerDriver(this); registered = true }
  }
  override def acceptsURL(url: String): Boolean = url.startsWith(prefix)
  override def connect(url: String, info: java.util.Properties): java.sql.Connection = {
    if (!acceptsURL(url)) return null
    if (connectFailures.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new java.sql.SQLNonTransientConnectionException(
        "injected connect failure", "08001")
    val real = DriverManager.getConnection("jdbc:" + url.stripPrefix(prefix), info)
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      (_, method, args) => {
        if (method.getName == "prepareStatement" &&
            failures.getAndUpdate(n => math.max(0, n - 1)) > 0)
          throw new java.sql.SQLNonTransientConnectionException(
            "injected connection failure", "08006")
        try method.invoke(real, (if (args == null) Array.empty[AnyRef] else args): _*)
        catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
      }).asInstanceOf[java.sql.Connection]
  }
  override def getPropertyInfo(u: String, p: java.util.Properties) = Array.empty
  override def getMajorVersion = 1
  override def getMinorVersion = 0
  override def jdbcCompliant() = false
  override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
}

/** The executing JDBC apply writer against a real embedded SQL target
  * (Derby, shipped with Spark) — the harness analog of the reference's
  * MySQL delivery path: compacted changelog in, real statements out,
  * `Checker.check` closes the loop with zero diff rows. */
class JdbcApplySpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftapply;create=true"
  private val tables = (0 until 10).map(i => s"sbtest$i")

  private def resetTables(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      tables.foreach { t =>
        try st.execute(s"DROP TABLE ${t.toUpperCase}") catch { case _: Exception => () }
        st.execute(s"CREATE TABLE ${t.toUpperCase} " +
          "(PK BIGINT PRIMARY KEY, R_ID BIGINT, R_K INT, R_V DOUBLE)")
      }
      st.close()
    } finally conn.close()
  }

  /** Target state read back through Spark's JDBC source, lower-cased and
    * tagged with its table, so it joins cleanly against the net frame. */
  private def targetState() =
    tables.map { t =>
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", t.toUpperCase).load()
        .toDF("pk", "r_id", "r_k", "r_v")
        .withColumn("tbl", lit(t))
        .select("tbl", "pk", "r_id", "r_k", "r_v")
    }.reduce(_ unionByName _)

  private def expectedState() =
    Compactor.compact(Changelog.fromEvents(spark, sf))
      .filter(col("net_op") =!= "delete")
      .select("tbl", "pk", "r_id", "r_k", "r_v")

  test("compacted changelog applies through real JDBC statements, checker-clean") {
    resetTables()
    val net = Compactor.compact(Changelog.fromEvents(spark, sf))
    JdbcApply(net, JdbcApply.Config(url, writers = 4, batchSize = 5))
    val want = expectedState()
    val got = targetState()
    assert(got.count() == want.count())
    assert(Checker.check(want, got, Seq("tbl", "pk")).count() == 0,
      "source vs applied target must have zero row_miss/row_diff")
    assert(Checker.check(got, want, Seq("tbl", "pk")).count() == 0,
      "no extra rows in the target either")
  }

  test("at-least-once replay: re-applying the same net converges (shortfall fallback)") {
    // the first test left the applied state in place; re-apply the same
    // compacted batch — inserts now hit duplicate keys and must fall back
    // to updates (tableprocessor.go:129-176), deletes hit absent rows
    val net = Compactor.compact(Changelog.fromEvents(spark, sf))
    JdbcApply(net, JdbcApply.Config(url, writers = 4, batchSize = 5))
    assert(Checker.check(expectedState(), targetState(), Seq("tbl", "pk")).count() == 0)
    assert(targetState().count() == expectedState().count())
  }

  test("config-driven streaming sync delivers into the JDBC target") {
    resetTables()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-sync").toString
    val cfg = s"""{
      "source": {"type": "events_stream", "dir": "$sf"},
      "processors": [],
      "sink": {"type": "jdbc_apply", "url": "$url",
               "checkpoint": "$ckpt", "writers": 4}
    }"""
    graft.pipeline.Pipeline.runStream(spark, cfg)
    assert(Checker.check(expectedState(), targetState(), Seq("tbl", "pk")).count() == 0)
    assert(targetState().count() == expectedState().count())
    // restart from the same checkpoint: no re-delivery, state unchanged
    graft.pipeline.Pipeline.runStream(spark, cfg)
    assert(targetState().count() == expectedState().count())
  }

  test("randomized batch sequences: JDBC state equals the model state") {
    resetTables()
    val rnd = new scala.util.Random(20260812L) // fixed seed: deterministic
    val model = scala.collection.mutable.Map[(String, Long), (Long, Int, Double)]()
    val ops = Seq("insert", "update", "delete")
    (0 until 8).foreach { _ =>
      // one compacted batch: at most one op per (tbl, pk); ops may target
      // absent keys (update/delete) or existing ones (insert) — the
      // writer's fallback paths must absorb all of it
      val keys = rnd.shuffle((0 until 40).map(i =>
        (s"sbtest${i % 10}", rnd.nextInt(25).toLong))).distinct.take(25)
      val batch = keys.map { case (t, pk) =>
        val op = ops(rnd.nextInt(3))
        (t, pk, op, pk * 10, rnd.nextInt(1000), rnd.nextDouble())
      }
      batch.foreach { case (t, pk, op, rid, rk, rv) =>
        if (op == "delete") model.remove((t, pk))
        else model((t, pk)) = (rid, rk, rv)
      }
      JdbcApply(batch.toDF("tbl", "pk", "net_op", "r_id", "r_k", "r_v"),
        JdbcApply.Config(url, writers = 4, batchSize = 7))
    }
    val got = targetState().collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getDouble(4))
    }.toMap
    assert(got == model.toMap)
  }

  test("update-miss inserts; duplicate insert updates (row-level fallback paths)") {
    resetTables()
    def netOf(rows: (String, Long, String, Long, Int, Double)*) =
      rows.toSeq.toDF("tbl", "pk", "net_op", "r_id", "r_k", "r_v")
    // an update targeting an absent pk materializes as an insert
    JdbcApply(netOf(("sbtest0", 1L, "update", 1L, 10, 0.5)),
      JdbcApply.Config(url, writers = 1))
    // a duplicate insert falls back to an update with the new image
    JdbcApply(netOf(("sbtest0", 1L, "insert", 1L, 20, 0.75)),
      JdbcApply.Config(url, writers = 1))
    val got = targetState().filter(col("tbl") === "sbtest0").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Int]("r_k") == 20)
    assert(got.head.getAs[Double]("r_v") == 0.75)
    // a delete of an absent key is a no-op, of a present key removes it
    JdbcApply(netOf(
      ("sbtest0", 1L, "delete", 0L, 0, 0.0),
      ("sbtest0", 99L, "delete", 0L, 0, 0.0)),
      JdbcApply.Config(url, writers = 1))
    assert(targetState().filter(col("tbl") === "sbtest0").count() == 0)
  }

  test("bounded reconnect: transient connection failures mid-flush converge") {
    resetTables()
    FlakyDriver.register()
    val flakyUrl = "jdbc:flaky:derby:memory:graftapply" // same store, faulty pipe
    def netOf(rows: (String, Long, String, Long, Int, Double)*) =
      rows.toSeq.toDF("tbl", "pk", "net_op", "r_id", "r_k", "r_v")
    // seed through the healthy url
    JdbcApply(netOf(("sbtest0", 1L, "insert", 1L, 10, 0.5)), JdbcApply.Config(url, writers = 1))
    // two injected connection failures: the writer must replace the
    // connection twice and re-apply the flush whole (maxReconnects = 3)
    FlakyDriver.failures.set(2)
    JdbcApply(netOf(
      ("sbtest0", 1L, "update", 1L, 20, 0.9),
      ("sbtest0", 2L, "insert", 2L, 30, 1.5)),
      JdbcApply.Config(flakyUrl, writers = 1))
    assert(FlakyDriver.failures.get() == 0, "both failures must have been consumed")
    val got = targetState().filter(col("tbl") === "sbtest0")
      .collect().map(r => r.getAs[Long]("pk") -> r.getAs[Int]("r_k")).toMap
    assert(got == Map(1L -> 20, 2L -> 30))
    // a target still DOWN at reconnect time (connect itself fails) stays
    // inside the bounded budget instead of escaping the retry loop
    FlakyDriver.failures.set(1)        // kill the live connection...
    FlakyDriver.connectFailures.set(1) // ...and fail the first reconnect
    JdbcApply(netOf(("sbtest0", 2L, "update", 2L, 31, 1.6)),
      JdbcApply.Config(flakyUrl, writers = 1, reconnectBackoffMs = 1L))
    assert(FlakyDriver.connectFailures.get() == 0)
    val got2 = targetState().filter(col("pk") === 2L).collect().head
    assert(got2.getAs[Int]("r_k") == 31)
    // exhausting the budget fails the task (Spark's coarser retry owns it)
    FlakyDriver.failures.set(1000)
    intercept[Exception] {
      JdbcApply(netOf(("sbtest0", 3L, "insert", 3L, 40, 2.0)),
        JdbcApply.Config(flakyUrl, writers = 1, maxReconnects = 2,
          reconnectBackoffMs = 1L))
    }
    FlakyDriver.failures.set(0)
    assert(targetState().filter(col("pk") === 3L).count() == 0)
  }

  test("nullToDefault: a NULL update column converges to the column default") {
    // the reference rewrites nil update columns to DEFAULT(col)
    // (pkg/utils/mysql.go:167-169); prove the EXECUTING writer does too
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE DEFT") catch { case _: Exception => () }
      st.execute("CREATE TABLE DEFT (PK BIGINT PRIMARY KEY, " +
        "R_ID BIGINT DEFAULT 7, R_K INT DEFAULT 42, R_V DOUBLE DEFAULT 2.5)")
      st.close()
    } finally conn.close()
    val cfg = JdbcApply.Config(url, writers = 1, nullToDefault = true)
    def net(rows: (String, Long, String, Option[Long], Option[Int], Option[Double])*) =
      rows.toSeq.toDF("tbl", "pk", "net_op", "r_id", "r_k", "r_v")
    def state() = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "DEFT").load().collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.get(2), r.get(3)))).toMap

    JdbcApply(net(("deft", 1L, "insert", Some(1L), Some(10), Some(0.5))), cfg)
    // update with r_k null: SET R_K=DEFAULT, not NULL
    JdbcApply(net(("deft", 1L, "update", Some(2L), None, Some(0.9))), cfg)
    assert(state()(1L) == ((2L, 42, 0.9)))
    // update-miss with null columns: the insert fallback carries DEFAULT
    // into the VALUES list, so the converged row is identical either way
    JdbcApply(net(("deft", 5L, "update", Some(5L), None, None)), cfg)
    assert(state()(5L) == ((5L, 42, 2.5)))
    // a mixed batch groups per null-mask: each shape is one stmt batch
    JdbcApply(net(
      ("deft", 1L, "update", Some(3L), Some(11), Some(1.1)),
      ("deft", 5L, "update", None, Some(12), None)), cfg)
    assert(state()(1L) == ((3L, 11, 1.1)))
    assert(state()(5L) == ((7L, 12, 2.5)))
    // a plain INSERT is a full row image: explicit null stays NULL
    JdbcApply(net(("deft", 9L, "insert", Some(9L), None, Some(1.0))), cfg)
    assert(state()(9L) == ((9L, null, 1.0)))
  }

  test("randomized nullToDefault sequences: JDBC state equals the model") {
    // model contract: INSERT is a full row image (None binds NULL);
    // UPDATE rewrites None columns to the column DEFAULT (42 / 2.5),
    // whether it matches a row or falls back to an insert; DELETE removes
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE DEFR") catch { case _: Exception => () }
      st.execute("CREATE TABLE DEFR (PK BIGINT PRIMARY KEY, " +
        "R_K INT DEFAULT 42, R_V DOUBLE DEFAULT 2.5)")
      st.close()
    } finally conn.close()
    val cfg = JdbcApply.Config(url, valueCols = Seq("r_k", "r_v"),
      writers = 4, batchSize = 5, nullToDefault = true)
    val rnd = new scala.util.Random(20260812L)
    val model = scala.collection.mutable.Map[Long, (Option[Int], Option[Double])]()
    (0 until 8).foreach { _ =>
      val keys = rnd.shuffle((0 until 16).map(_.toLong)).take(10)
      val batch = keys.map { pk =>
        val op = Seq("insert", "update", "delete")(rnd.nextInt(3))
        val k = if (rnd.nextBoolean()) Some(rnd.nextInt(1000)) else None
        val v = if (rnd.nextBoolean()) Some(rnd.nextDouble()) else None
        ("defr", pk, op, k, v)
      }
      batch.foreach { case (_, pk, op, k, v) =>
        op match {
          case "delete" => model.remove(pk)
          case "insert" => model(pk) = (k, v)
          case "update" => model(pk) =
            (Some(k.getOrElse(42)), Some(v.getOrElse(2.5)))
        }
      }
      JdbcApply(batch.toDF("tbl", "pk", "net_op", "r_k", "r_v"), cfg)
    }
    val got = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "DEFR").load().collect().map { r =>
        r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getInt(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      }.toMap
    assert(got == model.toMap)
  }

  test("composite multi-col PK: lineitem-shaped changelog applies, checker-clean") {
    // the synthetic lineitem's unique key is (l_orderkey, l_linenumber,
    // l_partkey) — composite routing the reference bounds at 5 key
    // columns (batchoutput.go:119-121)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE LI2PK") catch { case _: Exception => () }
      st.execute("CREATE TABLE LI2PK (L_ORDERKEY BIGINT, L_LINENUMBER INT, " +
        "L_PARTKEY BIGINT, L_QUANTITY DOUBLE, L_RETURNFLAG VARCHAR(1), " +
        "PRIMARY KEY (L_ORDERKEY, L_LINENUMBER, L_PARTKEY))")
      st.close()
    } finally conn.close()
    val pks = Seq("l_orderkey", "l_linenumber", "l_partkey")
    val cfg = JdbcApply.Config(url, pkCols = pks,
      valueCols = Seq("l_quantity", "l_returnflag"), writers = 4, batchSize = 50)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_returnflag")
      .filter(col("l_orderkey") <= 500) // deterministic subset (limit isn't)
      .cache()
    JdbcApply(li.withColumn("tbl", lit("li2pk"))
      .withColumn("net_op", lit("insert")), cfg)
    // second batch: update linenumber-1 rows, delete linenumber-2 rows —
    // both route and match on the full composite key
    val upd = li.filter(col("l_linenumber") === 1)
      .withColumn("l_quantity", col("l_quantity") + 100)
      .withColumn("tbl", lit("li2pk")).withColumn("net_op", lit("update"))
    val del = li.filter(col("l_linenumber") === 2)
      .withColumn("tbl", lit("li2pk")).withColumn("net_op", lit("delete"))
    JdbcApply(upd.unionByName(del), cfg)
    val want = li.filter(col("l_linenumber") =!= 2)
      .withColumn("l_quantity",
        when(col("l_linenumber") === 1, col("l_quantity") + 100)
          .otherwise(col("l_quantity")))
    val got = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "LI2PK").load()
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_returnflag")
    assert(got.count() == want.count())
    assert(Checker.check(want, got, pks).count() == 0)
    assert(Checker.check(got, want, pks).count() == 0)
    // replay the whole second batch: idempotent on composite keys too
    JdbcApply(upd.unionByName(del), cfg)
    assert(Checker.check(want, got, pks).count() == 0)
  }
}
