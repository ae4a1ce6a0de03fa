package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.SqlDialect

/** Golden statement text per dialect. Derby (JdbcApplySpec) proves the
  * apply SEMANTICS end-to-end; this spec pins the exact SQL each dialect
  * emits, so the MySQL deploy path (reference statement shapes, pipe-s
  * `pkg/utils/mysql.go:159-218`: backtick identifiers, INSERT IGNORE,
  * `default(col)`) is a config flip verified at the statement level —
  * no live MySQL needed to know the wire text is right. */
class DialectSpec extends AnyFunSuite {

  private val pk = Seq("pk")
  private val vals = Seq("r_id", "r_k", "r_v")
  private val noMask = Seq(false, false, false)
  private val kMask = Seq(false, true, false) // r_k carries "unchanged"

  test("MySQL golden statements (reference shapes)") {
    val d = SqlDialect.MySql
    assert(d.insertSql("sbtest1", pk, vals, noMask) ===
      "INSERT IGNORE INTO `sbtest1` (`pk`,`r_id`,`r_k`,`r_v`) VALUES (?,?,?,?)")
    assert(d.insertSql("sbtest1", pk, vals, kMask) ===
      "INSERT IGNORE INTO `sbtest1` (`pk`,`r_id`,`r_k`,`r_v`) " +
        "VALUES (?,?,default(`r_k`),?)")
    assert(d.updateSql("sbtest1", pk, vals, noMask) ===
      "UPDATE `sbtest1` SET `r_id`=?,`r_k`=?,`r_v`=? WHERE `pk`=?")
    assert(d.updateSql("sbtest1", pk, vals, kMask) ===
      "UPDATE `sbtest1` SET `r_id`=?,`r_k`=default(`r_k`),`r_v`=? WHERE `pk`=?")
    assert(d.deleteSql("sbtest1", pk) ===
      "DELETE FROM `sbtest1` WHERE `pk`=?")
    // identifier case is PRESERVED (MySQL table names are case-sensitive
    // on Linux); composite pks join with AND
    assert(d.deleteSql("Mixed", Seq("a", "b")) ===
      "DELETE FROM `Mixed` WHERE `a`=? AND `b`=?")
    assert(d.insertIgnoresDuplicates)
  }

  test("ANSI/Derby golden statements (the harness target, unchanged)") {
    val d = SqlDialect.Ansi
    assert(d.insertSql("sbtest1", pk, vals, noMask) ===
      "INSERT INTO \"SBTEST1\" (\"PK\",\"R_ID\",\"R_K\",\"R_V\") VALUES (?,?,?,?)")
    assert(d.insertSql("sbtest1", pk, vals, kMask) ===
      "INSERT INTO \"SBTEST1\" (\"PK\",\"R_ID\",\"R_K\",\"R_V\") " +
        "VALUES (?,?,DEFAULT,?)")
    assert(d.updateSql("sbtest1", pk, vals, kMask) ===
      "UPDATE \"SBTEST1\" SET \"R_ID\"=?,\"R_K\"=DEFAULT,\"R_V\"=? " +
        "WHERE \"PK\"=?")
    assert(d.deleteSql("sbtest1", pk) ===
      "DELETE FROM \"SBTEST1\" WHERE \"PK\"=?")
    assert(!d.insertIgnoresDuplicates)
  }

  test("dialect resolution: url scheme auto-detect and config names") {
    assert(SqlDialect.forUrl("jdbc:mysql://db:3306/x") === SqlDialect.MySql)
    assert(SqlDialect.forUrl("jdbc:mariadb://db/x") === SqlDialect.MySql)
    assert(SqlDialect.forUrl("jdbc:derby:memory:g;create=true") === SqlDialect.Ansi)
    assert(SqlDialect.byName("mysql") === SqlDialect.MySql)
    assert(SqlDialect.byName("derby") === SqlDialect.Ansi)
    intercept[IllegalArgumentException] { SqlDialect.byName("oracle") }
    // Config plumbs it through: explicit beats url-derived
    val auto = graft.sink.JdbcApply.Config("jdbc:mysql://db/x")
    assert(auto.resolvedDialect === SqlDialect.MySql)
    val forced = graft.sink.JdbcApply.Config("jdbc:mysql://db/x",
      dialect = Some(SqlDialect.Ansi))
    assert(forced.resolvedDialect === SqlDialect.Ansi)
  }

  test("masked columns bind no parameter (placeholder count = unmasked)") {
    // the statement text and the bind loop must agree on arity; pin the
    // invariant the fill code relies on: masked slots contribute NO '?'
    Seq(SqlDialect.Ansi, SqlDialect.MySql).foreach { d =>
      val sql = d.insertSql("t", pk, vals, Seq(true, true, false))
      assert(sql.count(_ == '?') === pk.length + 1)
      val upd = d.updateSql("t", pk, vals, Seq(true, true, false))
      assert(upd.count(_ == '?') === pk.length + 1)
    }
  }
}
