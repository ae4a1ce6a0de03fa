package graft.sink

/** SQL statement dialect for [[JdbcApply]] — the seam that makes the
  * deploy target a config flip rather than a code change.
  *
  * The reference emits MySQL-flavored statements (pipe-s
  * `pkg/utils/mysql.go:159-218`: backtick-quoted identifiers,
  * `INSERT IGNORE` for replay-idempotent inserts, `default(col)` for
  * update columns carrying "unchanged"); the sandbox target is embedded
  * Derby, which needs ANSI double-quoted identifiers and has no INSERT
  * IGNORE. Statement ASSEMBLY (column order, placeholder layout, pk
  * WHERE) is shared here so the two dialects can never drift in shape —
  * a dialect only decides quoting, the DEFAULT spelling, the insert
  * verb, and whether duplicate keys are swallowed by the statement
  * itself.
  *
  * `mask(i) = true` marks value column i as "write the column DEFAULT"
  * (the [[JdbcApply.Config.nullToDefault]] convention): masked columns
  * appear as a DEFAULT expression in the SQL text and are NOT bound as
  * parameters.
  */
sealed trait SqlDialect extends Serializable {
  def name: String
  def quote(ident: String): String

  /** The DEFAULT spelling for a masked column in a SET / VALUES slot. */
  def defaultExpr(col: String): String

  /** Insert statement head (`INSERT` / `INSERT IGNORE`). */
  def insertVerb: String = "INSERT"

  /** True when [[insertSql]]'s verb makes a duplicate-key insert a
    * silent no-op (count 0) instead of an error — the apply loop then
    * resolves replay upserts by count, never via the rollback fallback. */
  def insertIgnoresDuplicates: Boolean = false

  final def pkWhere(pkCols: Seq[String]): String =
    pkCols.map(c => s"${quote(c)}=?").mkString(" AND ")

  final def insertSql(table: String, pkCols: Seq[String],
      valueCols: Seq[String], mask: Seq[Boolean]): String = {
    val ph = pkCols.map(_ => "?") ++
      valueCols.zip(mask).map { case (c, d) => if (d) defaultExpr(c) else "?" }
    s"$insertVerb INTO ${quote(table)} " +
      s"(${(pkCols ++ valueCols).map(quote).mkString(",")}) " +
      s"VALUES (${ph.mkString(",")})"
  }

  final def updateSql(table: String, pkCols: Seq[String],
      valueCols: Seq[String], mask: Seq[Boolean]): String = {
    val sets = valueCols.zip(mask).map {
      case (c, true) => s"${quote(c)}=${defaultExpr(c)}"
      case (c, false) => s"${quote(c)}=?"
    }.mkString(",")
    s"UPDATE ${quote(table)} SET $sets WHERE ${pkWhere(pkCols)}"
  }

  final def deleteSql(table: String, pkCols: Seq[String]): String =
    s"DELETE FROM ${quote(table)} WHERE ${pkWhere(pkCols)}"
}

object SqlDialect {

  /** ANSI / Derby: double-quoted UPPERCASE identifiers (Derby folds
    * unquoted identifiers up, so quoting must match the fold to hit the
    * same catalog objects), bare `DEFAULT` keyword, plain INSERT —
    * duplicate keys raise, and [[JdbcApply]] resolves them through its
    * rollback + insert-else-update fallback. */
  case object Ansi extends SqlDialect {
    val name = "ansi"
    def quote(ident: String): String = "\"" + ident.toUpperCase + "\""
    def defaultExpr(col: String): String = "DEFAULT"
  }

  /** MySQL (`pkg/utils/mysql.go:159-218`): backtick-quoted identifiers
    * with case preserved, `default(`col`)` as the DEFAULT spelling, and
    * `INSERT IGNORE` so a replayed insert is a silent count-0 no-op —
    * the reference's replay idempotency, statement-native.
    *
    * Count caveat: the update-miss detection (batch count 0 ⇒ retry as
    * insert) relies on Connector/J's default `useAffectedRows=false`
    * (counts report MATCHED rows, so an identical-value replay update
    * still counts 1). Deploy with that default. */
  case object MySql extends SqlDialect {
    val name = "mysql"
    def quote(ident: String): String = "`" + ident + "`"
    def defaultExpr(col: String): String = s"default(${quote(col)})"
    override def insertVerb: String = "INSERT IGNORE"
    override def insertIgnoresDuplicates: Boolean = true
  }

  /** Dialect from the JDBC url scheme (the config front-end's auto
    * mode): `jdbc:mysql:` / `jdbc:mariadb:` → [[MySql]], anything else
    * (Derby in the harness) → [[Ansi]]. */
  def forUrl(url: String): SqlDialect =
    if (url.startsWith("jdbc:mysql:") || url.startsWith("jdbc:mariadb:")) MySql
    else Ansi

  def byName(name: String): SqlDialect = name.toLowerCase match {
    case "ansi" | "derby" => Ansi
    case "mysql" | "mariadb" => MySql
    case other => throw new IllegalArgumentException(
      s"unknown SQL dialect: $other (want ansi|mysql)")
  }
}
