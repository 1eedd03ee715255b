package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class JdbcSupportSpec extends AnyFunSuite {
  import JdbcSupport._

  private def strip(sql: String): String =
    stripQuotedAndComments(sql).fold(e => fail(s"unexpected reject: $e"), identity)

  test("lexer strips quoted text and comments") {
    assert(strip("a = 'it''s -- not a comment'").trim == "a =")
    assert(!strip("x = 'DROP TABLE'").toLowerCase.contains("drop"))
    assert(strip("a -- trailing\nb").contains("b"))
    assert(!strip("a /* DELETE */ b").toLowerCase.contains("delete"))
    assert(!strip("`union` = 1").toLowerCase.contains("union"))
  }

  test("backslash escapes inside literals are rejected (NO_BACKSLASH_ESCAPES ambiguity)") {
    // to an escape-honoring lexer this is ONE string; to a server running
    // NO_BACKSLASH_ESCAPES it is a terminated string followed by live SQL
    val smuggle = """name = '\'; DROP TABLE users; --'"""
    val r = stripQuotedAndComments(smuggle)
    assert(r.isLeft && r.left.exists(_.contains("NO_BACKSLASH_ESCAPES")))
    assert(validateWhereClause(smuggle).isLeft)
    assert(stripQuotedAndComments("""a = "x\ny"""").isLeft)
    // backticks never honor backslash escapes in any mode: literal char, fine
    assert(strip("`weird\\col` = 1").trim == "= 1")
    // the sql_mode-independent escape (doubled quote) still works
    assert(validateWhereClause("name = 'it''s fine'").isRight)
  }

  test("unterminated quoted text and block comments are rejected") {
    assert(stripQuotedAndComments("a = 'unterminated").isLeft)
    assert(stripQuotedAndComments("a = \"unterminated").isLeft)
    assert(stripQuotedAndComments("`unterminated = 1").isLeft)
    assert(stripQuotedAndComments("a /* unterminated").isLeft)
    assert(validateWhereClause("a = 'x' AND b = 'oops").isLeft)
    // line comments terminate at EOF harmlessly
    assert(strip("a > 1 -- trailing") == "a > 1 ")
  }

  test("MySQL line-comment rule: bare -- is NOT a comment (smuggle via ---tail blocked)") {
    // MySQL only opens a line comment at `--` + whitespace/control (or EOI).
    // `a>0--(select sleep(9))>0` parses server-side as `a>0 - -(select …)>0`,
    // so the tail MUST survive stripping and trip the keyword scan.
    val smuggled = "a>0--(select sleep(9))>0"
    assert(strip(smuggled).toLowerCase.contains("sleep"))
    val v = validateWhereClause(smuggled)
    assert(v.isLeft && v.left.exists(_.contains("sleep")))
    // `-- ` (with whitespace) still strips as a comment
    assert(!strip("a > 1 -- sleep(9)").toLowerCase.contains("sleep"))
    // `--` at end-of-input is a comment (nothing follows to mis-parse)
    assert(strip("a > 1 --") == "a > 1 ")
    // subtraction of a negative stays intact
    assert(strip("a - -1 > 0").contains("- -1"))
  }

  test("line comments terminate at \\r as well as \\n") {
    assert(strip("a -- x\rdrop").toLowerCase.contains("drop"))
    assert(strip("# x\rdrop").toLowerCase.contains("drop"))
  }

  test("control characters in the where clause are rejected outright") {
    assert(validateWhereClause("a > 1\nAND b < 2").isLeft)
    assert(validateWhereClause("a > 1\r-- x").isLeft)
    assert(validateWhereClause("a >\t1").isLeft)
    assert(validateWhereClause("a > 1\u2028-- x").isLeft)
    assert(validateWhereClause("a > 1\u2029AND b < 2").isLeft)
    assert(validateWhereClause("a > 1 AND b < 2").isRight) // plain spaces fine
  }

  test("where-clause validation catches smuggled DML but allows quoted text") {
    assert(validateWhereClause("status = 'active' AND id > 100").isRight)
    assert(validateWhereClause("name = 'DROP TABLE users'").isRight) // quoted: fine
    assert(validateWhereClause("1=1; DROP TABLE users").isLeft)
    assert(validateWhereClause("id IN (SELECT id FROM t UNION SELECT 1)").isLeft)
    assert(validateWhereClause("0 < (SELECT sleep(10))").isLeft)
  }

  test("dbtableSubquery wraps validated filters") {
    assert(dbtableSubquery("t", None) == Right("t"))
    assert(dbtableSubquery("t", Some("id > 5")) ==
      Right("(SELECT * FROM t WHERE id > 5) AS graft_filtered"))
    assert(dbtableSubquery("t", Some("x; DELETE FROM t")).isLeft)
  }

  test("versioned comments are rejected (MySQL executes their content)") {
    assert(JdbcSupport.validateWhereClause(
      "1=1 /*!UNION SELECT password FROM mysql.user*/").isLeft)
    // ordinary block comments still strip harmlessly
    assert(JdbcSupport.validateWhereClause("a > 1 /* note */ AND b < 2").isRight)
  }

  test("bound type inference: numeric, date, timestamp literals") {
    assert(JdbcSupport.inferBoundType("42.5") == JdbcSupport.NumericBound)
    assert(JdbcSupport.inferBoundType("2020-01-01") == JdbcSupport.DateBound)
    assert(JdbcSupport.inferBoundType("2020-01-01 10:30:00") == JdbcSupport.TimestampBound)
    // a date-partitioned config validates end to end
    assert(JdbcSupport.validateBounds(
      JdbcSupport.inferBoundType("2020-01-01"), "2020-01-01", "2021-01-01", 4).isRight)
  }

  test("dangerous connection properties rejected, case-insensitively") {
    assert(classifyProperty("useSSL").isRight)
    assert(classifyProperty("allowLoadLocalInfile").isLeft)
    assert(classifyProperty("SOCKETFACTORY").isLeft)
    assert(safeProperties(Map("useSSL" -> "true")).isRight)
    assert(safeProperties(Map("allowMultiQueries" -> "true")).isLeft)
  }

  test("partition bounds validated per type") {
    assert(validateBounds(NumericBound, "1", "100", 4).isRight)
    assert(validateBounds(NumericBound, "100", "1", 4).isLeft)
    assert(validateBounds(NumericBound, "abc", "100", 4).isLeft)
    assert(validateBounds(NumericBound, "1", "100", 0).isLeft)
    assert(validateBounds(DateBound, "2020-01-01", "2021-01-01", 2).isRight)
    assert(validateBounds(DateBound, "2020-13-01", "2021-01-01", 2).isLeft)
    assert(validateBounds(TimestampBound, "2020-01-01 00:00:00", "2020-06-01 00:00:00", 2).isRight)
    assert(validateBounds(TimestampBound, "2020-06-01 00:00:00", "2020-01-01 00:00:00", 2).isLeft)
  }

  test("jdbc type codes classify into Spark-partitionable categories") {
    import java.sql.Types
    assert(classifyColumnType(Types.BIGINT, "BIGINT", "id") == Right(NumericBound))
    assert(classifyColumnType(Types.DECIMAL, "DECIMAL", "id") == Right(NumericBound))
    assert(classifyColumnType(Types.DATE, "DATE", "d") == Right(DateBound))
    assert(classifyColumnType(Types.TIMESTAMP, "DATETIME", "ts") == Right(TimestampBound))
    assert(classifyColumnType(Types.TIMESTAMP_WITH_TIMEZONE, "TIMESTAMPTZ", "ts")
      == Right(TimestampBound))
    // VARCHAR/CHAR/BLOB columns cannot drive a partitioned read at all
    val bad = classifyColumnType(Types.VARCHAR, "VARCHAR", "name")
    assert(bad.isLeft && bad.left.exists(_.contains("'name'")))
  }

  test("bounds validated against the DECLARED column type, eagerly") {
    // right literal for the declared type
    assert(validateBoundsForColumn("id", "BIGINT", NumericBound, "1", "100", 4).isRight)
    assert(validateBoundsForColumn("d", "DATE", DateBound,
      "2020-01-01", "2021-01-01", 4).isRight)
    assert(validateBoundsForColumn("ts", "DATETIME", TimestampBound,
      "2020-01-01 00:00:00", "2020-06-01 12:30:45.5", 4).isRight)
    // a DATE literal against a numeric column fails NOW, not inside Spark
    val dn = validateBoundsForColumn("id", "BIGINT", NumericBound,
      "2020-01-01", "2021-01-01", 4)
    assert(dn.isLeft && dn.left.exists(m => m.contains("'id'") && m.contains("BIGINT")))
    // numeric columns take integer literals only (Spark JDBC contract)
    assert(validateBoundsForColumn("id", "DECIMAL", NumericBound, "1.5", "9.5", 4).isLeft)
    // epoch-millis against a temporal column is rejected with the hint
    val em = validateBoundsForColumn("ts", "DATETIME", TimestampBound,
      "1577836800000", "1590969600000", 4)
    assert(em.isLeft && em.left.exists(_.contains("epoch-millisecond")))
    assert(validateBoundsForColumn("d", "DATE", DateBound,
      "1577836800000", "1590969600000", 4).isLeft)
    // a timestamp literal against a DATE column is a mismatch too
    assert(validateBoundsForColumn("d", "DATE", DateBound,
      "2020-01-01 00:00:00", "2021-01-01 00:00:00", 4).isLeft)
    // ordering still enforced under the declared type
    assert(validateBoundsForColumn("id", "BIGINT", NumericBound, "100", "1", 4).isLeft)
    assert(validateBoundsForColumn("ts", "DATETIME", TimestampBound,
      "2020-06-01 00:00:00", "2020-01-01 00:00:00", 4).isLeft)
    assert(validateBoundsForColumn("id", "BIGINT", NumericBound, "1", "100", 0).isLeft)
  }
}
