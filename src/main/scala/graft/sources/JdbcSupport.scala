package graft.sources

import java.util.Locale

/** Pure helpers for the JDBC source path (reference:
  * readers/MySQL.scala:278-373 where-clause hardening,
  * readers/MySQL.scala:455-536 connection-property hardening,
  * readers/jdbc/JdbcPartitionBounds.scala:57-165 bound validation).
  *
  * The actual read is Spark's built-in JDBC source
  * (`spark.read.format("jdbc")` with dbtable = "(SELECT … WHERE …) t" and
  * partitionColumn/lowerBound/upperBound/numPartitions); these functions
  * validate the user-supplied pieces before they reach it. They are pure
  * and fully unit-testable offline.
  */
object JdbcSupport {

  /** Strip string literals, quoted identifiers and comments so keyword
    * scanning can't be fooled by quoted text — a miniature SQL lexer
    * (reference: readers/MySQL.scala:278-341).
    *
    * Three inputs are REJECTED instead of stripped, because stripping
    * would hide content whose server-side parse we cannot predict:
    *
    *  - a backslash inside a `'…'` or `"…"` literal. MySQL's
    *    `NO_BACKSLASH_ESCAPES` sql_mode flips whether `\'` is an escaped
    *    quote or a literal backslash followed by the string terminator —
    *    a lexer that commits to either reading mis-parses on servers
    *    running the other, and the mismatch is an injection vector
    *    (`'\'; DROP …--'` is one string to an escape-honoring lexer and
    *    a terminated string plus live SQL to a `NO_BACKSLASH_ESCAPES`
    *    server). The reference rejects the same way
    *    (readers/MySQL.scala:291-308).
    *  - unterminated quoted text: everything after the orphan quote
    *    would be stripped here but parsed as SQL (or as an error) by the
    *    server.
    *  - an unterminated block comment, for the same reason.
    *
    * Doubled quotes (`''`, `""`, ` `` ` — the sql_mode-independent escape)
    * stay inside the literal.
    */
  def stripQuotedAndComments(sql: String): Either[String, String] = {
    val out = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val q = c
        i += 1
        var closed = false
        while (i < n && !closed) {
          val in = sql.charAt(i)
          if (q != '`' && in == '\\')
            return Left(
              "where clause contains a backslash inside a quoted literal; rejected " +
                "because MySQL NO_BACKSLASH_ESCAPES mode changes how it parses")
          else if (in == q && i + 1 < n && sql.charAt(i + 1) == q) i += 2 // doubled-quote escape
          else if (in == q) { closed = true; i += 1 }
          else i += 1
        }
        if (!closed) return Left("where clause contains unterminated quoted text")
        out.append(' ')
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-' &&
                 (i + 2 >= n || sql.charAt(i + 2).isWhitespace || sql.charAt(i + 2).isControl)) {
        // MySQL line-comment rule (reference readers/MySQL.scala:207-213): `--`
        // opens a comment ONLY when followed by whitespace/control or
        // end-of-input. `a>0--(x)` is the expression `a>0 - -(x)` to MySQL, so
        // the dashes must survive into the stripped output for keyword
        // scanning — stripping them would hide the parenthesized tail.
        i += 2
        while (i < n && sql.charAt(i) != '\n' && sql.charAt(i) != '\r') i += 1
      } else if (c == '#') {
        i += 1
        while (i < n && sql.charAt(i) != '\n' && sql.charAt(i) != '\r') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        var closed = false
        while (i + 1 < n && !closed) {
          if (sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') { closed = true; i += 2 }
          else i += 1
        }
        if (!closed) return Left("where clause contains an unterminated block comment")
        out.append(' ')
      } else {
        out.append(c)
        i += 1
      }
    }
    Right(out.toString)
  }

  private val DangerousKeywords = Seq(
    "insert", "update", "delete", "drop", "alter", "create", "truncate",
    "grant", "revoke", "union", "into", "load_file", "outfile", "sleep",
    "benchmark", "information_schema")

  /** Validate a user-supplied WHERE clause: no statement separators, no
    * comments that survive stripping, no DML/DDL keywords outside quotes.
    *
    * Lexer scope: MySQL dialect (backslash escapes in strings), matching
    * the reference's MySQL source. MySQL *versioned* comments
    * (slash-star-bang) are rejected outright — the server EXECUTES
    * their content, so stripping them like ordinary comments would hide
    * forbidden keywords from the scan.
    */
  def validateWhereClause(where: String): Either[String, Unit] = {
    // Reject control characters (newlines, CRs, null bytes, U+2028/29) before
    // lexing (reference: readers/jdbc/JdbcWhereFilter.scala:32-37): a WHERE
    // clause has no legitimate use for them, and they are exactly the
    // characters comment/line-termination tricks are built from.
    if (where.exists(ch => ch.isControl || ch == '\u2028' || ch == '\u2029'))
      return Left("where clause contains control characters (newlines, null bytes, …); rejected")
    if (where.contains("/*!"))
      return Left("where clause must not contain versioned comments (/*!)")
    stripQuotedAndComments(where).flatMap { s =>
      val stripped = s.toLowerCase(Locale.ROOT)
      if (stripped.contains(";")) Left("where clause must not contain ';'")
      else {
        val words = stripped.split("[^a-z_]+").filter(_.nonEmpty).toSet
        DangerousKeywords.find(words.contains) match {
          case Some(k) => Left(s"where clause contains forbidden keyword: $k")
          case None    => Right(())
        }
      }
    }
  }

  /** Wrap a table + optional validated WHERE into the dbtable subquery
    * Spark's JDBC source pushes down (reference: readers/MySQL.scala:635-651).
    */
  def dbtableSubquery(table: String, where: Option[String]): Either[String, String] =
    where match {
      case None => Right(table)
      case Some(w) =>
        validateWhereClause(w).map(_ => s"(SELECT * FROM $table WHERE $w) AS graft_filtered")
    }

  /** Connection properties that must not be overridable by user config
    * (reference: readers/MySQL.scala:455-536): anything enabling
    * local-file reads, statement multiplexing, or custom socket/stream
    * factories is rejected; unknown keys pass through.
    */
  private val ForbiddenProps = Set(
    "allowloadlocalinfile", "allowmultiqueries", "allowurlinlocalinfile",
    "autodeserialize", "detectcustomcollations", "socketfactory",
    "streaminterceptors", "queryinterceptors", "statementinterceptors")

  def classifyProperty(key: String): Either[String, String] = {
    val k = key.toLowerCase(Locale.ROOT)
    if (ForbiddenProps.contains(k)) Left(s"forbidden jdbc property: $key")
    else Right(key)
  }

  def safeProperties(props: Map[String, String]): Either[String, Map[String, String]] = {
    val bad = props.keys.flatMap(k => classifyProperty(k).left.toOption)
    if (bad.nonEmpty) Left(bad.mkString("; ")) else Right(props)
  }

  sealed trait BoundType
  case object NumericBound extends BoundType
  case object DateBound extends BoundType
  case object TimestampBound extends BoundType

  /** Infer the bound type from the literal's shape, so date/timestamp
    * partition columns validate without explicit type config (Spark's
    * JDBC source accepts all three). When column metadata IS available,
    * prefer `classifyColumnType` + `validateBoundsForColumn` — shape
    * inference cannot catch a literal of the wrong type for the column.
    */
  def inferBoundType(bound: String): BoundType =
    if (scala.util.Try(BigDecimal(bound)).isSuccess) NumericBound
    else if (scala.util.Try(java.time.LocalDate.parse(bound)).isSuccess) DateBound
    else TimestampBound

  /** Classify a `java.sql.Types` code (from `DatabaseMetaData.getColumns`)
    * into the coarse category Spark JDBC supports for partitioned reads
    * (reference: readers/jdbc/JdbcPartitionBounds.scala:57-76). Columns
    * outside numeric/DATE/TIMESTAMP cannot drive a partitioned read at
    * all — rejected here, eagerly, instead of deep inside Spark.
    */
  def classifyColumnType(jdbcType: Int, jdbcTypeName: String,
                         column: String): Either[String, BoundType] = {
    import java.sql.Types
    jdbcType match {
      case Types.TINYINT | Types.SMALLINT | Types.INTEGER | Types.BIGINT |
           Types.FLOAT | Types.REAL | Types.DOUBLE | Types.NUMERIC | Types.DECIMAL =>
        Right(NumericBound)
      case Types.DATE => Right(DateBound)
      case Types.TIMESTAMP | Types.TIMESTAMP_WITH_TIMEZONE => Right(TimestampBound)
      case _ => Left(
        s"partition column '$column' has JDBC type '$jdbcTypeName', which Spark JDBC " +
          "does not support for partitioned reads; use a numeric, DATE, or TIMESTAMP column")
    }
  }

  /** Validate partition bounds against the column's DECLARED type (the
    * metadata-derived hint from `classifyColumnType`), not the literal's
    * shape (reference: readers/jdbc/JdbcPartitionBounds.scala:78-165).
    * This is what makes a DATE literal against a numeric column — or an
    * epoch-millis bound against a TIMESTAMP column — fail eagerly at
    * config time with a typed message, instead of late inside Spark's
    * JDBC partitioning math.
    *
    * Contract per declared type (what Spark's JDBC source actually
    * accepts): numeric columns take integer literals; DATE columns take
    * `yyyy-MM-dd`; TIMESTAMP columns take `yyyy-MM-dd HH:mm:ss[.S…]`
    * (space or 'T'). Callers must pass the column name as reported by
    * the driver metadata — identifier-folding databases report a
    * different case than the user configured, and Spark's quoting needs
    * the reported one.
    */
  def validateBoundsForColumn(column: String, jdbcTypeName: String,
                              declared: BoundType, lower: String, upper: String,
                              numPartitions: Int): Either[String, Unit] = {
    if (numPartitions < 1) return Left(s"numPartitions must be >= 1, got $numPartitions")
    def bad(boundName: String, v: String, expected: String): String =
      s"partition column '$column' has JDBC type '$jdbcTypeName', so $boundName " +
        s"must be $expected; got '$v'" + (declared match {
          case NumericBound => ""
          case _ => " (epoch-millisecond bounds are not supported for temporal columns)"
        })
    def parse(boundName: String, v: String): Either[String, Long] = declared match {
      case NumericBound =>
        scala.util.Try(v.trim.toLong).toOption
          .toRight(bad(boundName, v, "an integer literal"))
      case DateBound =>
        scala.util.Try(java.time.LocalDate.parse(v.trim).toEpochDay).toOption
          .toRight(bad(boundName, v, "a DATE literal (yyyy-MM-dd)"))
      case TimestampBound =>
        scala.util.Try(java.time.LocalDateTime.parse(v.trim.replace(' ', 'T')))
          .map(t => t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L)
          .toOption
          .toRight(bad(boundName, v, "a TIMESTAMP literal (yyyy-MM-dd HH:mm:ss)"))
    }
    for {
      lo <- parse("lowerBound", lower)
      hi <- parse("upperBound", upper)
      _ <- if (lo < hi) Right(())
           else Left(s"lowerBound ('$lower') must be less than upperBound ('$upper') " +
             s"for partition column '$column' ($jdbcTypeName)")
    } yield ()
  }

  /** Validate partition bounds against the partition column's type
    * (reference: readers/jdbc/JdbcPartitionBounds.scala:57-165): bounds
    * must parse for the type and lower < upper.
    */
  def validateBounds(boundType: BoundType, lower: String, upper: String,
                     numPartitions: Int): Either[String, Unit] = {
    if (numPartitions < 1) return Left(s"numPartitions must be >= 1, got $numPartitions")
    def parsed[T](name: String, v: String, p: String => Option[T]): Either[String, T] =
      p(v).toRight(s"$name bound '$v' does not parse as $boundType")
    val cmp: Either[String, Int] = boundType match {
      case NumericBound =>
        for {
          lo <- parsed("lower", lower, (s: String) => scala.util.Try(BigDecimal(s)).toOption)
          hi <- parsed("upper", upper, (s: String) => scala.util.Try(BigDecimal(s)).toOption)
        } yield lo.compare(hi)
      case DateBound =>
        for {
          lo <- parsed("lower", lower, (s: String) => scala.util.Try(java.time.LocalDate.parse(s)).toOption)
          hi <- parsed("upper", upper, (s: String) => scala.util.Try(java.time.LocalDate.parse(s)).toOption)
        } yield lo.compareTo(hi)
      case TimestampBound =>
        def p(s: String) = scala.util.Try(
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))).toOption
        for {
          lo <- parsed("lower", lower, p)
          hi <- parsed("upper", upper, p)
        } yield lo.compareTo(hi)
    }
    cmp.flatMap(c => if (c < 0) Right(()) else Left(s"lower bound must be < upper bound"))
  }
}
