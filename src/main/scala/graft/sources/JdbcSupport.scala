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
    */
  def stripQuotedAndComments(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = sql.length
    var state: Char = 'N' // N normal, S 'string', D "string", B `ident`, L line comment, C block comment
    while (i < n) {
      val c = sql.charAt(i)
      state match {
        case 'N' =>
          if (c == '\'') state = 'S'
          else if (c == '"') state = 'D'
          else if (c == '`') state = 'B'
          else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') { state = 'L'; i += 1 }
          else if (c == '#') state = 'L'
          else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') { state = 'C'; i += 1 }
          else out.append(c)
        case 'S' =>
          if (c == '\\') i += 1
          else if (c == '\'') { state = 'N'; out.append(' ') }
        case 'D' =>
          if (c == '\\') i += 1
          else if (c == '"') { state = 'N'; out.append(' ') }
        case 'B' =>
          if (c == '`') { state = 'N'; out.append(' ') }
        case 'L' =>
          if (c == '\n') { state = 'N'; out.append(' ') }
        case 'C' =>
          if (c == '*' && i + 1 < n && sql.charAt(i + 1) == '/') { state = 'N'; out.append(' '); i += 1 }
        case _ => ()
      }
      i += 1
    }
    out.toString
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
    if (where.contains("/*!"))
      return Left("where clause must not contain versioned comments (/*!)")
    val stripped = stripQuotedAndComments(where).toLowerCase(Locale.ROOT)
    if (stripped.contains(";")) Left("where clause must not contain ';'")
    else {
      val words = stripped.split("[^a-z_]+").filter(_.nonEmpty).toSet
      DangerousKeywords.find(words.contains) match {
        case Some(k) => Left(s"where clause contains forbidden keyword: $k")
        case None    => Right(())
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
    * JDBC source accepts all three).
    */
  def inferBoundType(bound: String): BoundType =
    if (scala.util.Try(BigDecimal(bound)).isSuccess) NumericBound
    else if (scala.util.Try(java.time.LocalDate.parse(bound)).isSuccess) DateBound
    else TimestampBound

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
