package graft.sources.jdbc

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema._
import graft.types.SrcType
import scala.collection.mutable

/** Live-DB schema scan via information_schema (S6/S8 + P2; reference:
  * postgres/infoschema.go:42-55,206-483, mysql/infoschema.go:32-46,
  * 180-418).
  *
  * The catalog access is a typed seam (`PgCatalog` / `MySqlCatalog`):
  * production implementations issue the catalog queries through
  * `spark.read.jdbc`; tests supply canned rows — the same seam the
  * reference tests through a mocked SQL driver (infoschema_test.go).
  * Schema assembly is driver-side metadata work (a few KB); only the
  * DATA scan (S7/S9, `JdbcData`) is distributed.
  */
object InfoSchema {

  /** P2: system schemas never migrated (postgres/infoschema.go:206-213). */
  val PgSystemSchemas: Set[String] = Set("information_schema", "postgres",
    "pg_catalog", "pg_temp_1", "pg_toast", "pg_toast_temp_1")

  final case class TableId(schema: String, name: String) {
    /** public tables keep their bare name; others qualify (reference
      * buildTableName). */
    def qualified: String = if (schema == "public") name else s"$schema.$name"
  }

  /** One information_schema.COLUMNS row (+ element type for arrays). */
  final case class ColumnRow(
      name: String,
      dataType: String,
      elementType: Option[String],   // set when dataType == ARRAY
      isNullable: String,            // YES / NO
      hasDefault: Boolean,
      charMaxLen: Option[Long],
      numericPrecision: Option[Long],
      numericScale: Option[Long],
      autoIncrement: Boolean = false)

  final case class ConstraintRow(column: String, constraintType: String)
  final case class FkRow(name: String, column: String,
      referTable: TableId, referColumn: String)
  final case class IndexRow(name: String, column: String, seq: Long,
      unique: Boolean, desc: Boolean)

  /** The catalog seam. */
  trait Catalog {
    def tables(): Seq[TableId]
    def columns(t: TableId): Seq[ColumnRow]
    /** PK + per-column UNIQUE/CHECK constraints, PK cols in ordinal order. */
    def constraints(t: TableId): Seq[ConstraintRow]
    def foreignKeys(t: TableId): Seq[FkRow]
    def indexes(t: TableId): Seq[IndexRow]
  }

  /** Column rows → SrcType (reference toType, infoschema.go:505-533):
    * ARRAY data types take their element type with 1-D bounds; length /
    * precision+scale become mods. */
  def toSrcType(c: ColumnRow): SrcType = {
    val (name, bounds) = c.elementType match {
      case Some(e) if c.dataType == "ARRAY" => (e, 1)
      case _                                => (c.dataType, 0)
    }
    val mods: Seq[Long] = c.charMaxLen match {
      case Some(n) => Seq(n)
      case None => (c.numericPrecision, c.numericScale) match {
        case (Some(p), Some(s)) => Seq(p, s)
        case (Some(p), None)    => Seq(p)
        case _                  => Nil
      }
    }
    SrcType(name, mods, bounds)
  }

  /** Assemble the full source schema from a catalog (S6/S8 core). */
  def readSchema(cat: Catalog,
      systemSchemas: Set[String] = PgSystemSchemas): (Map[String, SourceTable], Seq[String]) = {
    val out = mutable.LinkedHashMap.empty[String, SourceTable]
    cat.tables().filterNot(t => systemSchemas(t.schema)).foreach { tid =>
      val cons = cat.constraints(tid)
      val pkCols = cons.filter(_.constraintType == "PRIMARY KEY").map(_.column)
      val byCol = cons.filterNot(_.constraintType == "PRIMARY KEY")
        .groupBy(_.column)
      val cols = cat.columns(tid).map { c =>
        val colCons = byCol.getOrElse(c.name, Nil).map(_.constraintType)
        SrcColumn(
          name = c.name,
          tpe = toSrcType(c),
          notNull = c.isNullable == "NO" || pkCols.contains(c.name),
          unique = colCons.contains("UNIQUE"),
          ignored = Ignored(
            check = colCons.contains("CHECK"),
            default = c.hasDefault,
            autoIncrement = c.autoIncrement))
      }
      val fks = cat.foreignKeys(tid)
        .groupBy(_.name).toSeq.sortBy(_._1) // deterministic key-name order
        .map { case (name, rows) =>
          SrcForeignKey(name, rows.map(_.column),
            rows.head.referTable.qualified, rows.map(_.referColumn))
        }
      val ixs = cat.indexes(tid)
        .groupBy(_.name).toSeq.sortBy(_._1)
        .map { case (name, rows) =>
          SrcIndex(name, rows.head.unique,
            rows.sortBy(_.seq).map(r => SrcKey(r.column, r.desc)))
        }
      val name = tid.qualified
      out(name) = SourceTable(name, cols.map(_.name),
        cols.map(c => c.name -> c).toMap,
        primaryKeys = pkCols.map(SrcKey(_)),
        foreignKeys = fks,
        indexes = ixs)
    }
    (out.toMap, out.keys.toSeq)
  }
}

/** Production PostgreSQL catalog over spark.read.jdbc. Each method pushes
  * one catalog query to the source DB (reference SQL:
  * postgres/infoschema.go:206-213 tables, :263-270 columns+element_types,
  * :317-325 constraints, :359-382 pg_constraint FKs, :427-445 pg_index). */
final class PgJdbcCatalog(spark: SparkSession, url: String,
    props: java.util.Properties) extends InfoSchema.Catalog {
  import InfoSchema._

  private def q(sql: String): DataFrame =
    spark.read.jdbc(url, s"($sql) AS sub", props)
  private def lit(s: String) = "'" + s.replace("'", "''") + "'"

  def tables(): Seq[TableId] =
    q("""SELECT table_schema, table_name FROM information_schema.tables
         WHERE table_type = 'BASE TABLE'""")
      .collect().map(r => TableId(r.getString(0), r.getString(1))).toSeq

  def columns(t: TableId): Seq[ColumnRow] =
    q(s"""SELECT c.column_name, c.data_type, e.data_type AS element_type,
                 c.is_nullable, c.column_default, c.character_maximum_length,
                 c.numeric_precision, c.numeric_scale, c.ordinal_position
          FROM information_schema.columns c
            LEFT JOIN information_schema.element_types e
              ON ((c.table_catalog, c.table_schema, c.table_name, 'TABLE', c.dtd_identifier)
                = (e.object_catalog, e.object_schema, e.object_name, e.object_type, e.collection_type_identifier))
          WHERE c.table_schema = ${lit(t.schema)} AND c.table_name = ${lit(t.name)}""")
      .collect().sortBy(_.getAs[Number]("ordinal_position").longValue).map(r => ColumnRow(
        name = r.getAs[String]("column_name"),
        dataType = r.getAs[String]("data_type"),
        elementType = Option(r.getAs[String]("element_type")),
        isNullable = r.getAs[String]("is_nullable"),
        hasDefault = r.getAs[String]("column_default") != null,
        charMaxLen = Option(r.getAs[Number]("character_maximum_length")).map(_.longValue),
        numericPrecision = Option(r.getAs[Number]("numeric_precision")).map(_.longValue),
        numericScale = Option(r.getAs[Number]("numeric_scale")).map(_.longValue))).toSeq

  def constraints(t: TableId): Seq[ConstraintRow] =
    q(s"""SELECT k.column_name, tc.constraint_type, k.ordinal_position
          FROM information_schema.table_constraints tc
            JOIN information_schema.key_column_usage k
              ON tc.constraint_name = k.constraint_name
             AND tc.constraint_schema = k.constraint_schema
          WHERE k.table_schema = ${lit(t.schema)} AND k.table_name = ${lit(t.name)}""")
      .collect().sortBy(_.getAs[Number]("ordinal_position").longValue)
      .map(r => ConstraintRow(r.getAs[String]("column_name"),
        r.getAs[String]("constraint_type"))).toSeq

  def foreignKeys(t: TableId): Seq[FkRow] =
    q(s"""SELECT ns2.nspname AS ref_schema, cl2.relname AS ref_table,
                 att2.attname AS column_name, att.attname AS ref_column,
                 con.conname AS constraint_name
          FROM (SELECT unnest(con1.conkey) AS parent, unnest(con1.confkey) AS child,
                       con1.confrelid, con1.conrelid, con1.conname
                FROM pg_class cl JOIN pg_namespace ns ON cl.relnamespace = ns.oid
                  JOIN pg_constraint con1 ON con1.conrelid = cl.oid
                WHERE ns.nspname = ${lit(t.schema)} AND cl.relname = ${lit(t.name)}
                  AND con1.contype = 'f') con
            JOIN pg_attribute att ON att.attrelid = con.confrelid AND att.attnum = con.child
            JOIN pg_class cl2 ON cl2.oid = con.confrelid
            JOIN pg_namespace ns2 ON cl2.relnamespace = ns2.oid
            JOIN pg_attribute att2 ON att2.attrelid = con.conrelid AND att2.attnum = con.parent""")
      .collect().map(r => FkRow(r.getAs[String]("constraint_name"),
        r.getAs[String]("column_name"),
        TableId(r.getAs[String]("ref_schema"), r.getAs[String]("ref_table")),
        r.getAs[String]("ref_column"))).toSeq

  def indexes(t: TableId): Seq[IndexRow] =
    q(s"""SELECT irel.relname AS index_name, a.attname AS column_name,
                 1 + array_position(i.indkey, a.attnum) AS seq,
                 i.indisunique AS is_unique,
                 (i.indoption[array_position(i.indkey, a.attnum)] & 1) = 1 AS is_desc
          FROM pg_index i
            JOIN pg_class crel ON crel.oid = i.indrelid
            JOIN pg_class irel ON irel.oid = i.indexrelid
            JOIN pg_namespace ns ON crel.relnamespace = ns.oid
            JOIN pg_attribute a ON a.attrelid = crel.oid AND a.attnum = ANY(i.indkey)
          WHERE ns.nspname = ${lit(t.schema)} AND crel.relname = ${lit(t.name)}
            AND NOT i.indisprimary""")
      .collect().map(r => IndexRow(r.getAs[String]("index_name"),
        r.getAs[String]("column_name"), r.getAs[Number]("seq").longValue,
        r.getAs[Boolean]("is_unique"), r.getAs[Boolean]("is_desc"))).toSeq
}

/** Production MySQL catalog (reference: mysql/infoschema.go:180-418).
  * MySQL differences: mods come from COLUMN_TYPE (`tinyint(1)`,
  * `decimal(10,2)`), AUTO_INCREMENT arrives in EXTRA, indexes come from
  * information_schema.statistics with SEQ_IN_INDEX / NON_UNIQUE /
  * COLLATION ('D' = descending). */
final class MySqlJdbcCatalog(spark: SparkSession, url: String,
    props: java.util.Properties, dbName: String) extends InfoSchema.Catalog {
  import InfoSchema._

  private def q(sql: String): DataFrame =
    spark.read.jdbc(url, s"($sql) AS sub", props)
  private def lit(s: String) = "'" + s.replace("'", "''") + "'"

  /** `decimal(10,2) unsigned` → mods (10,2); `set('a','b')` → none. */
  private[jdbc] def modsOf(columnType: String): Seq[Long] = {
    val re = """^[a-z]+\((\d+(?:,\d+)*)\)""".r
    re.findFirstMatchIn(columnType.toLowerCase)
      .map(_.group(1).split(",").map(_.toLong).toSeq).getOrElse(Nil)
  }

  def tables(): Seq[TableId] =
    q(s"""SELECT table_schema, table_name FROM information_schema.tables
          WHERE table_type = 'BASE TABLE' AND table_schema = ${lit(dbName)}""")
      .collect().map(r => TableId(r.getString(0), r.getString(1))).toSeq

  def columns(t: TableId): Seq[ColumnRow] =
    q(s"""SELECT column_name, data_type, column_type, is_nullable,
                 column_default, character_maximum_length, numeric_precision,
                 numeric_scale, extra, ordinal_position
          FROM information_schema.columns
          WHERE table_schema = ${lit(t.schema)} AND table_name = ${lit(t.name)}""")
      .collect().sortBy(_.getAs[Number]("ordinal_position").longValue).map { r =>
        val colType = r.getAs[String]("column_type")
        val dataType = r.getAs[String]("data_type")
        ColumnRow(
          name = r.getAs[String]("column_name"),
          dataType = dataType,
          elementType = None,
          isNullable = r.getAs[String]("is_nullable"),
          hasDefault = r.getAs[String]("column_default") != null,
          // COLUMN_TYPE mods win (tinyint(1) is the bool spelling)
          charMaxLen = modsOf(colType).headOption.filter(_ =>
            Set("varchar", "char", "tinyint").contains(dataType)),
          numericPrecision = Option(r.getAs[Number]("numeric_precision")).map(_.longValue)
            .filter(_ => !Set("varchar", "char", "tinyint").contains(dataType)),
          numericScale = Option(r.getAs[Number]("numeric_scale")).map(_.longValue)
            .filter(_ => !Set("varchar", "char", "tinyint").contains(dataType)),
          autoIncrement = Option(r.getAs[String]("extra"))
            .exists(_.toLowerCase.contains("auto_increment")))
      }.toSeq

  def constraints(t: TableId): Seq[ConstraintRow] =
    q(s"""SELECT k.column_name, tc.constraint_type, k.ordinal_position
          FROM information_schema.table_constraints tc
            JOIN information_schema.key_column_usage k
              ON tc.constraint_name = k.constraint_name
             AND tc.constraint_schema = k.constraint_schema
             AND tc.table_name = k.table_name
          WHERE k.table_schema = ${lit(t.schema)} AND k.table_name = ${lit(t.name)}""")
      .collect().sortBy(_.getAs[Number]("ordinal_position").longValue)
      .map(r => ConstraintRow(r.getAs[String]("column_name"),
        r.getAs[String]("constraint_type"))).toSeq

  def foreignKeys(t: TableId): Seq[FkRow] =
    q(s"""SELECT constraint_name, column_name, referenced_table_schema,
                 referenced_table_name, referenced_column_name
          FROM information_schema.key_column_usage
          WHERE table_schema = ${lit(t.schema)} AND table_name = ${lit(t.name)}
            AND referenced_table_name IS NOT NULL
          ORDER BY constraint_name, ordinal_position""")
      .collect().map(r => FkRow(r.getAs[String]("constraint_name"),
        r.getAs[String]("column_name"),
        TableId(r.getAs[String]("referenced_table_schema"),
          r.getAs[String]("referenced_table_name")),
        r.getAs[String]("referenced_column_name"))).toSeq

  def indexes(t: TableId): Seq[IndexRow] =
    q(s"""SELECT index_name, column_name, seq_in_index, non_unique, collation
          FROM information_schema.statistics
          WHERE table_schema = ${lit(t.schema)} AND table_name = ${lit(t.name)}
            AND index_name != 'PRIMARY'""")
      .collect().map(r => IndexRow(r.getAs[String]("index_name"),
        r.getAs[String]("column_name"),
        r.getAs[Number]("seq_in_index").longValue,
        r.getAs[Number]("non_unique").longValue == 0,
        r.getAs[String]("collation") == "D")).toSeq
}

/** S7/S9 + C13: the distributed data scan. Spark's JDBC source reads each
  * table partitioned (the parallelism the reference's serial per-table
  * loop lacks, whitepaper.md:53-63); JDBC rows arrive already typed, so
  * C13's residual work is cast + rename to the Spanner plan. */
object JdbcData {

  /** Partitioned table read (numPartitions-way on partitionCol when the
    * caller knows a numeric key; single-stream otherwise).
    *
    * Bounds discipline: Spark's stride partitioning is only as good as its
    * lower/upper bounds — a fixed guess like [0, 2^40) puts a serial PK
    * topping out at a few million entirely inside stride 0 while the other
    * N-1 partitions issue empty-range queries, silently serializing the
    * read (rows are never lost; parallelism is). So when the caller does
    * not supply `bounds`, we pay ONE cheap `SELECT MIN, MAX` probe (the
    * standard Sqoop/Spark pattern) and derive explicit per-partition WHERE
    * predicates that are non-degenerate by construction: every range
    * intersects the probed [min, max], the first predicate is unbounded
    * below and catches NULL keys, the last is unbounded above so rows
    * inserted after the probe still land somewhere. Empty tables and
    * single-valued keys fall back to a single-stream read. */
  def readTable(spark: SparkSession, url: String, props: java.util.Properties,
      table: String, partitionCol: Option[String] = None,
      numPartitions: Int = 8, bounds: Option[(Long, Long)] = None): DataFrame =
    partitionCol match {
      case Some(c) =>
        bounds.orElse(probeBounds(spark, url, props, table, c)) match {
          case Some((lo, hi)) =>
            val preds = partitionPredicates(c, lo, hi, numPartitions)
            if (preds.isEmpty) spark.read.jdbc(url, table, props)
            else spark.read.jdbc(url, table, preds.toArray, props)
          case None => spark.read.jdbc(url, table, props) // empty table
        }
      case None => spark.read.jdbc(url, table, props)
    }

  /** One-row MIN/MAX probe over the partition column — the bound source
    * for [[readTable]] when the caller has none. Runs through the same
    * JDBC session config as the data read; `table` may itself be a
    * derived-table expression (the S9 spatial projection), every dialect
    * in scope nests those. None ⇔ the table has no non-NULL keys. */
  def probeBounds(spark: SparkSession, url: String,
      props: java.util.Properties, table: String, col: String): Option[(Long, Long)] = {
    val probe =
      s"(SELECT MIN($col) AS graft_lo, MAX($col) AS graft_hi FROM $table) AS graft_bounds"
    val row = spark.read.jdbc(url, probe, props).collect()(0)
    (row.get(0), row.get(1)) match {
      case (lo: Number, hi: Number) => Some((clampToLong(lo), clampToLong(hi)))
      case _                        => None
    }
  }

  /** Narrow a probed MIN/MAX to Long SATURATING, never wrapping: MySQL
    * BIGINT UNSIGNED and wide DECIMAL PKs come back as BigDecimal, and
    * `Number.longValue` on a value past Long.MaxValue wraps NEGATIVE —
    * inverting the bounds and failing the whole read that the old
    * fixed-stride default handled (merely lopsidedly). Clamped bounds
    * stay correct by the same argument as caller-supplied narrow
    * bounds: the first/last partition predicates are unbounded
    * outward, so rows beyond the clamp still land somewhere. */
  private[jdbc] def clampToLong(n: Number): Long = n match {
    case b: java.math.BigDecimal =>
      if (b.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) > 0) Long.MaxValue
      else if (b.compareTo(java.math.BigDecimal.valueOf(Long.MinValue)) < 0) Long.MinValue
      else b.longValue
    case b: java.math.BigInteger =>
      if (b.compareTo(java.math.BigInteger.valueOf(Long.MaxValue)) > 0) Long.MaxValue
      else if (b.compareTo(java.math.BigInteger.valueOf(Long.MinValue)) < 0) Long.MinValue
      else b.longValue
    case d: java.lang.Double =>
      // floating PKs are unusual but legal probe outputs; Double→Long
      // saturates in the JVM spec already, make it explicit anyway
      if (d >= Long.MaxValue.toDouble) Long.MaxValue
      else if (d <= Long.MinValue.toDouble) Long.MinValue
      else d.longValue
    case other => other.longValue // Byte/Short/Int/Long: always in range
  }

  /** Explicit partition predicates over integer key range [lo, hi]:
    * `requested` clamped to the key-span so no partition's range is empty,
    * boundaries evenly spread (BigInt math — a full-Long span must not
    * overflow), first predicate also admits NULL keys (Spark's own stride
    * partitioner does the same), first/last unbounded outward. Empty
    * result means "don't partition" (span 1, or requested ≤ 1). */
  def partitionPredicates(col: String, lo: Long, hi: Long, requested: Int): Seq[String] = {
    require(hi >= lo, s"bounds inverted: [$lo, $hi]")
    val span = BigInt(hi) - BigInt(lo) + 1
    val n = span.min(BigInt(math.max(1, requested))).toInt
    if (n <= 1) return Seq.empty
    val cuts = (1 until n).map(i => (BigInt(lo) + span * i / n).toLong)
    val first = s"$col < ${cuts.head} OR $col IS NULL"
    val middle = cuts.sliding(2).collect {
      case Seq(a, b) => s"$col >= $a AND $col < $b"
    }.toSeq
    val last = s"$col >= ${cuts.last}"
    (first +: middle) :+ last
  }

  /** S9: MySQL spatial types whose default SELECT form is WKB bytes that
    * would miscast downstream (reference: mysql/mysqldump.go:41). */
  val MySqlSpatialTypes: Set[String] = Set("geometrycollection", "multipoint",
    "multilinestring", "multipolygon", "point", "linestring", "polygon",
    "geometry")

  private def bq(id: String): String = "`" + id.replace("`", "``") + "`"

  private def isSpatial(typeName: String): Boolean =
    MySqlSpatialTypes.exists(typeName.toLowerCase.contains)

  /** S9 column list (reference buildColNameList, mysql/infoschema.go:
    * 119-137): spatial columns are projected through ST_AsText so they
    * arrive as WKT text; every name is backtick-quoted (reserved words,
    * embedded spaces). Input: (columnName, sourceTypeName) in ordinal
    * order. */
  def mySqlColProjection(cols: Seq[(String, String)]): String =
    cols.map { case (name, tpe) =>
      val q = bq(name)
      if (isSpatial(tpe)) s"ST_AsText($q) AS $q" else q
    }.mkString(", ")

  /** S9: MySQL data scan honoring spatial columns. Tables without spatial
    * columns read by bare name — the cheap path, keeping Spark's full
    * filter/pruning pushdown against the table itself; tables with one
    * read through the explicit projection so geometry arrives as WKT
    * STRING (the type the plan mapped it to) instead of WKB bytes. */
  def readMySqlTable(spark: SparkSession, url: String,
      props: java.util.Properties, table: SourceTable,
      partitionCol: Option[String] = None, numPartitions: Int = 8,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    val colsTypes = table.colNames.map(c => c -> table.colDefs(c).tpe.name)
    val qualified = table.name.split("\\.", 2) match {
      case Array(db, t) => bq(db) + "." + bq(t)
      case _            => bq(table.name)
    }
    val dbtable =
      if (colsTypes.exists { case (_, t) => isSpatial(t) })
        s"(SELECT ${mySqlColProjection(colsTypes)} FROM $qualified) AS sub"
      else qualified
    readTable(spark, url, props, dbtable, partitionCol, numPartitions, bounds)
  }

  /** C13 (postgres/infoschema.go:535-613 cvtSQLScalar, Spark-shaped):
    * project typed JDBC columns onto the Spanner schema — rename to
    * Spanner names, cast to the target Spark types (float→int truncates
    * via cast, numerics land as DECIMAL(38,9), dates/timestamps pass
    * through typed). */
  def toSpanner(df: DataFrame, plan: SchemaConverter.ConversionPlan,
      srcTable: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spName = plan.toSpannerTable(srcTable)
    val sp = plan.spSchema(spName)
    val colMap = plan.toSpannerCols(srcTable)
    val cols = df.columns.toSeq.filter(colMap.contains).map { c =>
      val spCol = colMap(c)
      col(c).cast(sp.colDefs(spCol).t.sparkType).as(spCol)
    }
    df.select(cols: _*)
  }
}
