package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** SQL `MERGE INTO` on graft tables, routed through the library's
  * [[CommitLog.merge]] — merge-on-read first (VERDICT r14 #2).
  *
  * Spark's own path for a DSv2 MERGE is the group-based row-level
  * rewrite: the analyzer's `RewriteMergeIntoTable` (main Resolution
  * batch — it fires before any injectable rule can see the resolved
  * node) turns the statement into a ReplaceData plan that recomputes
  * and REWRITES every scanned file. The library surface already has
  * the better plan: `CommitLog.merge` tries a deletion-vector commit
  * (mask matched rows, append updates/inserts, ONE `add_dv` version,
  * zero data-file rewrite) and falls back to a file-pruned
  * copy-on-write. This extension closes the SQL/library gap by
  * intercepting MERGE at the PARSER — the one extension point that
  * sees the statement before the analyzer rewrite — and emitting a
  * command that translates the parsed clauses to library clauses.
  *
  * Conservative by construction: translation REFUSES anything whose
  * library semantics are not provably identical to Spark's (ambiguous
  * unqualified references, subqueries in clauses,
  * schema evolution, duplicate source keys — legal in SQL
  * when they all land as inserts, refused by the library's ANSI
  * cardinality gate — sources carrying non-target columns when an
  * insert clause exists, partition-column assignment). A refusal runs
  * the ORIGINAL MergeIntoTable through Spark's standard path, so every
  * statement that worked before still works identically.
  * `spark.graft.sql.morMerge.enabled=false` opts out of interception
  * entirely. Reference analog: the reference's upsert is row-granular
  * (/root/reference/index.js:368) — this gives the SQL surface the
  * same no-rewrite write amplification the library user gets.
  */
final class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectParser((_, delegate) => new GraftMergeParser(delegate))
}

/** Delegating parser: identical to Spark's parser except that a
  * top-level MERGE INTO whose target names a graft catalog becomes a
  * [[GraftMorMergeCommand]] (which itself falls back to the original
  * plan whenever translation refuses). */
final class GraftMergeParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case m: MergeIntoTable if GraftMorMerge.interceptEnabled &&
          GraftMorMerge.targetsGraftCatalog(m) =>
        GraftMorMergeCommand(m)
      case p => p
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** The deferred MERGE: translation and eligibility run at EXECUTION
  * time (everything resolvable then); any refusal executes the
  * original parsed MergeIntoTable through Spark's standard analyzer
  * path, bit-identically to a session without the extension. */
final case class GraftMorMergeCommand(m: MergeIntoTable) extends LeafRunnableCommand {
  override def run(spark0: SparkSession): Seq[Row] = {
    try GraftMorMerge.execute(spark0, m)
    catch {
      case GraftMorMerge.Refuse(_) =>
        // Spark's group-based path — exactly what ran before this
        // extension existed (ofRows executes command plans eagerly)
        Bridge.ofRows(spark0, m)
    }
    Seq.empty
  }
}

private[sources] object GraftMorMerge
    extends org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** Translation refusal — NEVER raised after the library merge
    * starts; a caught Refuse means zero table state changed and the
    * standard path can still run the statement. */
  final case class Refuse(why: String) extends Exception(why)
  private def refuse(why: String): Nothing = throw Refuse(why)

  def interceptEnabled: Boolean =
    SparkSession.getActiveSession.forall { sp =>
      sp.conf.getOption("spark.graft.sql.morMerge.enabled")
        .map(_.trim).forall(!_.equalsIgnoreCase("false"))
    }

  /** Parse-time gate (cheap, purely syntactic): the target's head name
    * part is a catalog configured as GraftCatalog. Everything else is
    * checked at execution. */
  def targetsGraftCatalog(m: MergeIntoTable): Boolean = {
    val parts = m.targetTable match {
      case SubqueryAlias(_, u: UnresolvedRelation) => u.multipartIdentifier
      case u: UnresolvedRelation => u.multipartIdentifier
      case _ => return false
    }
    parts.lengthCompare(2) >= 0 && SparkSession.getActiveSession.exists(
      _.conf.getOption(s"spark.sql.catalog.${parts.head}")
        .contains("graft.sources.GraftCatalog"))
  }

  private def ci(a: String, b: String): Boolean = a.equalsIgnoreCase(b)

  def execute(spark: SparkSession, m: MergeIntoTable): Unit = {
    // r16: WITH SCHEMA EVOLUTION translates when its library semantics
    // are PROVABLY Spark's — the library evolves additively from the
    // FULL source schema whenever an insert clause exists
    // (mergedSchema union-by-name), which equals Spark's evolution
    // exactly when every insert is INSERT * (evolution scope = all
    // source columns) and no shared column changes type (the library
    // would widen where Spark's path errors). Anything else falls back.
    val evolve = m.withSchemaEvolution
    if (evolve && (m.notMatchedActions.isEmpty
        || !m.notMatchedActions.forall(_.isInstanceOf[InsertStarAction])))
      refuse("WITH SCHEMA EVOLUTION without INSERT *")

    // ---- target --------------------------------------------------
    val (tParts, tAliasOpt) = m.targetTable match {
      case SubqueryAlias(id, u: UnresolvedRelation) => (u.multipartIdentifier, Some(id.name))
      case u: UnresolvedRelation => (u.multipartIdentifier, None)
      case _ => refuse("unsupported target shape")
    }
    val tAlias = tAliasOpt.getOrElse(tParts.last)
    val catalog = spark.sessionState.catalogManager.catalog(tParts.head) match {
      case c: GraftCatalog => c
      case _ => refuse("not a graft catalog")
    }
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      tParts.drop(1).dropRight(1).toArray, tParts.last)
    val table = catalog.loadTable(ident) match {
      case t: GraftMergeTable if !t.isTimeTravel => t
      case _ => refuse("not a plain graft merge table")
    }
    val path = table.tablePath
    if (!CommitLog.exists(spark, path)) refuse("not a logged table")
    val log = CommitLog(spark, path).withConstraintProps(table.tableProps)
    val targetSchema = log.snapshot().schema.getOrElse(refuse("table has no committed schema"))
    val partCol = table.tableProps.get("merge.partcol").map(_.trim).filter(_.nonEmpty)
    def targetField(name: String): Option[String] =
      targetSchema.fields.map(_.name).find(ci(_, name))

    // ---- source --------------------------------------------------
    val sAlias = m.sourceTable match {
      case SubqueryAlias(id, _) => id.name
      case u: UnresolvedRelation => u.multipartIdentifier.last
      case _ => refuse("unaliased source shape")
    }
    if (ci(sAlias, tAlias)) refuse("source and target share an alias")
    val srcDf = Bridge.ofRows(spark, m.sourceTable)
    val srcCols = srcDf.schema.fieldNames.toSeq
    def sourceField(name: String): Option[String] = srcCols.find(ci(_, name))
    if (evolve) srcDf.schema.fields.foreach { c =>
      targetSchema.fields.find(f => ci(f.name, c.name)).foreach { f =>
        if (CommitLog.stripMeta(f.dataType) != CommitLog.stripMeta(c.dataType))
          refuse("schema evolution with a shared-column type change")
      }
    }
    // the source columns Spark's INSERT-*-scoped evolution appends
    val evolvedNew: Seq[org.apache.spark.sql.types.StructField] =
      if (!evolve) Nil
      else srcDf.schema.fields.toSeq.filter(c => targetField(c.name).isEmpty)

    // ---- ON condition: pure target-key = source-key conjunction ---
    // classify a reference: Left(target column) / Right(source column)
    def classify(parts: Seq[String]): Either[String, String] = parts match {
      case Seq(q, c) if ci(q, tAlias) =>
        Left(targetField(c).getOrElse(refuse(s"unknown target column $c")))
      case Seq(q, c) if ci(q, sAlias) =>
        Right(sourceField(c).getOrElse(refuse(s"unknown source column $c")))
      case Seq(c) => (targetField(c), sourceField(c)) match {
        case (Some(t), None) => Left(t)
        case (None, Some(s)) => Right(s)
        case (Some(_), Some(_)) => refuse(s"ambiguous unqualified reference $c")
        case (None, None) => refuse(s"unknown column $c")
      }
      case _ => refuse(s"unsupported reference ${parts.mkString(".")}")
    }
    val keyPairs: Seq[(String, String)] = splitConjunctivePredicates(m.mergeCondition).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        (classify(a.nameParts), classify(b.nameParts)) match {
          case (Left(t), Right(s)) => (t, s)
          case (Right(s), Left(t)) => (t, s)
          case _ => refuse("ON conjunct is not target-column = source-column")
        }
      case _ => refuse("ON condition is not a pure equality conjunction")
    }
    if (keyPairs.isEmpty || keyPairs.map(_._1).distinct.size != keyPairs.size)
      refuse("ON condition repeats a target key")

    // ---- expression translation to the library's t/s aliases ------
    // mergeStage aliases target "t" and source "s"; rewrite the user's
    // qualifiers onto those. Unqualified names resolve by (exclusive)
    // schema membership; anything ambiguous refuses.
    def requalify(e: Expression, allowTarget: Boolean): Column = {
      if (e.exists(_.isInstanceOf[SubqueryExpression])) refuse("subquery in clause")
      if (e.exists(_.isInstanceOf[UnresolvedStar])) refuse("star in clause expression")
      val rewritten = e.transformUp {
        case ua: UnresolvedAttribute =>
          val parts = ua.nameParts
          val mapped: Seq[String] = parts match {
            case head +: tail if tail.nonEmpty && ci(head, tAlias) => "t" +: tail
            case head +: tail if tail.nonEmpty && ci(head, sAlias) => "s" +: tail
            case head +: tail => (targetField(head), sourceField(head)) match {
              case (Some(_), None) => "t" +: head +: tail
              case (None, Some(_)) => "s" +: head +: tail
              case (Some(_), Some(_)) => refuse(s"ambiguous unqualified reference $head")
              case (None, None) => refuse(s"unknown column $head")
            }
          }
          if (!allowTarget && mapped.head == "t")
            refuse("target reference in a NOT MATCHED clause")
          UnresolvedAttribute(mapped)
      }
      Bridge.column(rewritten)
    }
    // an assignment's LHS: a plain (possibly alias-qualified) TOP-LEVEL
    // target column — nested-field assignment refuses
    def assignTarget(e: Expression): String = e match {
      case ua: UnresolvedAttribute => ua.nameParts match {
        case Seq(q, c) if ci(q, tAlias) =>
          targetField(c).getOrElse(refuse(s"unknown target column $c"))
        case Seq(c) => targetField(c).getOrElse(refuse(s"unknown target column $c"))
        case _ => refuse("nested assignment target")
      }
      case _ => refuse("unsupported assignment target")
    }

    // ---- clauses ---------------------------------------------------
    val matched: Seq[CommitLog.MergeClause] = m.matchedActions.map {
      case UpdateAction(cond, assigns, _) =>
        val set = assigns.map(a => assignTarget(a.key) ->
          requalify(a.value, allowTarget = true)).toMap
        if (set.size != assigns.size) refuse("duplicate assignment targets")
        if (partCol.exists(pc => PartSpec.parse(pc).sourceColumns.exists(c =>
            set.keys.exists(ci(_, c)))))
          refuse("assignment to the partition column")
        CommitLog.WhenMatchedUpdate(set, cond.map(requalify(_, allowTarget = true)))
      case UpdateStarAction(cond) =>
        // UPDATE SET * = every target column from its same-named source
        // column; SQL errors when one is missing, so refusing → the
        // standard path raises the standard error. Under evolution the
        // appended source-only columns update too (they are target
        // columns of the evolved schema).
        val set = (targetSchema.fields.map { f =>
          val s = sourceField(f.name).getOrElse(refuse(s"UPDATE * misses ${f.name}"))
          f.name -> col(s"s.$s")
        } ++ evolvedNew.map(f => f.name -> col(s"s.${f.name}"))).toMap
        if (partCol.exists(pc => PartSpec.parse(pc).sourceColumns.exists(c =>
            set.keys.exists(ci(_, c)))))
          refuse("UPDATE * assigns the partition column")
        CommitLog.WhenMatchedUpdate(set, cond.map(requalify(_, allowTarget = true)))
      case DeleteAction(cond) =>
        CommitLog.WhenMatchedDelete(cond.map(requalify(_, allowTarget = true)))
      case _ => refuse("unsupported matched action")
    }
    val inserts: Seq[CommitLog.MergeClause] = m.notMatchedActions.map {
      case InsertAction(cond, assigns) =>
        val values = assigns.map(a => assignTarget(a.key) ->
          requalify(a.value, allowTarget = false)).toMap
        if (values.size != assigns.size) refuse("duplicate insert targets")
        // SQL requires the INSERT column list to cover EVERY target
        // column; the library would silently fill the gap by source
        // name or null — refusing keeps Spark's standard error
        // (review r15)
        targetSchema.fields.foreach(f =>
          if (!values.keys.exists(ci(_, f.name)))
            refuse(s"INSERT column list misses ${f.name}"))
        CommitLog.WhenNotMatchedInsert(
          cond.map(requalify(_, allowTarget = false)), values)
      case InsertStarAction(cond) =>
        // library insert-* nulls absent columns where SQL errors — only
        // equivalent when every target column exists in the source
        targetSchema.fields.foreach(f =>
          if (sourceField(f.name).isEmpty) refuse(s"INSERT * misses ${f.name}"))
        CommitLog.WhenNotMatchedInsert(
          cond.map(requalify(_, allowTarget = false)), Map.empty)
      case _ => refuse("unsupported not-matched action")
    }
    // r16: NOT MATCHED BY SOURCE clauses — target-only by ANSI; a
    // source reference refuses (the standard path raises the standard
    // resolution error). Translated refs go to the `t.` namespace the
    // library's pre-join evaluation resolves.
    def requalifyTargetOnly(e: Expression): Column = {
      if (e.exists(_.isInstanceOf[SubqueryExpression])) refuse("subquery in clause")
      if (e.exists(_.isInstanceOf[UnresolvedStar])) refuse("star in clause expression")
      val rewritten = e.transformUp {
        case ua: UnresolvedAttribute =>
          val parts = ua.nameParts
          parts match {
            case head +: tail if tail.nonEmpty && ci(head, tAlias) =>
              UnresolvedAttribute("t" +: tail)
            case head +: tail if tail.nonEmpty && ci(head, sAlias) =>
              refuse("source reference in a NOT MATCHED BY SOURCE clause")
            case head +: tail => targetField(head) match {
              case Some(_) => UnresolvedAttribute("t" +: head +: tail)
              case None => refuse(
                if (sourceField(head).isDefined)
                  "source reference in a NOT MATCHED BY SOURCE clause"
                else s"unknown column $head")
            }
          }
      }
      Bridge.column(rewritten)
    }
    val bySource: Seq[CommitLog.MergeClause] = m.notMatchedBySourceActions.map {
      case DeleteAction(cond) =>
        CommitLog.WhenNotMatchedBySourceDelete(cond.map(requalifyTargetOnly))
      case UpdateAction(cond, assigns, _) =>
        val set = assigns.map(a => assignTarget(a.key) ->
          requalifyTargetOnly(a.value)).toMap
        if (set.size != assigns.size) refuse("duplicate assignment targets")
        if (partCol.exists(pc => PartSpec.parse(pc).sourceColumns.exists(c =>
            set.keys.exists(ci(_, c)))))
          refuse("assignment to the partition column")
        CommitLog.WhenNotMatchedBySourceUpdate(set,
          cond.map(requalifyTargetOnly))
      case _ => refuse("unsupported not-matched-by-source action")
    }

    // ---- source preparation + semantic pre-checks ------------------
    // the library joins t.<key> === s.<key>: expose every key under its
    // TARGET name on the source side
    var src = srcDf
    keyPairs.foreach { case (t, s) =>
      if (!ci(t, s)) {
        if (sourceField(t).isDefined) refuse(s"source already has a column named $t")
        src = src.withColumn(t, col(s))
      }
    }
    val keys = keyPairs.map(_._1)
    if (inserts.nonEmpty && !evolve) {
      // CommitLog.merge evolves the schema additively from the source
      // when inserts exist — SQL (without WITH SCHEMA EVOLUTION) must
      // not, so any non-target source column refuses
      src.schema.fieldNames.foreach(c =>
        if (targetField(c).isEmpty) refuse(s"source column $c is not a target column"))
    }
    // ---- analysis-time type check (review r15) ----------------------
    // Spark MERGE enforces ANSI store-assignment on every assignment
    // and boolean-ness on every condition AT ANALYSIS; the library's
    // mergeStage applies a plain Cast, which would silently accept
    // (and null out, under non-ANSI) what the standard path rejects.
    // Resolve every translated expression against EMPTY t/s frames —
    // one analysis pass, zero jobs — and refuse on any incompatibility
    // OR any analysis failure (unresolvable reference, bad function):
    // the fallback then raises the standard error.
    def targetType(name: String): org.apache.spark.sql.types.DataType =
      targetSchema.fields.find(f => ci(f.name, name))
        .orElse(evolvedNew.find(f => ci(f.name, name))) // evolution appends
        .getOrElse(refuse(s"unknown assignment target $name")).dataType
    val checks: Seq[(Column, Option[org.apache.spark.sql.types.DataType])] =
      matched.flatMap {
        case CommitLog.WhenMatchedUpdate(set, c) =>
          set.toSeq.map { case (tc, v) => (v, Some(targetType(tc))) } ++
            c.map(x => (x, None))
        case CommitLog.WhenMatchedDelete(c) => c.map(x => (x, None)).toSeq
        case _ => Nil
      } ++ inserts.flatMap {
        case CommitLog.WhenNotMatchedInsert(c, values) =>
          values.toSeq.map { case (tc, v) => (v, Some(targetType(tc))) } ++
            c.map(x => (x, None))
        case _ => Nil
      } ++ bySource.flatMap {
        case CommitLog.WhenNotMatchedBySourceUpdate(set, c) =>
          set.toSeq.map { case (tc, v) => (v, Some(targetType(tc))) } ++
            c.map(x => (x, None))
        case CommitLog.WhenNotMatchedBySourceDelete(c) =>
          c.map(x => (x, None)).toSeq
        case _ => Nil
      }
    if (checks.nonEmpty) {
      val tProbe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], targetSchema).as("t")
      val sProbe = src.limit(0).as("s")
      val resolvedTypes =
        try tProbe.crossJoin(sProbe)
          .select(checks.zipWithIndex.map { case ((c, _), i) => c.as(s"__c$i") }: _*)
          .schema.fields.map(_.dataType).toSeq
        catch { case scala.util.control.NonFatal(_) =>
          refuse("clause expression does not resolve") }
      checks.zip(resolvedTypes).foreach {
        case ((_, Some(tgt)), vt) =>
          if (!org.apache.spark.sql.catalyst.expressions.Cast
              .canANSIStoreAssign(vt, tgt))
            refuse(s"assignment ${vt.simpleString} -> ${tgt.simpleString} " +
              "is not an ANSI store assignment")
        case ((_, None), vt) =>
          if (vt != org.apache.spark.sql.types.BooleanType)
            refuse("clause condition is not boolean")
      }
    }

    // ---- single evaluation + duplicate-key probe ---------------------
    // the source is materialized ONCE here (review r15): the dup probe
    // below and every job inside the library merge read the same rows
    // — no second evaluation of the user's source plan, and a
    // non-deterministic source cannot pass the probe then fail the
    // library's own gate
    import org.apache.spark.sql.functions.{count => fcount, lit}
    val srcCk = src.localCheckpoint()
    try {
      // duplicate source keys: legal SQL when every duplicate lands as
      // an insert; the library's ANSI cardinality gate would refuse the
      // whole batch — so those statements keep the standard path
      val nonNullKeys = keys.map(col(_).isNotNull).reduce(_ && _)
      val hasDup = srcCk.filter(nonNullKeys).groupBy(keys.map(col): _*)
        .agg(fcount(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count() > 0
      if (hasDup) refuse("duplicate source keys")

      // ---- run the library merge (merge-on-read first) ---------------
      log.merge(srcCk, keys, matched ++ inserts ++ bySource, partCol)
    } finally graft.util.Ckpt.release(srcCk)
  }
}
