package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.expressions.{CharEntropy, CosineSimilarity, FreqFns, FreqMergeAgg, FreqSketchAgg, FreqTopItems, KllFns, KllMergeAgg, KllQuantile, KllSketchAgg, LshSignature, SqDistFns, SquaredDistance, TokenSetCount, TextVectorFns}

/** Session-extension entry point: makes the engine's native expressions
  * available cluster-wide without per-session registration calls —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * (the production form of `CosineFns.register`; SURVEY §7.4's extension
  * registration tier). Injected at session build, so SQL text, views, and
  * thrift-server clients all resolve the functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_native"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_native"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(SqDistFns.FnName),
      new ExpressionInfo(classOf[SquaredDistance].getName, SqDistFns.FnName),
      exprs => SquaredDistance(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(TextVectorFns.LshFnName),
      new ExpressionInfo(classOf[LshSignature].getName, TextVectorFns.LshFnName),
      TextVectorFns.lshBuilder))
    e.injectFunction((
      FunctionIdentifier(TextVectorFns.TokenSetFnName),
      new ExpressionInfo(classOf[TokenSetCount].getName, TextVectorFns.TokenSetFnName),
      TextVectorFns.tokenSetBuilder))
    e.injectFunction((
      FunctionIdentifier(TextVectorFns.CharEntropyFnName),
      new ExpressionInfo(classOf[CharEntropy].getName, TextVectorFns.CharEntropyFnName),
      TextVectorFns.charEntropyBuilder))
    e.injectFunction((
      FunctionIdentifier(KllFns.SketchFnName),
      new ExpressionInfo(classOf[KllSketchAgg].getName, KllFns.SketchFnName),
      KllFns.sketchBuilder))
    e.injectFunction((
      FunctionIdentifier(KllFns.MergeFnName),
      new ExpressionInfo(classOf[KllMergeAgg].getName, KllFns.MergeFnName),
      KllFns.mergeBuilder))
    e.injectFunction((
      FunctionIdentifier(KllFns.QuantileFnName),
      new ExpressionInfo(classOf[KllQuantile].getName, KllFns.QuantileFnName),
      KllFns.quantileBuilder))
    e.injectFunction((
      FunctionIdentifier(FreqFns.SketchFnName),
      new ExpressionInfo(classOf[FreqSketchAgg].getName, FreqFns.SketchFnName),
      FreqFns.sketchBuilder))
    e.injectFunction((
      FunctionIdentifier(FreqFns.MergeFnName),
      new ExpressionInfo(classOf[FreqMergeAgg].getName, FreqFns.MergeFnName),
      FreqFns.mergeBuilder))
    e.injectFunction((
      FunctionIdentifier(FreqFns.TopFnName),
      new ExpressionInfo(classOf[FreqTopItems].getName, FreqFns.TopFnName),
      FreqFns.topBuilder))
    // Manifest-stat file skipping for warehouse scans: runs in the operator-
    // optimization batch, i.e. BEFORE V2ScanRelationPushDown, so it narrows
    // the file list and parquet pushdown then applies to the survivors.
    e.injectOptimizerRule(_ => graft.catalog.ManifestPruneRule)
    // Merge-on-read: relations whose snapshot carries pending equality
    // deletes swap for the seq-aware anti-joined MOR frame (read side only;
    // write targets stay relations). Runs AFTER ManifestPruneRule in the
    // same fixed point, so the overlay plans from the delete-aware
    // segment-pruned manifest and PushDownPredicates re-pushes the query's
    // filters into the spliced plan on the next iteration.
    e.injectOptimizerRule(_ => graft.catalog.MorReadRule)
    // Metadata-only aggregates: global COUNT(*)/MIN/MAX over an unfiltered
    // warehouse scan collapse to a one-row LocalRelation served from the
    // manifest's row counts / column bounds — zero file opens.
    e.injectOptimizerRule(_ => graft.catalog.StatsAggRule)
    // Variant extractions inside Aggregate move to a Project below it —
    // the shape Spark's variant pushdown absorbs into the scan, and the
    // workaround for 4.1.2's DSv2 agg-over-pushed-filter defect (scaladoc).
    e.injectOptimizerRule(_ => graft.catalog.VariantAggExtractRule)
    // CDC STREAMING window scoping: per trigger, the consumer's Filter on a
    // t$changes stream relation installs stat-domain conjuncts on the
    // stream (observe-only — the plan is never rewritten), so each
    // micro-batch stages readChangesScoped's slice instead of the full
    // window. Spark's own pushdown never runs for streaming relations.
    e.injectOptimizerRule(_ => graft.catalog.CdcStreamScopeRule)
    // SQL MERGE INTO on graft tables → the disposition=merge write path
    // (must run in the resolution batch, before Spark's row-level rewrites
    // reject tables without SupportsRowLevelOperations).
    e.injectResolutionRule(_ => graft.catalog.GraftMergeRule)
    // SQL UPDATE on graft tables → the stat-pruned copy-on-write
    // Warehouse.updateWhere (Spark's own path needs
    // SupportsRowLevelOperations).
    e.injectResolutionRule(_ => graft.catalog.GraftUpdateRule)
    // Persisted SQL views: DDL is claimed at PARSE time (Spark 4.1 rejects
    // view DDL on non-session catalogs before any extension rule runs) and
    // reads substitute the stored SQL at analysis time.
    e.injectParser((session, delegate) =>
      new graft.catalog.GraftViewParser(session, delegate))
    e.injectResolutionRule(session => new graft.catalog.GraftViewSubstitution(session))
    // Row lineage's SQL face: `t$lineage` relations resolve to the
    // loadWithLineage plan (analysis-time substitution — the lineage read
    // is a multi-file plan, not a per-file DSv2 scan).
    e.injectResolutionRule(session => new graft.catalog.LineageRelationRule(session))
    // get_json_object over a VARIANT column resolves to variant_get::string
    // (same null-on-missing contract) — string-era queries keep working
    // after a table adopts parse-once variant storage, and the rewritten
    // form is what Spark's variant pushdown moves into the scan.
    e.injectResolutionRule(_ => graft.catalog.VariantJsonCompatRule)
  }
}
