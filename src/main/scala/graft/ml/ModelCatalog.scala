package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.algo.GraphSage
import graft.io.SnapshotStore
import scala.collection.concurrent.TrieMap

/** Named model catalog (reference: core/src/main/java/org/neo4j/gds/core/
  * model/ModelCatalog.java + `gds.beta.model.list/exists/drop` and
  * `gds.alpha.model.store/load` in
  * doc/asciidoc/operations-reference/model-operation-references.adoc).
  *
  * Registry is driver-local (models are tiny — weight vectors, a few KB);
  * persistence rides [[graft.io.SnapshotStore]]: each `store` commits the
  * model as an atomic versioned snapshot of a flat parameter table
  * (section, i, j, v, s), so a catalog directory is inspectable with plain
  * parquet tooling and a partially-written store is never visible. */
object ModelCatalog {

  final case class ModelInfo(name: String, modelType: String,
                             creationMillis: Long, meta: Map[String, String])

  /** Flat parameter row: dense tensors land as (section, i, j, v);
    * scalars/strings as (section, 0, 0, v, s). */
  final case class ParamRow(section: String, i: Long, j: Long, v: Double, s: String)

  private val registry = TrieMap.empty[String, (ModelInfo, AnyRef)]

  /** Fixed registration time source for deterministic tests: tests may set
    * this; production leaves it at the wall clock. */
  @volatile var clock: () => Long = () => System.currentTimeMillis()

  def set(name: String, model: AnyRef, meta: Map[String, String] = Map.empty): ModelInfo = {
    val info = ModelInfo(name, typeOf(model), clock(), meta)
    registry.put(name, (info, model))
    info
  }

  def exists(name: String): Boolean = registry.contains(name)

  def list(): Seq[ModelInfo] = registry.values.map(_._1).toSeq.sortBy(_.name)

  def drop(name: String): Boolean = registry.remove(name).isDefined

  def dropAll(): Unit = registry.clear()

  def get[M <: AnyRef](name: String): M =
    registry.get(name) match {
      case Some((_, m)) => m.asInstanceOf[M]
      case None => throw new NoSuchElementException(s"Model not in catalog: $name")
    }

  def info(name: String): ModelInfo =
    registry.get(name).map(_._1)
      .getOrElse(throw new NoSuchElementException(s"Model not in catalog: $name"))

  /** Persist a cataloged model under `dir/<name>` as the next snapshot. */
  def store(spark: SparkSession, name: String, dir: String): SnapshotStore.Snapshot = {
    val (inf, model) = registry.getOrElse(name,
      throw new NoSuchElementException(s"Model not in catalog: $name"))
    import spark.implicits._
    val df: DataFrame = spark.createDataset(encode(model)).toDF()
      .repartition(1) // a model is a few KB — one part file
    SnapshotStore.commit(df, s"$dir/$name", Map(
      "modelName" -> inf.name, "modelType" -> inf.modelType,
      "creationMillis" -> inf.creationMillis.toString) ++
      inf.meta.map { case (k, v) => s"meta:$k" -> v })
  }

  /** `gds.alpha.model.delete`: remove every STORED snapshot of `name`
    * under `dir` (reference ModelDeleteProc — disk only; the in-catalog
    * registration is `drop`'s job). Returns whether anything was deleted. */
  def deleteStored(name: String, dir: String): Boolean = {
    val d = new java.io.File(s"$dir/$name")
    val existed = d.exists()
    if (existed) org.apache.commons.io.FileUtils.deleteQuietly(d)
    existed
  }

  /** Load the latest stored snapshot of `name` from `dir` and register it. */
  def load(spark: SparkSession, name: String, dir: String): ModelInfo = {
    val snap = SnapshotStore.latest(s"$dir/$name")
      .getOrElse(throw new NoSuchElementException(s"No stored model at $dir/$name"))
    import spark.implicits._
    val rows = spark.read.parquet(snap.dataPath).as[ParamRow].collect()
    val modelType = snap.meta("modelType")
    val model = decode(modelType, rows)
    val info = ModelInfo(
      snap.meta.getOrElse("modelName", name), modelType,
      snap.meta.get("creationMillis").map(_.toLong).getOrElse(clock()),
      snap.meta.collect { case (k, v) if k.startsWith("meta:") => k.drop(5) -> v })
    registry.put(name, (info, model))
    info
  }

  private def typeOf(model: AnyRef): String = model match {
    case _: LogisticRegression.LrModel   => "LogisticRegression"
    case _: NodeClassification.NcModel   => "NodeClassification"
    case _: LinkPrediction.LinkModel     => "LinkPrediction"
    case _: LinkPipeline.PipelineModel   => "LinkPipeline"
    case _: GraphSage.GraphSageModel     => "GraphSage"
    case m => throw new IllegalArgumentException(s"Unsupported model type: ${m.getClass}")
  }

  // --- flat-table codecs (model classes are plain parameter holders) ---

  private def lrRows(prefix: String, m: LogisticRegression.LrModel): Seq[ParamRow] =
    m.weights.zipWithIndex.map { case (w, i) => ParamRow(s"$prefix/w", i, 0, w, "") } ++
      Seq(ParamRow(s"$prefix/bias", 0, 0, m.bias, "")) ++
      m.losses.zipWithIndex.map { case (l, i) => ParamRow(s"$prefix/loss", i, 0, l, "") }

  private def lrFrom(prefix: String, rows: Seq[ParamRow]): LogisticRegression.LrModel = {
    val bySec = rows.filter(_.section.startsWith(prefix + "/")).groupBy(_.section)
    def vec(sec: String): Array[Double] =
      bySec.getOrElse(s"$prefix/$sec", Seq.empty).sortBy(_.i).map(_.v).toArray
    LogisticRegression.LrModel(vec("w"), vec("bias").headOption.getOrElse(0.0),
      vec("loss").toSeq)
  }

  private def matRows(sec: String, m: Array[Array[Double]]): Seq[ParamRow] =
    for (i <- m.indices; j <- m(i).indices) yield ParamRow(sec, i, j, m(i)(j), "")

  private def matFrom(sec: String, rows: Seq[ParamRow]): Array[Array[Double]] = {
    val rs = rows.filter(_.section == sec)
    if (rs.isEmpty) Array.empty
    else {
      val out = Array.ofDim[Double](rs.map(_.i).max.toInt + 1, rs.map(_.j).max.toInt + 1)
      rs.foreach(r => out(r.i.toInt)(r.j.toInt) = r.v)
      out
    }
  }

  private[graft] def encode(model: AnyRef): Seq[ParamRow] = model match {
    case m: LogisticRegression.LrModel => lrRows("lr", m)
    case m: NodeClassification.NcModel =>
      m.classes.zipWithIndex.map { case (c, i) => ParamRow("classes", i, 0, c.toDouble, "") } ++
        Seq(ParamRow("trainAccuracy", 0, 0, m.trainAccuracy, ""),
            ParamRow("testAccuracy", 0, 0, m.testAccuracy, ""),
            ParamRow("winner", 0, 0, m.winner.toDouble, "")) ++
        m.validationStats.flatMap(s => Seq(
          ParamRow("vstat/avg", s.candidate.toLong, 0, s.avg, ""),
          ParamRow("vstat/min", s.candidate.toLong, 0, s.min, ""),
          ParamRow("vstat/max", s.candidate.toLong, 0, s.max, ""))) ++
        m.holdoutMetrics.toSeq.sortBy(_._1).map { case (k, v) =>
          ParamRow("metric", 0, 0, v, k) } ++
        m.classes.flatMap(c => lrRows(s"cls:$c", m.models(c)))
    case m: LinkPrediction.LinkModel =>
      Seq(ParamRow("combiner", 0, 0, 0.0, m.combiner.toString),
          ParamRow("dims", 0, 0, m.dims.toDouble, ""),
          ParamRow("trainAccuracy", 0, 0, m.trainAccuracy, ""),
          ParamRow("testAccuracy", 0, 0, m.testAccuracy, "")) ++ lrRows("lr", m.model)
    case m: LinkPipeline.PipelineModel =>
      // the stored artifact is the WINNING model plus the replayable recipe
      // (node-property + feature steps + split); the candidate search space
      // is not persisted — matching the reference, which stores the trained
      // winner (pipeline/LinkPredictionTrain.java model selection)
      Seq(ParamRow("pipelineName", 0, 0, 0.0, m.pipeline.name),
          ParamRow("dims", 0, 0, m.dims.toDouble, ""),
          ParamRow("winner", 0, 0, m.winner.toDouble, ""),
          ParamRow("trainAccuracy", 0, 0, m.trainAccuracy, ""),
          ParamRow("testAccuracy", 0, 0, m.testAccuracy, ""),
          ParamRow("splitTest", 0, 0, m.pipeline.split.testFraction, ""),
          ParamRow("splitRatio", 0, 0, m.pipeline.split.negativeSamplingRatio, ""),
          ParamRow("splitSeed", 0, 0, m.pipeline.split.seed.toDouble, "")) ++
        m.candidateTestAcc.zipWithIndex.map { case (a, i) =>
          ParamRow("candAcc", i, 0, a, "") } ++
        m.pipeline.nodePropertySteps.zipWithIndex.map { case (s, i) =>
          ParamRow("npstep", i, 0, 0.0,
            s"${s.proc}|${s.mutateProperty}|" +
              s.config.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")) } ++
        m.pipeline.featureSteps.zipWithIndex.map { case (s, i) =>
          ParamRow("feature", i, 0, 0.0,
            s"${s.combiner}|${s.nodeProperties.mkString(",")}") } ++
        lrRows("lr", m.model)
    case m: GraphSage.GraphSageModel =>
      Seq(ParamRow("inputDim", 0, 0, m.inputDim.toDouble, "")) ++
        m.layers.zipWithIndex.flatMap { case (l, k) =>
          matRows(s"layer$k/wSelf", l.wSelf) ++ matRows(s"layer$k/wNeigh", l.wNeigh) ++
            l.bias.zipWithIndex.map { case (b, i) => ParamRow(s"layer$k/bias", i, 0, b, "") }
        }
    case m => throw new IllegalArgumentException(s"Unsupported model type: ${m.getClass}")
  }

  private[graft] def decode(modelType: String, rows: Seq[ParamRow]): AnyRef = modelType match {
    case "LogisticRegression" => lrFrom("lr", rows)
    case "NodeClassification" =>
      val classes = rows.filter(_.section == "classes").sortBy(_.i).map(_.v.toLong)
      def scalar(sec: String) = rows.find(_.section == sec).map(_.v).getOrElse(0.0)
      def vstatPart(part: String): Map[Long, Double] =
        rows.filter(_.section == s"vstat/$part").map(r => r.i -> r.v).toMap
      val (avgs, mins, maxs) = (vstatPart("avg"), vstatPart("min"), vstatPart("max"))
      val vstats = avgs.keys.toSeq.sorted.map(ci =>
        NodeClassification.CandidateStats(ci.toInt, avgs(ci), mins(ci), maxs(ci)))
      val metrics = rows.filter(_.section == "metric").map(r => r.s -> r.v).toMap
      NodeClassification.NcModel(classes.toSeq,
        classes.map(c => c -> lrFrom(s"cls:$c", rows)).toMap,
        scalar("trainAccuracy"), scalar("testAccuracy"),
        scalar("winner").toInt, vstats, metrics)
    case "LinkPrediction" =>
      def scalar(sec: String) = rows.find(_.section == sec).map(_.v).getOrElse(0.0)
      val combiner = rows.find(_.section == "combiner").map(_.s).getOrElse("Hadamard") match {
        case "L2"     => LinkPrediction.Combiner.L2
        case "Cosine" => LinkPrediction.Combiner.Cosine
        case _        => LinkPrediction.Combiner.Hadamard
      }
      LinkPrediction.LinkModel(lrFrom("lr", rows), combiner,
        scalar("dims").toInt, scalar("trainAccuracy"), scalar("testAccuracy"))
    case "LinkPipeline" =>
      def scalar(sec: String) = rows.find(_.section == sec).map(_.v).getOrElse(0.0)
      def combinerOf(s: String) = s match {
        case "L2"     => LinkPrediction.Combiner.L2
        case "Cosine" => LinkPrediction.Combiner.Cosine
        case _        => LinkPrediction.Combiner.Hadamard
      }
      val steps = rows.filter(_.section == "npstep").sortBy(_.i).map { r =>
        val Array(proc, prop, cfg) = (r.s + "| ").split("\\|", 3)
        LinkPipeline.NodePropertyStep(proc, prop,
          cfg.trim.split(",").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap)
      }
      val feats = rows.filter(_.section == "feature").sortBy(_.i).map { r =>
        val Array(c, ps) = r.s.split("\\|", 2)
        LinkPipeline.FeatureStep(combinerOf(c), ps.split(",").toSeq)
      }
      val pipe = LinkPipeline.Pipeline(
        rows.find(_.section == "pipelineName").map(_.s).getOrElse(""),
        steps.toSeq, feats.toSeq,
        LinkPipeline.SplitCfg(scalar("splitTest"), scalar("splitRatio"),
          scalar("splitSeed").toLong))
      LinkPipeline.PipelineModel(pipe, lrFrom("lr", rows),
        scalar("dims").toInt, scalar("winner").toInt,
        rows.filter(_.section == "candAcc").sortBy(_.i).map(_.v).toSeq,
        scalar("trainAccuracy"), scalar("testAccuracy"))
    case "GraphSage" =>
      val inputDim = rows.find(_.section == "inputDim").map(_.v.toInt).getOrElse(0)
      val layerIds = rows.flatMap(r => "^layer(\\d+)/".r.findFirstMatchIn(r.section)
        .map(_.group(1).toInt)).distinct.sorted
      GraphSage.GraphSageModel(layerIds.map { k =>
        GraphSage.Layer(matFrom(s"layer$k/wSelf", rows), matFrom(s"layer$k/wNeigh", rows),
          rows.filter(_.section == s"layer$k/bias").sortBy(_.i).map(_.v).toArray)
      }.toSeq, inputDim)
    case t => throw new IllegalArgumentException(s"Unknown stored model type: $t")
  }
}
