package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, PropertyGraph}

/** GraphSAGE inductive node embeddings (Hamilton et al., "Inductive
  * Representation Learning on Large Graphs").
  *
  * Reference: algo/src/main/java/org/neo4j/gds/embeddings/graphsage/
  * {GraphSage.java,GraphSageModelTrainer.java,Aggregator.java} — mean
  * aggregator, sigmoid activation, unsupervised skip-gram loss with
  * negative sampling, trained per-batch in a single JVM.
  *
  * Spark split of responsibilities (the shape that survives 100 TB):
  *
  *  - TRAIN fits a few KB of weights. Like the reference — which trains on
  *    batches, never the full graph — we fit on a bounded DETERMINISTIC
  *    sample (min-xxhash top-`sampleNodes` vertices + their induced edges)
  *    collected to the driver, with exact full-batch backprop through the
  *    mean-aggregator layers. No cluster resource is spent shipping
  *    gradients for a model that fits in a cache line; the sample is
  *    hash-stable so training is reproducible at any parallelism.
  *  - PREDICT (the part that actually touches all data) is a fully
  *    distributed layer-wise forward pass: neighbour means are
  *    posexplode/(dst, dim)-aggregations — the same dimension-salted
  *    shuffle as FastRP, so power-law hubs spread over `d` sub-keys — and
  *    the dense layer is a static unrolled expression per output dimension
  *    (weights inlined as literals into whole-stage codegen). Inference
  *    over any number of nodes is one scan + K joins, model never moves.
  */
object GraphSage {

  /** Reference defaults: GraphSageTrainConfig.java (aggregator MEAN,
    * activation SIGMOID, embeddingDimension 64, negative samples 20). */
  final case class GraphSageConfig(
    embeddingDimension: Int = 16,
    hiddenDimension: Int = 16,
    layers: Int = 2,
    epochs: Int = 60,
    learningRate: Double = 0.1,
    negativeSamples: Int = 5,
    sampleNodes: Int = 2000,
    seed: Long = 42L)

  /** One dense layer: out = sigmoid(wSelf·h + wNeigh·mean + bias),
    * wSelf/wNeigh are (dOut x dIn) row-major. */
  final case class Layer(wSelf: Array[Array[Double]],
                         wNeigh: Array[Array[Double]],
                         bias: Array[Double])

  final case class GraphSageModel(layers: Seq[Layer], inputDim: Int)

  final case class Result(embeddings: DataFrame, model: GraphSageModel,
                          losses: Seq[Double])

  private def sigm(x: Double): Double = 1.0 / (1.0 + math.exp(-math.max(-30.0, math.min(30.0, x))))

  // ---------------------------------------------------------------- train

  /** Deterministic bounded sample: the `sampleNodes` vertices with the
    * smallest xxhash64(id, seed), their features, and induced edges. */
  private def collectSample(graph: PropertyGraph, featureProperty: String,
                            cfg: GraphSageConfig): (Array[Long], Map[Long, Array[Double]], Map[Long, Array[Long]]) = {
    val sampled = graph.vertices
      .select(col("id"), col(featureProperty).cast("array<double>").as("f"),
        xxhash64(col("id"), lit(cfg.seed)).as("__h"))
      .orderBy("__h").limit(cfg.sampleNodes)
      .select("id", "f").collect()
    val ids = sampled.map(_.getLong(0))
    val feats = sampled.map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
    val idSet = ids.toSet
    val spark = graph.edges.sparkSession
    import spark.implicits._
    val idsDf = spark.createDataset(ids).toDF("id")
    val induced = graph.edges.select("src", "dst")
      .join(broadcast(idsDf.withColumnRenamed("id", "src")), "src")
      .join(broadcast(idsDf.withColumnRenamed("id", "dst")), "dst")
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val adj = induced.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted }
    (ids, feats, adj.filter { case (k, _) => idSet(k) })
  }

  /** Full-batch forward + backprop + skip-gram loss on the driver sample. */
  def train(graph: PropertyGraph, featureProperty: String,
            cfg: GraphSageConfig = GraphSageConfig()): (GraphSageModel, Seq[Double]) = {
    val (ids, feats, adj) = collectSample(graph, featureProperty, cfg)
    require(ids.nonEmpty, "empty training sample")
    val d0 = feats(ids.head).length
    val dims = Seq(d0) ++ Seq.fill(cfg.layers - 1)(cfg.hiddenDimension) :+ cfg.embeddingDimension

    // deterministic Xavier-ish init from hash bits
    def initMat(rows: Int, cols: Int, tag: Long): Array[Array[Double]] = {
      val scale = math.sqrt(6.0 / (rows + cols))
      Array.tabulate(rows, cols) { (i, j) =>
        val h = scala.util.hashing.MurmurHash3.productHash((cfg.seed, tag, i, j))
        (h.toDouble / Int.MaxValue) * scale
      }
    }
    var layers = (0 until cfg.layers).map { k =>
      Layer(initMat(dims(k + 1), dims(k), 2L * k),
        initMat(dims(k + 1), dims(k), 2L * k + 1),
        new Array[Double](dims(k + 1)))
    }.toArray

    val n = ids.length
    val idx = ids.zipWithIndex.toMap
    val neigh: Array[Array[Int]] = ids.map(v => adj.getOrElse(v, Array.empty[Long])
      .filter(idx.contains).map(idx))
    val x: Array[Array[Double]] = ids.map(feats)
    val posPairs: Array[(Int, Int)] = ids.indices.flatMap(i =>
      neigh(i).map(j => (i, j))).toArray
    val rng = new scala.util.Random(cfg.seed)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]

    for (_ <- 1 to cfg.epochs) {
      // forward all layers, keep activations
      val h = Array.ofDim[Array[Array[Double]]](cfg.layers + 1)
      val means = Array.ofDim[Array[Array[Double]]](cfg.layers)
      h(0) = x
      for (k <- 0 until cfg.layers) {
        val dIn = dims(k); val dOut = dims(k + 1); val L = layers(k)
        means(k) = Array.tabulate(n) { i =>
          val m = new Array[Double](dIn)
          val ns = neigh(i)
          if (ns.nonEmpty) {
            ns.foreach(j => { val hj = h(k)(j); var t = 0
              while (t < dIn) { m(t) += hj(t); t += 1 } })
            var t = 0; while (t < dIn) { m(t) /= ns.length; t += 1 }
          }
          m
        }
        h(k + 1) = Array.tabulate(n) { i =>
          val out = new Array[Double](dOut)
          var j = 0
          while (j < dOut) {
            var s = L.bias(j); var t = 0
            while (t < dIn) { s += L.wSelf(j)(t) * h(k)(i)(t) + L.wNeigh(j)(t) * means(k)(i)(t); t += 1 }
            out(j) = sigm(s); j += 1
          }
          out
        }
      }
      val z = h(cfg.layers); val dE = dims.last
      // skip-gram loss on final embeddings; dL/dz accumulation
      val gz = Array.fill(n)(new Array[Double](dE))
      var loss = 0.0
      def push(u: Int, v: Int, y: Double): Unit = {
        var dot = 0.0; var t = 0
        while (t < dE) { dot += z(u)(t) * z(v)(t); t += 1 }
        val p = sigm(dot)
        loss += (if (y > 0.5) -math.log(math.max(p, 1e-12)) else -math.log(math.max(1 - p, 1e-12)))
        val g = p - y
        t = 0
        while (t < dE) { gz(u)(t) += g * z(v)(t); gz(v)(t) += g * z(u)(t); t += 1 }
      }
      posPairs.foreach { case (u, v) =>
        push(u, v, 1.0)
        var q = 0
        while (q < cfg.negativeSamples) { push(u, rng.nextInt(n), 0.0); q += 1 }
      }
      val denom = math.max(1, posPairs.length)
      losses += loss / denom

      // backprop layer by layer
      var grad = gz
      for (k <- (cfg.layers - 1) to 0 by -1) {
        val dIn = dims(k); val dOut = dims(k + 1); val L = layers(k)
        val gWs = Array.ofDim[Double](dOut, dIn)
        val gWn = Array.ofDim[Double](dOut, dIn)
        val gB = new Array[Double](dOut)
        val gPrev = Array.fill(n)(new Array[Double](dIn))
        var i = 0
        while (i < n) {
          val hi = h(k + 1)(i)
          var j = 0
          while (j < dOut) {
            val dAct = grad(i)(j) * hi(j) * (1.0 - hi(j))
            if (dAct != 0.0) {
              gB(j) += dAct
              var t = 0
              while (t < dIn) {
                gWs(j)(t) += dAct * h(k)(i)(t)
                gWn(j)(t) += dAct * means(k)(i)(t)
                gPrev(i)(t) += dAct * L.wSelf(j)(t)
                t += 1
              }
              val ns = neigh(i)
              if (ns.nonEmpty) {
                val inv = 1.0 / ns.length
                ns.foreach { u =>
                  var t2 = 0
                  while (t2 < dIn) { gPrev(u)(t2) += dAct * L.wNeigh(j)(t2) * inv; t2 += 1 }
                }
              }
            }
            j += 1
          }
          i += 1
        }
        val lr = cfg.learningRate / denom
        layers(k) = Layer(
          Array.tabulate(dOut, dIn)((j, t) => L.wSelf(j)(t) - lr * gWs(j)(t)),
          Array.tabulate(dOut, dIn)((j, t) => L.wNeigh(j)(t) - lr * gWn(j)(t)),
          Array.tabulate(dOut)(j => L.bias(j) - lr * gB(j)))
        grad = gPrev
      }
    }
    (GraphSageModel(layers.toSeq, d0), losses.toSeq)
  }

  // -------------------------------------------------------------- predict

  private def dotLit(v: Column, w: Array[Double]): Column =
    aggregate(zip_with(v, array(w.map(lit): _*), (a, b) => a * b),
      lit(0.0), (a, b) => a + b)

  private def l2normalize(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0), (a, v) => a + v * v))
    transform(vec, v => when(norm === 0.0, lit(0.0)).otherwise(v / norm))
  }

  /** Distributed forward pass over every vertex with the feature property:
    * (id, embedding: array<double>), L2-normalized like the reference's
    * final layer. */
  def predict(graph: PropertyGraph, featureProperty: String,
              model: GraphSageModel): DataFrame = {
    val spark = graph.edges.sparkSession
    val parts = GraphOps.adaptiveParts(spark, graph.edges.count())
    val vertices = graph.vertices
      .select(col("id"), col(featureProperty).cast("array<double>").as("h"))
      .filter(col("h").isNotNull)
      .repartition(parts, col("id")).persist()
    val edges = graph.edges.select("src", "dst")
      .repartition(parts, col("src")).persist()
    val inDeg = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("indeg"))

    var state = vertices
    model.layers.foreach { layer =>
      val dIn = layer.wSelf(0).length
      // neighbour mean, dimension-salted exactly like FastRP
      val msgs = state.join(edges, col("id") === col("src"))
        .select(col("dst"), posexplode(col("h")).as(Seq("dim", "hv")))
        .groupBy("dst", "dim").agg(sum("hv").as("s"))
      val gathered = msgs.groupBy(col("dst").as("id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("s")))).as("ds"))
        .select(col("id"), transform(col("ds"), e => e.getField("s")).as("msum"))
      val zeroes = transform(sequence(lit(0), lit(dIn - 1)), _ => lit(0.0))
      val withMean = state.join(gathered, Seq("id"), "left")
        .join(inDeg, Seq("id"), "left")
        .select(col("id"), col("h"),
          when(col("msum").isNull, zeroes)
            .otherwise(transform(col("msum"), v => v / col("indeg"))).as("m"))
      val outCols = layer.bias.indices.map { j =>
        lit(1.0) / (lit(1.0) + exp(-(dotLit(col("h"), layer.wSelf(j)) +
          dotLit(col("m"), layer.wNeigh(j)) + lit(layer.bias(j)))))
      }
      val next = withMean.select(col("id"), array(outCols: _*).as("h")).persist()
      next.count()
      val prev = state
      state = next
      if (prev ne vertices) prev.unpersist(false)
    }
    val out = state.select(col("id"), l2normalize(col("h")).as("embedding"))
    vertices.unpersist(false); edges.unpersist(false)
    out
  }

  def run(graph: PropertyGraph, featureProperty: String,
          cfg: GraphSageConfig = GraphSageConfig()): Result = {
    val (model, losses) = train(graph, featureProperty, cfg)
    Result(predict(graph, featureProperty, model), model, losses)
  }
}
