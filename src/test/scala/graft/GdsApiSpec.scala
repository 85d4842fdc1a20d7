package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.{Gds, Modes}
import graft.core.{EdgeAggregation, Orientation}
import graft.functions.Similarity
import graft.io.CsvGraphStore
import java.nio.file.Files

/** Catalog + execution modes + functions + export/import surface. */
class GdsApiSpec extends AnyFunSuite with SparkTestBase {

  lazy val gds = Gds(spark)

  test("catalog create/list/exists/drop + mutate chaining") {
    val g = graphOf(10, Seq(0L -> 1L, 1L -> 2L, 3L -> 4L))
    gds.graph.create("g1", g.vertices, g.edges)
    assert(gds.graph.exists("g1") && gds.graph.list().contains("g1"))
    val mutated = gds.wcc.mutate("g1", "component")
    assert(mutated.vertices.columns.contains("component"))
    // chain: degree on the mutated graph still works
    assert(gds.degree.stream("g1").count() == 10)
    gds.graph.removeNodeProperty("g1", "component")
    assert(!gds.catalog.get("g1").vertices.columns.contains("component"))
    assert(gds.graph.drop("g1") && !gds.graph.exists("g1"))
  }

  test("parallel-edge aggregation modes") {
    import spark.implicits._
    val vs = spark.range(3).toDF("id")
    val es = Seq((0L, 1L, 2.0), (0L, 1L, 3.0), (1L, 2L, 1.0)).toDF("src", "dst", "weight")
    val g = gds.graph.create("agg", vs, es, EdgeAggregation.Sum)
    val w = g.edges.filter(col("src") === 0).select("weight").first().getDouble(0)
    assert(w == 5.0 && g.edges.count() == 2)
    gds.graph.drop("agg")
  }

  test("stats mode returns GDS-style percentile summary") {
    val g = graphOf(6, Seq(0L -> 1L, 1L -> 2L, 3L -> 4L))
    gds.graph.create("g2", g.vertices, g.edges)
    val row = gds.wcc.stats("g2")
    // components {0,1,2},{3,4},{5} -> sizes 3,2,1
    assert(row.getAs[Long]("count") == 3)
    assert(row.getAs[Double]("max") == 3.0)
    assert(row.getAs[Double]("mean") == 2.0)
    gds.graph.drop("g2")
  }

  test("subgraph by Catalyst predicate") {
    import spark.implicits._
    val vs = Seq((0L, 10.0), (1L, 5.0), (2L, 20.0)).toDF("id", "score")
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    gds.graph.create("g3", vs, es)
    val sub = gds.graph.subgraph("g3", "g3sub", vertexPredicate = "score >= 10")
    assert(sub.vertices.count() == 2)
    assert(sub.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 2L)))
    gds.graph.drop("g3"); gds.graph.drop("g3sub")
  }

  test("similarity functions match closed forms") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L),
                  Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b", "va", "vb")
    val r = df.select(
      Similarity.jaccard(col("a"), col("b")).as("j"),
      Similarity.overlap(col("a"), col("b")).as("o"),
      Similarity.cosine(col("va"), col("vb")).as("c"),
      Similarity.euclideanDistance(col("va"), col("vb")).as("e"),
      Similarity.commonNeighbors(col("a"), col("b")).as("cn")).first()
    assert(r.getDouble(0) == 0.5)     // |{2,3}| / |{1,2,3,4}|
    assert(r.getDouble(1) == 2 / 3.0)
    assert(r.getDouble(2) == 0.0)
    assert(math.abs(r.getDouble(3) - math.sqrt(2)) < 1e-12)
    assert(r.getDouble(4) == 2.0)
  }

  test("pearson on correlated vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(2.0, 4.0, 6.0),
                  Array(3.0, 2.0, 1.0))).toDF("a", "b", "c")
    val r = df.select(Similarity.pearson(col("a"), col("b")).as("p1"),
      Similarity.pearson(col("a"), col("c")).as("p2")).first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }

  test("csv export/import round-trips the graph with exact schema") {
    val g = weightedGraphOf(5, Seq((0L, 1L, 2.5), (1L, 2L, 1.0)))
    val dir = Files.createTempDirectory("graft-csv").toString
    CsvGraphStore.export(g, dir)
    val back = CsvGraphStore.importGraph(spark, dir)
    def shape(s: org.apache.spark.sql.types.StructType) = s.map(f => (f.name, f.dataType))
    assert(shape(back.vertices.schema) == shape(g.vertices.schema))
    assert(shape(back.edges.schema) == shape(g.edges.schema))
    assert(back.edges.exceptAll(g.edges).isEmpty && g.edges.exceptAll(back.edges).isEmpty)
  }

  test("snapshot export/import round-trips") {
    val g = graphOf(4, Seq(0L -> 1L))
    val dir = Files.createTempDirectory("graft-snapexp").toString
    CsvGraphStore.exportSnapshot(g, dir)
    val back = CsvGraphStore.importSnapshot(spark, dir)
    assert(back.vertices.count() == 4 && back.edges.count() == 1)
  }

  test("relationship catalog ops: write, stream, delete") {
    val gds = graft.api.Gds(spark)
    val g = weightedGraphOf(4, Seq((0L, 1L, 1.0), (1L, 2L, 2.0)))
    gds.graph.create("relops", g.vertices, g.edges)
    import spark.implicits._
    val sims = Seq((0L, 2L, 0.9)).toDF("src", "dst", "similarity")
    gds.graph.writeRelationship("relops", "SIMILAR", sims)
    assert(gds.catalog.get("relops").edges.count() == 3)
    val streamed = gds.graph.streamRelationshipProperties("relops", Seq("rel_type"))
    assert(streamed.filter(col("rel_type") === "SIMILAR").count() == 1)
    gds.graph.deleteRelationships("relops", "SIMILAR")
    assert(gds.catalog.get("relops").edges.count() == 2)
    gds.graph.drop("relops")
  }

  test("createFromSql projects a graph from SQL (cypher-projection analogue)") {
    val gds = graft.api.Gds(spark)
    spark.range(5).toDF("id").createOrReplaceTempView("relops_nodes")
    val g = gds.graph.createFromSql("sqlproj",
      "SELECT id FROM relops_nodes",
      "SELECT id AS src, (id + 1) % 5 AS dst FROM relops_nodes")
    assert(g.vertices.count() == 5 && g.edges.count() == 5)
    gds.graph.drop("sqlproj")
  }

  test("estimate mode reports a footprint without running") {
    val gds = graft.api.Gds(spark)
    val g = graphOf(10, Seq(0L -> 1L, 1L -> 2L))
    gds.graph.create("est", g.vertices, g.edges)
    val e = gds.estimate.forAlgorithm("est", "pageRank")
    assert(e.nodeCount == 10 && e.relationshipCount == 2)
    assert(e.bytesMin > 0 && e.bytesMax >= e.bytesMin)
    gds.graph.drop("est")
  }

  test("new algorithm facades run end-to-end through the catalog") {
    val gds = graft.api.Gds(spark)
    val g = graphOf(4, Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L))
    gds.graph.create("algos", g.vertices, g.edges)
    assert(gds.louvain.stream("algos").count() == 4)
    assert(gds.betweenness.stream("algos").count() == 4)
    assert(gds.closeness.stream("algos").count() == 4)
    assert(gds.closeness.harmonic.stream("algos").count() == 4)
    assert(gds.scc.stream("algos").count() == 4)
    val sp = gds.shortestPath.dijkstra.stream("algos", 0L, 3L).collect()
    assert(sp.length == 1 && sp(0).getSeq[Long](3) == Seq(0L, 1L, 2L, 3L))
    assert(gds.dfs.stream("algos", 0L).count() == 4)
    gds.graph.drop("algos")
  }

  test("estimate mode: per-family state widths within 2x of measured cached sizes") {
    val gds = graft.api.Gds(spark)
    val n = 50000L
    // realistic 100-TB id space: hashed (non-compressible) ids — columnar
    // cache compression can't flatter the measurement
    val ids = spark.range(n).select(xxhash64(col("id")).as("id"))
    val edges = spark.range(4 * n).select(
      xxhash64(pmod(col("id"), lit(n))).as("src"),
      xxhash64(pmod(col("id") * 31 + 7, lit(n))).as("dst"))
    gds.graph.create("est2", ids, edges)
    def cachedBytesPerRow(df: org.apache.spark.sql.DataFrame): Double = {
      val p = df.persist()
      val rows = p.count()
      val size = p.queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          r.computeStats().sizeInBytes.toLong
      }.sum
      p.unpersist(blocking = true)
      size.toDouble / rows
    }
    // hash-derived doubles: realistic mid-run state values
    def hdouble(salt: Int) =
      (pmod(xxhash64(col("id"), lit(salt)), lit(100000L)) / lit(100000.0))
    // representative per-row state shapes, as the engines persist them
    val states: Seq[(String, graft.api.EstimateResult, org.apache.spark.sql.DataFrame)] = Seq(
      ("pageRank", gds.pageRank.estimate("est2"),
        ids.select(col("id"), hdouble(1).as("rank"), hdouble(2).as("delta"),
          (pmod(col("id"), lit(2)) === 0).as("_active"))),
      ("wcc", gds.wcc.estimate("est2"),
        ids.select(col("id"), xxhash64(col("id"), lit(3)).as("component"),
          (pmod(col("id"), lit(2)) === 0).as("_active"))),
      ("labelPropagation", gds.labelPropagation.estimate("est2"),
        ids.select(col("id"), xxhash64(col("id"), lit(4)).as("label"),
          (pmod(col("id"), lit(2)) === 0).as("_active"))),
      ("triangleCount", gds.triangleCount.estimate("est2"),
        ids.select(col("id"), pmod(xxhash64(col("id"), lit(5)), lit(1000L)).as("triangles"))),
      ("fastRP", gds.fastRP.estimate("est2",
        graft.algo.FastRP.FastRPConfig(embeddingDimension = 32)),
        ids.select(col("id"), transform(sequence(lit(0), lit(31)),
          d => pmod(xxhash64(col("id"), d), lit(100000L)) / lit(100000.0)).as("h"))),
      ("knn", gds.knn.estimate("est2", graft.algo.Knn.KnnConfig(k = 10)),
        ids.select(col("id"), transform(sequence(lit(0), lit(9)), j =>
          struct(xxhash64(col("id"), j).as("neighbor_id"),
            (pmod(xxhash64(col("id"), j, lit(9)), lit(100000L)) / lit(100000.0)).as("similarity")))
          .as("neighbors"))),
      // one (source, node) row of the Brandes forward frame MsBfs persists
      ("betweenness", gds.betweenness.estimate("est2"),
        ids.select(xxhash64(col("id"), lit(6)).as("s"), col("id"),
          pmod(xxhash64(col("id"), lit(7)), lit(30L)).cast("int").as("dist"),
          pmod(xxhash64(col("id"), lit(8)), lit(1000L)).as("sigma"))),
      ("louvain", gds.louvain.estimate("est2"),
        ids.select(col("id"), xxhash64(col("id"), lit(9)).as("communityId"))),
      // one row of the capped topK similarity-pair heap
      ("nodeSimilarity", gds.nodeSimilarity.estimate("est2"),
        ids.select(col("id").as("n1"), xxhash64(col("id"), lit(10)).as("n2"),
          hdouble(11).as("similarity"))),
      // Borůvka per-node state: component + candidate (dst, weight)
      ("spanningTree", gds.spanningTree.estimate("est2"),
        ids.select(col("id"), xxhash64(col("id"), lit(12)).as("component"),
          xxhash64(col("id"), lit(13)).as("candDst"), hdouble(14).as("candW"))))
    states.foreach { case (name, est, state) =>
      val perRow = est.stateRowBytes.toDouble
      val meas = cachedBytesPerRow(state)
      assert(perRow <= meas * 2 && perRow >= meas / 2,
        f"$name: estimated $perRow%.0f B/row vs measured $meas%.1f B/row — outside 2x")
      assert(est.bytesMin > 0 && est.bytesMax == est.bytesMin * 3)
    }
    // per-family formulas genuinely differ (no vestigial constant)
    assert(states.map(_._2.stateRowBytes).distinct.size >= 4)
    // betweenness is the QUADRATIC family: S x V state (the pre-run gate
    // that matters most; ~70 GB here, not the generic model's ~2 MB)
    val bw = gds.betweenness.estimate("est2")
    assert(bw.stateBytes == 50000L * 28L * 50000L)
    assert(!bw.genericFallback)
    assert(gds.estimate.forAlgorithm("est2", "betweenness").stateBytes == bw.stateBytes)
    // sampled sources shrink the model linearly
    assert(gds.estimate.betweenness("est2", sources = 100L).stateBytes ==
      50000L * 28L * 100L)
    // unknown families fall through to the generic default AND say so
    val gen = gds.estimate.forAlgorithm("est2", "somethingElse")
    assert(gen.genericFallback)
    assert(states.forall(!_._2.genericFallback))
    gds.graph.drop("est2")
  }

  test("mode matrix: stats/mutate/write across the formerly stream-only algorithms") {
    import spark.implicits._
    val gds = graft.api.Gds(spark)
    val g = graphOf(6, Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L, 3L -> 4L, 4L -> 3L, 4L -> 5L))
    val verts = g.vertices.withColumn("vec",
      array(col("id").cast("double"), (col("id") * 2 + 1).cast("double")))
    gds.graph.create("modes", verts, g.edges)
    val dir = Files.createTempDirectory("graft-modes").toString
    try {
      // stats rows exist and carry the count field
      assert(gds.scc.stats("modes").getLong(0) > 0)
      assert(gds.hits.stats("modes")._1.getLong(0) == 6)
      assert(gds.k1coloring.stats("modes").getLong(0) > 0)
      assert(gds.degree.stats("modes").getLong(0) == 6)
      assert(gds.closeness.stats("modes").getLong(0) == 6)
      assert(gds.closeness.harmonic.stats("modes").getLong(0) == 6)
      assert(gds.articleRank.stats("modes").getLong(0) == 6)
      assert(gds.eigenvector.stats("modes").getLong(0) == 6)
      assert(gds.localClusteringCoefficient.stats("modes")._2.getLong(0) == 6)
      assert(gds.nodeSimilarity.stats("modes").getLong(0) > 0)
      assert(gds.knn.stats("modes", "vec",
        graft.algo.Knn.KnnConfig(k = 2)).getLong(0) > 0)
      // node-property mutates chain into later reads
      gds.scc.mutate("modes", "sccId")
      gds.hits.mutate("modes", "hits")
      gds.k1coloring.mutate("modes", "color")
      gds.degree.mutate("modes", "deg")
      gds.closeness.mutate("modes", "close")
      gds.closeness.harmonic.mutate("modes", "harm")
      gds.articleRank.mutate("modes", "article")
      gds.eigenvector.mutate("modes", "eigen")
      gds.localClusteringCoefficient.mutate("modes", "lcc")
      gds.sllpa.mutate("modes", "sllpaIds")
      val cols = gds.catalog.get("modes").vertices.columns.toSet
      Seq("sccId", "hitshub", "hitsauth", "color", "deg", "close", "harm",
        "article", "eigen", "lcc", "sllpaIds").foreach(c =>
        assert(cols.contains(c), s"missing mutated column $c in $cols"))
      // relationship mutates: similarity pairs become typed edges the next
      // algorithm consumes (the reference's composition idiom)
      gds.nodeSimilarity.mutate("modes", "SIMILAR",
        graft.algo.NodeSimilarityConfig(topK = 2))
      gds.knn.mutate("modes", "NEAR", "vec", graft.algo.Knn.KnnConfig(k = 2))
      val edges = gds.catalog.get("modes").edges
      val simEdges = edges.filter(col("rel_type") === "SIMILAR")
      assert(simEdges.count() > 0)
      assert(edges.filter(col("rel_type") === "NEAR").count() > 0)
      // chain: degree over ONLY the similarity graph
      gds.graph.subgraph("modes", "simgraph", edgePredicate = "rel_type = 'SIMILAR'")
      val simDeg = gds.degree.stream("simgraph")
      assert(simDeg.agg(sum("score")).first().getDouble(0) == simEdges.count().toDouble)
      // write mode persists snapshot-committed parquet per algorithm
      gds.scc.write("modes", s"$dir/scc")
      gds.hits.write("modes", s"$dir/hits")
      gds.nodeSimilarity.write("modes", s"$dir/nodesim")
      gds.knn.write("modes", s"$dir/knn", "vec", graft.algo.Knn.KnnConfig(k = 2))
      gds.labelPropagation.write("modes", s"$dir/lp")
      gds.triangleCount.write("modes", s"$dir/tc")
      gds.fastRP.write("modes", s"$dir/fastrp")
      for (sub <- Seq("scc", "hits", "nodesim", "knn", "lp", "tc", "fastrp"))
        assert(graft.io.SnapshotStore.latest(s"$dir/$sub").isDefined,
          s"no committed snapshot under $dir/$sub")
    } finally {
      graft.io.Fs.deleteRecursively(dir)
      gds.graph.drop("modes"); gds.graph.drop("simgraph")
    }
  }

  test("mode matrix: path procs mutate/write (dijkstra, yens, astar, bfs, dfs, allShortestPaths)") {
    val gds = graft.api.Gds(spark)
    // weighted path graph 0->1->2->3 plus a costly shortcut 0->3
    val verts = spark.range(4).toDF("id")
      .withColumn("latitude", col("id").cast("double"))
      .withColumn("longitude", lit(0.0))
    val edges = spark.createDataFrame(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (0L, 3L, 10.0)))
      .toDF("src", "dst", "weight")
    gds.graph.create("paths", verts, edges)
    val dir = Files.createTempDirectory("graft-path-modes").toString
    try {
      gds.shortestPath.dijkstra.mutate("paths", "SP", 0L, 3L)
      gds.shortestPath.astar.mutate("paths", "ASTAR", 0L, 3L)
      gds.shortestPath.yens.mutate("paths", "YENS", 0L, 3L, 2)
      gds.bfs.mutate("paths", "hop", 0L)
      val g = gds.catalog.get("paths")
      val sp = g.edges.filter(col("rel_type") === "SP").collect()
      assert(sp.length == 1)
      assert(sp(0).getAs[Long]("src") == 0L && sp(0).getAs[Long]("dst") == 3L)
      assert(sp(0).getAs[Double]("weight") == 3.0) // 0->1->2->3, not the 10.0 shortcut
      assert(g.edges.filter(col("rel_type") === "ASTAR").count() == 1)
      assert(g.edges.filter(col("rel_type") === "YENS").count() == 2) // k=2 paths
      assert(g.vertices.columns.contains("hop"))
      gds.shortestPath.dijkstra.write("paths", s"$dir/sp", 0L, 3L)
      gds.dfs.write("paths", s"$dir/dfs", 0L)
      gds.allShortestPaths.write("paths", s"$dir/asp", 0L)
      for (sub <- Seq("sp", "dfs", "asp"))
        assert(graft.io.SnapshotStore.latest(s"$dir/$sub").isDefined,
          s"no committed snapshot under $dir/$sub")
    } finally {
      graft.io.Fs.deleteRecursively(dir)
      gds.graph.drop("paths")
    }
  }

  test("mode matrix: alpha-tail mutate/write (ann, maxkcut, influenceMax, deltaStepping, triangles, spanningTree)") {
    val gds = graft.api.Gds(spark)
    val g = graphOf(6, Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L, 3L -> 4L, 4L -> 3L, 4L -> 5L))
    val verts = g.vertices.withColumn("vec",
      array(col("id").cast("double"), (col("id") * 2 + 1).cast("double")))
    gds.graph.create("alpha", verts,
      g.edges.withColumn("weight", lit(1.0) + col("src").cast("double")))
    val dir = Files.createTempDirectory("graft-alpha-modes").toString
    try {
      // relationship mutates
      gds.ann.mutate("alpha", "ANN", "vec", graft.algo.Knn.KnnConfig(k = 2))
      gds.spanningTree.mutate("alpha", "MST", startNode = Some(0L))
      val edges = gds.catalog.get("alpha").edges
      assert(edges.filter(col("rel_type") === "ANN").count() > 0)
      // the MST of a connected 6-node graph has 5 edges
      assert(edges.filter(col("rel_type") === "MST").count() == 5)
      // node-property mutates chain into later reads
      gds.maxkcut.mutate("alpha", "cut", k = 2)
      gds.influenceMaximization.mutate("alpha", "spread", seedSetSize = 2,
        monteCarloSimulations = 20)
      gds.deltaStepping.mutate("alpha", "dist0", source = 0L)
      gds.triangles.mutate("alpha", "triPart")
      val vcols = gds.catalog.get("alpha").vertices
      Seq("cut", "spread", "dist0", "triPart").foreach(c =>
        assert(vcols.columns.contains(c), s"missing mutated column $c"))
      // triangle participation via the triple stream == triangleCount
      val triProp = vcols.select("id", "triPart")
      val tc = gds.triangleCount.stream("alpha")
      val joined = triProp.join(tc, "id")
        .filter(col("triPart") =!= col("triangles")).count()
      assert(joined == 0, "triangles.mutate must agree with triangleCount")
      // stats row for maxkcut
      assert(gds.maxkcut.stats("alpha").getLong(0) > 0)
      // writes persist committed snapshots
      gds.ann.write("alpha", s"$dir/ann", "vec", graft.algo.Knn.KnnConfig(k = 2))
      gds.maxkcut.write("alpha", s"$dir/maxkcut")
      gds.influenceMaximization.write("alpha", s"$dir/im", seedSetSize = 2,
        monteCarloSimulations = 20)
      gds.deltaStepping.write("alpha", s"$dir/delta", source = 0L)
      gds.triangles.write("alpha", s"$dir/tri")
      gds.spanningTree.write("alpha", s"$dir/mst", startNode = Some(0L))
      for (sub <- Seq("ann", "maxkcut", "im", "delta", "tri", "mst"))
        assert(graft.io.SnapshotStore.latest(s"$dir/$sub").isDefined,
          s"no committed snapshot under $dir/$sub")
    } finally {
      graft.io.Fs.deleteRecursively(dir)
      gds.graph.drop("alpha")
    }
  }

  test("alpha similarity / ann / singular property / model.delete facades") {
    import spark.implicits._
    val gds = graft.api.Gds(spark)
    val vs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(0.0, 1.0)), (3L, Array(0.6, 0.8))).toDF("id", "emb")
    val es = Seq((0L, 1L)).toDF("src", "dst")
    gds.graph.create("simg", vs, es)
    // alpha similarity proc: cosine pair stream with cutoff
    val pairs = gds.alphaSimilarity.stream("simg", "emb",
      graft.algo.AlphaSimilarity.Metric.Cosine,
      graft.algo.AlphaSimilarity.SimConfig(similarityCutoff = 0.99))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
    val st = gds.alphaSimilarity.stats("simg", "emb",
      graft.algo.AlphaSimilarity.Metric.Cosine)
    assert(st.getAs[Long]("count") == 6L)
    // ann facade = knn over the vertex property
    val ann = gds.ann.stream("simg", "emb",
      graft.algo.Knn.KnnConfig(k = 1, maxIterations = 3))
    assert(ann.count() == 4L)
    // singular property stream forms
    assert(gds.graph.streamNodeProperty("simg", "emb").columns.toSeq == Seq("id", "emb"))
    // model.delete removes stored snapshots but not the catalog entry
    val dir = Files.createTempDirectory("gds-model-del").toString
    gds.model.set("delme", graft.ml.LogisticRegression.LrModel(Array(1.0), 0.5, Seq(0.1)))
    gds.model.store("delme", dir)
    assert(new java.io.File(s"$dir/delme").exists())
    assert(gds.model.delete("delme", dir))
    assert(!new java.io.File(s"$dir/delme").exists())
    assert(gds.model.exists("delme") && !gds.model.delete("delme", dir))
    gds.model.drop("delme")
    gds.graph.drop("simg")
  }

  test("orientation views: reverse and undirected degrees") {
    val g = graphOf(3, Seq(0L -> 1L, 0L -> 2L))
    val natural = collectMap(g.degrees(Orientation.Natural), "id", "degree")
    val reverse = collectMap(g.degrees(Orientation.Reverse), "id", "degree")
    val undirected = collectMap(g.degrees(Orientation.Undirected), "id", "degree")
    assert(natural == Map(0L -> 2.0, 1L -> 0.0, 2L -> 0.0))
    assert(reverse == Map(0L -> 0.0, 1L -> 1.0, 2L -> 1.0))
    assert(undirected == Map(0L -> 2.0, 1L -> 1.0, 2L -> 1.0))
  }
}
