package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth analytics pack — operator classes the TPC-H shapes don't
  * exercise, each with an explicitly scale-bounded plan.
  */
object Analytics4 {

  // ---------------------------------------------------------------
  // q_skyline — 2-D Pareto frontier (skyline operator): the parts no
  // other part dominates on (size, retail price), where x dominates y
  // iff x.size <= y.size AND x.price <= y.price with at least one
  // strict. The classic skyline needs a self-join (quadratic) or a
  // global sort (one task owns the corpus); for 2-D the frontier is a
  // running min over the size axis, and the scale-right plan splits
  // it:
  //   1. min(price) per size — fact-sized shuffle on a LOW-CARD key,
  //      map-side combined (the only corpus-wide pass);
  //   2. strict-predecessor running min over the per-size minima — an
  //      unpartitioned RANGE window, but above the |sizes|-row
  //      aggregate (PlanGuard's rule), never over the fact table;
  //   3. broadcast the |sizes|-row frontier stats back and filter:
  //      kept iff price == its size's min AND every strictly smaller
  //      size's min is strictly greater (equal-(size,price) rows are
  //      mutually non-dominating and all kept).
  // ---------------------------------------------------------------
  private def skyline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        col("p_retailprice").cast("decimal(12,2)").as("price"))
    val sizeMin = p.groupBy("p_size").agg(min(col("price")).as("size_min"))
    val strictW = Window.orderBy("p_size")
      .rangeBetween(Window.unboundedPreceding, -1)
    val stats = sizeMin.withColumn("strict_min", min(col("size_min")).over(strictW))
    p.join(broadcast(stats), "p_size")
      .filter(col("price") === col("size_min") &&
        (col("strict_min").isNull || col("strict_min") > col("price")))
      .select(col("p_partkey"), col("p_size"), col("price").cast("double"))
      .orderBy("p_partkey")
  }

  private val skylineSql =
    """WITH p AS (SELECT p_partkey, p_size, CAST(p_retailprice AS DECIMAL(12,2)) AS price FROM part),
      |m AS (SELECT p_size, min(price) AS size_min FROM p GROUP BY 1),
      |st AS (SELECT *, min(size_min) OVER (ORDER BY p_size
      |         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict_min FROM m)
      |SELECT p.p_partkey, p.p_size, CAST(p.price AS DOUBLE) AS price
      |FROM p JOIN st ON p.p_size = st.p_size
      |WHERE p.price = st.size_min AND (st.strict_min IS NULL OR st.strict_min > p.price)
      |ORDER BY p.p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q_hierarchy_flatten — recursive-hierarchy traversal (the
  // org-chart / category-tree closure SQL solves with RECURSIVE
  // CTEs, which Spark lacks): depth-to-root per node over the
  // deterministic binary tree parent(k) = k DIV 2 synthesized on the
  // customer keys. Spark-first re-expression: POINTER JUMPING
  // (anc ← anc(anc), steps add) — O(log depth) rounds of keyed
  // self-joins instead of O(depth) recursive steps, the same
  // log-round engine dedup_clusters proved, with localCheckpoint
  // lineage truncation, a 1-row driver action per round for the
  // fixpoint, and a loud failure at the round cap. The oracle IS a
  // recursive CTE — the hash match proves the log-round rewrite
  // equals true recursion. Output: one row per depth (histogram +
  // key range), so the gate stays |depths|-sized.
  // ---------------------------------------------------------------
  private val MaxHierRounds = 40 // pointer jumping: covers depth ~2^40

  private def hierarchyFlatten(s: SparkSession, dir: String): DataFrame = {
    val init = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("node"))
      .select(col("node"),
        when(col("node") <= 1, col("node")).otherwise(expr("node DIV 2")).as("anc"),
        when(col("node") <= 1, 0L).otherwise(1L).as("steps"))
    var cur = init.localCheckpoint()
    var rounds = 0
    var converged = cur.filter(col("anc") > 1).isEmpty
    while (!converged && rounds < MaxHierRounds) {
      val prev = cur
      cur = prev.as("a")
        .join(prev.as("b").select(col("node").as("bnode"),
          col("anc").as("banc"), col("steps").as("bsteps")),
          col("a.anc") === col("bnode"))
        .select(col("a.node").as("node"), col("banc").as("anc"),
          (col("a.steps") + col("bsteps")).as("steps"))
        .localCheckpoint()
      prev.unpersist()
      rounds += 1
      converged = cur.filter(col("anc") > 1).isEmpty
    }
    require(converged,
      s"q_hierarchy_flatten: pointer jumping did not converge in $MaxHierRounds rounds")
    cur.groupBy(col("steps").as("depth"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_key"), max(col("node")).as("max_key"))
      .orderBy("depth")
  }

  private val hierarchyFlattenSql =
    """WITH RECURSIVE walk(node, anc, steps) AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey <= 1 THEN c_custkey ELSE c_custkey // 2 END,
      |    CAST(CASE WHEN c_custkey <= 1 THEN 0 ELSE 1 END AS BIGINT)
      |  FROM customer
      |  UNION ALL
      |  SELECT w.node, CASE WHEN w.anc <= 1 THEN w.anc ELSE w.anc // 2 END, w.steps + 1
      |  FROM walk w WHERE w.anc > 1),
      |d AS (SELECT node, max(steps) AS depth FROM walk GROUP BY 1)
      |SELECT depth, count(*) AS n_nodes, min(node) AS min_key, max(node) AS max_key
      |FROM d
      |GROUP BY depth
      |ORDER BY depth""".stripMargin

  // ---------------------------------------------------------------
  // geo_cell_join — spatial proximity join via DENSITY-ADAPTIVE
  // GRID-CELL BUCKETING (the geohash-class technique: a radius join
  // compiles to an equality join on cell ids, never an all-pairs
  // distance filter). Positions are deterministic md5-derived
  // integer microdegrees on a 10°×10° region (the corpus has no geo
  // columns; the synthesized ones are engine-portable like every
  // other md5-derived value here). One side explodes to its 3×3
  // neighbor cells, the other stays in its own cell — every
  // qualifying pair meets in EXACTLY one cell (the right point's
  // own), so no distinct is needed; the residual predicate is an
  // exact integer squared-distance test (flat-grid metric, the
  // honest small-cell approximation).
  //
  // Scale shape: a FIXED radius over a fixed region is quadratic in
  // the point count — 10× points ⇒ ~100× true radius pairs, no plan
  // can beat its own output (this op's measured 11× slope in
  // SCALING_r09 before this change). The honest contract is a
  // PAIR BUDGET: r² = GeoPairBudget / N, so the expected neighbor
  // count per point (π·r²·N/area) is a CONSTANT (~11.8) and output,
  // join work, and shuffle all stay LINEAR in N. The grid tracks the
  // radius: cell = the smallest power of two ≥ r, chosen by an
  // integer CASE ladder on N (N ≥ ceil(budget/4^p) ⇔ 2^p ≥ r) —
  // zero floating point anywhere, so both engines pick bit-identical
  // cells and radii. The 3×3 cover stays complete because cell ≥ r.
  // Cell occupancy is bounded by 4·budget/area ≈ 15 points whatever
  // N is: at 100 TB the cells partition the shuffle at constant
  // per-cell work, and skewed cells fall to AQE like any hot key.
  // The budget anchors r to 0.5° at N = 1500 (the sf0.01 gate).
  // ---------------------------------------------------------------
  private[graft] val GeoPairBudget = 375000000000000L // r²·N: 0.5° at N=1500

  /** Ladder branches as data, in CASE evaluation order: (nMin, cell).
    * Shared by the SQL text and the pure reference [[geoCellFor]] so
    * the property suite tests the SAME branch list the ops run.
    */
  private[graft] val geoLadderBranches: Seq[(Long, Long)] =
    (6 to 23).map { p =>
      val cell = 1L << p
      ((GeoPairBudget + cell * cell - 1) / (cell * cell), cell)
    }

  /** Pure-Scala semantics of [[geoCellLadder]]: first true branch. */
  private[graft] def geoCellFor(n: Long): Long =
    geoLadderBranches.collectFirst { case (nMin, c) if n >= nMin => c }
      .getOrElse(1L << 24)

  /** Smallest power-of-two cell ≥ the adaptive radius, as a CASE
    * ladder on the point count `n` — the SAME text is valid Spark
    * and DuckDB SQL (thresholds are ceil(GeoPairBudget / 4^p),
    * integer-exact; plain integer literals, no suffixes). Branch
    * order matters: CASE takes the FIRST true branch, so the
    * TIGHTEST condition (largest n threshold ⇒ smallest cell) must
    * come first — the loosest-first ordering silently degrades every
    * corpus to one giant cell and the join to a quadratic
    * (correctness survives, the plan does not; pinned by
    * GeoLadderProps' minimality property).
    */
  private[graft] val geoCellLadder: String = {
    val branches = geoLadderBranches.map { case (nMin, cell) =>
      s"WHEN n >= $nMin THEN $cell"
    }
    s"CASE ${branches.mkString(" ")} ELSE ${1L << 24} END"
  }

  private def geoCellJoin(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(s, dir, "customer").select(
      col("c_custkey").as("key"),
      expr("CAST(conv(substr(md5(concat('lat', c_custkey)), 1, 8), 16, 10) AS BIGINT) % 10000000")
        .as("lat"),
      expr("CAST(conv(substr(md5(concat('lon', c_custkey)), 1, 8), 16, 10) AS BIGINT) % 10000000")
        .as("lon"))
    val pts = raw
      .crossJoin(broadcast(raw.agg(count(lit(1)).as("n"))))
      .withColumn("r2", expr(s"$GeoPairBudget DIV n"))
      .withColumn("cell", expr(geoCellLadder))
      .withColumn("cla", expr("lat DIV cell"))
      .withColumn("clo", expr("lon DIV cell"))
    val probe = pts
      .withColumn("di", explode(expr("sequence(-1, 1)")))
      .withColumn("dj", explode(expr("sequence(-1, 1)")))
      .select(col("key").as("a"), col("lat").as("lat_a"), col("lon").as("lon_a"),
        col("r2"),
        (col("cla") + col("di")).as("jcla"), (col("clo") + col("dj")).as("jclo"))
    probe.join(pts.select(col("key").as("b"), col("lat").as("lat_b"),
        col("lon").as("lon_b"), col("cla").as("jcla"), col("clo").as("jclo")),
        Seq("jcla", "jclo"))
      .filter(col("a") < col("b"))
      .withColumn("dist2",
        (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b"))
          + (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")))
      .filter(col("dist2") <= col("r2"))
      .select(col("a"), col("b"), col("dist2"))
      .orderBy("a", "b")
  }

  private val geoCellJoinSql =
    s"""WITH nn AS (SELECT count(*) AS n FROM customer),
      |pts AS (
      |  SELECT c_custkey AS key,
      |    (('0x' || substr(md5('lat' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT) % 10000000 AS lat,
      |    (('0x' || substr(md5('lon' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT) % 10000000 AS lon,
      |    $GeoPairBudget // n AS r2,
      |    $geoCellLadder AS cell
      |  FROM customer CROSS JOIN nn),
      |c AS (SELECT *, lat // cell AS cla, lon // cell AS clo FROM pts),
      |probe AS (
      |  SELECT key AS a, lat AS lat_a, lon AS lon_a, r2,
      |    cla + di.x AS jcla, clo + dj.x AS jclo
      |  FROM c, range(-1, 2) di(x), range(-1, 2) dj(x))
      |SELECT p.a, q.key AS b,
      |  (p.lat_a - q.lat) * (p.lat_a - q.lat) + (p.lon_a - q.lon) * (p.lon_a - q.lon) AS dist2
      |FROM probe p JOIN c q ON p.jcla = q.cla AND p.jclo = q.clo
      |WHERE p.a < q.key
      |  AND (p.lat_a - q.lat) * (p.lat_a - q.lat) + (p.lon_a - q.lon) * (p.lon_a - q.lon)
      |      <= p.r2
      |ORDER BY a, b""".stripMargin


  // ---------------------------------------------------------------
  // geo_grid_density — rasterized density + 3×3 binomial smoothing
  // (the hotspot-map primitive: raster algebra as relational ops).
  // Same md5-derived microdegree points as geo_cell_join, bucketed to
  // 1° cells; the smoothing kernel (corner 1, edge 2, center 4, /16)
  // is an EQUALITY JOIN of the cell-count relation against its own
  // 9-offset explode — convolution compiles to join+aggregate exactly
  // like the radius join compiles to cell equality. The local-peak
  // ratio (cell count vs its smoothed neighborhood) is published in
  // truncating ppm so the verdict is engine-stable.
  //
  // Scale shape: ONE fact-sized aggregate (map-side combined) down to
  // ≤ |cells| rows; the convolution fans the CELL relation ×9, never
  // the points. At 100 TB with a finer grid the cell relation is
  // still millions of rows, not billions — the kernel join shuffles
  // on the cell key and partial-aggregates.
  // ---------------------------------------------------------------
  private def geoGridDensity(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(s, dir, "customer").select(
        expr("CAST(conv(substr(md5(concat('lat', c_custkey)), 1, 8), 16, 10) AS BIGINT) % 10000000 DIV 1000000").as("cla"),
        expr("CAST(conv(substr(md5(concat('lon', c_custkey)), 1, 8), 16, 10) AS BIGINT) % 10000000 DIV 1000000").as("clo"))
      .groupBy("cla", "clo").agg(count(lit(1)).as("n"))
    val spread = cells
      .withColumn("di", explode(expr("sequence(-1, 1)")))
      .withColumn("dj", explode(expr("sequence(-1, 1)")))
      .select((col("cla") + col("di")).as("cla"), (col("clo") + col("dj")).as("clo"),
        (col("n") * (lit(4) - abs(col("di")) * 2 - abs(col("dj")) * 2
          + abs(col("di")) * abs(col("dj")))).as("w"))
    // weight algebra: (0,0)→4, edge→2, corner→1 (binomial 3×3 kernel)
    val smooth = spread.groupBy("cla", "clo").agg(sum(col("w")).as("smooth16"))
    cells.join(smooth, Seq("cla", "clo"))
      .withColumn("peak_ppm", expr("n * 16 * CAST(1000000 AS BIGINT) DIV smooth16"))
      .select("cla", "clo", "n", "smooth16", "peak_ppm")
      .orderBy("cla", "clo")
  }

  private val geoGridDensitySql =
    """WITH pts AS (SELECT
      |    (('0x' || substr(md5('lat' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT) % 10000000 // 1000000 AS cla,
      |    (('0x' || substr(md5('lon' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT) % 10000000 // 1000000 AS clo
      |  FROM customer),
      |cells AS (SELECT cla, clo, count(*) AS n FROM pts GROUP BY 1, 2),
      |spread AS (SELECT cla + di AS cla, clo + dj AS clo,
      |    n * (4 - abs(di) * 2 - abs(dj) * 2 + abs(di) * abs(dj)) AS w
      |  FROM cells, (SELECT unnest([-1, 0, 1]) AS di) a, (SELECT unnest([-1, 0, 1]) AS dj) b),
      |smooth AS (SELECT cla, clo, CAST(sum(w) AS BIGINT) AS smooth16 FROM spread GROUP BY 1, 2)
      |SELECT c.cla, c.clo, c.n, s.smooth16,
      |  CAST(c.n * 16 * 1000000 // s.smooth16 AS BIGINT) AS peak_ppm
      |FROM cells c JOIN smooth s ON c.cla = s.cla AND c.clo = s.clo
      |ORDER BY c.cla, c.clo""".stripMargin

  // ---------------------------------------------------------------
  // q_market_basket — association rules over order baskets (the
  // retail classic: which part PAIRS co-occur in the same order more
  // than their solo popularity predicts): within-order part pairs
  // (a < b), support / confidence / lift in exact truncating ppm —
  // lift's cross-multiplication runs in DECIMAL(38,0) (n_ab·N·10⁶
  // over n_a·n_b) so the rule ranking is engine-identical —
  // MinSupport-floored, deterministic top-25 by (lift, a, b).
  //
  // Scale shape: baskets are aggregated ONCE to order grain
  // (sort_array(collect_set) — state bounded by basket size, small
  // by domain) and the pair generator is an ARRAY COMBINATION over
  // each basket — fan-out is C(k,2) per order, linear in orders,
  // never all-pairs over parts and never a self-join. The basket
  // relation is NOT checkpointed: it is order-grain (fact-sized),
  // and the repo convention reserves localCheckpoint for
  // grain-reduced relations — the three consumers (order count,
  // item counts, pair counts) re-derive it with at most one extra
  // linear scan each (the itemCnt and pairs branches share a
  // canonically identical aggregate subtree, so ReuseExchange runs
  // that scan+shuffle once). Item counts join back on the part key
  // (vocab-sized, map-combinable); the rank window runs over the
  // ≥MinSupport survivors, above an Aggregate.
  // ---------------------------------------------------------------
  private val BasketMinSupport = 3
  private val BasketTop = 25

  private def marketBasket(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("okey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    // part-grain (vocab-sized) and consumed by BOTH join legs below —
    // the grain-reduced multi-consumer case the checkpoint convention
    // is FOR (unlike the order-grain basket relation, which stays
    // lazy and costs one linear re-scan per consumer)
    val itemCnt = baskets.select(explode(col("ps")).as("pkey"))
      .groupBy("pkey").agg(count(lit(1)).as("n_solo"))
      .localCheckpoint()
    val pairs = baskets.select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS part_a, y AS part_b))))"))
        .as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= BasketMinSupport)
    val scored = pairs
      .join(itemCnt.select(col("pkey").as("part_a"), col("n_solo").as("n_a")), "part_a")
      .join(itemCnt.select(col("pkey").as("part_b"), col("n_solo").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("CAST(n_ab * 1000000 DIV n_orders AS BIGINT)").as("support_ppm"),
        expr("CAST(n_ab * 1000000 DIV n_a AS BIGINT)").as("confidence_ppm"),
        expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000) DIV " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_ppm"))
    scored
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lift_ppm").desc, col("part_a"), col("part_b"))))
      .filter(col("rank") <= BasketTop)
      .select(col("rank"), col("part_a"), col("part_b"), col("n_ab"),
        col("support_ppm"), col("confidence_ppm"), col("lift_ppm"))
      .orderBy("rank")
  }

  private val marketBasketSql =
    s"""WITH items AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
      |n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
      |ic AS (SELECT pkey, count(*) AS n_solo FROM items GROUP BY pkey),
      |pairs AS (
      |  SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS n_ab
      |  FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
      |  GROUP BY 1, 2
      |  HAVING count(*) >= $BasketMinSupport),
      |scored AS (
      |  SELECT p.part_a, p.part_b, CAST(p.n_ab AS BIGINT) AS n_ab,
      |    CAST(p.n_ab * 1000000 // n.n_orders AS BIGINT) AS support_ppm,
      |    CAST(p.n_ab * 1000000 // a.n_solo AS BIGINT) AS confidence_ppm,
      |    CAST(CAST(p.n_ab AS HUGEINT) * n.n_orders * 1000000
      |      // (CAST(a.n_solo AS HUGEINT) * b.n_solo) AS BIGINT) AS lift_ppm
      |  FROM pairs p
      |  JOIN ic a ON a.pkey = p.part_a
      |  JOIN ic b ON b.pkey = p.part_b
      |  CROSS JOIN n),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY lift_ppm DESC, part_a, part_b) AS rank
      |  FROM scored)
      |SELECT CAST(rank AS INT) AS rank, part_a, part_b, n_ab,
      |  support_ppm, confidence_ppm, lift_ppm
      |FROM r WHERE rank <= $BasketTop
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------
  // q_benford — Benford's-law first-digit audit on line amounts (the
  // classic fabricated-data / unit-mix-error screen an auditor runs
  // over any financial fact table): count line items by the first
  // significant digit of l_extendedprice, compare each digit's exact
  // observed ppm share against the Benford expectation
  // log10(1+1/d). The nine expected shares are COMPILE-TIME literals
  // (floor(log10(1+1/d)·10⁶) — a runtime transcendental would
  // hash-drift between engines; a constant cannot), and the observed
  // share is the exact truncating n·10⁶ DIV total. The digit is read
  // from the decimal string of integer CENTS (round(x·100) — prices
  // are exact cents, so the float error is ≪ 0.5 and both engines
  // round to the same integer; first significant digit is invariant
  // under the ×100 power-of-ten scale), never from a float format.
  //
  // Plan shape: one fact-scan map + a 9-row map-side-combined
  // aggregate, the 1-row total joined back as a broadcast scalar.
  // At 100 TB nothing but the scan grows.
  // ---------------------------------------------------------------
  private val BenfordPpm: Seq[(Int, Long)] =
    Seq(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  private def benford(s: SparkSession, dir: String): DataFrame = {
    val expCase = BenfordPpm
      .map { case (d, p) => s"WHEN $d THEN ${p}L" }
      .mkString("CASE digit ", " ", " END")
    val digits = Tables.load(s, dir, "lineitem")
      .select(expr(
        "CAST(substring(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("total"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("CAST(n * 1000000 DIV total AS BIGINT)").as("obs_ppm"),
        expr(expCase).as("exp_ppm"),
        expr(s"CAST(n * 1000000 DIV total - ($expCase) AS BIGINT)").as("dev_ppm"))
      .orderBy("digit")
  }

  private val benfordSql = {
    val expCase = BenfordPpm
      .map { case (d, p) => s"WHEN $d THEN $p" }
      .mkString("CASE digit ", " ", " END")
    s"""WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM lineitem),
      |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      |t AS (SELECT sum(n) AS total FROM c)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
      |  CAST($expCase AS BIGINT) AS exp_ppm,
      |  CAST(n * 1000000 // total - ($expCase) AS BIGINT) AS dev_ppm
      |FROM c CROSS JOIN t
      |ORDER BY digit""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("q_benford", benford, Some(benfordSql)),
    Op("q_skyline", skyline, Some(skylineSql)),
    Op("q_hierarchy_flatten", hierarchyFlatten, Some(hierarchyFlattenSql)),
    Op("q_market_basket", marketBasket, Some(marketBasketSql)),
    Op("geo_cell_join", geoCellJoin, Some(geoCellJoinSql)),
    Op("geo_grid_density", geoGridDensity, Some(geoGridDensitySql)))
}
