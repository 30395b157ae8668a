package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality operators — the Deequ/dbt-test shape every warehouse
  * runs before trusting a load: column profiling (q62) and declarative
  * constraint validation (q63).
  *
  * Scale shape: q62 is ONE pass over the table — all null counts,
  * distinct counts and min/max come from a single aggregate (the
  * multi-distinct Expand, same machinery as q10), then a `stack`
  * unpivot of the one result row; at petabyte scale the exact
  * distincts swap for the q39 HLL sketches without changing the
  * frame. q63's row rules are one conditional aggregate over one scan;
  * the referential rule is a broadcast-able anti-join — violations,
  * never full joins, cross the network. */
object Quality {

  /** (column, null-count expr, distinct expr, min repr, max repr) —
    * representations are strings with engine-identical rendering:
    * integers/dates/strings cast directly, doubles via exact cents. */
  private def profiled: Seq[(String, Column, Column)] = Seq(
    ("o_orderkey", col("o_orderkey"), col("o_orderkey").cast("string")),
    ("o_custkey", col("o_custkey"), col("o_custkey").cast("string")),
    ("o_orderstatus", col("o_orderstatus"), col("o_orderstatus")),
    ("o_totalprice", col("o_totalprice"),
      Det.cents(col("o_totalprice")).cast("long").cast("string")),
    ("o_orderdate", col("o_orderdate"), col("o_orderdate").cast("string")),
    ("o_orderpriority", col("o_orderpriority"), col("o_orderpriority")))

  /** Column profile of `orders` (q62): per column — nulls, exact
    * distincts, min/max in a canonical string rendering — plus the
    * table row count on every row. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val aggs = profiled.flatMap { case (name, c, repr) =>
      Seq(
        count(lit(1)).minus(count(c)).cast("long").as(s"nn_$name"),
        countDistinct(c).cast("long").as(s"nd_$name"),
        min(repr).as(s"mn_$name"),
        max(repr).as(s"mx_$name"))
    }
    val one = Tables.orders(s, dir)
      .agg(count(lit(1)).cast("long").as("n_rows"), aggs: _*)
    val stackArgs = profiled.map { case (name, _, _) =>
      s"'$name', nn_$name, nd_$name, mn_$name, mx_$name"
    }.mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${profiled.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_repr, max_repr)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")
      .orderBy("col_name")
  }

  /** TPC-H-shaped rule set for q63. */
  val QuantityMin = 1.0
  val QuantityMax = 50.0
  val DiscountMax = 0.11

  /** Constraint validation (q63): violation counts per declared rule —
    * range rules as conditional sums over one lineitem scan, the
    * referential rule as an anti-join against orders. Zero counts on
    * clean data are the point: the spec proves the rules fire on
    * constructed dirty rows. */
  def constraints(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    def viol(name: String, bad: Column): Column =
      struct(lit(name).as("rule"),
        sum(bad.cast("long")).cast("long").as("n_violations"))
    val rowRules = l.agg(
      viol("quantity_range",
        !(col("l_quantity") >= QuantityMin && col("l_quantity") <= QuantityMax)
          || col("l_quantity").isNull).as("r1"),
      viol("discount_range",
        !(col("l_discount") >= 0.0 && col("l_discount") <= DiscountMax)
          || col("l_discount").isNull).as("r2"),
      viol("price_positive",
        !(col("l_extendedprice") > 0.0) || col("l_extendedprice").isNull).as("r3"))
      .select(explode(array(col("r1"), col("r2"), col("r3"))).as("v"))
      .select(col("v.rule").as("rule"), col("v.n_violations").as("n_violations"))
    val orphan = l.select(col("l_orderkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit("orderkey_exists").as("rule"), col("n_violations"))
    rowRules.unionByName(orphan).orderBy("rule")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_data_profile" -> (profile _),
    "q63_constraints" -> (constraints _)
  )

  val oracles: Map[String, String] = Map(
    "q62_data_profile" -> {
      val reprSql = Map(
        "o_orderkey" -> "CAST(o_orderkey AS VARCHAR)",
        "o_custkey" -> "CAST(o_custkey AS VARCHAR)",
        "o_orderstatus" -> "o_orderstatus",
        "o_totalprice" -> "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
        "o_orderdate" -> "CAST(o_orderdate AS VARCHAR)",
        "o_orderpriority" -> "o_orderpriority")
      profiled.map { case (name, _, _) =>
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
           | count(*) - count($name) AS n_nulls,
           | count(DISTINCT $name) AS n_distinct,
           | min(${reprSql(name)}) AS min_repr,
           | max(${reprSql(name)}) AS max_repr
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
    },
    "q63_constraints" ->
      s"""SELECT rule, n_violations FROM (
         | SELECT 'quantity_range' AS rule,
         |  CAST(sum(CAST(NOT (l_quantity >= $QuantityMin AND l_quantity <= $QuantityMax)
         |       OR l_quantity IS NULL AS BIGINT)) AS BIGINT) AS n_violations
         | FROM lineitem
         | UNION ALL
         | SELECT 'discount_range',
         |  CAST(sum(CAST(NOT (l_discount >= 0.0 AND l_discount <= $DiscountMax)
         |       OR l_discount IS NULL AS BIGINT)) AS BIGINT)
         | FROM lineitem
         | UNION ALL
         | SELECT 'price_positive',
         |  CAST(sum(CAST(NOT (l_extendedprice > 0.0)
         |       OR l_extendedprice IS NULL AS BIGINT)) AS BIGINT)
         | FROM lineitem
         | UNION ALL
         | SELECT 'orderkey_exists',
         |  (SELECT count(*) FROM lineitem l
         |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
         |ORDER BY rule""".stripMargin
  )
}
