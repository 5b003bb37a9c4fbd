package graft.ops

import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.functions.Det._

/** Scalar function coverage: string, date/time, math, conditional, JSON.
  * The reference's only scalar op is epoch→timestamp
  * (`/root/reference/consumer/sensor_data_consumer.py:132`, mapped in
  * [[graft.pipeline.Pipeline]]); this module supplies the standard scalar
  * library over the harness tables. Everything here is a codegen'd
  * built-in `Column` expression — no UDFs — so the whole stage fuses.
  *
  * Cross-engine care: only IEEE-exact math ops are oracle-checked (abs,
  * sqrt, floor/ceil, sign, x*x); libm-dependent ops (ln, pow) are kept
  * out of oracle outputs. Int widths are pinned with explicit casts
  * (DuckDB length/extract return BIGINT, Spark INT).
  */
object Scalars {

  val all: Seq[Q] = Seq(
    // --- q18: string functions.
    Q(
      "q18_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  lower(p_brand) AS lo_brand,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substr(p_name, 1, 5) AS name_pfx,
        |  concat(p_brand, '/', p_type) AS brand_type,
        |  replace(p_name, ' ', '_') AS snake_name,
        |  p_name LIKE '%red%' AS has_red,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  lpad(p_brand, 12, '*') AS padded,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("lo_brand"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake_name"),
          col("p_name").like("%red%").as("has_red"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey")
    },

    // --- q19: date/time functions.
    Q(
      "q19_date_funcs",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dd,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER) AS dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER) AS days_since_epoch0,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      val od = col("o_orderdate").cast("date")
      orders(s, d)
        .select(
          col("o_orderkey"),
          od.as("order_date"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dd"),
          quarter(col("o_orderdate")).as("q"),
          (dayofweek(od) - 1).as("dow"),
          trunc(od, "month").as("month_start"),
          date_add(od, 30).as("plus_30d"),
          datediff(od, to_date(lit("1995-01-01"))).as("days_since_epoch0"),
          last_day(od).as("month_end"))
        .orderBy("o_orderkey")
    },

    // --- q20: math functions (IEEE-exact subset only; see scaladoc).
    Q(
      "q20_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS abs_dev,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  sqrt(l_quantity) AS sqrt_qty,
        |  l_quantity * l_quantity AS qty_sq,
        |  CAST(l_linenumber % 3 AS INTEGER) AS ln_mod3,
        |  CAST(sign(l_quantity - 25.0) AS INTEGER) AS dev_sign,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_orderkey") % 7 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25.0).as("abs_dev"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          floor(col("l_extendedprice")).as("floor_price"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          (col("l_linenumber") % 3).as("ln_mod3"),
          signum(col("l_quantity") - 25.0).cast("int").as("dev_sign"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          least(col("l_tax"), col("l_discount")).as("min_rate"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // --- q26: array + map function coverage over the embedding column:
    // size/min/max, HOF filter/exists/forall, slice with fixed-point
    // fold, and map construction + extraction. All scalar outputs (no
    // raw arrays/maps in the result — cross-engine encodings differ).
    Q(
      "q26_array_map_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  list_max(embedding) AS vmax,
        |  list_min(embedding) AS vmin,
        |  CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0)) AS INTEGER) AS n_pos,
        |  len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.3)) > 0 AS any_big,
        |  len(list_filter(embedding, x -> NOT (abs(CAST(x AS DOUBLE)) < 1.0))) = 0 AS all_small,
        |  CAST(list_sum(list_transform(embedding[1:3],
        |       x -> CAST(floor(CAST(x AS DOUBLE) * 1.0e6) AS BIGINT))) AS BIGINT) AS first3_fp,
        |  map(['lo','hi'], [list_min(embedding), list_max(embedding)])['hi'][1] AS map_hi
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin
    ) { (s, d) =>
      embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          array_max(col("embedding")).as("vmax"),
          array_min(col("embedding")).as("vmin"),
          size(filter(col("embedding"), x => x.cast("double") > 0.0)).as("n_pos"),
          exists(col("embedding"), x => x.cast("double") > 0.3).as("any_big"),
          forall(col("embedding"), x => abs(x.cast("double")) < 1.0).as("all_small"),
          aggregate(
            transform(slice(col("embedding"), 1, 3),
              x => floor(x.cast("double") * 1.0e6).cast("long")),
            lit(0L), (a, v) => a + v).as("first3_fp"),
          element_at(
            map_from_arrays(
              array(lit("lo"), lit("hi")),
              array(array_min(col("embedding")), array_max(col("embedding")))),
            "hi").as("map_hi"))
        .orderBy("vec_id")
    },

    // --- q21: conditional logic (CASE WHEN) + agg.
    Q(
      "q21_case_bucket",
      """SELECT o_orderstatus,
        |  CASE WHEN o_totalprice < 50000 THEN 'S'
        |       WHEN o_totalprice < 150000 THEN 'M'
        |       WHEN o_totalprice < 300000 THEN 'L'
        |       ELSE 'XL' END AS bucket,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY o_orderstatus, bucket""".stripMargin
    ) { (s, d) =>
      orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "S")
            .when(col("o_totalprice") < 150000, "M")
            .when(col("o_totalprice") < 300000, "L")
            .otherwise("XL"))
        .groupBy("o_orderstatus", "bucket")
        .agg(count(lit(1)).as("cnt"), davg(col("o_totalprice")).as("avg_price"))
        .orderBy("o_orderstatus", "bucket")
    },

    // --- q22: JSON extraction from the events.props payload column.
    Q(
      "q22_json_extract",
      """SELECT COALESCE(CAST(props->>'$.k' AS INTEGER), -1) AS k,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS avg_value
        |FROM events
        |GROUP BY 1
        |ORDER BY k""".stripMargin
    ) { (s, d) =>
      // schema'd from_json (not get_json_object string-probing): the
      // parse happens once per row against a typed struct
      // COALESCE the group key: a malformed/missing k would otherwise
      // sort NULLS FIRST in Spark but NULLS LAST in DuckDB
      events(s, d)
        .select(
          coalesce(
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k"),
            lit(-1)).as("k"),
          col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("cnt"), davg(col("value")).as("avg_value"))
        .orderBy("k")
    }
  )
}
