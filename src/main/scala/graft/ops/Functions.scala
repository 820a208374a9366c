package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Scalar-function queries: string/date/math/conditional/json/array/map
  * (SURVEY.md §2.B q_fn_*). Each one exercises a family of codegen'd
  * Catalyst expressions and pins its DuckDB twin, with explicit casts where
  * the engines' return types differ (DuckDB len/levenshtein → BIGINT,
  * sign → TINYINT, floor → DOUBLE, etc.).
  */
object Functions {
  def queries: Map[String, Q] = Map(
    "q_fn_string" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "part")
          .select(col("p_partkey"),
            substring(col("p_name"), 1, 8).as("sub8"),
            upper(col("p_brand")).as("up"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("cc"),
            length(col("p_name")).as("len"),
            element_at(split(col("p_name"), " "), 1).as("tok1"),
            regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
            levenshtein(col("p_brand"), lit("Brand#1")).as("lev"),
            replace(col("p_name"), lit(" "), lit("_")).as("rep"),
            lpad(col("p_brand"), 10, "*").as("lp"))
          .orderBy("p_partkey"),
      Some("SELECT p_partkey, p_name[1:8] AS sub8, UPPER(p_brand) AS up, " +
        "p_brand || '/' || p_type AS cc, " +
        "CAST(LENGTH(p_name) AS INT) AS len, " +
        "split_part(p_name, ' ', 1) AS tok1, " +
        "regexp_extract(p_name, '(\\w+)$', 1) AS last_word, " +
        "CAST(levenshtein(p_brand, 'Brand#1') AS INT) AS lev, " +
        "replace(p_name, ' ', '_') AS rep, " +
        "lpad(p_brand, 10, '*') AS lp " +
        "FROM part ORDER BY p_partkey")),

    "q_fn_datetime" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"),
            Cols.epochUs(date_trunc("month", col("o_orderdate")))
              .as("mon_us"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            (expr("weekday(o_orderdate)") + 1).as("isodow"),
            datediff(col("o_orderdate").cast("date"),
              lit("1995-01-01").cast("date")).as("days_since"),
            Cols.epochUs(col("o_orderdate") + expr("INTERVAL 1 MONTH"))
              .as("plus_month_us"))
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, epoch_us(date_trunc('month', o_orderdate)) " +
        "AS mon_us, CAST(year(o_orderdate) AS INT) AS yr, " +
        "CAST(month(o_orderdate) AS INT) AS mo, " +
        "CAST(day(o_orderdate) AS INT) AS dom, " +
        "CAST(isodow(o_orderdate) AS INT) AS isodow, " +
        "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) " +
        "AS INT) AS days_since, " +
        "epoch_us(o_orderdate + INTERVAL 1 MONTH) AS plus_month_us " +
        "FROM orders ORDER BY o_orderkey")),

    "q_fn_math" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .select(
            (col("l_orderkey") * 10L + col("l_linenumber")).as("line_id"),
            Cols.fround(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
            Cols.fround(exp(col("l_discount")), 6).as("exp_d"),
            pow(col("l_quantity"), 2).as("qty_sq"),
            abs(col("l_tax") - 0.04).as("tax_gap"),
            signum(col("l_discount") - 0.05).as("sgn"),
            floor(col("l_extendedprice") / 1000.0).as("floor_k"),
            ceil(col("l_extendedprice") / 1000.0).as("ceil_k"))
          .orderBy("line_id", "sqrt_p", "exp_d", "qty_sq", "tax_gap", "sgn"),
      Some("SELECT l_orderkey*10+l_linenumber AS line_id, " +
        Cols.froundSql("SQRT(l_extendedprice)", 6) + " AS sqrt_p, " +
        Cols.froundSql("EXP(l_discount)", 6) + " AS exp_d, " +
        "POW(l_quantity, 2) AS qty_sq, " +
        "ABS(l_tax - 0.04) AS tax_gap, " +
        "CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn, " +
        "CAST(FLOOR(l_extendedprice/1000.0) AS BIGINT) AS floor_k, " +
        "CAST(CEIL(l_extendedprice/1000.0) AS BIGINT) AS ceil_k " +
        "FROM lineitem " +
        "ORDER BY line_id, sqrt_p, exp_d, qty_sq, tax_gap, sgn")),

    "q_fn_case_null" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"),
            when(col("o_orderstatus") === "O", "open")
              .when(col("o_orderstatus") === "F", "done")
              .otherwise("other").as("status_word"),
            when(col("o_totalprice") > 300000.0, "big")
              .when(col("o_totalprice") > 150000.0, "mid")
              .otherwise("small").as("bucket"),
            coalesce(nullif(col("o_orderpriority"), lit("3-MEDIUM")),
              lit("(med)")).as("prio_or_med"),
            nullif(col("o_orderstatus"), lit("P")).as("status_np"))
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, " +
        "CASE WHEN o_orderstatus = 'O' THEN 'open' " +
        "WHEN o_orderstatus = 'F' THEN 'done' ELSE 'other' END " +
        "AS status_word, " +
        "CASE WHEN o_totalprice > 300000.0 THEN 'big' " +
        "WHEN o_totalprice > 150000.0 THEN 'mid' ELSE 'small' END AS bucket, " +
        "COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), '(med)') " +
        "AS prio_or_med, " +
        "NULLIF(o_orderstatus, 'P') AS status_np " +
        "FROM orders ORDER BY o_orderkey")),

    "q_fn_json" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            from_json(col("props"), org.apache.spark.sql.types.StructType
              .fromDDL("k INT")).getField("k").as("k_int"))
          .orderBy("event_id"),
      Some("SELECT event_id, json_extract_string(props, '$.k') AS k_str, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS k_int " +
        "FROM events ORDER BY event_id")),

    "q_fn_array" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "embeddings")
          .select(col("vec_id"),
            size(col("embedding")).as("dim"),
            element_at(col("embedding"), 1).as("e1"),
            element_at(col("embedding"), 32).as("e32"),
            element_at(col("embedding"), size(col("embedding"))).as("e_last"),
            array_max(col("embedding")).as("emax"),
            array_min(col("embedding")).as("emin"),
            array_position(col("embedding"), array_max(col("embedding")))
              .as("argmax"))
          .orderBy("vec_id"),
      Some("SELECT vec_id, CAST(len(embedding) AS INT) AS dim, " +
        "embedding[1] AS e1, embedding[32] AS e32, " +
        "embedding[len(embedding)] AS e_last, " +
        "list_max(embedding) AS emax, list_min(embedding) AS emin, " +
        "CAST(list_position(embedding, list_max(embedding)) AS BIGINT) " +
        "AS argmax FROM embeddings ORDER BY vec_id")),

    "q_fn_hof" -> Q(
      (spark, dir) =>
        // lambda higher-order functions — the Catalyst machinery
        // (LambdaFunction + HigherOrderFunction, codegen-free but
        // whole-stage-adjacent) behind every in-row array computation
        // over an embedding column: transform to the exact ×1e7 integer
        // plane, aggregate for the fold (L2², and a dot product against
        // the reversed vector via zip_with — the brief's
        // aggregate/zip_with dot-product shape), filter+size for a
        // count, exists/forall for the quantifiers. All outputs scalar
        // and exact (integer sums; double-compared booleans), so the
        // whole family hash-oracles.
        Tables(spark, dir, "embeddings")
          // the quantized array is computed ONCE per row and reused by
          // every fold below (4 transforms → 1: 3.4 → ~1 s at 8×)
          .withColumn("qe", expr("transform(embedding, x -> " +
            "CAST(ROUND(CAST(x AS DOUBLE)*10000000, 0) AS BIGINT))"))
          .select(col("vec_id"),
            expr("aggregate(qe, 0L, (acc, x) -> acc + x*x)")
              .as("l2sq_q"),
            expr("aggregate(zip_with(qe, reverse(qe), (a, b) -> a*b), " +
              "0L, (acc, x) -> acc + x)").as("dot_rev_q"),
            // count on the SAME quantized plane the oracle uses — a raw
            // value in (0, 5e-8) rounds to 0 and must not count
            expr("CAST(size(filter(qe, x -> x > 0L)) AS BIGINT)")
              .as("n_pos"),
            expr("exists(embedding, x -> CAST(x AS DOUBLE) > 0.45)")
              .as("has_hi"),
            expr("forall(embedding, x -> CAST(x AS DOUBLE) > -1.0)")
              .as("all_gt"))
          .orderBy("vec_id"),
      Some("WITH x AS (SELECT vec_id, CAST(i AS INT) AS i, v, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
        "FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
        "unnest(embedding) AS v FROM embeddings)), " +
        "n AS (SELECT vec_id, MAX(i) AS n FROM x GROUP BY 1), " +
        "rev AS (SELECT a.vec_id, CAST(SUM(a.q * b.q) AS BIGINT) AS " +
        "dot_rev_q FROM x a JOIN n USING (vec_id) " +
        "JOIN x b ON b.vec_id = a.vec_id AND b.i = n.n + 1 - a.i " +
        "GROUP BY 1), " +
        "agg AS (SELECT vec_id, CAST(SUM(q*q) AS BIGINT) AS l2sq_q, " +
        "CAST(COUNT(*) FILTER (WHERE q > 0) AS BIGINT) AS n_pos, " +
        "BOOL_OR(CAST(v AS DOUBLE) > 0.45) AS has_hi, " +
        "BOOL_AND(CAST(v AS DOUBLE) > -1.0) AS all_gt " +
        "FROM x GROUP BY 1) " +
        "SELECT agg.vec_id, l2sq_q, dot_rev_q, n_pos, has_hi, all_gt " +
        "FROM agg JOIN rev USING (vec_id) ORDER BY vec_id")),

    "q_fn_map" -> Q(
      (spark, dir) => {
        // token counts built into a MapType per doc (map_from_entries over
        // a sorted entry array), then exploded back out — exercises the
        // Generator + MapType path while keeping row-shaped output.
        val toks = Tables(spark, dir, "documents")
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        toks.groupBy("doc_id")
          .agg(map_from_entries(array_sort(
            collect_list(struct(col("token"), col("cnt"))))).as("tok_map"))
          .select(col("doc_id"), explode(col("tok_map")).as(Seq("token", "cnt")))
          .orderBy("doc_id", "token")
      },
      Some("SELECT doc_id, tok AS token, COUNT(*) AS cnt FROM " +
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents) WHERE tok <> '' " +
        "GROUP BY doc_id, tok ORDER BY doc_id, token")),

    "q_fn_nested" -> Q(
      (spark, dir) =>
        // nested-type export shape: group each customer's orders into a
        // sorted array<struct> and serialize with to_json (the standard
        // "rows → nested documents" sink stage), then parse the FIRST
        // element back out through from_json — both directions of the
        // nested path in one oracle-checked query. Spark's compact JSON
        // and DuckDB's to_json(list(struct_pack ...)) are byte-identical
        // for integer/string fields (no doubles: float formatting is
        // engine-specific).
        Tables(spark, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            to_json(sort_array(collect_list(
              struct(col("o_orderkey").as("k"),
                col("o_orderstatus").as("s"))))).as("orders_json"))
          .select(col("o_custkey"), col("n_orders"), col("orders_json"),
            element_at(from_json(col("orders_json"),
              org.apache.spark.sql.types.DataTypes.createArrayType(
                org.apache.spark.sql.types.StructType.fromDDL(
                  "k BIGINT, s STRING"))), 1).getField("k").as("first_k"))
          .orderBy("o_custkey"),
      Some("SELECT o_custkey, COUNT(*) AS n_orders, " +
        "CAST(to_json(list(struct_pack(k := o_orderkey, " +
        "s := o_orderstatus) ORDER BY o_orderkey, o_orderstatus)) " +
        "AS VARCHAR) AS orders_json, " +
        "MIN(o_orderkey) AS first_k " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey")))
}
