"""Beam-YAML-style frontend tests (reference: sdks/python/apache_beam/
yaml/): YAML spec -> the same operator pipeline."""

from beam_spark.yaml_pipeline import run_yaml


def test_yaml_linear_pipeline(spark, sf_dir):
    spec = f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
    - type: Filter
      keep: "o_orderstatus = 'F'"
    - type: MapToFields
      fields:
        price_tier: "CASE WHEN o_totalprice > 100000 THEN 'high' ELSE 'low' END"
    - type: Combine
      group_by: [price_tier]
      aggregates:
        n: "count(*)"
        total: "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)"
    - type: Top
      count: 2
      order_by: ["n desc", "price_tier"]
"""
    out = run_yaml(spec, spark)
    rows = {r["price_tier"]: r["n"] for r in out.collect()}
    exact = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter("o_orderstatus = 'F'").count()
    assert sum(rows.values()) == exact and len(rows) <= 2


def test_yaml_join_with_named_step(spark, sf_dir):
    spec = f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/nation.parquet
      name: nations
    - type: ReadFromParquet
      path: {sf_dir}/region.parquet
    - type: Join
      with: nations
      condition: "r_regionkey = n_regionkey"
      broadcast: true
    - type: Combine
      group_by: [r_name]
      aggregates:
        n_nations: "count(*)"
"""
    out = run_yaml(spec, spark)
    got = {r["r_name"]: r["n_nations"] for r in out.collect()}
    assert sum(got.values()) == 25 and len(got) == 5


def test_yaml_sql_step(spark, sf_dir):
    spec = f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/customer.parquet
    - type: Sql
      query: "SELECT c_mktsegment, count(*) AS n FROM PCOLLECTION GROUP BY c_mktsegment"
"""
    out = run_yaml(spec, spark)
    assert sum(r["n"] for r in out.collect()) == \
        spark.read.parquet(f"{sf_dir}/customer.parquet").count()


def test_yaml_windowed(spark, sf_dir):
    # events needs the nanos shim, so feed it through Create
    spec = """
pipeline:
  transforms:
    - type: Create
      elements:
        - {t: "2024-01-01 00:00:10", v: 1}
        - {t: "2024-01-01 00:00:50", v: 2}
        - {t: "2024-01-01 00:02:10", v: 5}
    - type: MapToFields
      fields:
        ts: "CAST(t AS TIMESTAMP)"
    - type: WindowInto
      windowing: {type: fixed, size: 60, ts_col: ts}
    - type: Combine
      group_by: []
      aggregates:
        n: "count(*)"
"""
    out = run_yaml(spec, spark)
    counts = sorted(r["n"] for r in out.collect())
    assert counts == [1, 2]


def test_yaml_ml_and_dedup_chain(spark, sf_dir):
    """Round-2 YAML providers: Deduplicate + MLTransform + RunInference
    over the documents table."""
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/documents.parquet"},
            {"type": "MapToFields", "append": True,
             "fields": {"features":
                        "array(CAST(n_chars AS DOUBLE), "
                        "CAST(n_chars AS DOUBLE), CAST(n_chars AS DOUBLE))"}},
            {"type": "RunInference", "model": "linear_regression",
             "input_col": "features", "output_col": "score"},
            {"type": "MLTransform", "op": "scale_to_01", "col": "score"},
        ]}}, spark)
    rows = out.df.select("doc_id", "score", "score_scaled").collect()
    assert len(rows) > 0
    assert all(0.0 <= r["score_scaled"] <= 1.0 for r in rows)

    dedup = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/documents.parquet"},
            {"type": "Deduplicate", "strategy": "exact"},
        ]}}, spark)
    assert dedup.df.columns == ["content_md5", "keep_id", "dup_count"]
    assert dedup.df.count() > 0


def test_yaml_avro_roundtrip(spark, tmp_path):
    """Avro source/sink through the YAML front-end (pure-python OCF
    fallback in this container)."""
    from beam_spark.yaml_pipeline import run_yaml

    path = str(tmp_path / "y_avro")
    run_yaml(f"""
pipeline:
  transforms:
    - type: Create
      elements:
        - {{k: a, v: 1}}
        - {{k: b, v: 2}}
    - type: WriteToAvro
      path: {path}
""", spark)
    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromAvro
      path: {path}/*.avro
    - type: Filter
      keep: v > 1
""", spark)
    rows = [(r["k"], r["v"]) for r in out.collect()]
    assert rows == [("b", 2)]


def test_yaml_curation_pipeline(spark, sf_dir):
    """The curation surface drives from YAML: normalize -> gopher rules
    -> deterministic split, then constraint checks."""
    from beam_spark.yaml_pipeline import run_yaml

    spec = f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: NormalizeText
      strip_punct: true
    - type: GopherQualityFilter
      min_words: 20
      min_stopword_hits: 1
    - type: SplitByHash
      splits: {{train: 0.8, val: 0.2}}
      id_col: doc_id
"""
    out = run_yaml(spec, spark)
    rows = out.df.select("doc_id", "norm_text", "keep", "split").collect()
    assert len(rows) == 500
    assert {r["split"] for r in rows} <= {"train", "val"}
    assert any(r["keep"] == 1 for r in rows)

    check_spec = f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
    - type: CheckConstraints
      checks:
        orderkey_unique: count(DISTINCT o_orderkey) = count(*)
        price_positive: min(o_totalprice) > 0
"""
    checks = run_yaml(check_spec, spark)
    got = {r["check"]: r["passed"] for r in checks.df.collect()}
    assert got == {"orderkey_unique": 1, "price_positive": 1}


def test_yaml_bpe_encode(spark, sf_dir):
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: BpeEncode
      n_merges: 40
""", spark)
    rows = out.df.select("doc_id", "n_bpe_tokens").limit(5).collect()
    assert all(r["n_bpe_tokens"] > 0 for r in rows)


def test_yaml_curriculum_and_outliers(spark, sf_dir):
    """Round-6 YAML additions: FlagOutliers + CurriculumBuckets drive
    declaratively (the quantile-boundary default plan)."""
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/events.parquet
    - type: FlagOutliers
      columns: value
    - type: CurriculumBuckets
      score_col: value
      id_col: event_id
      n_buckets: 4
""", spark)
    rows = out.df.select("event_id", "value_outlier", "bucket").collect()
    assert {r["bucket"] for r in rows} == {1, 2, 3, 4}
    assert all(r["value_outlier"] in (0, 1) for r in rows)


def test_yaml_line_dedup(spark, sf_dir):
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: LineDedup
""", spark)
    cols = set(out.df.columns)
    assert {"text", "n_kept", "n_dropped"} <= cols
    assert out.df.count() > 0


def test_yaml_rollup(spark, sf_dir):
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/lineitem.parquet
    - type: GroupByRollup
      keys: [l_returnflag, l_linestatus]
      aggs: {{n: "count(*)"}}
""", spark)
    rows = out.df.collect()
    gids = {r["grouping_id"] for r in rows}
    assert gids == {0, 1, 3}          # rollup levels
    total = [r["n"] for r in rows if r["grouping_id"] == 3]
    assert total and total[0] == sum(
        r["n"] for r in rows if r["grouping_id"] == 0)


def test_yaml_ks_drift_and_stratified(spark, sf_dir):
    """Round-7 YAML surface: two-frame KsDrift via a named reference
    step; StratifiedSample through the generic curation adapter."""
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
      name: ref
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
    - type: KsDrift
      reference: ref
      col: o_totalprice
""", spark)
    r = out.df.collect()[0]
    assert r["ks_stat"] == 0.0 and r["p_value"] == 1.0  # same frame

    out2 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/events.parquet
    - type: StratifiedSample
      stratum_col: event_type
      id_col: event_id
      n: 7
""", spark)
    by = {r[0]: r[1]
          for r in out2.df.groupBy("event_type").count().collect()}
    assert by and all(v <= 7 for v in by.values())


def test_yaml_bm25_retrieval(spark, sf_dir):
    """Bm25TopK / Bm25fTopK as YAML transforms with a named query
    step; fields as {column: [weight, b]}."""
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: Sql
      query: "SELECT doc_id AS query_id, text FROM PCOLLECTION WHERE doc_id < 3"
      name: qs
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: Bm25TopK
      queries: qs
      k: 3
""", spark)
    rows = out.df.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    assert all(r["rank"] <= 3 for r in rows)

    out2 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: Sql
      query: "SELECT doc_id AS query_id, text FROM PCOLLECTION WHERE doc_id < 3"
      name: qs
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: MapToFields
      fields:
        title: "array_join(slice(split(lower(trim(text)), '\\\\s+'), 1, 5), ' ')"
        body: "text"
    - type: Bm25fTopK
      queries: qs
      k: 3
      fields:
        title: [3.0, 0.5]
        body: [1.0, 0.75]
""", spark)
    rows2 = out2.df.collect()
    assert {r["query_id"] for r in rows2} == {0, 1, 2}


def test_yaml_round7_ops(spark, sf_dir):
    """Histogram / Ewma via the generic adapter; ScdType2Apply with a
    named dimension step."""
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
    - type: Histogram
      col: o_totalprice
      n_bins: 10
""", spark)
    rows = out.df.collect()
    assert sum(r["n"] for r in rows) == \
        spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    out2 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/events.parquet
    - type: Ewma
      col: value
      alpha: 0.5
      keys: user_id
      order_by: [ts, event_id]
""", spark)
    assert "ewma" in out2.df.columns and out2.df.count() > 0

    out3 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/customer.parquet
    - type: Sql
      query: "SELECT c_custkey AS id, c_mktsegment AS seg,
              CAST(0 AS BIGINT) AS valid_from,
              CAST(NULL AS BIGINT) AS valid_to FROM PCOLLECTION"
      name: dim
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
    - type: Sql
      query: "SELECT o_custkey AS id, o_orderpriority AS seg,
              CAST(o_orderkey AS BIGINT) AS ts FROM PCOLLECTION"
    - type: ScdType2Apply
      dimension: dim
      key: id
""", spark)
    df3 = out3.df
    assert {"id", "seg", "valid_from", "valid_to"} <= set(df3.columns)
    assert df3.filter("valid_to IS NULL").count() > 0


def test_yaml_round8_ops(spark, sf_dir):
    """Round-8 scalar-kwarg ops through the generic YAML adapter:
    HoltLinear, SeasonalDecompose, UrlNormalize, MisraGries,
    SortedNeighborhoodPairs, CdcApply."""
    from beam_spark.yaml_pipeline import run_yaml

    out = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/events.parquet
    - type: HoltLinear
      col: value
      alpha: 0.5
      beta: 0.25
      keys: user_id
      order_by: [ts, event_id]
""", spark)
    assert {"level", "trend"} <= set(out.df.columns)
    assert out.df.count() > 0

    out2 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/events.parquet
    - type: SeasonalDecompose
      col: value
      period: 7
      keys: user_id
      order_by: [ts, event_id]
""", spark)
    assert {"trend", "seasonal", "remainder"} <= set(out2.df.columns)

    out3 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/documents.parquet
    - type: MapToFields
      fields:
        url: "'https://ex' || CAST(doc_id % 7 AS STRING) || '.com/a?b=1'"
    - type: UrlNormalize
""", spark)
    assert {"url_norm", "host", "domain"} <= set(out3.df.columns)

    out4 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
    - type: MapToFields
      append: false
      fields:
        item: "o_orderpriority"
    - type: MisraGries
      col: item
      k: 10
""", spark)
    assert {"item", "est"} == set(out4.df.columns)
    assert 0 < out4.df.count() <= 10 * 64

    out5 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/part.parquet
    - type: SortedNeighborhoodPairs
      key_col: p_name
      id_col: p_partkey
      window: 3
""", spark)
    assert {"i", "j", "d"} == set(out5.df.columns)

    out6 = run_yaml(f"""
pipeline:
  transforms:
    - type: ReadFromParquet
      path: {sf_dir}/orders.parquet
    - type: MapToFields
      append: false
      fields:
        id: "o_custkey"
        ts: "o_orderdate"
        seq: "o_orderkey"
        op: "'U'"
        price: "o_totalprice"
    - type: CdcApply
      key: id
      order_by: [ts, seq]
""", spark)
    assert "op" not in out6.df.columns
    assert out6.df.count() == out6.df.select("id").distinct().count()


def test_yaml_round11_eval_ops(spark, sf_dir):
    """Round-11 session-2 YAML surface: single-frame ops (SkewProfile,
    CohensKappa) through the generic adapter; two-frame
    ReconcileTables and QuantileTransform via named-step references."""
    from beam_spark.yaml_pipeline import run_yaml

    skew = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/orders.parquet"},
            {"type": "SkewProfile", "keys": "o_custkey"},
        ]}}, spark)
    r = skew.df.collect()[0]
    assert r["n_rows"] > 0 and 0.0 <= r["gini"] < 1.0

    rec = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet", "name": "after",
             "path": f"{sf_dir}/orders.parquet"},
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/orders.parquet"},
            {"type": "ReconcileTables", "other": "after",
             "keys": "o_orderkey"},
        ]}}, spark)
    out = {(x["kind"], x["name"]): x["n"] for x in rec.df.collect()}
    assert out[("rows", "changed")] == 0 and out[("rows", "added")] == 0

    qt = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet", "name": "ref",
             "path": f"{sf_dir}/events.parquet"},
            {"type": "Filter", "keep": "value IS NOT NULL"},
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/events.parquet"},
            {"type": "Filter", "keep": "value IS NOT NULL"},
            {"type": "QuantileTransform", "reference": "ref",
             "col": "value"},
        ]}}, spark)
    assert "value_q" in qt.df.columns and qt.df.count() > 0


def test_yaml_round12_session3_ops(spark, sf_dir):
    """Session-3 YAML surface: single-frame stats/privacy ops via the
    generic adapter; two-frame NaiveBayesClassify and
    QueryLikelihoodTopK via named-step references."""
    from beam_spark.yaml_pipeline import run_yaml

    kan = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/customer.parquet"},
            {"type": "KAnonymity",
             "quasi": ["c_nationkey", "c_mktsegment"],
             "sensitive": "c_acctbal", "k": 10},
        ]}}, spark)
    r = kan.df.collect()[0]
    assert r["n_rows"] > 0 and r["k_anonymity"] >= 1

    fit = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/lineitem.parquet"},
            {"type": "LinearFit", "x": "l_quantity",
             "y": "l_extendedprice", "keys": "l_returnflag"},
        ]}}, spark)
    assert {row["l_returnflag"] for row in fit.df.collect()} \
        == {"A", "N", "R"}

    nb = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet", "name": "train",
             "path": f"{sf_dir}/documents.parquet"},
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/documents.parquet"},
            {"type": "Filter", "keep": "doc_id % 2 = 1"},
            {"type": "NaiveBayesClassify", "train": "train",
             "label_col": "lang", "id_col": "doc_id"},
        ]}}, spark)
    rows = nb.df.collect()
    assert rows and all(row["predicted"] is not None for row in rows)

    ql = run_yaml({
        "pipeline": {"transforms": [
            {"type": "ReadFromParquet", "name": "qs",
             "path": f"{sf_dir}/documents.parquet"},
            {"type": "Filter", "input": "qs", "name": "qs2",
             "keep": "doc_id < 2"},
            {"type": "Sql", "name": "qs3",
             "query": "SELECT doc_id AS query_id, text FROM qs2"},
            {"type": "ReadFromParquet",
             "path": f"{sf_dir}/documents.parquet"},
            {"type": "QueryLikelihoodTopK", "queries": "qs3", "k": 3},
        ]}}, spark)
    out = ql.df.collect()
    assert out and all(1 <= row["rank"] <= 3 for row in out)
