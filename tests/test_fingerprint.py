"""Plan-fingerprint stability: same logical plan -> same hash across
re-builds, temp paths, and expression-id churn; a real plan change (lost
broadcast, new shuffle) -> different hash with a readable ops diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from adsb_clickhouse_spark.plans.fingerprint import (
    diff_plans,
    formatted_plan,
    normalize_plan,
    op_tree,
    plan_fingerprint,
)

SF = "/root/testdata/sf0.001"


def test_same_plan_same_hash_across_rebuilds(spark):
    def build():
        df = spark.read.parquet(f"{SF}/lineitem.parquet")
        return (
            df.filter(F.col("l_quantity") > 10)
            .groupBy("l_returnflag")
            .agg(F.sum("l_quantity").alias("s"))
        )

    fp1 = plan_fingerprint(build())
    # a throwaway plan in between shifts every expression id
    spark.range(100).select((F.col("id") * 2).alias("x")).count()
    fp2 = plan_fingerprint(build())
    assert fp1["hash"] == fp2["hash"]
    assert fp1["ops"] == fp2["ops"]


def test_path_and_id_normalization(spark, tmp_base):
    df = spark.range(50).select(F.col("id"), (F.col("id") % 5).alias("k"))
    df.write.mode("overwrite").parquet(f"{tmp_base}/a")
    df.write.mode("overwrite").parquet(f"{tmp_base}/b")

    def agg(path):
        return spark.read.parquet(path).groupBy("k").agg(F.sum("id").alias("s"))

    fp_a = plan_fingerprint(agg(f"{tmp_base}/a"))
    fp_b = plan_fingerprint(agg(f"{tmp_base}/b"))
    # different tempdirs, different expression ids -> identical fingerprint
    assert fp_a["hash"] == fp_b["hash"]
    norm = normalize_plan(formatted_plan(agg(f"{tmp_base}/a")))
    assert tmp_base not in norm
    assert "#_" in norm  # expression ids were rewritten, not dropped


def test_plan_change_changes_hash_and_names_the_join(spark):
    big = spark.range(10_000).select(F.col("id"), (F.col("id") % 100).alias("k"))
    small = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    bcast = big.join(F.broadcast(small), "k")
    smj = big.join(small.hint("merge"), "k")
    fp_b, fp_s = plan_fingerprint(bcast), plan_fingerprint(smj)
    assert fp_b["hash"] != fp_s["hash"]
    ops_b, ops_s = "\n".join(fp_b["ops"]), "\n".join(fp_s["ops"])
    assert "BroadcastHashJoin" in ops_b
    assert "SortMergeJoin" in ops_s


def test_op_tree_is_compact_header_only(spark):
    df = spark.range(10).groupBy((F.col("id") % 2).alias("k")).count()
    tree = op_tree(formatted_plan(df))
    assert any("HashAggregate" in l for l in tree)
    assert any("Exchange" in l for l in tree)
    # detail sections (Output [n]: ...) are not part of the tree
    assert not any(l.lstrip().startswith("Output") for l in tree)
    # node numbers stripped
    assert not any(l.rstrip().endswith(")") and "(" in l.split()[-1] for l in tree)


def test_diff_plans_classifies_changed_added_removed():
    prev = {
        "a": {"hash": "x1", "ops": ["A"]},
        "b": {"hash": "y1", "ops": ["B1"]},
        "gone": {"hash": "z", "ops": ["Z"]},
    }
    cur = {
        "a": {"hash": "x1", "ops": ["A"]},
        "b": {"hash": "y2", "ops": ["B2"]},
        "new": {"hash": "n", "ops": ["N"]},
    }
    d = diff_plans(prev, cur)
    assert set(d) == {"b", "+new", "-gone"}
    assert d["b"] == {"prev_ops": ["B1"], "cur_ops": ["B2"]}


def test_epoch_literal_normalization():
    # millis (13 digits) and micros (16) both normalize; unrelated
    # numbers do not
    n = normalize_plan("ts#12L > 1755312000000000, v > 1755312000123, k = 42")
    assert "<epoch>" in n and "1755312" not in n
    assert "42" in n


def test_error_fingerprints_are_stable():
    # bench.py hashes a failed fingerprint by exception TYPE only —
    # assert the convention stays stable (run-varying text in the hash
    # would flag a spurious plan change every round)
    exc = ValueError("/tmp/run-4f3a9c/part-0001.parquet missing")
    assert f"error:{type(exc).__name__}" == "error:ValueError"


def test_codegen_counter_normalization():
    # the codegen counter is JVM-global and drifts with broadcast-thread
    # scheduling — all three spellings must normalize (observed unstable
    # across identical back-to-back runs before the r12 fix)
    text = ("*(3) HashAggregate\n"
            "(32) Scan ExistingRDD [codegen id : 24]\n"
            "(65) WholeStageCodegen (24)\n"
            "Arguments: 24\n"
            "Arguments: 100, [x#12 ASC]\n")
    n = normalize_plan(text)
    assert "[codegen id : _]" in n and "codegen id : 24" not in n
    assert "WholeStageCodegen (_)" in n
    assert "\nArguments: _" in n
    # multi-valued Arguments lines are NOT digit-only and stay intact
    assert "Arguments: 100, [x#_ ASC]" in n


def test_bare_arguments_anchored_to_counter_nodes():
    # r12 advice: the blanket ^Arguments: \d+$ sub hid every digit-only
    # literal. Normalization is now anchored to the node header —
    # WholeStageCodegen / AQE *QueryStage ids (run-varying counters)
    # normalize, while CollectLimit's LIMIT literal stays and a change
    # to it fingerprints as a plan change.
    text = ("(5) ShuffleQueryStage\n"
            "Output [2]: [a#1, b#2]\n"
            "Arguments: 0\n"
            "(9) ResultQueryStage\n"
            "Arguments: 2\n"
            "(3) CollectLimit\n"
            "Input [1]: [a#1]\n"
            "Arguments: 21\n")
    n = normalize_plan(text)
    assert n.count("Arguments: _") == 2  # both QueryStage ids
    assert "Arguments: 21" in n  # the LIMIT literal survives
    changed = normalize_plan(text.replace("Arguments: 21", "Arguments: 99"))
    assert changed != n  # a pure LIMIT change IS detected now


def test_funnel_plan_probe_fires_and_is_deterministic(spark, tmp_path):
    # the CurationIngest.plan_probe hook (r12 verdict item 3): every
    # funnel stage boundary reports its frame, and two identical
    # batches against identical store state fingerprint identically —
    # the property the funnel rows in PLANS_r{N}.json depend on
    from adsb_clickhouse_spark.streaming.curation import CurationIngest

    docs = spark.range(20).selectExpr(
        "id AS doc_id",
        "concat('alpha beta gamma delta epsilon zeta ', md5(string(id))) AS text",
    )

    def run(base):
        ing = CurationIngest(str(base), run_id="fp")
        ing.process_batch(docs, batch_id=0)  # store state: one batch
        fps = {}
        ing.plan_probe = lambda stage, df: fps.setdefault(
            stage, plan_fingerprint(df)["hash"]
        )
        ing.process_batch(docs, batch_id=1)
        return fps

    a = run(tmp_path / "a")
    b = run(tmp_path / "b")
    # the base-config funnel's stages, in order of the taps
    assert set(a) == {"in", "policy", "exact_text", "store_dup", "final"}
    assert a == b  # deterministic across independent store trees
