"""CV engine invariants (FIXTURES.md §5) on the sf0.001 ML fixture:
orders⋈customer with binary target, logistic-regression wrapper."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from fastmlframework_spark.ml.cv import CVPredictor
from fastmlframework_spark.ml.wrappers import ModelWrapper, clamp_hyperparams
from fastmlframework_spark.queries.analytics import ml_train_table

FEATURES = ["o_totalprice", "c_acctbal", "order_year", "o_orderpriority"]


@pytest.fixture(scope="module")
def fixture_frames(spark, sf_dir_small):
    df = ml_train_table(spark, sf_dir_small)
    train = df.filter(F.col("key") % 4 != 0).cache()
    test = df.filter(F.col("key") % 4 == 0).drop("target").cache()
    train.count(), test.count()
    return train, test


def test_cv_proba_bagged(fixture_frames):
    train, test = fixture_frames
    predictor = CVPredictor(
        ModelWrapper("logistic_regression", "classification", seed=27),
        metric="roc_auc_score",
        k=3,
        seeds=(27, 99),
        stratified=True,
        predict_probability=True,
        target_decimals=6,
    )
    res = predictor.run(train, test, "key", "target", FEATURES)

    n_train = train.count()
    oof = res.oof.cache()
    # exactly one OOF row per train key, predictions non-null in [0,1]
    assert oof.count() == n_train
    assert oof.select("key").distinct().count() == n_train
    assert oof.filter(F.col("target_oof").isNull()).count() == 0
    mn, mx = oof.agg(F.min("target_oof"), F.max("target_oof")).first()
    assert 0.0 <= mn <= mx <= 1.0

    # bagged mean equals row-mean of per-seed columns (to rounding)
    bad = oof.filter(
        F.abs(
            F.col("target_oof") - F.round((F.col("seed_27") + F.col("seed_99")) / 2, 6)
        )
        > 1e-9
    ).count()
    assert bad == 0

    # cv_results: one entry per seed, scores in (0,1], std finite
    assert [r["seed"] for r in res.cv_results] == [27, 99]
    for r in res.cv_results:
        assert len(r["cv_score_per_each_fold"]) == 3
        assert 0.0 < r["cv_mean_score"] <= 1.0
        assert math.isfinite(r["cv_std"])

    # test predictions: one row per test key
    n_test = test.count()
    assert res.test_pred.count() == n_test
    assert res.test_pred.filter(F.col("target").isNull()).count() == 0

    # importance table covers every feature
    feats = {r.feature for r in res.feature_importance.collect()}
    assert feats == set(FEATURES)


def test_cv_label_mode_int_cast(fixture_frames):
    train, test = fixture_frames
    predictor = CVPredictor(
        ModelWrapper("logistic_regression", "classification", seed=27),
        metric="accuracy_score",
        k=3,
        seeds=(27,),
        stratified=True,
        predict_probability=False,
        target_decimals=0,
    )
    res = predictor.run(train, test, "key", "target", FEATURES)
    assert dict(res.oof.dtypes)["target_oof"] == "bigint"
    labels = {r.target_oof for r in res.oof.select("target_oof").distinct().collect()}
    assert labels <= {0, 1}
    assert res.cv_results[0]["cv_mean_score"] > 0.5  # better than chance
    assert dict(res.test_pred.dtypes)["target"] == "bigint"


def test_wrapper_factory_and_clamps(spark):
    clamped = clamp_hyperparams(
        {"maxDepth": 3.7, "stepSize": 2.0, "regParam": -1.0, "custom": "x"}
    )
    assert clamped == {
        "maxDepth": 4,
        "stepSize": 1.0,
        "regParam": 0.0,
        "custom": "x",
    }
    with pytest.raises(ValueError, match="no estimator"):
        ModelWrapper("nope", "classification")._estimator()
    # alias + param application
    est = ModelWrapper(
        "lightgbm", "classification", params={"maxDepth": 3, "maxIter": 5}
    )._estimator()
    assert est.getMaxDepth() == 3 and est.getMaxIter() == 5


def test_gbt_regression_smoke(spark, sf_dir_small):
    df = ml_train_table(spark, sf_dir_small).limit(300)
    predictor = CVPredictor(
        ModelWrapper("gbt", "regression", params={"maxIter": 3, "maxDepth": 3}),
        metric="root_mean_squared_error",
        k=2,
        seeds=(1,),
        stratified=False,
        target_decimals=4,
    )
    res = predictor.run(df, None, "key", "o_totalprice", ["c_acctbal", "order_year"])
    assert res.oof.count() == 300
    assert res.test_pred is None
    assert res.cv_results[0]["cv_mean_score"] > 0


def test_frozen_logistic_model_scoring(spark):
    """The box-constrained freeze pins coefficients within 1e-12
    relative and predict_proba reproduces sigmoid(w·x + b) through
    the real pipeline→assemble→transform→slice path."""
    from fastmlframework_spark.ml.wrappers import frozen_logistic_model

    w, b = [0.25, -0.5], 0.125
    fitted = frozen_logistic_model(spark, ["x1", "x2"], w, b)
    got = list(fitted.model.coefficients) + [fitted.model.intercept]
    for g, e in zip(got, w + [b]):
        assert math.isclose(g, e, rel_tol=1e-12, abs_tol=0.0)

    df = spark.createDataFrame(
        [(1, 2.0, 1.0), (2, -4.0, 3.0), (3, 0.0, 0.0)], ["k", "x1", "x2"]
    )
    out = {r["k"]: r["prediction"] for r in fitted.predict_proba(df).collect()}
    for k, x1, x2 in [(1, 2.0, 1.0), (2, -4.0, 3.0), (3, 0.0, 0.0)]:
        expect = 1.0 / (1.0 + math.exp(-((w[0] * x1 + w[1] * x2) + b)))
        assert math.isclose(out[k], expect, rel_tol=1e-12)


def test_frozen_logistic_model_rejects_bad_arity(spark):
    from fastmlframework_spark.ml.wrappers import frozen_logistic_model

    with pytest.raises(ValueError):
        frozen_logistic_model(spark, ["x1", "x2"], [1.0], 0.0)


def test_ridge_closed_form_matches_numpy(spark):
    """The d=2 Cramer path must agree with an independent numpy
    normal-equation solve (to float tolerance), and the model must be
    a genuine least-squares fit: on exactly-linear integer data with
    lam=0 it recovers the generating coefficients."""
    import numpy as np

    from fastmlframework_spark.ml.wrappers import RidgeClosedFormWrapper

    rows = [
        (i, float(i % 17), float((i * 7) % 23), 0.0) for i in range(400)
    ]
    rows = [
        (k, x1, x2, 3.0 + 2.0 * x1 - 5.0 * x2) for k, x1, x2, _ in rows
    ]
    df = spark.createDataFrame(rows, ["k", "x1", "x2", "y"]).withColumn(
        "y", F.col("y").cast("bigint")
    )
    w = RidgeClosedFormWrapper(scales={"x1": 1, "x2": 1}, lam=0)
    fitted = w.fit(df, ["x1", "x2"], "y")
    # exact linear data, integer design: recovers (3, 2, -5)
    assert math.isclose(fitted.intercept, 3.0, rel_tol=1e-9)
    assert math.isclose(fitted.coefficients[0], 2.0, rel_tol=1e-9)
    assert math.isclose(fitted.coefficients[1], -5.0, rel_tol=1e-9)

    # cross-check the Cramer tree against numpy on the ridge system
    w2 = RidgeClosedFormWrapper(scales={"x1": 1, "x2": 1}, lam=1000)
    fitted2 = w2.fit(df, ["x1", "x2"], "y")
    pdf = np.array([(x1, x2, y) for _, x1, x2, y in rows])
    X = np.column_stack([np.ones(len(pdf)), pdf[:, 0], pdf[:, 1]])
    A = X.T @ X + np.diag([0.0, 1000.0, 1000.0])
    beta = np.linalg.solve(A, X.T @ pdf[:, 2])
    got = [fitted2.intercept] + list(fitted2.coefficients)
    for g, e in zip(got, beta):
        assert math.isclose(g, e, rel_tol=1e-9), (got, beta)


def test_ridge_closed_form_d3_gauss_jordan_path(spark):
    """d>2 solves by fixed-order Gauss-Jordan (VERDICT r11 #2, no
    LAPACK) — still a real fit: exact 3-feature linear data is
    recovered."""
    from fastmlframework_spark.ml.wrappers import RidgeClosedFormWrapper

    rows = [
        (
            i,
            float(i % 13),
            float((i * 5) % 11),
            float((i * 3) % 7),
            1.0 + 4.0 * (i % 13) - 2.0 * ((i * 5) % 11) + 6.0 * ((i * 3) % 7),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["k", "x1", "x2", "x3", "y"]).withColumn(
        "y", F.col("y").cast("bigint")
    )
    w = RidgeClosedFormWrapper(scales={}, lam=0)
    fitted = w.fit(df, ["x1", "x2", "x3"], "y")
    got = [fitted.intercept] + list(fitted.coefficients)
    for g, e in zip(got, [1.0, 4.0, -2.0, 6.0]):
        assert math.isclose(g, e, rel_tol=1e-8, abs_tol=1e-8), got


def test_gauss_jordan_matches_numpy_and_cramer():
    """The shared elimination formula list must agree with LAPACK to
    float precision at d=4 and with the d=2 Cramer tree to the last
    bit-neighborhood — and its unpivoted pivots are guaranteed
    nonzero on ridge-regularized (SPD) systems."""
    import numpy as np

    from fastmlframework_spark.ml.wrappers import (
        _cramer3_solve,
        _gauss_jordan_solve,
        gauss_jordan_formulas,
    )

    rng = __import__("random").Random(11)
    for d in (3, 4, 5):
        n = 400
        X = [[rng.randint(-500, 500) for _ in range(d)] for _ in range(n)]
        y = [rng.randint(0, 1) for _ in range(n)]
        ints = {"n": n, "sy": sum(y)}
        for i in range(1, d + 1):
            ints[f"s{i}"] = sum(r[i - 1] for r in X)
            ints[f"s{i}y"] = sum(r[i - 1] * t for r, t in zip(X, y))
            for j in range(i, d + 1):
                ints[f"s{i}{j}"] = sum(r[i - 1] * r[j - 1] for r in X)
        lam = 10_000
        beta = _gauss_jordan_solve(ints, lam, d)
        A = np.zeros((d + 1, d + 1))
        v = np.zeros(d + 1)
        A[0, 0], v[0] = ints["n"], ints["sy"]
        for i in range(1, d + 1):
            A[0, i] = A[i, 0] = ints[f"s{i}"]
            v[i] = ints[f"s{i}y"]
            for j in range(i, d + 1):
                A[i, j] = A[j, i] = ints[f"s{i}{j}"]
            A[i, i] += lam
        ref = np.linalg.solve(A, v)
        assert max(abs(b - r) for b, r in zip(beta, ref)) < 1e-9
        if d == 2:
            assert beta == list(_cramer3_solve(ints, lam))
    # every formula is at most two ops over already-defined symbols —
    # the property that makes the SQL rendering token-equivalent
    defined = {f"a{i}_{j}" for i in range(6) for j in range(6)} | {
        f"v{i}" for i in range(6)
    }
    for name, expr in gauss_jordan_formulas(6)[0]:
        toks = expr.replace("/", " ").replace("-", " ").replace("*", " ")
        assert all(t in defined for t in toks.split()), (name, expr)
        defined.add(name)


def test_ridge_predict_is_map_only(spark):
    """The scoring plan adds NO exchange — literal-coefficient affine
    projection over the scan (the 100 TB contract for the predict
    half of the closed-form fit)."""
    from fastmlframework_spark.ml.wrappers import ClosedFormLinearModel

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("x1"),
        (F.col("id") % 3).cast("double").alias("x2"),
    )
    m = ClosedFormLinearModel(
        feature_cols=["x1", "x2"],
        scales=[1, 1],
        coefficients=[0.5, -0.25],
        intercept=1.0,
    )
    plan = m.predict(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_logistic_newton_fits_real_signal(spark):
    """The fixed-point Newton wrapper is a REAL fit: on separable-ish
    synthetic data it must (a) be deterministic, (b) produce nonzero
    data-driven coefficients with the right signs, and (c) rank
    positives above negatives far better than chance."""
    import math as _math

    from fastmlframework_spark.ml.wrappers import LogisticNewtonWrapper

    rows = []
    for i in range(2000):
        x1 = float(i % 97) - 48.0
        x2 = float((i * 7) % 31) - 15.0
        z = 0.15 * x1 - 0.3 * x2 - 0.2
        p = 1.0 / (1.0 + _math.exp(-z))
        # deterministic 'draw': threshold a hash-ish fraction
        u = ((i * 2654435761) % 1000) / 1000.0
        rows.append((i, x1, x2, 1 if u < p else 0))
    df = spark.createDataFrame(rows, ["k", "x1", "x2", "y"])
    w = LogisticNewtonWrapper(scales={"x1": 10, "x2": 10}, iters=3)
    m1 = w.fit(df, ["x1", "x2"], "y")
    m2 = w.fit(df, ["x1", "x2"], "y")
    assert m1.coefficients == m2.coefficients  # bit-deterministic
    assert m1.coefficients[0] > 0 > m1.coefficients[1]  # sign recovery
    from fastmlframework_spark.ml import metrics as metrics_mod

    scored = m1.predict_proba(df, class_label=1).select(
        F.col("y").alias("label"), F.col("prediction").alias("score")
    )
    auc = metrics_mod.score(scored, "roc_auc_score", "label", "score")
    assert auc > 0.75, auc
    # data-dependence: perturbing labels moves the fit
    df2 = df.withColumn(
        "y", F.when(F.col("k") % 5 == 0, 1 - F.col("y")).otherwise(F.col("y"))
    )
    m3 = w.fit(df2, ["x1", "x2"], "y")
    assert m3.coefficients != m1.coefficients


def test_logistic_newton_scoring_is_map_only(spark):
    """ClosedFormLogisticModel scoring is a pure projection — no
    exchange, no MLlib transform, whole plan stays in the scan."""
    from fastmlframework_spark.ml.wrappers import ClosedFormLogisticModel

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("x1"),
    )
    m = ClosedFormLogisticModel(
        feature_cols=["x1"], scales=[1], coefficients=[0.3], intercept=-0.1
    )
    plan = (
        m.predict_proba(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_cart_wrapper_recovers_planted_splits(spark):
    """The depth-2 CART is a REAL greedy fit: on data whose target is
    a two-level threshold rule over small-int features it must
    recover the planted split structure exactly, deterministically."""
    from fastmlframework_spark.ml.wrappers import CARTClosedFormWrapper

    rows = []
    for i in range(3000):
        x1 = i % 10
        x2 = (i * 7) % 6
        # noise-free conjunction: a depth-2 tree separates it exactly
        y = 1 if (x1 <= 4 and x2 <= 2) else 0
        rows.append((i, x1, x2, y))
    df = spark.createDataFrame(rows, ["k", "x1", "x2", "y"])
    w = CARTClosedFormWrapper(max_depth=2)
    m1 = w.fit(df, ["x1", "x2"], "y")
    m2 = w.fit(df, ["x1", "x2"], "y")
    # the greedy root is one of the two planted thresholds
    assert (m1.root.feat, m1.root.thr) in [(1, 4), (2, 2)]
    # the fitted tree separates the rule PERFECTLY: every leaf pure,
    # every row scored to exactly its label
    bad = (
        m1.predict_proba(df)
        .filter(F.col("prediction") != F.col("y").cast("double"))
        .count()
    )
    assert bad == 0

    # bit-deterministic across refits
    def shape(n):
        if n is None:
            return None
        return (n.feat, n.thr, n.n, n.pos, shape(n.left), shape(n.right))

    assert shape(m1.root) == shape(m2.root)


def test_cart_scoring_is_map_only(spark):
    from fastmlframework_spark.ml.wrappers import (
        ClosedFormTreeModel,
        TreeNode,
    )

    root = TreeNode(
        n=10, pos=5, feat=1, thr=3,
        left=TreeNode(n=6, pos=5), right=TreeNode(n=4, pos=0),
    )
    m = ClosedFormTreeModel(feature_cols=["x1"], root=root)
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("x1")
    )
    plan = (
        m.predict_proba(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert m.feature_importances() == [("x1", 1.0)]


def test_eval_elim_formula_matches_python_eval():
    """ADVICE r12: the two-op dispatcher that replaced eval() must
    reproduce the identical IEEE sequence — bit-equality against a
    literal eval of every formula at d up to 6."""
    from fastmlframework_spark.ml.wrappers import (
        eval_elim_formula,
        gauss_jordan_formulas,
    )

    rng = __import__("random").Random(7)
    for m in (2, 4, 6):
        env_a = {}
        for i in range(m):
            env_a[f"v{i}"] = rng.uniform(-100, 100)
            for j in range(m):
                env_a[f"a{i}_{j}"] = rng.uniform(-100, 100)
            env_a[f"a{i}_{i}"] += 1000.0  # keep pivots away from zero
        env_b = dict(env_a)
        for name, expr in gauss_jordan_formulas(m)[0]:
            env_a[name] = eval_elim_formula(expr, env_a)
            env_b[name] = eval(expr, {"__builtins__": {}}, env_b)
            assert env_a[name] == env_b[name], (name, expr)


def test_cart_rejects_null_feature_values(spark):
    """ADVICE r12: a NULL (or non-castable) feature value must raise a
    clear ValueError naming the column, not an opaque TypeError deep
    in the driver-side int() conversions."""
    import pytest as _pytest

    from fastmlframework_spark.ml.wrappers import CARTClosedFormWrapper

    df = spark.createDataFrame(
        [(1, None, 1), (2, 3, 0), (0, 4, 1)],
        "f_a int, f_b int, y int",
    )
    with _pytest.raises(ValueError, match="f_b"):
        CARTClosedFormWrapper(max_depth=2).fit(df, ["f_a", "f_b"], "y")


def test_forest_bagged_members_differ_and_average(spark):
    """The bagged forest is a real ensemble: member trees see
    different (hash-subsampled) rows and different (rotating) feature
    subsets, and the model's probability is exactly the mean of the
    members' leaf rates."""
    from fastmlframework_spark.ml.wrappers import ForestClosedFormWrapper

    rows = []
    for i in range(600):
        x1 = i % 5
        x2 = (i * 7) % 3
        x3 = (i * 11) % 4
        y = 1 if (x1 >= 3) ^ (x2 == 1) else 0
        rows.append((i, x1, x2, x3, y))
    df = spark.createDataFrame(
        rows, "key long, f1 long, f2 long, f3 long, y long"
    )
    wrapper = ForestClosedFormWrapper(key_col="key", n_trees=3)
    model = wrapper.fit(df, ["f1", "f2", "f3"], "y")
    assert len(model.trees) == 3
    # rotating subsets: member b drops feature b
    assert [t.feature_cols for t in model.trees] == [
        ["f2", "f3"], ["f1", "f3"], ["f1", "f2"],
    ]
    # deterministic: refit is identical
    model2 = wrapper.fit(df, ["f1", "f2", "f3"], "y")
    p1 = {r.key: r.prediction
          for r in model.predict_proba(df).select("key", "prediction").collect()}
    p2 = {r.key: r.prediction
          for r in model2.predict_proba(df).select("key", "prediction").collect()}
    assert p1 == p2
    # the ensemble mean equals the member means exactly
    member_preds = []
    for t in model.trees:
        member_preds.append({
            r.key: r.prediction
            for r in t.predict_proba(df).select("key", "prediction").collect()
        })
    for k, v in p1.items():
        exact = ((member_preds[0][k] + member_preds[1][k])
                 + member_preds[2][k]) / 3.0
        assert v == exact


def test_fit_folds_bit_identity_all_wrappers(spark):
    """The batched `fit_folds` path (one grouped/conditional aggregate
    per iteration/level for ALL folds) must produce BIT-IDENTICAL
    models to the per-fold `fit` loop it replaces: every solve input
    is an exact integer / fixed-point DECIMAL(38,0) sum, so
    complement-by-subtraction and conditional aggregation change the
    plan, never the model."""
    from fastmlframework_spark.ml.folds import fold_split, with_fold_column
    from fastmlframework_spark.ml.wrappers import (
        CARTClosedFormWrapper,
        ForestClosedFormWrapper,
        LogisticNewtonWrapper,
        RidgeClosedFormWrapper,
    )

    rows = []
    for i in range(900):
        x1 = i % 7
        x2 = (i * 5) % 11
        x3 = (i * 3) % 4
        y = 1 if ((x1 >= 4) ^ (x2 % 3 == 1)) or x3 == 2 else 0
        rows.append((i, x1, x2, x3, y))
    df = spark.createDataFrame(
        rows, "key long, f1 long, f2 long, f3 long, y long"
    )
    k = 3
    folded = with_fold_column(
        df, "key", k, 27, stratify_col="y", method="ntile"
    ).cache()
    folded.count()
    feats = ["f1", "f2", "f3"]

    for wrapper in (
        RidgeClosedFormWrapper(scales={}, lam=10),
        LogisticNewtonWrapper(scales={}, iters=2),
        CARTClosedFormWrapper(max_depth=2),
        ForestClosedFormWrapper(key_col="key", n_trees=3),
    ):
        batched = wrapper.fit_folds(folded, feats, "y", "fold", k)
        assert sorted(batched) == list(range(k))
        for f in range(k):
            tr, _ = fold_split(folded, "fold", f)
            single = wrapper.fit(tr, feats, "y")
            b = batched[f]
            assert type(b) is type(single)
            if hasattr(single, "coefficients"):
                # ridge / newton: exact float equality, not approx
                assert list(b.coefficients) == list(single.coefficients)
                assert b.intercept == single.intercept
                assert list(b.scales) == list(single.scales)
                assert list(b.feature_cols) == list(single.feature_cols)
            elif hasattr(single, "root"):
                # CART: dataclass equality is recursive over children
                assert b.root == single.root
                assert list(b.feature_cols) == list(single.feature_cols)
            else:
                # forest: every member tree identical
                assert [t.feature_cols for t in b.trees] == [
                    t.feature_cols for t in single.trees
                ]
                assert [t.root for t in b.trees] == [
                    t.root for t in single.trees
                ]
    folded.unpersist()
