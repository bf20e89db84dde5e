"""ML inference operators — SURVEY.md §2.9, implemented from scratch.

The reference wraps sklearn models (KNeighborsClassifier, NearestNeighbors,
RandomForestClassifier, GradientBoostedClassifier) and statsmodels SARIMAX
behind its UDF protocol; sklearn/statsmodels are not in this environment,
so the models are small pure-NumPy implementations fitted driver-side on
the (broadcastable) training table and applied per-pixel inside Arrow
batches — the same broadcast-train / vectorized-predict shape the Spark
deployment of the reference would use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..raster import TileOp

try:  # pragma: no cover — not present in this container
    import sklearn  # noqa: F401
    HAVE_SKLEARN = True
except ImportError:
    HAVE_SKLEARN = False


# ------------------------------------------------------------- kNN ---------

def _knn_predict(X: np.ndarray, train_X: np.ndarray, train_y: np.ndarray,
                 k: int) -> np.ndarray:
    """Vectorized kNN vote: pairwise squared distances in one gemm-shaped
    expression, stable argsort for the k nearest (replaces the reference's
    sklearn fit+predict, KNearestNeighborsClassifier.py:116-117). The
    stable sort makes distance ties deterministic (smallest training index
    wins) — required for cross-engine oracle parity on integer features."""
    d2 = ((X ** 2).sum(1)[:, None] - 2.0 * X @ train_X.T
          + (train_X ** 2).sum(1)[None, :])
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    labels = train_y[idx]
    # majority vote; deterministic tie-break = smallest label
    out = np.empty(X.shape[0], dtype=train_y.dtype)
    for i in range(X.shape[0]):
        vals, counts = np.unique(labels[i], return_counts=True)
        out[i] = vals[np.argmax(counts)]
    return out


def knn_classifier(train_X: np.ndarray, train_y: np.ndarray, k: int = 5) -> TileOp:
    """Per-pixel kNN classification: features = band values
    (KNearestNeighborsClassifier.py:104-128 behavior)."""
    tX = np.asarray(train_X, dtype=np.float64)
    ty = np.asarray(train_y)

    def fn(px, meta):
        bands, h, w = px.shape
        X = px.reshape(bands, -1).T.astype(np.float64)
        pred = _knn_predict(X, tX, ty, k)
        return pred.reshape(1, h, w).astype(np.float32)

    return TileOp("knn_classifier", fn, bands_out=1, dtype_out="f4")


def nearest_neighbors(train_X: np.ndarray, train_y: np.ndarray, k: int = 3) -> TileOp:
    """k neighbor labels as k output bands — NearestNeighborsClassifier
    (NearestNeighborsClassifier.py:126-158 behavior)."""
    tX = np.asarray(train_X, dtype=np.float64)
    ty = np.asarray(train_y, dtype=np.float64)

    def fn(px, meta):
        bands, h, w = px.shape
        X = px.reshape(bands, -1).T.astype(np.float64)
        d2 = ((X ** 2).sum(1)[:, None] - 2.0 * X @ tX.T + (tX ** 2).sum(1)[None, :])
        idx = np.argsort(d2, axis=1)[:, :k]
        return ty[idx].T.reshape(k, h, w).astype(np.float32)

    return TileOp("nearest_neighbors", fn, bands_out=k, dtype_out="f4")


# ------------------------------------------------- decision forest ---------

class _Tree:
    """Minimal CART classifier (gini, axis-aligned splits) — from scratch."""

    def __init__(self, max_depth: int = 6, min_leaf: int = 2, rng=None,
                 feature_frac: float = 1.0):
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        self.rng = rng or np.random.default_rng(0)
        self.feature_frac = feature_frac
        self.nodes: list[tuple] = []  # (feat, thr, left, right) or ("leaf", label)

    def fit(self, X, y):
        self.classes_ = np.unique(y)
        self._grow(X, y, 0)
        return self

    def _grow(self, X, y, depth) -> int:
        node_id = len(self.nodes)
        self.nodes.append(None)
        vals, counts = np.unique(y, return_counts=True)
        majority = vals[np.argmax(counts)]
        if depth >= self.max_depth or len(vals) == 1 or y.size < 2 * self.min_leaf:
            self.nodes[node_id] = ("leaf", majority)
            return node_id
        best = None
        n_feat = X.shape[1]
        feats = self.rng.choice(n_feat, max(1, int(n_feat * self.feature_frac)),
                                replace=False)
        base_gini = self._gini(y)
        for f in feats:
            xs = np.unique(X[:, f])
            if xs.size < 2:
                continue
            thrs = (xs[:-1] + xs[1:]) / 2.0
            if thrs.size > 16:
                thrs = thrs[:: max(1, thrs.size // 16)]
            for t in thrs:
                left = X[:, f] <= t
                nl = int(left.sum())
                if nl < self.min_leaf or y.size - nl < self.min_leaf:
                    continue
                g = (nl * self._gini(y[left])
                     + (y.size - nl) * self._gini(y[~left])) / y.size
                if best is None or g < best[0]:
                    best = (g, f, t, left)
        if best is None or best[0] >= base_gini:
            self.nodes[node_id] = ("leaf", majority)
            return node_id
        _, f, t, left = best
        li = self._grow(X[left], y[left], depth + 1)
        ri = self._grow(X[~left], y[~left], depth + 1)
        self.nodes[node_id] = (int(f), float(t), li, ri)
        return node_id

    @staticmethod
    def _gini(y) -> float:
        _, c = np.unique(y, return_counts=True)
        p = c / c.sum()
        return float(1.0 - (p ** 2).sum())

    def predict(self, X) -> np.ndarray:
        out = np.empty(X.shape[0])
        for i in range(X.shape[0]):
            n = 0
            while True:
                node = self.nodes[n]
                if node[0] == "leaf":
                    out[i] = node[1]
                    break
                f, t, li, ri = node
                n = li if X[i, f] <= t else ri
        return out


class RandomForest:
    """Bagged CART ensemble (from scratch; deterministic seed) — stands in
    for sklearn RandomForestClassifier (RandomForestClassifier.py:92-111).
    Class probabilities = vote fractions (the reference's 3 output bands:
    class + top-2 probabilities)."""

    def __init__(self, n_trees: int = 16, max_depth: int = 6, seed: int = 42):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.seed = seed

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        self.trees = []
        rng = np.random.default_rng(self.seed)
        for t in range(self.n_trees):
            idx = rng.integers(0, X.shape[0], X.shape[0])
            tree = _Tree(self.max_depth, rng=np.random.default_rng(self.seed + t + 1),
                         feature_frac=0.8)
            tree.fit(X[idx], y[idx])
            self.trees.append(tree)
        return self

    def predict_proba(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        votes = np.zeros((X.shape[0], self.classes_.size))
        for tree in self.trees:
            pred = tree.predict(X)
            for ci, c in enumerate(self.classes_):
                votes[:, ci] += pred == c
        return votes / self.n_trees

    def predict(self, X) -> np.ndarray:
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]


def random_forest_classifier(train_X: np.ndarray, train_y: np.ndarray,
                             n_trees: int = 16, max_depth: int = 6) -> TileOp:
    """Per-pixel RF classification → 3 bands: class, p(best), p(second) —
    output shape of RandomForestClassifier.py:92-111."""
    model = RandomForest(n_trees, max_depth).fit(train_X, train_y)

    def fn(px, meta):
        bands, h, w = px.shape
        X = px.reshape(bands, -1).T.astype(np.float64)
        proba = model.predict_proba(X)
        order = np.argsort(-proba, axis=1)
        cls = model.classes_[order[:, 0]].astype(np.float64)
        p1 = proba[np.arange(len(X)), order[:, 0]]
        p2 = (proba[np.arange(len(X)), order[:, 1]]
              if proba.shape[1] > 1 else np.zeros(len(X)))
        return np.stack([cls.reshape(h, w), p1.reshape(h, w),
                         p2.reshape(h, w)]).astype(np.float32)

    return TileOp("random_forest", fn, bands_out=3, dtype_out="f4")


def gradient_boosted_classifier(train_X: np.ndarray, train_y: np.ndarray,
                                n_rounds: int = 20, max_depth: int = 3,
                                lr: float = 0.3) -> TileOp:
    """Binary gradient-boosted stumps (logit boosting, from scratch) —
    capability analog of GradientBoostedClassifier.py:95-112 (binary case)."""
    X = np.asarray(train_X, dtype=np.float64)
    yy = np.asarray(train_y)
    classes = np.unique(yy)
    if classes.size != 2:
        raise ValueError("from-scratch GBT supports binary labels")
    y01 = (yy == classes[1]).astype(np.float64)
    f0 = 0.0
    trees = []
    pred = np.full(X.shape[0], f0)
    for r in range(n_rounds):
        p = 1.0 / (1.0 + np.exp(-pred))
        resid = y01 - p
        tree = _Tree(max_depth, rng=np.random.default_rng(1000 + r))
        tree.fit(X, (resid > 0).astype(np.int64))
        # leaf value = mean residual of samples routed to each side (stump-ish)
        step = tree.predict(X) * 2 - 1
        gamma = (resid * step).sum() / max((np.abs(step)).sum(), 1e-12)
        trees.append((tree, gamma))
        pred = pred + lr * gamma * step

    def fn(px, meta):
        bands, h, w = px.shape
        Xp = px.reshape(bands, -1).T.astype(np.float64)
        acc = np.full(Xp.shape[0], f0)
        for tree, gamma in trees:
            acc += lr * gamma * (tree.predict(Xp) * 2 - 1)
        p = 1.0 / (1.0 + np.exp(-acc))
        cls = np.where(p >= 0.5, classes[1], classes[0]).astype(np.float64)
        return np.stack([cls.reshape(h, w), p.reshape(h, w)]).astype(np.float32)

    return TileOp("gbt_classifier", fn, bands_out=2, dtype_out="f4")


# ------------------------------------------------ seasonal forecast --------

def seasonal_forecast(period: int = 12, horizon: int = 1):
    """Per-group seasonal forecast for applyInPandas — SeasonalARIMA's
    slot (SeasonalARIMA.py:192-216). statsmodels SARIMAX is unavailable, so
    the model is seasonal-naive + linear trend (deterministic, closed
    form): forecast = last same-season value + OLS trend × horizon.
    Returns fn(pdf) -> pdf with columns (group cols..., forecast, delta)."""

    def fit_predict(values: np.ndarray) -> tuple[float, float]:
        n = values.size
        t = np.arange(n, dtype=np.float64)
        slope = (np.cov(t, values, bias=True)[0, 1] / np.var(t)) if n > 1 else 0.0
        # anchor on the last same-season observation, extend by OLS trend
        idx = n - period + (horizon - 1) % period if n >= period else n - 1
        fc = float(values[idx] + slope * (n + horizon - 1 - idx))
        return fc, float(fc - values[-1])

    return fit_predict


def seasonal_forecast_by_group(df, group_cols: list[str], value_col: str,
                               time_col: str, period: int = 12,
                               horizon: int = 1):
    """Per-group seasonal forecast via applyInPandas — the distributed
    shape of SeasonalARIMA (A11/M5: model-per-group aggregation,
    SeasonalARIMA.py:192-216, time-sorted per 162-163)."""
    import pyspark.sql.types as T

    fit = seasonal_forecast(period, horizon)
    base_schema = [df.schema[c] for c in group_cols]
    out_schema = T.StructType(base_schema + [
        T.StructField("forecast", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
        T.StructField("n_obs", T.LongType())])

    def per_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        vals = pdf[value_col].to_numpy(np.float64)
        fc, delta = fit(vals)
        row = {c: key[i] for i, c in enumerate(group_cols)}
        row.update({"forecast": fc, "delta": delta, "n_obs": len(vals)})
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(per_group, schema=out_schema)


def training_from_table(df, feature_cols: list[str], label_col: str):
    """Collect a (small, broadcastable) labeled training table to NumPy —
    the training-CSV scan of the reference's ML operators (S4,
    KNearestNeighborsClassifier.py:84-101 reads CSV and drops id/x/y)."""
    pdf = df.select(*feature_cols, label_col).toPandas()
    X = pdf[feature_cols].to_numpy(np.float64)
    y = pdf[label_col].to_numpy()
    return X, y


def training_from_csv(spark, path: str, feature_cols: list[str], label_col: str):
    return training_from_table(
        spark.read.csv(path, header=True, inferSchema=True), feature_cols, label_col)
