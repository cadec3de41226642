"""Deterministic numpy classifiers (no sklearn in this environment).

Replaces the reference's FlexibleClassifier model zoo
(/root/reference/classifier.py:43-54) with seeded, exact-reproducible
implementations whose results are independent of parallelism: training runs on
the driver over a canonically-sorted train matrix (SURVEY.md §7.4.6), exactly
as the reference fits on the driver (classifier.py:150-163).  Prediction is
distributed via an actor-pool map_batches (PredictActor).

Provided models: RandomForest (the reference's blocking model,
config.py:78), GradientBoosting (stumps on logistic loss), and a model
registry + grid-search CV mirroring classifier.py:106-163's surface.
``feature_importances_`` are impurity-gain sums like sklearn's, consumed by
the BKAFI blocker (classifier.py:191-207).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


# Set True inside grid-search CV workers so model fits stay single-process
# there (the outer fan-out already owns the parallelism); the driver's direct
# fits keep their internal Ray tree-level fan-out.
_SERIAL_FIT = False


def _set_serial_fit(v: bool):
    global _SERIAL_FIT
    _SERIAL_FIT = v


def _gini_best_split(x: np.ndarray, y: np.ndarray):
    """Best threshold on one feature by Gini gain.  Returns
    (gain, threshold) or None.  Vectorized prefix-sum scan."""
    order = np.argsort(x, kind="stable")
    xs, ys = x[order], y[order]
    n = len(ys)
    pos = np.cumsum(ys)
    total_pos = pos[-1]
    # split after position i (1..n-1), only where value changes
    idx = np.nonzero(xs[1:] != xs[:-1])[0] + 1
    if len(idx) == 0:
        return None
    nl = idx.astype(np.float64)
    nr = n - nl
    pl = pos[idx - 1]
    pr = total_pos - pl
    gini_l = 1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
    gini_r = 1.0 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
    parent = 1.0 - (total_pos / n) ** 2 - ((n - total_pos) / n) ** 2
    gain = parent - (nl / n) * gini_l - (nr / n) * gini_r
    best = int(np.argmax(gain))
    if gain[best] <= 0:
        return None
    thr = (xs[idx[best] - 1] + xs[idx[best]]) / 2.0
    return float(gain[best]), thr


class DecisionTree:
    def __init__(self, max_depth=10, min_samples_split=2, max_features=None):
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.max_features = max_features
        # flat node arrays: feature(-1 = leaf), threshold, left, right, proba
        self.feature, self.threshold = [], []
        self.left, self.right, self.proba = [], [], []
        self.importances_ = None

    def fit(self, X, y, rng):
        n, f = X.shape
        self.importances_ = np.zeros(f)
        k = self.max_features or f
        self._build(X, y, np.arange(n), 0, rng, k, n)
        for name in ("feature", "threshold", "left", "right", "proba"):
            setattr(self, name, np.asarray(getattr(self, name)))
        return self

    def _new_node(self):
        for arr in (self.feature, self.threshold, self.left, self.right, self.proba):
            # identity checks (is), not ==: empty lists compare equal, which
            # would misroute left/right to the float branch on the root node
            arr.append(0.0 if (arr is self.threshold or arr is self.proba)
                       else -1)
        return len(self.feature) - 1

    def _build(self, X, y, idx, depth, rng, k, n_total):
        node = self._new_node()
        ys = y[idx]
        self.proba[node] = float(ys.mean()) if len(ys) else 0.0
        if depth >= self.max_depth or len(idx) < self.min_samples_split \
                or ys.min() == ys.max():
            return node
        feats = np.sort(rng.choice(X.shape[1], size=k, replace=False))
        best = None
        for fi in feats:
            res = _gini_best_split(X[idx, fi], ys)
            if res and (best is None or res[0] > best[0] + 1e-15):
                best = (res[0], fi, res[1])
        if best is None:
            return node
        gain, fi, thr = best
        mask = X[idx, fi] <= thr
        self.importances_[fi] += gain * len(idx) / n_total
        self.feature[node] = int(fi)
        self.threshold[node] = thr
        self.left[node] = self._build(X, y, idx[mask], depth + 1, rng, k, n_total)
        self.right[node] = self._build(X, y, idx[~mask], depth + 1, rng, k, n_total)
        return node

    def predict_proba(self, X):
        """Vectorized level-synchronous tree traversal (no per-row loop)."""
        n = len(X)
        cur = np.zeros(n, dtype=np.int64)
        rows = np.nonzero(self.feature[cur] >= 0)[0]
        while len(rows):
            node = cur[rows]
            f = self.feature[node]
            go_left = X[rows, f] <= self.threshold[node]
            nxt = np.where(go_left, self.left[node], self.right[node])
            cur[rows] = nxt
            rows = rows[self.feature[nxt] >= 0]
        return self.proba[cur]


def _fit_forest_tree(X, y, params: dict, t: int):
    """One seeded bootstrap tree — pure function so trees can fit in parallel
    Ray tasks with results identical to the serial order."""
    rng = np.random.default_rng(params["random_state"] * 100003 + t)
    boot = rng.integers(0, len(X), len(X))
    tree = DecisionTree(params["max_depth"], params["min_samples_split"],
                        params["k"])
    tree.fit(X[boot], y[boot], rng)
    return tree


class RandomForest:
    """Seeded bagged trees; deterministic regardless of num_cpus (per-tree
    seeds fix the result whether trees fit serially or as parallel Ray
    tasks — the reference fits on the driver, classifier.py:150-163; we fan
    the independent trees out when a Ray session exists)."""

    def __init__(self, n_estimators=40, max_depth=10, min_samples_split=2,
                 max_features="sqrt", random_state=1):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.max_features = max_features
        self.random_state = random_state

    def get_params(self):
        return dict(n_estimators=self.n_estimators, max_depth=self.max_depth,
                    min_samples_split=self.min_samples_split,
                    max_features=self.max_features, random_state=self.random_state)

    def fit(self, X, y):
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int8)
        f = X.shape[1]
        k = max(1, int(np.sqrt(f))) if self.max_features == "sqrt" else f
        params = dict(random_state=self.random_state, max_depth=self.max_depth,
                      min_samples_split=self.min_samples_split, k=k)
        if ray.is_initialized() and not _SERIAL_FIT and len(X) * f >= 100_000:
            fit_remote = ray.remote(num_cpus=1)(_fit_forest_tree)
            Xr, yr = ray.put(X), ray.put(y)
            self.trees_ = ray.get([fit_remote.remote(Xr, yr, params, t)
                                   for t in range(self.n_estimators)])
        else:
            self.trees_ = [_fit_forest_tree(X, y, params, t)
                           for t in range(self.n_estimators)]
        imp = np.sum([t.importances_ for t in self.trees_], axis=0)
        s = imp.sum()
        self.feature_importances_ = imp / s if s > 0 else imp
        return self

    def predict_proba(self, X):
        X = np.ascontiguousarray(X, dtype=np.float64)
        return np.mean([t.predict_proba(X) for t in self.trees_], axis=0)

    def predict(self, X):
        return (self.predict_proba(X) >= 0.5).astype(np.int8)


class GradientBoosting:
    """Depth-limited regression trees on logistic-loss gradients."""

    def __init__(self, n_estimators=60, learning_rate=0.2, max_depth=3,
                 random_state=1):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.random_state = random_state

    def get_params(self):
        return dict(n_estimators=self.n_estimators, learning_rate=self.learning_rate,
                    max_depth=self.max_depth, random_state=self.random_state)

    def fit(self, X, y):
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.f0_ = 0.0
        pred = np.zeros(len(y))
        self.trees_ = []
        f = X.shape[1]
        imp = np.zeros(f)
        for t in range(self.n_estimators):
            p = 1.0 / (1.0 + np.exp(-pred))
            resid = y - p
            rng = np.random.default_rng(self.random_state * 100003 + t)
            tree = _RegressionTree(self.max_depth)
            tree.fit(X, resid, rng)
            step = tree.predict(X)
            pred += self.learning_rate * step
            imp += tree.importances_
            self.trees_.append(tree)
        s = imp.sum()
        self.feature_importances_ = imp / s if s > 0 else imp
        return self

    def predict_proba(self, X):
        X = np.ascontiguousarray(X, dtype=np.float64)
        pred = np.zeros(len(X))
        for tree in self.trees_:
            pred += self.learning_rate * tree.predict(X)
        return 1.0 / (1.0 + np.exp(-pred))

    def predict(self, X):
        return (self.predict_proba(X) >= 0.5).astype(np.int8)


class _RegressionTree:
    def __init__(self, max_depth):
        self.max_depth = max_depth
        self.nodes = []
        self.importances_ = None

    def fit(self, X, r, rng):
        self.importances_ = np.zeros(X.shape[1])
        self._n_total = len(r)
        self._build(X, r, np.arange(len(r)), 0)
        return self

    def _build(self, X, r, idx, depth):
        node = len(self.nodes)
        self.nodes.append([-1, 0.0, -1, -1, float(r[idx].mean()) if len(idx) else 0.0])
        if depth >= self.max_depth or len(idx) < 4:
            return node
        best = None
        for fi in range(X.shape[1]):
            x = X[idx, fi]
            order = np.argsort(x, kind="stable")
            xs, rs = x[order], r[idx][order]
            cut = np.nonzero(xs[1:] != xs[:-1])[0] + 1
            if not len(cut):
                continue
            csum = np.cumsum(rs)
            tot = csum[-1]
            nl = cut.astype(np.float64)
            nr = len(rs) - nl
            sl = csum[cut - 1]
            sr = tot - sl
            gain = sl * sl / nl + sr * sr / nr - tot * tot / len(rs)
            b = int(np.argmax(gain))
            if gain[b] > 1e-12 and (best is None or gain[b] > best[0] + 1e-15):
                best = (float(gain[b]), fi, (xs[cut[b] - 1] + xs[cut[b]]) / 2.0)
        if best is None:
            return node
        gain, fi, thr = best
        self.importances_[fi] += gain / self._n_total
        mask = X[idx, fi] <= thr
        self.nodes[node][0] = fi
        self.nodes[node][1] = thr
        self.nodes[node][2] = self._build(X, r, idx[mask], depth + 1)
        self.nodes[node][3] = self._build(X, r, idx[~mask], depth + 1)
        return node

    def predict(self, X):
        nodes = np.asarray(self.nodes, dtype=np.float64)
        feat = nodes[:, 0].astype(np.int64)
        thr, left = nodes[:, 1], nodes[:, 2].astype(np.int64)
        right, val = nodes[:, 3].astype(np.int64), nodes[:, 4]
        cur = np.zeros(len(X), dtype=np.int64)
        rows = np.nonzero(feat[cur] >= 0)[0]
        while len(rows):
            node = cur[rows]
            go_left = X[rows, feat[node]] <= thr[node]
            nxt = np.where(go_left, left[node], right[node])
            cur[rows] = nxt
            rows = rows[feat[nxt] >= 0]
        return val[cur]


class Bagging(RandomForest):
    """Bootstrap-aggregated deep trees considering ALL features at every
    split — the reference's headline family (BaggingClassifier; Table 6's
    P=100/F1=93 row, classifier.py:48 / config.py:75-76).  Differs from
    RandomForest exactly as sklearn's does: no feature subsampling and
    deeper default trees."""

    def __init__(self, n_estimators=40, max_depth=14, min_samples_split=2,
                 random_state=1):
        super().__init__(n_estimators=n_estimators, max_depth=max_depth,
                         min_samples_split=min_samples_split,
                         max_features=None, random_state=random_state)

    def get_params(self):
        return dict(n_estimators=self.n_estimators, max_depth=self.max_depth,
                    min_samples_split=self.min_samples_split,
                    random_state=self.random_state)


class _WeightedStump:
    """Depth-1 weighted decision stump: best (feature, threshold, polarity)
    by weighted 0-1 error; fully deterministic (ties -> lowest feature index,
    then lowest threshold)."""

    def fit(self, X, y, w):
        # y in {-1, +1}; w normalized
        best = None  # (err, fi, thr, polarity)
        for fi in range(X.shape[1]):
            x = X[:, fi]
            order = np.argsort(x, kind="stable")
            xs, ys, ws = x[order], y[order], w[order]
            cut = np.nonzero(xs[1:] != xs[:-1])[0] + 1
            if not len(cut):
                continue
            cpos = np.cumsum(ws * (ys > 0))
            cneg = np.cumsum(ws * (ys < 0))
            tot_pos, tot_neg = cpos[-1], cneg[-1]
            # polarity +1: predict -1 left of thr, +1 right
            err_plus = cpos[cut - 1] + (tot_neg - cneg[cut - 1])
            err_minus = (tot_pos + tot_neg) - err_plus
            for errs, pol in ((err_plus, 1), (err_minus, -1)):
                b = int(np.argmin(errs))
                if best is None or errs[b] < best[0] - 1e-15:
                    thr = (xs[cut[b] - 1] + xs[cut[b]]) / 2.0
                    best = (float(errs[b]), fi, thr, pol)
        if best is None:  # constant features: majority vote
            maj = 1 if float((w * (y > 0)).sum()) >= float((w * (y < 0)).sum()) else -1
            self.err_, self.fi_, self.thr_, self.pol_ = 0.5, 0, -np.inf, maj
        else:
            self.err_, self.fi_, self.thr_, self.pol_ = best
        return self

    def predict(self, X):
        side = np.where(X[:, self.fi_] <= self.thr_, -1, 1)
        return side * self.pol_


class AdaBoost:
    """Deterministic AdaBoost (discrete SAMME over weighted stumps) — the
    reference's AdaBoostClassifier slot (classifier.py:49 / config.py:75-76).
    No RNG anywhere; ``feature_importances_`` are alpha-weight sums per
    feature."""

    def __init__(self, n_estimators=60, learning_rate=1.0, random_state=1):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate  # shrinks each stump's alpha
        self.random_state = random_state  # unused (deterministic); API compat

    def get_params(self):
        return dict(n_estimators=self.n_estimators,
                    learning_rate=self.learning_rate,
                    random_state=self.random_state)

    def fit(self, X, y):
        X = np.ascontiguousarray(X, dtype=np.float64)
        yy = np.where(np.asarray(y) > 0, 1.0, -1.0)
        n, f = X.shape
        w = np.full(n, 1.0 / n)
        self.stumps_, self.alphas_ = [], []
        imp = np.zeros(f)
        for _ in range(self.n_estimators):
            stump = _WeightedStump().fit(X, yy, w)
            pred = stump.predict(X)
            err = float(w[pred != yy].sum())
            if err >= 0.5:
                break
            err = max(err, 1e-10)
            alpha = self.learning_rate * 0.5 * np.log((1.0 - err) / err)
            self.stumps_.append(stump)
            self.alphas_.append(alpha)
            imp[stump.fi_] += alpha
            w = w * np.exp(-alpha * yy * pred)
            w /= w.sum()
            if err <= 1e-10:
                break
        s = imp.sum()
        self.feature_importances_ = imp / s if s > 0 else imp
        return self

    def _margin(self, X):
        X = np.ascontiguousarray(X, dtype=np.float64)
        m = np.zeros(len(X))
        for stump, alpha in zip(self.stumps_, self.alphas_):
            m += alpha * stump.predict(X)
        return m

    def predict_proba(self, X):
        return 1.0 / (1.0 + np.exp(-2.0 * self._margin(X)))

    def predict(self, X):
        return (self._margin(X) > 0).astype(np.int8)


class LogisticRegression:
    """Deterministic L2-regularized logistic regression (full-batch Newton
    steps — no RNG, identical at any parallelism).  Fills the reference's
    linear-model slot in the registry (classifier.py:47); its
    ``feature_importances_`` are |weight| magnitudes."""

    def __init__(self, l2: float = 1e-3, n_iter: int = 25, random_state: int = 1):
        self.l2 = l2
        self.n_iter = n_iter
        self.random_state = random_state

    def get_params(self):
        return dict(l2=self.l2, n_iter=self.n_iter, random_state=self.random_state)

    def fit(self, X, y):
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.mu_ = X.mean(axis=0)
        self.sd_ = X.std(axis=0)
        self.sd_[self.sd_ == 0] = 1.0
        Z = (X - self.mu_) / self.sd_
        Z = np.hstack([Z, np.ones((len(Z), 1))])
        w = np.zeros(Z.shape[1])
        for _ in range(self.n_iter):
            p = 1.0 / (1.0 + np.exp(-(Z @ w)))
            g = Z.T @ (p - y) + self.l2 * w
            W = p * (1 - p) + 1e-9
            H = (Z * W[:, None]).T @ Z + self.l2 * np.eye(Z.shape[1])
            w = w - np.linalg.solve(H, g)
        self.w_ = w
        imp = np.abs(w[:-1])
        s = imp.sum()
        self.feature_importances_ = imp / s if s > 0 else imp
        return self

    def predict_proba(self, X):
        Z = (np.ascontiguousarray(X, dtype=np.float64) - self.mu_) / self.sd_
        Z = np.hstack([Z, np.ones((len(Z), 1))])
        return 1.0 / (1.0 + np.exp(-(Z @ self.w_)))

    def predict(self, X):
        return (self.predict_proba(X) >= 0.5).astype(np.int8)


class _XGBTree:
    """Second-order (Newton) regression tree on (gradient, hessian) pairs:
    leaf weight -G/(H+λ), split gain ½[G_L²/(H_L+λ) + G_R²/(H_R+λ) −
    G²/(H+λ)] − γ — the XGBoost tree booster recipe, deterministic
    (exhaustive feature scan, ties → lowest feature index then lowest cut)."""

    def __init__(self, max_depth, lam, gamma):
        self.max_depth = max_depth
        self.lam = lam
        self.gamma = gamma
        self.nodes = []
        self.importances_ = None

    def fit(self, X, g, h):
        self.importances_ = np.zeros(X.shape[1])
        self._build(X, g, h, np.arange(len(g)), 0)
        return self

    def _build(self, X, g, h, idx, depth):
        node = len(self.nodes)
        G, H = float(g[idx].sum()), float(h[idx].sum())
        self.nodes.append([-1, 0.0, -1, -1, -G / (H + self.lam)])
        if depth >= self.max_depth or len(idx) < 2:
            return node
        parent = G * G / (H + self.lam)
        best = None
        for fi in range(X.shape[1]):
            x = X[idx, fi]
            order = np.argsort(x, kind="stable")
            xs = x[order]
            cut = np.nonzero(xs[1:] != xs[:-1])[0] + 1
            if not len(cut):
                continue
            gc = np.cumsum(g[idx][order])
            hc = np.cumsum(h[idx][order])
            GL, HL = gc[cut - 1], hc[cut - 1]
            GR, HR = G - GL, H - HL
            gain = 0.5 * (GL * GL / (HL + self.lam)
                          + GR * GR / (HR + self.lam) - parent) - self.gamma
            b = int(np.argmax(gain))
            if gain[b] > 1e-12 and (best is None or gain[b] > best[0] + 1e-15):
                best = (float(gain[b]), fi, (xs[cut[b] - 1] + xs[cut[b]]) / 2.0)
        if best is None:
            return node
        gain, fi, thr = best
        self.importances_[fi] += gain
        mask = X[idx, fi] <= thr
        self.nodes[node][0] = fi
        self.nodes[node][1] = thr
        self.nodes[node][2] = self._build(X, g, h, idx[mask], depth + 1)
        self.nodes[node][3] = self._build(X, g, h, idx[~mask], depth + 1)
        return node

    predict = _RegressionTree.predict  # same flat-node vectorized traversal


class XGBoost:
    """Deterministic second-order boosted trees — the reference's
    XGBClassifier slot (classifier.py model zoo / config.py:75-76,121-127):
    logistic loss, per-round gradients g = p − y and hessians h = p(1−p),
    L2 leaf regularization ``lam`` and min split gain ``gamma`` exactly as
    the XGBoost objective defines them.  No RNG anywhere."""

    def __init__(self, n_estimators=60, learning_rate=0.3, max_depth=4,
                 lam=1.0, gamma=0.0, random_state=1):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.lam = lam
        self.gamma = gamma
        self.random_state = random_state  # unused (deterministic); API compat

    def get_params(self):
        return dict(n_estimators=self.n_estimators,
                    learning_rate=self.learning_rate,
                    max_depth=self.max_depth, lam=self.lam, gamma=self.gamma,
                    random_state=self.random_state)

    def fit(self, X, y):
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        pred = np.zeros(len(y))
        self.trees_ = []
        imp = np.zeros(X.shape[1])
        for _ in range(self.n_estimators):
            p = 1.0 / (1.0 + np.exp(-pred))
            g = p - y
            h = np.maximum(p * (1.0 - p), 1e-10)
            tree = _XGBTree(self.max_depth, self.lam, self.gamma).fit(X, g, h)
            pred += self.learning_rate * tree.predict(X)
            imp += tree.importances_
            self.trees_.append(tree)
        s = imp.sum()
        self.feature_importances_ = imp / s if s > 0 else imp
        return self

    def predict_proba(self, X):
        X = np.ascontiguousarray(X, dtype=np.float64)
        pred = np.zeros(len(X))
        for tree in self.trees_:
            pred += self.learning_rate * tree.predict(X)
        return 1.0 / (1.0 + np.exp(-pred))

    def predict(self, X):
        return (self.predict_proba(X) >= 0.5).astype(np.int8)


class MLP:
    """Seeded two-hidden-layer perceptron — the reference's MLPClassifier
    slot (config.py:96-101: hidden (64,32), relu, adam).  Deterministic:
    seeded init, FULL-batch Adam for a fixed epoch count (no minibatch
    shuffling, so the fit is identical at any parallelism).
    ``feature_importances_`` are first-layer |weight| row sums."""

    def __init__(self, hidden=(64, 32), epochs=200, lr=0.01, l2=1e-4,
                 random_state=1):
        self.hidden = tuple(hidden)
        self.epochs = epochs
        self.lr = lr
        self.l2 = l2
        self.random_state = random_state

    def get_params(self):
        return dict(hidden=self.hidden, epochs=self.epochs, lr=self.lr,
                    l2=self.l2, random_state=self.random_state)

    def fit(self, X, y):
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.mu_ = X.mean(axis=0)
        self.sd_ = X.std(axis=0)
        self.sd_[self.sd_ == 0] = 1.0
        Z = (X - self.mu_) / self.sd_
        rng = np.random.default_rng(self.random_state)
        sizes = [Z.shape[1], *self.hidden, 1]
        W = [rng.standard_normal((a, b)) * np.sqrt(2.0 / a)
             for a, b in zip(sizes[:-1], sizes[1:])]
        B = [np.zeros(b) for b in sizes[1:]]
        mW = [np.zeros_like(w) for w in W]
        vW = [np.zeros_like(w) for w in W]
        mB = [np.zeros_like(b) for b in B]
        vB = [np.zeros_like(b) for b in B]
        b1, b2, eps = 0.9, 0.999, 1e-8
        n = len(Z)
        for t in range(1, self.epochs + 1):
            acts = [Z]
            for li in range(len(W) - 1):
                acts.append(np.maximum(acts[-1] @ W[li] + B[li], 0.0))
            logits = (acts[-1] @ W[-1] + B[-1]).ravel()
            p = 1.0 / (1.0 + np.exp(-logits))
            delta = ((p - y) / n)[:, None]
            for li in range(len(W) - 1, -1, -1):
                gW = acts[li].T @ delta + self.l2 * W[li]
                gB = delta.sum(axis=0)
                if li > 0:
                    delta = (delta @ W[li].T) * (acts[li] > 0)
                mW[li] = b1 * mW[li] + (1 - b1) * gW
                vW[li] = b2 * vW[li] + (1 - b2) * gW * gW
                mB[li] = b1 * mB[li] + (1 - b1) * gB
                vB[li] = b2 * vB[li] + (1 - b2) * gB * gB
                c1, c2 = 1 - b1 ** t, 1 - b2 ** t
                W[li] -= self.lr * (mW[li] / c1) / (np.sqrt(vW[li] / c2) + eps)
                B[li] -= self.lr * (mB[li] / c1) / (np.sqrt(vB[li] / c2) + eps)
        self.W_, self.B_ = W, B
        imp = np.abs(W[0]).sum(axis=1)
        s = imp.sum()
        self.feature_importances_ = imp / s if s > 0 else imp
        return self

    def predict_proba(self, X):
        Z = (np.ascontiguousarray(X, dtype=np.float64) - self.mu_) / self.sd_
        for li in range(len(self.W_) - 1):
            Z = np.maximum(Z @ self.W_[li] + self.B_[li], 0.0)
        logits = (Z @ self.W_[-1] + self.B_[-1]).ravel()
        return 1.0 / (1.0 + np.exp(-logits))

    def predict(self, X):
        return (self.predict_proba(X) >= 0.5).astype(np.int8)


MODEL_REGISTRY = {
    "RandomForest": RandomForest,
    "GradientBoosting": GradientBoosting,
    "Bagging": Bagging,
    "AdaBoost": AdaBoost,
    "XGBoost": XGBoost,
    "MLP": MLP,
    "LogisticRegression": LogisticRegression,
}

# hyperparameter grids per family — the reference's config.Models.params_dict
# (config.py:79-128) scaled to deterministic numpy models.  DEFAULT_GRIDS
# bound the correctness-driver runtime; FULL_GRIDS mirror the reference's
# published grid dimensions (select with grids="full" / GEO_FULL_GRIDS=1).
DEFAULT_GRIDS = {
    "RandomForest": {"n_estimators": [50, 100], "max_depth": [5, 10]},
    "GradientBoosting": {"n_estimators": [100, 200],
                         "learning_rate": [0.01, 0.1]},
    "Bagging": {"n_estimators": [10, 50], "max_depth": [10, 14]},
    "AdaBoost": {"n_estimators": [100, 200], "learning_rate": [0.5, 1.0]},
    "XGBoost": {"n_estimators": [50, 100], "max_depth": [3, 5],
                "learning_rate": [0.1, 0.5]},
    "MLP": {"hidden": [(64, 32)], "epochs": [200]},
    "LogisticRegression": {"l2": [1e-3, 1e-1, 1.0]},
}

FULL_GRIDS = {
    # config.py:80-83
    "RandomForest": {"n_estimators": [50, 100, 200], "max_depth": [5, 10],
                     "min_samples_split": [2]},
    # config.py:107-113
    "GradientBoosting": {"learning_rate": [0.01, 0.1],
                         "n_estimators": [100, 200], "max_depth": [3]},
    # config.py:115-119 (max_samples/max_features become depth variants in
    # the deterministic numpy bagger)
    "Bagging": {"n_estimators": [10, 50], "max_depth": [10, 12, 14]},
    # config.py:102-105
    "AdaBoost": {"n_estimators": [100, 200],
                 "learning_rate": [0.1, 0.5, 1.0]},
    # config.py:121-127
    "XGBoost": {"max_depth": [3, 4, 5], "learning_rate": [0.01, 0.1, 0.5],
                "n_estimators": [50, 100, 150, 200], "gamma": [0.0, 0.1, 1.0]},
    # config.py:96-101
    "MLP": {"hidden": [(64, 32)], "epochs": [200, 500]},
    # config.py:90-93
    "LogisticRegression": {"l2": [1e-2, 1e-1, 1.0]},
}


def f1_binary(y_true, y_pred):
    tp = int(((y_true == 1) & (y_pred == 1)).sum())
    fp = int(((y_true == 0) & (y_pred == 1)).sum())
    fn = int(((y_true == 1) & (y_pred == 0)).sum())
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0, p, r


def _cv_fit_score(X, y, fold, model_name: str, params: dict, f: int, seed: int):
    """One (param-combo, fold) CV fit+score.  Runs as a Ray task inside
    grid_search_fit's fan-out; _SERIAL_FIT keeps the model's own tree-level
    parallelism off there (the fan-out already owns the cluster)."""
    _set_serial_fit(True)
    try:
        tr, te = fold != f, fold == f
        m = MODEL_REGISTRY[model_name](random_state=seed, **params).fit(
            X[tr], y[tr])
        return f1_binary(y[te], m.predict(X[te]))[0]
    finally:
        _set_serial_fit(False)


def grid_search_fit(model_name: str, grid: dict, X, y, cv: int = 3, seed: int = 1):
    """Deterministic GridSearchCV analogue (classifier.py:150-163): k-fold CV
    scored by binary F1, best params re-fit on all data.  The (combo x fold)
    CV fits are embarrassingly parallel, so they fan out as one Ray task each
    over a ray.put-once train matrix; scores are reduced on the driver with
    the same first-combo-wins tie policy as the serial loop, so results are
    bit-identical regardless of parallelism."""
    from itertools import product
    cls = MODEL_REGISTRY[model_name]
    keys = sorted(grid)
    n = len(y)
    fold = np.arange(n) % cv
    combos = [dict(zip(keys, c)) for c in product(*(grid[k] for k in keys))]
    jobs = [(ci, f) for ci in range(len(combos)) for f in range(cv)]
    if ray.is_initialized() and len(jobs) > 1:
        fit_remote = ray.remote(num_cpus=1)(_cv_fit_score)
        Xr = ray.put(np.ascontiguousarray(X, dtype=np.float64))
        yr = ray.put(np.asarray(y, dtype=np.int8))
        foldr = ray.put(fold)
        scores = ray.get([fit_remote.remote(Xr, yr, foldr, model_name,
                                            combos[ci], f, seed)
                          for ci, f in jobs])
    else:
        scores = [_cv_fit_score(X, y, fold, model_name, combos[ci], f, seed)
                  for ci, f in jobs]
    best = None
    for ci, params in enumerate(combos):
        score = float(np.mean([scores[ci * cv + f] for f in range(cv)]))
        if best is None or score > best[0] + 1e-12:
            best = (score, params)
    model = cls(random_state=seed, **best[1]).fit(X, y)
    return model, best[1], best[0]


def predict_dataset(ds: ray.data.Dataset, model, feature_cols: list[str],
                    concurrency: int = 4, batch_size: int = 8192,
                    proba: bool = False) -> ray.data.Dataset:
    """Distributed inference: model broadcast once, actor pool per batch
    (the reference's classifier.predict loop — classifier.py:132-135 — as a
    map_batches stage)."""
    model_ref = ray.put(model)

    class PredictActor:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = np.column_stack([batch.column(c).to_numpy() for c in feature_cols])
            batch = batch.append_column(
                "pred", pa.array(self.model.predict(X).astype(np.int8), type=pa.int8()))
            if proba:
                batch = batch.append_column(
                    "proba", pa.array(self.model.predict_proba(X), type=pa.float64()))
            return batch

    # stateless task pool, model fetched once per worker process (the
    # per-worker cache pattern from pipeline.matching_inference_pipeline)
    holder: dict = {}

    def predict_fn(batch: pa.Table) -> pa.Table:
        if "a" not in holder:
            holder["a"] = PredictActor()
        return holder["a"](batch)

    return ds.map_batches(predict_fn, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
