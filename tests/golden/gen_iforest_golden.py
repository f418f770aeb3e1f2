"""Generate the sklearn IsolationForest golden labels for the parity
test (tests/test_iforest.py::test_sklearn_label_agreement).

Run this WHERE SKLEARN IS INSTALLED (it is not shipped in the build
environment, so the golden file cannot be produced there — fabricating
labels without sklearn would make the test meaningless):

    python tests/golden/gen_iforest_golden.py

It writes iforest_golden.json next to itself: the fixture is fully
determined by the seeds below (regenerated identically by the test),
so only sklearn's labels are stored. Reference parameters:
contamination=0.05, random_state=42 (reference app/app3_ML.py:165-166).
"""

from __future__ import annotations

import json
import os

import numpy as np

SEED = 20260813
N, N_OUT, DIM = 400, 20, 4


def fixture() -> np.ndarray:
    """Deterministic blob + planted outliers — shared with the test."""
    rng = np.random.default_rng(SEED)
    inliers = rng.normal(0, 1, size=(N - N_OUT, DIM))
    outliers = rng.uniform(6, 10, size=(N_OUT, DIM)) * rng.choice(
        [-1.0, 1.0], size=(N_OUT, 1)
    )
    return np.vstack([inliers, outliers])


def main() -> None:
    from sklearn.ensemble import IsolationForest  # requires sklearn

    labels = (
        IsolationForest(contamination=0.05, random_state=42)
        .fit_predict(fixture())
        .tolist()
    )
    out = os.path.join(os.path.dirname(__file__), "iforest_golden.json")
    with open(out, "w") as f:
        json.dump({"seed": SEED, "n": N, "labels": labels}, f)
    print(f"wrote {out} ({labels.count(-1)} outliers)")


if __name__ == "__main__":
    main()
