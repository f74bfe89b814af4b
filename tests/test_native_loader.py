"""Native C++ CSV/shuffler vs pandas/numpy oracles.

Builds libmgploader.so on first run (make in native/, ~1s); skips only if
the toolchain build itself fails.
"""
import os
import subprocess
import numpy as np
import pytest

from modulatedgps_tpu.data import native

_build_err = ""
if not native.available():
    _native_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    _res = subprocess.run(["make"], cwd=_native_dir, capture_output=True,
                          text=True, timeout=120, check=False)
    if _res.returncode != 0:
        _build_err = (_res.stderr or _res.stdout)[-500:]

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"libmgploader.so not built and make failed: {_build_err}")

CSV = os.path.join(os.path.dirname(__file__), "..", "data",
                   "john_doe_dataset.csv")


def test_csv_dims_match_pandas():
    import pandas as pd
    df = pd.read_csv(CSV)
    c = native.NativeCsv(CSV)
    assert c.n_rows == len(df)
    assert c.n_cols == len(df.columns)


def test_csv_numeric_columns_match_pandas():
    import pandas as pd
    df = pd.read_csv(CSV)
    c = native.NativeCsv(CSV)
    got = c.read_columns(["stumpsX", "stumpsY", "batterRuns"])
    want = df[["stumpsX", "stumpsY", "batterRuns"]].to_numpy(dtype=float)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_csv_string_match_filters():
    import pandas as pd
    df = pd.read_csv(CSV)
    c = native.NativeCsv(CSV)
    mask = c.match_column("bowlingStyle", ["FAST_SEAM", "MEDIUM_SEAM", "SEAM"])
    want = df["bowlingStyle"].isin(["FAST_SEAM", "MEDIUM_SEAM", "SEAM"]).to_numpy()
    np.testing.assert_array_equal(mask, want)


def test_shuffle_epoch_is_permutation_and_deterministic():
    a = native.shuffle_epoch(7, 0, 1000)
    b = native.shuffle_epoch(7, 0, 1000)
    c2 = native.shuffle_epoch(7, 1, 1000)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c2)


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(100, 7))
    idx = rng.integers(0, 100, size=32).astype(np.int32)
    got = native.gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_native_john_doe_pipeline_matches_pandas():
    """Full filter pipeline: native engine selects the same 557 rows with
    identical features/targets as the pandas path."""
    import pandas as pd
    from modulatedgps_tpu.data.datasets import (_load_john_doe_frame,
                                                load_john_doe_arrays_native)
    df = _load_john_doe_frame(None)
    Xn, Yn = load_john_doe_arrays_native(None)
    Xp = df[["stumpsX", "stumpsY"]].to_numpy(dtype=float)
    Yp = df["batterRuns"].to_numpy(dtype=float).reshape(-1, 1)
    assert Xn.shape == Xp.shape
    np.testing.assert_allclose(Xn, Xp, rtol=1e-12)
    np.testing.assert_allclose(Yn, Yp, rtol=0)


def test_native_minibatch_iterator():
    from modulatedgps_tpu.data import minibatch_iterator
    X = np.arange(40, dtype=float).reshape(20, 2)
    Y = np.arange(20, dtype=float).reshape(20, 1)
    it = minibatch_iterator(X, Y, 8, seed=5, use_native=True)
    xb, yb = next(it)
    assert xb.shape == (8, 2) and yb.shape == (8, 1)
    # rows stay aligned
    np.testing.assert_array_equal(xb[:, 0] // 2, yb[:, 0])
    # epoch covers all points once (2 full batches + drop tail of 4)
    seen = set(yb[:, 0].astype(int)) | set(next(it)[1][:, 0].astype(int))
    assert len(seen) == 16


def test_default_stream_bit_identical_to_numpy():
    """The default (autodetect) path uses C++ gathers with the numpy-seeded
    permutation: batches must be BIT-identical to the pure-numpy path, so
    enabling the native engine never perturbs goldens or demos."""
    from modulatedgps_tpu.data import minibatch_iterator
    rng = np.random.default_rng(3)
    X = rng.normal(size=(101, 3))
    Y = rng.normal(size=(101, 1))
    it_auto = minibatch_iterator(X, Y, 32, seed=7)           # native gathers
    it_np = minibatch_iterator(X, Y, 32, seed=7, use_native=False)
    for _ in range(10):
        (xa, ya), (xn, yn) = next(it_auto), next(it_np)
        np.testing.assert_array_equal(xa, xn)
        np.testing.assert_array_equal(ya, yn)
