"""Native C++ data-layer tests (native/sgdnet_native.cpp via ctypes)."""

import numpy as np
import pytest
import scipy.sparse as sp

from sgdnet_tpu.utils import native

LIBSVM_SAMPLE = b"""1 1:0.5 3:-1.25 7:2
0 2:1.0
# comment line
1 1:3.5 2:0.25 4:1e-3
0 7:-4
"""


def test_native_library_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ should be available in this image"


def test_parse_libsvm():
    x, y = native.load_libsvm(LIBSVM_SAMPLE)
    assert x.shape == (4, 7)
    np.testing.assert_allclose(y, [1, 0, 1, 0])
    dense = x.toarray()
    np.testing.assert_allclose(dense[0], [0.5, 0, -1.25, 0, 0, 0, 2])
    np.testing.assert_allclose(dense[1], [0, 1.0, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(dense[2], [3.5, 0.25, 0, 1e-3, 0, 0, 0])
    np.testing.assert_allclose(dense[3], [0, 0, 0, 0, 0, 0, -4])


def test_parse_matches_sklearn():
    from sklearn.datasets import dump_svmlight_file
    import io

    rng = np.random.default_rng(0)
    x = sp.random(50, 20, density=0.2, random_state=0, format="csr")
    y = rng.normal(size=50)
    buf = io.BytesIO()
    dump_svmlight_file(x, y, buf)
    x2, y2 = native.load_libsvm(buf.getvalue())
    np.testing.assert_allclose(y2, y, rtol=1e-6)
    np.testing.assert_allclose(x2.toarray(), x.toarray()[:, : x2.shape[1]], rtol=1e-6)


def test_parse_error():
    with pytest.raises(ValueError, match="parse error"):
        native.load_libsvm(b"1 bogus\n")


def test_pack_padded_matches_numpy():
    x = sp.random(40, 15, density=0.3, random_state=1, format="csr")
    L = int(np.diff(x.indptr).max())
    out_i, out_v, out_n = native.pack_padded(x, L)
    # rebuild and compare
    dense = np.zeros((40, 15), np.float32)
    for i in range(40):
        for k in range(out_n[i]):
            dense[i, out_i[i, k]] += out_v[i, k]
    np.testing.assert_allclose(dense, x.toarray().astype(np.float32), rtol=1e-6)


def test_csr_column_stats():
    x = sp.random(60, 9, density=0.4, random_state=2, format="csr")
    mean, sd = native.csr_column_stats(x)
    d = x.toarray()
    np.testing.assert_allclose(mean, d.mean(0), atol=1e-12)
    expected_sd = d.std(0)
    expected_sd[expected_sd == 0] = 1.0
    np.testing.assert_allclose(sd, expected_sd, atol=1e-12)


def test_end_to_end_fit_from_libsvm():
    from sklearn.datasets import dump_svmlight_file
    import io

    import sgdnet_tpu as st

    rng = np.random.default_rng(3)
    x = sp.random(120, 10, density=0.4, random_state=3, format="csr")
    beta = rng.normal(size=10)
    y = (np.asarray(x @ beta).ravel() > 0).astype(float)
    buf = io.BytesIO()
    dump_svmlight_file(x, y, buf)
    x2, y2 = native.load_libsvm(buf.getvalue())
    fit = st.fit(x2, y2, family="binomial", nlambda=5, dtype=np.float64)
    assert (fit.return_codes == 0).all()
