"""Native C++ Matrix-Market parser vs the pure-Python reference reader."""
import numpy as np
import pytest

from singlespmv_tpu.core import native
from singlespmv_tpu.core.mmio import load_matrix, read_matrix_market

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


CASES = {
    "general": """%%MatrixMarket matrix coordinate real general
% comment
3 4 5
1 1 1.5
1 4 -2e-3
2 2 3.25
3 1 4
3 3 0.5
""",
    "symmetric": """%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
3 1 4.5
3 3 1.0
""",
    "skew": """%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 3.0
3 2 -1.5
""",
    "pattern": """%%MatrixMarket matrix coordinate pattern general
2 2 3
1 1
1 2
2 2
""",
    "complex": """%%MatrixMarket matrix coordinate complex hermitian
2 2 2
1 1 5.0 0.0
2 1 1.25 -3.0
""",
    "integer": """%%MatrixMarket matrix coordinate integer general
2 2 2
1 2 7
2 1 -3
""",
    "bannerless": """3 3 3
1 1 1.0
2 2 2.0
3 3 3.0
""",
    "duplicates": """%%MatrixMarket matrix coordinate real general
2 2 4
1 1 1.0
1 1 2.5
2 2 1.0
2 1 -1.0
""",
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("sum_dup", [False, True], ids=["keep", "sumdup"])
def test_native_matches_python(tmp_path, name, sum_dup):
    p = tmp_path / f"{name}.mtx"
    p.write_text(CASES[name])
    a = native.load_mtx(str(p), sum_duplicates=sum_dup)
    b = read_matrix_market(str(p), sum_duplicates=sum_dup)
    assert a is not None
    assert (a.n_row, a.n_col, a.nnz) == (b.n_row, b.n_col, b.nnz)
    np.testing.assert_array_equal(a.row, b.row)
    np.testing.assert_array_equal(a.col, b.col)
    np.testing.assert_allclose(a.val, b.val, rtol=0, atol=0)


def test_load_matrix_prefers_native(tmp_path):
    p = tmp_path / "m.mtx"
    p.write_text(CASES["general"])
    coo = load_matrix(str(p))
    assert coo.nnz == 5


def test_native_error_reporting(tmp_path):
    from singlespmv_tpu.core.mmio import MatrixMarketError

    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n2 2 1\n5 1 1.0\n")
    with pytest.raises(MatrixMarketError):
        native.load_mtx(str(p))


def test_large_roundtrip(tmp_path):
    from singlespmv_tpu.core.mmio import write_matrix_market
    from singlespmv_tpu.data.generators import powerlaw

    coo = powerlaw(500, 20000, seed=13)
    p = tmp_path / "big.mtx"
    write_matrix_market(p, coo)
    a = native.load_mtx(str(p))
    np.testing.assert_array_equal(a.row, coo.row)
    np.testing.assert_array_equal(a.col, coo.col)
    np.testing.assert_allclose(a.val, coo.val)
