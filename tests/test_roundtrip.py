"""Inverse-conversion (to_coo, the CSR5 asCSR analog) round-trips + suite tools."""
import numpy as np
import pytest

from singlespmv_tpu import formats
from singlespmv_tpu.config import Config
from singlespmv_tpu.data.fixtures import fixture_10x10, fixture_5x5
from singlespmv_tpu.data.generators import generate, powerlaw

ALL_FORMATS = ["coo", "csr", "ell", "jds", "dia", "ss", "css", "csr5", "bsr",
               "dense", "bcoo", "hostlib"]


@pytest.mark.parametrize("fmt", ALL_FORMATS)
@pytest.mark.parametrize("make", [fixture_5x5, fixture_10x10,
                                  lambda: powerlaw(64, 500, seed=3)],
                         ids=["5x5", "10x10-empty-rows", "powerlaw"])
def test_to_coo_round_trip(fmt, make):
    coo = make()
    cfg = Config(format=fmt, dtype="float64", segment_width=128)
    state = formats.convert(coo, cfg)
    back = formats.to_coo(state, cfg)
    assert (back.n_row, back.n_col) == (coo.n_row, coo.n_col)
    np.testing.assert_allclose(back.to_dense(), coo.to_dense(), rtol=0, atol=0)


def test_suitesparse_tooling(tmp_path):
    from singlespmv_tpu.data.suitesparse import (NATURAL_SUITE, ensure_suite,
                                                 synthesize, url_for)

    assert len(NATURAL_SUITE) == 26  # the reference's download.sh list
    assert url_for("Williams", "webbase-1M").endswith("/Williams/webbase-1M.tar.gz")
    # No-egress path: reports missing without raising.
    status = ensure_suite(str(tmp_path), download=False, subset=["torso1"])
    assert "torso1" in status and "missing" in status["torso1"]
    syn = synthesize("raefsky3", seed=1)
    assert (syn.n_row, syn.n_col) == (21200, 21200)
    assert syn.nnz > 500_000  # collisions dedupe below the published nnz


def test_confirm_cli_subset(capsys):
    from singlespmv_tpu.cli import main

    rc = main(["confirm", "--formats", "csr", "dia", "--dtype", "float64"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "ALL PASS" in out


def test_suite_cli_artificial(tmp_path):
    from singlespmv_tpu.cli import main

    rc = main(["suite", "artificial", "--out", str(tmp_path), "--sizes", "64"])
    assert rc == 0
    names = {p.name for p in tmp_path.iterdir()}
    assert {"band-64.mtx", "unbalance-64.mtx", "random-64.mtx",
            "dense-64.mtx"} <= names

    rc = main(["suite", "test", "--out", str(tmp_path)])
    assert rc == 0
