"""Batched vmapped PDHG solves (SURVEY §7.3: instance batches as one
device program)."""
import numpy as np
import pytest

from highs_tpu import HighsModelStatus
from highs_tpu.io.mps import read_mps
from highs_tpu.options import HighsOptions
from highs_tpu.solvers.pdlp.batch import solve_lp_batch
from highs_tpu.solvers.pdlp.wrapper import solve_lp_pdlp

from conftest import instance_path

REFS = {"afiro": -4.6475314286e2, "adlittle": 2.2549496316e5}


def test_batch_matches_reference(instances_dir):
    names = sorted(REFS)
    lps = [read_mps(instance_path(f"{n}.mps")).lp for n in names]
    opts = HighsOptions()
    results = solve_lp_batch(lps, opts)
    for name, (st, sol, info) in zip(names, results):
        assert st == HighsModelStatus.kOptimal
        ref = REFS[name]
        assert abs(info.primal_obj - ref) / max(1.0, abs(ref)) < 1e-5
        assert sol.value_valid and sol.dual_valid


def test_batch_matches_single_solves(instances_dir):
    """Batched iterates must be identical to single-instance solves
    (mesh/batch invariance, SURVEY §4)."""
    names = sorted(REFS)
    lps = [read_mps(instance_path(f"{n}.mps")).lp for n in names]
    opts = HighsOptions()
    batch = solve_lp_batch(lps, opts)
    for lp, (st_b, sol_b, info_b) in zip(lps, batch):
        st_s, sol_s, info_s = solve_lp_pdlp(lp, opts)
        # bucket shapes differ between batch and single solves, which
        # perturbs the power-method step size slightly; solutions agree
        # to solver tolerance
        assert abs(info_b.iterations - info_s.iterations) <= \
            10 * opts.tpu_check_interval
        np.testing.assert_allclose(sol_b.col_value, sol_s.col_value,
                                   atol=2e-4)
