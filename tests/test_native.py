"""Differential tests: native contiguity kernel vs the numpy path."""
import time

import numpy as np
import pytest

from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.geometry import native, ops
from urban_tpu.utils.config import Config


@pytest.mark.skipif(not native.available(), reason='no native toolchain')
def test_native_matches_numpy_on_hlg():
    cfg = Config('hlg', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    rows = plc._table.alive_rows()
    segs, owner = plc._feature_segments(rows)
    n = len(rows)
    pairs = native.contiguity_pairs(segs, owner, n, plc.CONTIG_TOL)
    native_set = {tuple(p) for p in pairs}

    dmat = ops.segment_distance_matrix(segs, segs)
    touch = dmat <= plc.CONTIG_TOL
    adj = np.zeros((n, n), dtype=bool)
    np.logical_or.at(adj, (owner[:, None], owner[None, :]), touch)
    iu, ju = np.nonzero(np.triu(adj, k=1))
    numpy_set = set(zip(iu.tolist(), ju.tolist()))
    assert native_set == numpy_set


@pytest.mark.skipif(not native.available(), reason='no native toolchain')
def test_native_speedup():
    cfg = Config('dhm', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    rows = plc._table.alive_rows()
    segs, owner = plc._feature_segments(rows)
    n = len(rows)
    t0 = time.time()
    for _ in range(3):
        native.contiguity_pairs(segs, owner, n, plc.CONTIG_TOL)
    t_native = (time.time() - t0) / 3
    t0 = time.time()
    ops.segment_distance_matrix(segs, segs)
    t_numpy = time.time() - t0
    # the grid-hash kernel should beat the dense numpy matrix comfortably
    assert t_native < t_numpy
