"""Branch-frequency histogram for the host slicing tree on real episodes.

Replays seeded host episodes (random valid actions, like tools/divergence.py)
with the slicer's decision functions instrumented, and prints how often each
branch of the tree fires plus the leaf cutter kinds. Used to prioritize the
jit-tier port of the tree (VERDICT round-2 item 1).

Usage: JAX_PLATFORMS=cpu python tools/slicer_branch_stats.py [n_seeds] [scenario]
"""
import collections
import functools
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

COUNTS = collections.Counter()

logger = logging.getLogger('branchstats')
logger.addHandler(logging.NullHandler())
logger.propagate = False


def _wrap(mod, name):
    fn = getattr(mod, name)

    @functools.wraps(fn)
    def wrapped(*a, **k):
        COUNTS[name] += 1
        return fn(*a, **k)
    setattr(mod, name, wrapped)


def instrument():
    from urban_tpu.geometry import slicer
    for name in ('slice_from_u_shape', 'slice_from_angle',
                 'slice_from_angle_rect_tri', 'slice_from_part_edge',
                 'slice_from_l_shape', 'slice_from_half_edge',
                 'slice_polygon_from_half_or_part_edge',
                 'slice_from_whole_edge', 'slice_polygon_from_edge',
                 'slice_polygon_from_corner', 'slice_edge'):
        _wrap(slicer, name)
    # classify edge vs corner entries
    orig = slicer.simplify_and_classify

    @functools.wraps(orig)
    def classify(*a, **k):
        out = orig(*a, **k)
        COUNTS[f'entry_{out[2]}'] += 1
        return out
    slicer.simplify_and_classify = classify


def run(n_seeds=20, scenario='hlg', start_seed=100, max_steps=60):
    from urban_tpu.utils.config import Config
    from urban_tpu.envs.city import CityEnv
    instrument()
    placements = 0
    whole = 0
    for k in range(n_seeds):
        cfg = Config(scenario, 0, tmp=True)
        env = CityEnv(cfg)
        obs = env.reset()
        rng = np.random.default_rng(start_seed + k)
        for _ in range(max_steps):
            valid = np.nonzero(obs[6])[0]
            if len(valid) == 0:
                break
            before = sum(COUNTS.values())
            action = int(rng.choice(valid))
            obs, r, done, info = env.step(np.array([action, 0], float), logger)
            placements += 1
            if sum(COUNTS.values()) == before:
                whole += 1  # whole-feasible shortcut, no slicing
            if done:
                break
    print(f'placements: {placements} (whole-feasible: {whole})')
    for name, n in COUNTS.most_common():
        print(f'{name:45s} {n}')


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    scenario = sys.argv[2] if len(sys.argv) > 2 else 'hlg'
    run(n, scenario)
