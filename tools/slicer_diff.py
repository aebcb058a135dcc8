"""Differential harness: host slicing tree vs jitted compute_cutter.

Replays seeded host episodes (random valid actions, like tools/divergence.py),
intercepts every call into the host slicer (urban_tpu/geometry/slicer.py
slice_polygon) to capture its inputs and the cutter quad it produced, then
runs the jitted mirror (urban_tpu/jaxenv/slicer.py compute_cutter) on the
same inputs and reports agreement:

  * cutter quads matching as vertex sets (tol in grid units)
  * parcel (block ∩ cutter) area agreement
  * SliceError <-> jit fail flag agreement

Usage: JAX_PLATFORMS=cpu python tools/slicer_diff.py [n_seeds] [scenario]
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger('slicerdiff')
logger.addHandler(logging.NullHandler())
logger.propagate = False

CASES = []


def instrument():
    from urban_tpu.envs import plan_client as pc_mod
    from urban_tpu.geometry import slicer as host_slicer

    orig_slice = host_slicer.slice_polygon
    orig_maxpiece = host_slicer.get_intersection_polygon_with_maximum_area
    last_cutter = {}

    def rec_maxpiece(cutter, ring):
        last_cutter['cutter'] = np.asarray(cutter, dtype=np.float64)
        return orig_maxpiece(cutter, ring)

    def rec_slice(polygon, intersection, all_intersections, **kw):
        case = dict(ring=np.asarray(polygon.canonicalize().coords,
                                    dtype=np.float64),
                    X=np.asarray(intersection, dtype=np.float64).reshape(2),
                    pts=np.asarray(all_intersections, dtype=np.float64),
                    params=dict(kw), fail=False, cutter=None)
        last_cutter.pop('cutter', None)
        try:
            out = orig_slice(polygon, intersection, all_intersections, **kw)
        except host_slicer.SliceError:
            case['fail'] = True
            CASES.append(case)
            raise
        case['cutter'] = last_cutter.get('cutter')
        case['parcel_area'] = float(out.area)
        CASES.append(case)
        return out

    host_slicer.get_intersection_polygon_with_maximum_area = rec_maxpiece
    host_slicer.slice_polygon = rec_slice
    pc_mod.slice_polygon = rec_slice


def collect(n_seeds=20, scenario='hlg', start_seed=100, max_steps=60):
    from urban_tpu.utils.config import Config
    from urban_tpu.envs.city import CityEnv
    instrument()
    for k in range(n_seeds):
        cfg = Config(scenario, 0, tmp=True)
        env = CityEnv(cfg)
        obs = env.reset()
        rng = np.random.default_rng(start_seed + k)
        for _ in range(max_steps):
            valid = np.nonzero(obs[6])[0]
            if len(valid) == 0:
                break
            action = int(rng.choice(valid))
            obs, r, done, info = env.step(np.array([action, 0], float), logger)
            if done:
                break


def compare(tol=1e-3):
    import jax
    import jax.numpy as jnp
    from urban_tpu.jaxenv import geometry as jg
    from urban_tpu.jaxenv import slicer as jslicer

    KV = max(len(c['ring']) for c in CASES) + 8
    NPT = max(len(c['pts']) for c in CASES) + 8

    @jax.jit
    def run(ring, nv, X, pts, alive, lp):
        S, snv, cut, fail = jslicer.compute_cutter(ring, nv, X, pts, alive,
                                                   lp)
        pr, pn, ovf = jg.clip_poly_by_convex_quad(S, snv, cut)
        area = jg.ring_area(pr, pn)
        return cut, fail, area

    n_quad = n_area = n_fail_agree = 0
    worst = []
    for ci, c in enumerate(CASES):
        ring = np.zeros((KV, 2))
        ring[:len(c['ring'])] = c['ring']
        pts = np.zeros((NPT, 2))
        alive = np.zeros(NPT, bool)
        pts[:len(c['pts'])] = c['pts']
        alive[:len(c['pts'])] = True
        p = c['params']
        lp = jslicer.LuParams(
            cell=jnp.float64(p['cell_edge_length']),
            min_edge=jnp.float64(p['min_edge_length']),
            max_edge=jnp.float64(p['max_edge_length']),
            search_max_length=jnp.float64(p['search_max_length']),
            search_max_area=jnp.float64(p['search_max_area']),
            search_min_area=jnp.float64(p['search_min_area']),
            common_min_edge=jnp.float64(p['search_max_length']
                                        - p['max_edge_length']))
        cut, fail, area = run(jnp.asarray(ring), jnp.asarray(len(c['ring'])),
                              jnp.asarray(c['X']), jnp.asarray(pts),
                              jnp.asarray(alive), lp)
        cut = np.asarray(cut)
        fail = bool(fail)
        if c['fail'] or fail:
            n_fail_agree += int(c['fail'] == fail)
            worst.append((np.inf if c['fail'] != fail else 0.0, ci,
                          'fail_host=%s fail_jit=%s' % (c['fail'], fail)))
            continue
        n_fail_agree += 1
        hq = np.array(sorted(map(tuple, np.round(c['cutter'][:4], 6))))
        jq = np.array(sorted(map(tuple, np.round(cut, 6))))
        dq = float(np.abs(hq - jq).max()) if hq.shape == jq.shape else np.inf
        if dq < tol:
            n_quad += 1
        da = abs(float(area) - c['parcel_area']) / max(c['parcel_area'], 1e-9)
        if da < 1e-3:
            n_area += 1
        worst.append((dq, ci, 'dq=%.4g da=%.4g' % (dq, da)))

    n = len(CASES)
    print(f'cases: {n}')
    print(f'fail agreement:  {n_fail_agree}/{n} = {n_fail_agree / n:.3f}')
    print(f'quad match:      {n_quad}/{n} = {n_quad / n:.3f}')
    print(f'parcel area:     {n_area}/{n} = {n_area / n:.3f}')
    worst.sort(reverse=True)
    print('\nworst cases:')
    for d, ci, msg in worst[:12]:
        c = CASES[ci]
        print(f'  case {ci}: {msg} nv={len(c["ring"])} '
              f'X={c["X"].round(2).tolist()}')
    return worst


if __name__ == '__main__':
    import jax
    jax.config.update('jax_enable_x64', True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scenario = sys.argv[2] if len(sys.argv) > 2 else 'hlg'
    collect(n, scenario)
    dump = os.environ.get('SLICER_DIFF_DUMP')
    if dump:
        import pickle
        with open(dump, 'wb') as f:
            pickle.dump(CASES, f)
    compare()
