"""Scenario construction tooling (reference: misc/init_plan.py).

Builds an initial plan from raw main-road polylines, the way the reference's
``aggregate`` does (reference misc/init_plan.py:22-52): node the linework at
mutual crossings, emit road segments (type 2) + unique intersections
(type 13) + polygonized feasible faces (type 1). Also regenerates the
synthetic 240x240 grid community from its defining road lines.

Usage:
  python tools/make_scenario.py --out urban_tpu/cfg/scenarios/mygrid \
      [--name mygrid]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_tpu.geometry import graph as ggraph
from urban_tpu.geometry import ops
from urban_tpu.geometry.base import Geometry, LINE, POINT, POLY
from urban_tpu.io.refpickle import PlanTable
from urban_tpu.io.scenario import save_init_plan
from urban_tpu import city_config


def node_linework(lines):
    """Split polylines at mutual intersection points (noding)."""
    segs = []
    for ln in lines:
        ln = np.asarray(ln, dtype=np.float64)
        for i in range(len(ln) - 1):
            segs.append((ln[i], ln[i + 1]))
    # collect split points per segment
    out = []
    for i, (a, b) in enumerate(segs):
        cuts = [0.0, 1.0]
        ab = b - a
        denom_ab = float(np.dot(ab, ab))
        for j, (c, d) in enumerate(segs):
            if i == j:
                continue
            # proper or touching intersection of segments
            p = _segment_intersection(a, b, c, d)
            if p is not None:
                t = float(np.dot(p - a, ab)) / max(denom_ab, 1e-12)
                if 1e-9 < t < 1 - 1e-9:
                    cuts.append(t)
        cuts = sorted(set(round(t, 12) for t in cuts))
        for t0, t1 in zip(cuts[:-1], cuts[1:]):
            p0 = a + ab * t0
            p1 = a + ab * t1
            if np.linalg.norm(p1 - p0) > 1e-9:
                out.append(np.stack([p0, p1]))
    return out


def _segment_intersection(a, b, c, d):
    """Intersection point of segments ab and cd, or None."""
    r = b - a
    s = d - c
    denom = r[0] * s[1] - r[1] * s[0]
    if abs(denom) < 1e-12:
        return None
    t = ((c - a)[0] * s[1] - (c - a)[1] * s[0]) / denom
    u = ((c - a)[0] * r[1] - (c - a)[1] * r[0]) / denom
    if -1e-9 <= t <= 1 + 1e-9 and -1e-9 <= u <= 1 + 1e-9:
        return a + t * r
    return None


def aggregate(lines) -> PlanTable:
    """Noded roads + intersections + polygonized feasible blocks
    (reference misc/init_plan.py:22-52)."""
    roads = node_linework(lines)
    # unique endpoints
    pts = {}
    for seg in roads:
        for p in (seg[0], seg[1]):
            pts[(round(float(p[0]), 9), round(float(p[1]), 9))] = p
    intersections = list(pts.values())
    faces = ggraph.polygonize(roads)

    geoms = ([Geometry(LINE, seg) for seg in roads]
             + [Geometry(POINT, p[None, :]) for p in intersections]
             + [Geometry.polygon(ops.ensure_ccw(f)) for f in faces])
    types = ([city_config.ROAD] * len(roads)
             + [city_config.INTERSECTION] * len(intersections)
             + [city_config.FEASIBLE] * len(faces))
    n = len(geoms)
    return PlanTable(ids=np.arange(n, dtype=np.int64),
                     types=np.asarray(types, dtype=np.int32),
                     existence=np.ones(n, dtype=bool),
                     geoms=geoms)


def grid_lines():
    """The synthetic grid community's defining road lines
    (reference misc/init_plan.py:62-75)."""
    return [
        [(0, 0), (0, 240)], [(0, 240), (240, 240)],
        [(240, 240), (240, 0)], [(240, 0), (0, 0)],
        [(0, 120), (240, 120)], [(120, 0), (120, 240)],
        [(60, 0), (60, 240)], [(190, 0), (190, 240)],
        [(0, 50), (240, 50)], [(0, 180), (240, 180)],
    ]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True, help='output directory')
    p.add_argument('--name', default='grid2')
    args = p.parse_args()
    table = aggregate(grid_lines())
    os.makedirs(args.out, exist_ok=True)
    out_npz = os.path.join(args.out, f'init_plan_{args.name}.npz')
    save_init_plan(out_npz, table, [], False)
    kinds = np.array([g.kind for g in table.geoms])
    print(f'{args.name}: {int((kinds == LINE).sum())} roads, '
          f'{int((kinds == POINT).sum())} intersections, '
          f'{int((kinds == POLY).sum())} feasible blocks -> {out_npz}')


if __name__ == '__main__':
    main()
