"""New-community onboarding: raw road traces -> complete initial plan.

The reference builds its real scenarios from hand-traced main-road polylines
plus land-use annotations (reference misc/init_plan.py:112-217 for HLG,
:312-413 for DHM, land-use annotation :269-274,466-474; the huizhou
walkthrough in extra/README.md). This tool is the framework-native
equivalent, so onboarding a new city needs no reference pickles:

  extract   recover editable raw data (road traces + land-use annotation
            points) from an existing scenario bundle
  build     raw traces + annotations -> noded roads, intersections,
            polygonized blocks, annotated land uses -> init_plan .npz
  compare   verify a rebuilt plan is geometrically identical to a bundle
            (segment/intersection/face multisets + land-use assignment)

Round-trip check (extract -> build -> compare against the shipped bundle)
runs in tests/test_build_scenario.py for HLG and DHM.

Usage:
  python tools/build_scenario.py extract --scenario hlg \
      --out urban_tpu/cfg/scenarios/hlg/traces_hlg.json
  python tools/build_scenario.py build --traces traces_mycity.json \
      --out urban_tpu/cfg/scenarios/mycity/init_plan_mycity.npz
  python tools/build_scenario.py compare --traces traces_hlg.json \
      --bundle urban_tpu/cfg/scenarios/hlg/init_plan_hlg.npz

See docs/new_scenario.md for the full new-city walkthrough.
"""
import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_tpu import city_config
from urban_tpu.geometry.base import Geometry, LINE, POINT, POLY
from urban_tpu.io.refpickle import PlanTable
from urban_tpu.io.scenario import load_init_plan, save_init_plan
from tools.make_scenario import aggregate

TOL = 1e-6


def _key(p, nd=6):
    return (round(float(p[0]), nd), round(float(p[1]), nd))


def extract_traces(plan: PlanTable):
    """Recover raw road polylines + land-use annotations from a bundle.

    Road rows are re-merged through degree-2 nodes into maximal polylines
    (the inverse of noding); every non-feasible polygon becomes a land-use
    annotation at a representative interior point."""
    segs = []
    for i, g in enumerate(plan.geoms):
        if not plan.existence[i] or g.kind != LINE:
            continue
        if plan.types[i] not in (city_config.ROAD, city_config.BOUNDARY):
            continue
        c = g.coords
        for k in range(len(c) - 1):
            segs.append((c[k].copy(), c[k + 1].copy()))

    # node degree over segment endpoints
    deg = defaultdict(int)
    for a, b in segs:
        deg[_key(a)] += 1
        deg[_key(b)] += 1

    # walk chains from non-degree-2 nodes (and leftover cycles)
    adj = defaultdict(list)
    for idx, (a, b) in enumerate(segs):
        adj[_key(a)].append(idx)
        adj[_key(b)].append(idx)
    visited = [False] * len(segs)
    traces = []

    def walk(start_key, eidx):
        line = [np.array(start_key)]
        cur = start_key
        while True:
            visited[eidx] = True
            a, b = segs[eidx]
            nxt = _key(b) if _key(a) == cur else _key(a)
            line.append(np.array(nxt))
            if deg[nxt] != 2:
                break
            cand = [e for e in adj[nxt] if not visited[e]]
            if not cand:
                break
            eidx = cand[0]
            cur = nxt
        return line

    for node, d in deg.items():
        if d == 2:
            continue
        for eidx in adj[node]:
            if not visited[eidx]:
                traces.append(walk(node, eidx))
    for eidx in range(len(segs)):     # pure cycles
        if not visited[eidx]:
            traces.append(walk(_key(segs[eidx][0]), eidx))

    annotations = []
    for i, g in enumerate(plan.geoms):
        if not plan.existence[i] or g.kind != POLY:
            continue
        t = int(plan.types[i])
        if t == city_config.FEASIBLE:
            continue
        cx, cy = g.centroid
        annotations.append({'type': t,
                            'land_use': city_config.LAND_USE[t],
                            'point': [float(cx), float(cy)]})
    return ([[p.tolist() for p in line] for line in traces], annotations)


def build_plan(traces, annotations) -> PlanTable:
    """Raw polylines + annotations -> complete initial plan
    (the reference aggregate + land-use annotation pipeline)."""
    table = aggregate([np.asarray(line, dtype=np.float64)
                       for line in traces])
    from urban_tpu.geometry import ops
    for ann in annotations:
        t = ann.get('type')
        if t is None:
            t = city_config.LAND_USE.index(ann['land_use'])
        p = np.asarray(ann['point'], dtype=np.float64)
        hit = None
        for i, g in enumerate(table.geoms):
            if g.kind == POLY and ops.point_in_ring(p, g.coords) >= 0:
                hit = i
                break
        if hit is None:
            raise ValueError(f'annotation point {p.tolist()} falls in no '
                             f'polygonized block')
        table.types[hit] = t
    return table


def _seg_multiset(plan: PlanTable, road_types):
    out = []
    for i, g in enumerate(plan.geoms):
        if not plan.existence[i] or g.kind != LINE:
            continue
        if plan.types[i] not in road_types:
            continue
        c = g.coords
        for k in range(len(c) - 1):
            a, b = _key(c[k]), _key(c[k + 1])
            out.append(tuple(sorted((a, b))))
    return sorted(out)


def compare_plans(built: PlanTable, bundle: PlanTable):
    """Geometric equality of two plans regardless of row grouping/order."""
    road_types = (city_config.ROAD, city_config.BOUNDARY)
    report = {}
    report['segments_equal'] = (_seg_multiset(built, road_types)
                                == _seg_multiset(bundle, road_types))

    def pts(plan):
        return sorted(_key(g.coords[0]) for i, g in enumerate(plan.geoms)
                      if plan.existence[i] and g.kind == POINT)
    report['intersections_equal'] = pts(built) == pts(bundle)

    def faces(plan):
        out = []
        for i, g in enumerate(plan.geoms):
            if plan.existence[i] and g.kind == POLY:
                cx, cy = g.centroid
                out.append((int(plan.types[i]), round(g.area, 6),
                            round(cx, 6), round(cy, 6)))
        return sorted(out)
    report['faces_equal'] = faces(built) == faces(bundle)
    report['ok'] = all(report.values())
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument('cmd', choices=['extract', 'build', 'compare'])
    p.add_argument('--scenario', help='bundled scenario name (extract)')
    p.add_argument('--bundle', help='init_plan .npz path')
    p.add_argument('--traces', help='traces .json path')
    p.add_argument('--out', help='output path')
    args = p.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    if args.cmd == 'extract':
        path = args.bundle or os.path.join(
            root, 'urban_tpu', 'cfg', 'scenarios', args.scenario,
            f'init_plan_{args.scenario}.npz')
        plan, concept, rules = load_init_plan(path)
        traces, annotations = extract_traces(plan)
        payload = {'traces': traces, 'annotations': annotations,
                   'rule_constraints': bool(rules)}
        with open(args.out, 'w') as f:
            json.dump(payload, f)
        print(f'{len(traces)} traces, {len(annotations)} annotations '
              f'-> {args.out}')
    elif args.cmd == 'build':
        with open(args.traces) as f:
            payload = json.load(f)
        table = build_plan(payload['traces'], payload['annotations'])
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        save_init_plan(args.out, table, [],
                       payload.get('rule_constraints', False))
        kinds = np.array([g.kind for g in table.geoms])
        print(f'{int((kinds == LINE).sum())} road rows, '
              f'{int((kinds == POINT).sum())} intersections, '
              f'{int((kinds == POLY).sum())} blocks -> {args.out}')
    else:
        with open(args.traces) as f:
            payload = json.load(f)
        built = build_plan(payload['traces'], payload['annotations'])
        plan, _, _ = load_init_plan(args.bundle)
        report = compare_plans(built, plan)
        print(json.dumps(report, indent=2))
        sys.exit(0 if report['ok'] else 1)


if __name__ == '__main__':
    main()
