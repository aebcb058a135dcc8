"""Offline OSM road-network importer: local .osm XML -> scenario traces.

The reference retrieves road networks with osmnx (reference
misc/osmnx_test.py); this environment-independent equivalent parses a
locally saved OpenStreetMap XML extract (export from openstreetmap.org or
any Overpass dump), projects it to local meters, scales it onto the
scenario grid, and emits a traces JSON consumable by
tools/build_scenario.py build. No network access and no osmnx/geopandas
dependency.

Usage:
  python tools/osm_import.py --osm mycity.osm \
      --cell-edge 10 --out urban_tpu/cfg/scenarios/mycity/traces_mycity.json
  python tools/build_scenario.py build \
      --traces .../traces_mycity.json --out .../init_plan_mycity.npz

Then write objectives_mycity.yaml with the printed grid_cols/grid_rows and
follow docs/new_scenario.md.
"""
import argparse
import json
import math
import os
import sys
import xml.etree.ElementTree as ET

# highway classes kept as main roads (the reference's drive network)
DEFAULT_HIGHWAYS = ('motorway', 'trunk', 'primary', 'secondary', 'tertiary',
                    'unclassified', 'residential', 'living_street', 'road',
                    'motorway_link', 'trunk_link', 'primary_link',
                    'secondary_link', 'tertiary_link')


def parse_osm(path, highways=DEFAULT_HIGHWAYS):
    """(nodes {id: (lon, lat)}, ways [[node ids]]) of kept highways."""
    tree = ET.parse(path)
    root = tree.getroot()
    nodes = {}
    for n in root.iter('node'):
        nodes[n.get('id')] = (float(n.get('lon')), float(n.get('lat')))
    ways = []
    for w in root.iter('way'):
        tags = {t.get('k'): t.get('v') for t in w.findall('tag')}
        if tags.get('highway') not in highways:
            continue
        nds = [nd.get('ref') for nd in w.findall('nd')]
        if len(nds) >= 2:
            ways.append(nds)
    return nodes, ways


def project(nodes):
    """Equirectangular projection to meters around the extract centroid."""
    lons = [p[0] for p in nodes.values()]
    lats = [p[1] for p in nodes.values()]
    lon0 = sum(lons) / len(lons)
    lat0 = sum(lats) / len(lats)
    r = 6371000.0
    k = math.pi / 180.0
    out = {}
    for nid, (lon, lat) in nodes.items():
        x = r * k * (lon - lon0) * math.cos(lat0 * k)
        y = r * k * (lat - lat0)
        out[nid] = (x, y)
    return out


def to_traces(nodes_m, ways, cell_edge):
    """Shift to a nonnegative grid frame and scale meters -> cells."""
    used = {nid for way in ways for nid in way if nid in nodes_m}
    if not used:
        raise ValueError('no highway nodes found in the extract')
    minx = min(nodes_m[n][0] for n in used)
    miny = min(nodes_m[n][1] for n in used)
    traces = []
    for way in ways:
        line = [[(nodes_m[n][0] - minx) / cell_edge,
                 (nodes_m[n][1] - miny) / cell_edge]
                for n in way if n in nodes_m]
        if len(line) >= 2:
            traces.append(line)
    maxx = max(p[0] for ln in traces for p in ln)
    maxy = max(p[1] for ln in traces for p in ln)
    return traces, math.ceil(maxx), math.ceil(maxy)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--osm', required=True, help='local .osm XML extract')
    p.add_argument('--cell-edge', type=float, default=10.0,
                   help='grid cell edge length in meters')
    p.add_argument('--out', required=True, help='traces JSON output')
    p.add_argument('--highways', default=','.join(DEFAULT_HIGHWAYS))
    args = p.parse_args()

    nodes, ways = parse_osm(args.osm, tuple(args.highways.split(',')))
    nodes_m = project(nodes)
    traces, cols, rows = to_traces(nodes_m, ways, args.cell_edge)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump({'traces': traces, 'annotations': [],
                   'rule_constraints': False}, f)
    print(f'{len(traces)} road traces -> {args.out}')
    print(f'objectives: grid_cols: {cols}  grid_rows: {rows}  '
          f'cell_edge_length: {args.cell_edge}')


if __name__ == '__main__':
    main()
