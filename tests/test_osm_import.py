"""Offline OSM importer: XML extract -> traces -> buildable plan."""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OSM = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="1" lat="40.0000" lon="116.0000"/>
  <node id="2" lat="40.0000" lon="116.0050"/>
  <node id="3" lat="40.0040" lon="116.0050"/>
  <node id="4" lat="40.0040" lon="116.0000"/>
  <node id="5" lat="40.0000" lon="116.0025"/>
  <node id="6" lat="40.0040" lon="116.0025"/>
  <node id="7" lat="40.0020" lon="116.0000"/>
  <node id="8" lat="40.0020" lon="116.0050"/>
  <node id="9" lat="41.0" lon="117.0"/>
  <way id="100"><nd ref="1"/><nd ref="2"/><tag k="highway" v="primary"/></way>
  <way id="101"><nd ref="2"/><nd ref="3"/><tag k="highway" v="secondary"/></way>
  <way id="102"><nd ref="3"/><nd ref="4"/><tag k="highway" v="primary"/></way>
  <way id="103"><nd ref="4"/><nd ref="1"/><tag k="highway" v="residential"/></way>
  <way id="104"><nd ref="5"/><nd ref="6"/><tag k="highway" v="tertiary"/></way>
  <way id="105"><nd ref="7"/><nd ref="8"/><tag k="highway" v="unclassified"/></way>
  <way id="200"><nd ref="1"/><nd ref="9"/><tag k="highway" v="footway"/></way>
  <way id="201"><nd ref="1"/><nd ref="9"/><tag k="waterway" v="river"/></way>
</osm>
"""


def test_osm_to_buildable_plan(tmp_path):
    osm_path = tmp_path / 'city.osm'
    osm_path.write_text(OSM)
    out = tmp_path / 'traces.json'
    subprocess.run([sys.executable, os.path.join(ROOT, 'tools',
                                                 'osm_import.py'),
                    '--osm', str(osm_path), '--cell-edge', '10',
                    '--out', str(out)], check=True, cwd=ROOT)
    payload = json.loads(out.read_text())
    # footway/waterway excluded
    assert len(payload['traces']) == 6

    from tools.build_scenario import build_plan
    from urban_tpu.geometry.base import POLY
    table = build_plan(payload['traces'], [])
    kinds = [g.kind for g in table.geoms]
    # ring + one vertical + one horizontal main road -> 4 blocks
    assert kinds.count(POLY) == 4
