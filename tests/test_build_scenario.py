"""Scenario onboarding round-trip: raw traces rebuild the shipped bundles."""
import os

import pytest

from tools.build_scenario import build_plan, compare_plans
from urban_tpu.io.scenario import load_init_plan
from urban_tpu.utils.io import resolve_path

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize('name', ['grid', 'hlg', 'dhm'])
def test_traces_rebuild_bundle(name):
    import json
    d = os.path.join(ROOT, 'urban_tpu', 'cfg', 'scenarios', name)
    with open(os.path.join(d, f'traces_{name}.json')) as f:
        payload = json.load(f)
    built = build_plan(payload['traces'], payload['annotations'])
    bundle, _, _ = load_init_plan(os.path.join(d, f'init_plan_{name}.npz'))
    report = compare_plans(built, bundle)
    assert report['ok'], report
