"""One-shot converter: reference scenario data -> framework-native bundles.

Reads the reference's pickled initial plans + objectives YAMLs (public
scenario *data*, not code) and writes:
  * urban_tpu/cfg/scenarios/<name>/init_plan_<name>.npz
  * urban_tpu/cfg/scenarios/<name>/objectives_<name>.yaml

Run once from the repo root:  python tools/import_scenarios.py
"""
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_tpu.io.refpickle import load_reference_plan
from urban_tpu.io.scenario import save_init_plan

REF = '/root/reference/urban_planning/cfg/test_data'
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'urban_tpu', 'cfg', 'scenarios')

SCENARIOS = {
    'grid': (f'{REF}/synthetic/init_plan_grid.pickle',
             f'{REF}/synthetic/objectives_grid.yaml', 'grid'),
    'hlg': (f'{REF}/real/hlg/init_plan_hlg.pickle',
            f'{REF}/real/hlg/objectives_hlg.yaml', 'hlg'),
    'hlg_concept': (f'{REF}/real/hlg/init_plan_hlg_concept.pickle',
                    f'{REF}/real/hlg/objectives_hlg.yaml', 'hlg'),
    'dhm': (f'{REF}/real/dhm/init_plan_dhm.pickle',
            f'{REF}/real/dhm/objectives_dhm.yaml', 'dhm'),
    'dhm_concept': (f'{REF}/real/dhm/init_plan_dhm_concept.pickle',
                    f'{REF}/real/dhm/objectives_dhm.yaml', 'dhm'),
    # the reference's third-city onboarding walkthrough artifact
    # (reference: extra/README.md, extra/init_plan_huizhou.pickle)
    'huizhou': ('/root/reference/extra/init_plan_huizhou.pickle',
                '/root/reference/extra/objectives_huizhou.yaml', 'huizhou'),
}


def main() -> None:
    written_objectives = set()
    for name, (pickle_path, objectives_path, obj_name) in SCENARIOS.items():
        scenario_dir = os.path.join(OUT, obj_name)
        os.makedirs(scenario_dir, exist_ok=True)
        raw = load_reference_plan(pickle_path)
        out_npz = os.path.join(scenario_dir, f'init_plan_{name}.npz')
        save_init_plan(out_npz, raw.plan, raw.concept, raw.rule_constraints)
        print(f'{name}: {len(raw.plan)} features, {len(raw.concept)} concept '
              f'entries -> {out_npz}')
        if obj_name not in written_objectives:
            with open(objectives_path) as f:
                objectives = yaml.safe_load(f)
            out_yaml = os.path.join(scenario_dir, f'objectives_{obj_name}.yaml')
            with open(out_yaml, 'w') as f:
                f.write('# Scenario objectives (converted from the reference '
                        'scenario data by tools/import_scenarios.py)\n')
                yaml.safe_dump(objectives, f, sort_keys=False)
            written_objectives.add(obj_name)
            print(f'  objectives -> {out_yaml}')


if __name__ == '__main__':
    main()
