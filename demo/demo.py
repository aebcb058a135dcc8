"""Plan inspection demo (reference: demo/demo.ipynb).

Load a saved plan (GeoJSON or a checkpointed best-plan payload), re-score it
with the environment, and optionally render it:

  python demo/demo.py --cfg hlg --plan /path/to/plan.geojson [--render out.svg]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_tpu.envs.city import CityEnv
from urban_tpu.io.geojson import load_geojson
from urban_tpu.utils.config import Config
from urban_tpu.utils.io import load_yaml


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument('--cfg', required=True)
    p.add_argument('--plan', required=True,
                   help='GeoJSON plan or pickled plan payload')
    p.add_argument('--render', default=None, help='SVG output path')
    p.add_argument('--road_weight', type=float, default=1.0,
                   help='road-network weight when scoring')
    args = p.parse_args()

    cfg_dict = load_yaml(f'urban_tpu/cfg/**/{args.cfg}.yaml')
    cfg_dict.setdefault('reward_specs', {})
    cfg_dict['reward_specs']['road_network_weight'] = args.road_weight
    cfg = Config(args.cfg, 0, tmp=True, cfg_dict=cfg_dict)
    env = CityEnv(cfg)

    if args.plan.endswith('.geojson') or args.plan.endswith('.json'):
        table = load_geojson(args.plan)
    else:
        with open(args.plan, 'rb') as f:
            payload = pickle.load(f)
        if isinstance(payload, list):
            payload = payload[0]
        if isinstance(payload, dict) and 'best_plan_state' in payload:
            # TPU-trainer checkpoint (rl/train_tpu.py save_checkpoint):
            # convert the jitted-env best-plan state to a host GeoTable
            # (state_to_table sizes itself from the state's own buffers,
            # so phase-2 checkpoints with regrown slot tables decode too)
            if payload['best_plan_state'] is None:
                raise SystemExit(
                    'checkpoint holds no best plan (best_plan_state=None): '
                    'no greedy eval episode succeeded before it was saved')
            from urban_tpu.jaxenv.state import state_to_table
            table = state_to_table(payload['best_plan_state'])
        else:
            table = payload['gdf'] if isinstance(payload, dict) else payload

    env.load_plan(table)
    env.score_plan(verbose=True)
    if args.render:
        env.visualize(save_fig=True, path=args.render, legend=True)
        print(f'rendered to {args.render}')


if __name__ == '__main__':
    main()
