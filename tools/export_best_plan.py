"""Export a TPU-trainer checkpoint's best plan to geojson + host re-score.

Loads ``tpu_best.p`` (urban_tpu.rl.train_tpu.TPUTrainer.save_checkpoint),
materializes the best greedy eval plan as a host GeoTable, completes
leftover feasible space to GREEN_S exactly like the env's stage transition
(reference: plan_client.fill_leftover, /root/reference/urban_planning/envs/
plan_client.py:224-227), saves geojson in the published results/ format, and
re-scores it with the exact host engine (the published scorer, reference
demo/demo.ipynb -> city.py:621-635).

Usage:
  python tools/export_best_plan.py --cfg huizhou --ckpt /tmp/urban_tpu/huizhou/111/models/tpu_best.p \
      --out results/huizhou_rl_tpu.geojson
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', required=True)
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--global_seed', type=int, default=111)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    from urban_tpu import city_config
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.io.geojson import save_geojson
    from urban_tpu.jaxenv.state import state_to_table
    from urban_tpu.utils.config import Config

    with open(args.ckpt, 'rb') as f:
        ckpt = pickle.load(f)
    state = ckpt.get('best_plan_state')
    if state is None:
        print('checkpoint has no best_plan_state')
        return 1
    table = state_to_table(state)
    leftover = table.alive_mask_of(city_config.FEASIBLE)
    table.types[leftover] = city_config.GREEN_S
    save_geojson(table, args.out)
    print(f'exported best plan (jit eval reward '
          f"{ckpt.get('best_reward'):.4f}, iteration "
          f"{ckpt.get('best_iteration')}) -> {args.out}")

    cfg = Config(args.cfg, args.global_seed, tmp=True)
    env = CityEnv(cfg)
    env.load_plan(table)
    env.score_plan(verbose=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
