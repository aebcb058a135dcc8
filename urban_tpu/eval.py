"""Evaluation/inference CLI (reference: urban_planning/eval.py:18-74).

Usage:
  python -m urban_tpu.eval --cfg hlg --global_seed 111 --agent rule-centralized
"""
from __future__ import annotations

from pprint import pprint

import numpy as np
from absl import app

from urban_tpu.utils.flags import tolerant_flags as flags

from urban_tpu.agents.urban_agent import UrbanPlanningAgent
from urban_tpu.utils.config import Config

flags.DEFINE_string('root_dir', '/tmp/urban_tpu_runs',
                    'Root directory for logs/summaries/checkpoints.')
flags.DEFINE_string('cfg', None, 'Configuration file.')
flags.DEFINE_bool('tmp', False, 'Whether to use temporary storage.')
flags.DEFINE_enum('agent', 'rl-sgnn',
                  ['rl-sgnn', 'rl-mlp', 'rule-centralized',
                   'rule-decentralized', 'gsca', 'ga'], 'Agent type.')
flags.DEFINE_bool('mean_action', True, 'Whether to use greedy strategy.')
flags.DEFINE_bool('visualize', False, 'Whether to visualize the planning '
                  'process.')
flags.DEFINE_bool('only_road', False, 'Whether to only visualize road '
                  'planning.')
flags.DEFINE_bool('save_video', False, 'Whether to save a video of the '
                  'planning process.')
flags.DEFINE_integer('global_seed', None, 'Seed.')
flags.DEFINE_string('iteration', '0', 'Checkpoint to load (number or '
                    '"best").')

FLAGS = flags.FLAGS


def main_loop(_):
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    cfg = Config(FLAGS.cfg, FLAGS.global_seed, FLAGS.tmp, FLAGS.root_dir,
                 FLAGS.agent)
    np.random.seed(cfg.seed)
    checkpoint = int(FLAGS.iteration) if FLAGS.iteration.isnumeric() \
        else FLAGS.iteration
    agent = UrbanPlanningAgent(cfg=cfg, num_threads=1, training=False,
                               checkpoint=checkpoint,
                               restore_best_rewards=True)
    if FLAGS.only_road:
        agent.freeze_land_use()

    if FLAGS.agent != 'ga':
        agent.infer(num_samples=1, mean_action=FLAGS.mean_action,
                    visualize=FLAGS.visualize, save_video=FLAGS.save_video,
                    only_road=FLAGS.only_road)
    else:
        best_solution, _ = agent.load_ga()
        _, plan, log_eval = agent.fitness_ga(
            best_solution, num_samples=1, mean_action=FLAGS.mean_action,
            visualize=FLAGS.visualize, return_log_eval=True)
        pprint({k: v for k, v in plan.items() if not k.endswith('gdf')},
               indent=4, sort_dicts=False)
        agent.save_plan(log_eval)


if __name__ == '__main__':
    flags.mark_flags_as_required(['cfg', 'global_seed'])
    app.run(main_loop)
